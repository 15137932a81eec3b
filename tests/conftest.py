"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the XLA flags before jax is imported anywhere, so this lives at the
top of conftest. The 8 virtual host devices let data-parallel sharding and
the ICI all-reduce paths compile and execute without TPU hardware.
"""

import os
import re

# Force-override: the sandbox environment pins JAX_PLATFORMS=axon (TPU)
# via sitecustomize; tests must run on the virtual CPU mesh regardless.
# The device count is force-overridden too - a pre-existing count != 8
# in XLA_FLAGS would break every mesh test.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
m = re.search(r"--xla_force_host_platform_device_count=\d+", flags)
if m is None:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
else:
    flags = flags.replace(m.group(0), "--xla_force_host_platform_device_count=8")
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

# sitecustomize may have imported jax already (axon PJRT registration),
# so the env var alone is not enough - set the config directly too.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")
