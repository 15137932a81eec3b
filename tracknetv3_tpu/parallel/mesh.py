"""Data-parallel device mesh + sharding helpers.

The reference is strictly single-device (every placement is a bare
``.cuda()``; see SURVEY.md section 2 "Parallelism"). Here data parallelism
is a first-class capability: a 1-D ``Mesh`` over the ``data`` axis, the
batch sharded across it, parameters/optimizer state replicated. Under
``jit`` XLA GSPMD then:

  - partitions the conv forward/backward across chips,
  - inserts ICI all-reduces for the gradient sum,
  - computes BatchNorm batch statistics *globally* (the batch-axis mean
    of a sharded array is an all-reduce) - i.e. sync-BN semantics for
    free, mathematically cleaner than the reference's per-device stats.

Multi-host extension: the same mesh spans processes when
``jax.distributed.initialize`` has been called; nothing else changes.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def apply_platform_override() -> None:
    """Honor ``TRACKNETV3_TPU_PLATFORM`` (e.g. ``cpu``) for CLI runs.

    The sandbox's sitecustomize imports jax and pins the axon TPU
    platform programmatically, so the standard ``JAX_PLATFORMS`` env var
    is silently ignored by the time a CLI runs — the only reliable
    override is ``jax.config.update`` in-process. Lets users force CPU
    execution (e.g. when the remote TPU compiler is degraded) without
    touching code. No-op when the variable is unset.
    """
    import os

    plat = os.environ.get("TRACKNETV3_TPU_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)


def ensure_virtual_devices(num_devices: Optional[int]) -> None:
    """Sandbox shim: make an ``num_devices``-wide mesh runnable on the
    single-chip axon host by switching to a virtual CPU platform.

    The sandbox's sitecustomize pins the axon platform programmatically
    (env ``JAX_PLATFORMS`` is ignored), so multi-device CLI runs would
    fail with "only 1 available". Call this BEFORE any backend
    initialization (checkpoint loads, device_put); it is a no-op outside
    the sandbox (no ``PALLAS_AXON_POOL_IPS``) or for num_devices <= 1,
    so real multi-chip hosts are unaffected.
    """
    import os

    if (num_devices or 0) <= 1 or not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return
    import re

    flags = os.environ.get("XLA_FLAGS", "")
    m = re.search(r"--xla_force_host_platform_device_count=(\d+)", flags)
    if m is None:
        flags = (flags + f" --xla_force_host_platform_device_count={num_devices}").strip()
    elif int(m.group(1)) < num_devices:
        # an existing smaller count would make make_mesh fail anyway
        flags = flags.replace(
            m.group(0), f"--xla_force_host_platform_device_count={num_devices}"
        )
    os.environ["XLA_FLAGS"] = flags
    jax.config.update("jax_platforms", "cpu")


def make_mesh(num_devices: Optional[int] = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        if num_devices > len(devices):
            raise ValueError(
                f"Requested {num_devices} devices, only {len(devices)} available"
            )
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), axis_names=("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis split across the data mesh axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """device_put a pytree of host arrays with the batch axis sharded.

    Leaves that are already ``jax.Array`` are left untouched: they were
    placed deliberately (e.g. ResidentHeatmapLoader's replicated or
    frame-sharded split buffers, whose axis 0 is frames, not batch) -
    re-putting them with the batch sharding would silently reshard GBs
    every step.

    Multi-host (``jax.process_count() > 1``): each process passes only
    its LOCAL slice of the global batch (loaders shard per
    ``process_index``, see HeatmapBatchLoader/CoordinateBatchLoader
    ``process_id``/``process_count``); the global array is assembled with
    ``jax.make_array_from_process_local_data`` - data rides each host's
    own PCIe, never the DCN."""
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:

        def put(x):
            if isinstance(x, jax.Array):
                return x
            return jax.make_array_from_process_local_data(sh, np.asarray(x))

        return jax.tree_util.tree_map(put, batch)
    return jax.tree_util.tree_map(
        lambda x: x if isinstance(x, jax.Array) else jax.device_put(x, sh), batch
    )


def replicate_tree(tree: Any, mesh: Mesh) -> Any:
    sh = replicated(mesh)
    if jax.process_count() > 1:
        # multi-controller: every process holds the full value; assemble
        # the global replicated array from identical local copies
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
            tree,
        )
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def pad_batch_to(batch: Any, target: int) -> Any:
    """Pad every leaf's leading axis to ``target`` by repeating the last
    element (so batch sizes stay divisible by the mesh width)."""

    def pad(x):
        n = x.shape[0]
        if n == target:
            return x
        reps = np.repeat(x[-1:], target - n, axis=0)
        return np.concatenate([x, reps], axis=0)

    return jax.tree_util.tree_map(pad, batch)
