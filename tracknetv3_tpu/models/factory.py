"""Model factory: the single construction path for all models.

Mirrors the reference factory contract (reference: utils/general.py:46-80):
``get_model('TrackNet', seq_len, bg_mode)`` maps bg_mode to the TrackNet
input channel count, out_dim is always seq_len; ``get_model('InpaintNet')``
takes no shape arguments.

Returns ``(module, variables)`` where ``variables`` holds freshly-initialized
``params`` (and ``batch_stats`` for TrackNet).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import tracknet_in_channels
from .inpaintnet import InpaintNet
from .tracknet import TrackNet


def get_model(
    model_name: str,
    seq_len: Optional[int] = None,
    bg_mode: Optional[str] = None,
    *,
    rng: Optional[jax.Array] = None,
    compute_dtype: Any = jnp.bfloat16,
    init_params: bool = True,
) -> Tuple[Any, Any]:
    """Create a model and its initial variables by name and configuration.

    With ``init_params=False`` only the variable *structure* is produced
    (via ``jax.eval_shape`` - no compile, no device work); use it when the
    real weights come from a checkpoint.
    """
    if rng is None:
        rng = jax.random.PRNGKey(0)

    if model_name == "TrackNet":
        assert seq_len is not None, "TrackNet requires seq_len"
        in_ch = tracknet_in_channels(seq_len, bg_mode or "")
        model = TrackNet(out_dim=seq_len, dtype=compute_dtype)
        # init at reduced spatial size (divisible by the 3 pooling levels):
        # conv/BN parameter shapes do not depend on H/W, so this avoids a
        # full-resolution init program.
        dummy = jnp.zeros((1, 32, 64, in_ch), jnp.float32)
        init_fn = lambda: model.init(rng, dummy, train=False)  # noqa: E731
    elif model_name == "InpaintNet":
        # Deliberately f32 regardless of compute_dtype: bf16's ~2^-8
        # relative step would quantize normalized coordinates by ~2 px at
        # 512-px width (vs the 4-px eval tolerance), and the model is far
        # too small for the MXU rate to matter.
        model = InpaintNet()
        L = seq_len or 16
        coords = jnp.zeros((1, L, 2), jnp.float32)
        mask = jnp.zeros((1, L, 1), jnp.float32)
        init_fn = lambda: model.init(rng, coords, mask)  # noqa: E731
    else:
        raise ValueError(f"Invalid model name: {model_name!r}")

    if init_params:
        variables = jax.jit(init_fn)()
    else:
        variables = jax.eval_shape(init_fn)
    return model, variables
