"""Token-gather primitives for masked training (static-shape friendly).

The reference gathers kept tokens with torch.gather over per-sample index
tensors (reference: src/masks/utils.py:11-23) and tiles masks across clips
with repeat_interleave_batch (reference: src/utils/tensors.py:65-71). Here
the same semantics are expressed with jnp.take_along_axis so they live
inside jit with static shapes; a validity-weight variant supports the
padded-parity masking mode (see jepa_tpu/masks/).
"""

from __future__ import annotations

from typing import List, Optional

import jax.numpy as jnp


def gather_tokens(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather tokens at ``idx`` along the sequence axis.

    x: [B, N, D]; idx: [B, K] int32 in [0, N). Returns [B, K, D].
    """
    return jnp.take_along_axis(x, idx[:, :, None], axis=1)


def apply_masks(x: jnp.ndarray, masks: List[jnp.ndarray], concat: bool = True):
    """Reference-compatible multi-mask gather.

    Each mask in ``masks`` is [B, K_i]; returns the gathered token sets
    concatenated on the batch axis ([len(masks)*B, K, D], requires equal K)
    or as a list when ``concat=False``.
    """
    outs = [gather_tokens(x, m) for m in masks]
    if not concat:
        return outs
    return jnp.concatenate(outs, axis=0)


def repeat_interleave_batch(x: jnp.ndarray, b: int, repeat: int) -> jnp.ndarray:
    """Tile each contiguous batch-chunk of size ``b`` ``repeat`` times.

    Input [N*b, ...] viewed as N chunks of b; output
    [N*repeat*b, ...] = concat over chunks of (chunk repeated ``repeat``x).
    """
    n = x.shape[0] // b
    rest = x.shape[1:]
    out = jnp.reshape(x, (n, 1, b) + rest)
    out = jnp.broadcast_to(out, (n, repeat, b) + rest)
    return jnp.reshape(out, (n * repeat * b,) + rest)


def masked_mean(
    x: jnp.ndarray, weight: Optional[jnp.ndarray], axis=None
) -> jnp.ndarray:
    """Mean of ``x`` under optional token-validity weights.

    weight broadcasts against x (typically [B, K] vs x [B, K, D]); invalid
    (padded) positions contribute zero and are excluded from the normalizer.
    """
    if weight is None:
        return jnp.mean(x, axis=axis)
    w = jnp.broadcast_to(
        weight[..., None] if weight.ndim == x.ndim - 1 else weight, x.shape
    ).astype(x.dtype)
    return jnp.sum(x * w, axis=axis) / jnp.maximum(jnp.sum(w, axis=axis), 1e-6)
