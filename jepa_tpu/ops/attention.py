"""Attention ops: XLA reference path + Pallas flash-attention dispatch.

Replaces the reference's cuDNN SDPA call (reference:
src/models/utils/modules.py:66-69) with TPU-native kernels. The XLA einsum
path is the always-correct fallback (CPU tests, odd shapes); the Pallas
flash kernel (jepa_tpu/ops/flash_attention.py) is used on TPU for the hot
self-attention over 1568-4608 video tokens.

Conventions: q/k/v are [B, N, H, Dh]; softmax runs in float32; the optional
``kv_mask`` [B, Nk] bool marks *valid* key positions (False = padded token,
excluded from attention) — this is what makes the padded static-shape
masking mode numerically equivalent to the reference's variable-K token
dropping.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


def xla_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Plain XLA attention with fp32 softmax. q/k/v: [B, N, H, Dh]."""
    head_dim = q.shape[-1]
    if scale is None:
        scale = head_dim**-0.5
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    logits = logits * jnp.float32(scale)
    if kv_mask is not None:
        logits = jnp.where(kv_mask[:, None, None, :], logits, _NEG_INF)
    weights = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd",
        weights.astype(v.dtype),
        v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(v.dtype)


def resolve_flash(impl: str, nq: int, nk: int) -> bool:
    """Trace-time decision: does this (impl, shape) combination run the
    Pallas flash kernel? Lets callers pick the operand layout (head-major
    for flash, token-major for XLA) before projecting q/k/v."""
    if impl == "xla":
        return False
    if impl == "flash":
        return True
    if impl == "auto":
        return _on_tpu() and nq >= 128 and nk >= 128
    raise ValueError(f"unknown attention impl: {impl}")


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    impl: str = "auto",
) -> jnp.ndarray:
    """Dispatching attention over token-major [B, N, H, Dh] operands.
    impl: 'auto' | 'xla' | 'flash'. 'auto' picks the Pallas flash kernel on
    TPU when shapes qualify and the XLA path otherwise."""
    if resolve_flash(impl, q.shape[1], k.shape[1]):
        from jepa_tpu.ops.flash_attention import flash_attention

        return flash_attention(q, k, v, kv_mask=kv_mask, scale=scale)
    return xla_attention(q, k, v, kv_mask=kv_mask, scale=scale)


@functools.lru_cache(maxsize=1)
def _on_tpu() -> bool:
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


