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


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    impl: str = "auto",
) -> jnp.ndarray:
    """Dispatching attention. impl: 'auto' | 'xla' | 'flash'.

    'auto' picks the Pallas flash kernel on TPU when shapes qualify and the
    XLA path otherwise.
    """
    if impl == "xla":
        return xla_attention(q, k, v, kv_mask=kv_mask, scale=scale)
    if impl in ("auto", "flash"):
        use_flash = impl == "flash"
        if impl == "auto":
            use_flash = _on_tpu() and _flash_supported(q, k)
        if use_flash:
            try:
                from jepa_tpu.ops.flash_attention import flash_attention
            except ImportError:
                if impl == "flash":
                    raise
            else:
                return flash_attention(q, k, v, kv_mask=kv_mask, scale=scale)
        return xla_attention(q, k, v, kv_mask=kv_mask, scale=scale)
    raise ValueError(f"unknown attention impl: {impl}")


@functools.lru_cache(maxsize=1)
def _on_tpu() -> bool:
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


def _flash_supported(q, k) -> bool:
    # Flash kernel requires seq lens it can tile; small sequences (the
    # 1-query attentive probe) stay on the XLA path where they're trivial.
    return q.shape[1] >= 128 and k.shape[1] >= 128
