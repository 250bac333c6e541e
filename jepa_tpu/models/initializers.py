"""Weight initialization matching the reference's construction recipe.

Recipe (reference: src/models/vision_transformer.py:128-151,
src/models/predictor.py:132-152, src/models/attentive_pooler.py:66-98):
  * linear / conv weights: truncated normal, std=0.02, clipped to [-2, 2]
  * all biases zero; LayerNorm scale 1, bias 0
  * residual-branch output projections (attn.proj and mlp.fc2) of layer i
    (1-indexed) divided by sqrt(2 * i)
  * mask tokens zero (or trunc-normal when zero_init_mask_tokens=False)

Implemented with jax.random for on-device init; the truncated normal uses
the same inverse-CDF construction as the reference's trunc_normal_.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def trunc_normal(key, shape, std=0.02, mean=0.0, a=-2.0, b=2.0, dtype=jnp.float32):
    """Truncated normal via inverse-CDF of a truncated uniform.

    Equivalent in distribution to the reference's trunc_normal_
    (reference: src/utils/tensors.py:17-50): draw u ~ U[2*cdf(lo)-1,
    2*cdf(hi)-1], apply erfinv, scale by std*sqrt(2), shift by mean, clamp.
    """
    lo = (1.0 + math.erf(((a - mean) / std) / math.sqrt(2.0))) / 2.0
    hi = (1.0 + math.erf(((b - mean) / std) / math.sqrt(2.0))) / 2.0
    u = jax.random.uniform(
        key, shape, dtype=jnp.float32, minval=2 * lo - 1, maxval=2 * hi - 1
    )
    x = jax.scipy.special.erfinv(u)
    x = x * (std * math.sqrt(2.0)) + mean
    x = jnp.clip(x, a, b)
    return x.astype(dtype)


def linear_init(key, in_dim, out_dim, *, std=0.02, rescale=1.0, dtype=jnp.float32):
    """Weight [in, out] trunc-normal(std) / rescale, bias zeros [out]."""
    w = trunc_normal(key, (in_dim, out_dim), std=std, dtype=dtype)
    if rescale != 1.0:
        w = w / rescale
    return {"w": w, "b": jnp.zeros((out_dim,), dtype=dtype)}


def layernorm_init(dim, dtype=jnp.float32):
    return {"scale": jnp.ones((dim,), dtype=dtype), "bias": jnp.zeros((dim,), dtype=dtype)}


def residual_rescale(layer_id: int) -> float:
    """Divisor for residual-branch output projections; layer_id is 1-indexed."""
    return math.sqrt(2.0 * layer_id)
