"""V-JEPA losses (reference: app/vjepa/train.py:440-459).

  * jepa loss: mean(|pred - target|^loss_exp) / loss_exp, averaged over mask
    configs (loss_exp=1.0 -> L1)
  * variance regularizer: mean(relu(1 - mean_i sqrt(var_tokens(pred_i)+1e-4)))
    where the variance is over the token axis (unbiased, matching torch)

Optional per-token validity weights support the padded-parity masking mode.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp

from jepa_tpu.ops.masking import masked_mean


def jepa_loss(
    preds: List[jnp.ndarray],
    targets: List[jnp.ndarray],
    loss_exp: float = 1.0,
    weights: Optional[List[Optional[jnp.ndarray]]] = None,
) -> jnp.ndarray:
    """preds/targets: per-mask-config lists of [B, K, D] float32."""
    if weights is None:
        weights = [None] * len(preds)
    total = 0.0
    for z, h, w in zip(preds, targets, weights):
        err = jnp.abs(z.astype(jnp.float32) - h.astype(jnp.float32))
        if loss_exp != 1.0:
            err = err**loss_exp
        total = total + masked_mean(err, w) / loss_exp
    return total / len(preds)


def variance_reg(
    preds: List[jnp.ndarray],
    weights: Optional[List[Optional[jnp.ndarray]]] = None,
) -> jnp.ndarray:
    """Penalize collapsed (low token-variance) predictions."""
    if weights is None:
        weights = [None] * len(preds)
    pstd = 0.0
    for z, w in zip(preds, weights):
        zf = z.astype(jnp.float32)
        if w is None:
            var = jnp.var(zf, axis=1, ddof=1)  # [B, D]
        else:
            wf = w[..., None].astype(jnp.float32)
            cnt = jnp.maximum(jnp.sum(wf, axis=1), 2.0)
            mean = jnp.sum(zf * wf, axis=1) / cnt
            var = jnp.sum(wf * (zf - mean[:, None, :]) ** 2, axis=1) / (cnt - 1.0)
        pstd = pstd + jnp.sqrt(var + 1e-4)
    pstd = pstd / len(preds)
    return jnp.mean(jax.nn.relu(1.0 - pstd))


def layer_norm_targets(h: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Feature-dim LayerNorm (no affine) applied to target features
    (reference train.py:424: F.layer_norm(h, (D,)), default eps 1e-5)."""
    hf = h.astype(jnp.float32)
    mean = jnp.mean(hf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(hf - mean), axis=-1, keepdims=True)
    return (hf - mean) * jax.lax.rsqrt(var + eps)
