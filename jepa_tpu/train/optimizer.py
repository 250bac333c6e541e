"""Hand-rolled AdamW (+ weight-decay masking + global-norm clipping).

Semantics mirror the reference exactly:
  * torch.optim.AdamW update order — decoupled decay applied to params
    *before* the moment update step (p *= 1 - lr*wd), bias-corrected moments
  * 4-group structure (reference app/vjepa/utils.py:173-191) becomes a
    per-leaf decay mask: biases and LayerNorm/1D params are never decayed
    (`zero_init_bias_wd`); everything else (incl. mask/query tokens) follows
    the scheduled wd
  * clip_grad_norm per module (encoder and predictor separately), gated on
    step > warmup like the reference's `epoch > warmup` test

Implemented as pure functions folded into the fused train step so XLA fuses
moments + decay + EMA into the gradient pass; no optax dependency in the hot
path (optax is available for the eval probes where flexibility > fusion).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

_NO_DECAY_LEAVES = {"b", "scale", "bias"}


def _is_decayed(path) -> bool:
    """Decay rule from the leaf's key path (see module docstring)."""
    last = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
    if last in _NO_DECAY_LEAVES or last.endswith("_b"):
        return False
    return True


def decay_mask(params) -> Any:
    """Pytree of 0/1 floats: 1 where weight decay applies."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: jnp.float32(1.0 if _is_decayed(path) else 0.0), params
    )


def init_adamw_state(params) -> Dict[str, Any]:
    zeros = lambda t: jax.tree.map(jnp.zeros_like, t)
    return {"mu": zeros(params), "nu": zeros(params)}


def global_norm(tree) -> jnp.ndarray:
    leaves = [jnp.sum(jnp.square(x.astype(jnp.float32))) for x in jax.tree.leaves(tree)]
    return jnp.sqrt(sum(leaves))


def clip_by_global_norm(grads, max_norm, enabled) -> Tuple[Any, jnp.ndarray]:
    """torch.nn.utils.clip_grad_norm_ semantics; `enabled` is a traced bool."""
    norm = global_norm(grads)
    scale = jnp.where(
        enabled & (norm > max_norm), max_norm / (norm + 1e-6), 1.0
    )
    return jax.tree.map(lambda g: g * scale, grads), norm


def adamw_update(
    params,
    grads,
    opt_state,
    *,
    lr,
    wd,
    mask,
    step,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
):
    """One AdamW step. `step` is the 1-indexed update count (for bias corr).

    Returns (new_params, new_opt_state, moment_stats).
    """
    stepf = jnp.asarray(step, jnp.float32)
    bc1 = 1.0 - b1**stepf
    bc2 = 1.0 - b2**stepf

    def upd(p, g, m, v, dm):
        g = g.astype(jnp.float32)
        p32 = p.astype(jnp.float32)
        m = b1 * m + (1.0 - b1) * g
        v = b2 * v + (1.0 - b2) * jnp.square(g)
        p32 = p32 * (1.0 - lr * wd * dm)
        denom = jnp.sqrt(v / bc2) + eps
        p32 = p32 - lr * (m / bc1) / denom
        # stat sums ride the update fusion (same pass over m/v) instead of
        # a separate full-buffer reduce per leaf — with per-layer block
        # params that separate pass was ~400 extra tiny reduce ops/step
        # (BENCH.md round 4); values are identical (mean = sum/size)
        return p32.astype(p.dtype), m, v, jnp.sum(jnp.abs(m)), jnp.sum(v)

    flat_p, treedef = jax.tree.flatten(params)
    flat_g = jax.tree.leaves(grads)
    flat_m = jax.tree.leaves(opt_state["mu"])
    flat_v = jax.tree.leaves(opt_state["nu"])
    flat_dm = jax.tree.leaves(mask)
    new_p, new_m, new_v, mean_am, mean_v = [], [], [], [], []
    for p, g, m, v, dm in zip(flat_p, flat_g, flat_m, flat_v, flat_dm):
        a, b, c, sa, sv = upd(p, g, m, v, dm)
        new_p.append(a)
        new_m.append(b)
        new_v.append(c)
        mean_am.append(sa / p.size)
        mean_v.append(sv / p.size)
    stats = {
        "exp_avg_abs_mean": sum(mean_am) / len(mean_am),
        "exp_avg_sq_mean": sum(mean_v) / len(mean_v),
    }
    return (
        jax.tree.unflatten(treedef, new_p),
        {"mu": jax.tree.unflatten(treedef, new_m), "nu": jax.tree.unflatten(treedef, new_v)},
        stats,
    )


def ema_update(target, online, momentum):
    """k <- m*k + (1-m)*q (reference train.py:483-487)."""
    m = jnp.asarray(momentum, jnp.float32)
    return jax.tree.map(
        lambda k, q: (m * k.astype(jnp.float32) + (1.0 - m) * q.astype(jnp.float32)).astype(k.dtype),
        target,
        online,
    )
