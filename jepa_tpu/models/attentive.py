"""Attentive pooler / classifier: the entire downstream-eval model.

A learnable query token cross-attends over frozen encoder features,
optionally followed by depth-1 self-attention blocks, then a linear head
(reference: src/models/attentive_pooler.py). The cross-attention block
normalizes the *features* (not the query) before attention — reference
modules.py:160-181 — and the pooler's residual projections use the
layer-1 rescale while trailing self-attn blocks continue from layer 2.

Note the reference builds the probe with torch's default LayerNorm eps
(1e-5), unlike the encoder's 1e-6; ``ln_eps`` defaults accordingly.
"""

from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp

from jepa_tpu.models.initializers import (
    layernorm_init,
    linear_init,
    residual_rescale,
    trunc_normal,
)
from jepa_tpu.models.transformer import (
    BlockCfg,
    block_forward,
    init_block_stack,
    layer_norm,
    linear,
    mlp,
)
from jepa_tpu.ops.attention import dot_product_attention


@dataclasses.dataclass(frozen=True)
class AttentiveCfg:
    embed_dim: int = 768
    num_heads: int = 12
    mlp_ratio: float = 4.0
    depth: int = 1
    num_queries: int = 1
    num_classes: int = 1000
    ln_eps: float = 1e-5
    init_std: float = 0.02
    qkv_bias: bool = True
    complete_block: bool = True
    # Reference CrossAttention DEFINES self.proj but never calls it in
    # forward (reference modules.py:137,141-157) — upstream-trained probes
    # therefore carry an untouched random proj matrix, and applying it
    # would destroy ported probe accuracy. Default matches the reference;
    # flip on to use the (probably intended) output projection.
    use_cross_proj: bool = False
    compute_dtype: jnp.dtype = jnp.bfloat16
    attn_impl: str = "auto"

    def block_cfg(self) -> BlockCfg:
        return BlockCfg(
            dim=self.embed_dim,
            num_heads=self.num_heads,
            mlp_hidden=int(self.embed_dim * self.mlp_ratio),
            ln_eps=self.ln_eps,
            compute_dtype=self.compute_dtype,
            attn_impl=self.attn_impl,
        )


def init_attentive_pooler(key, cfg: AttentiveCfg, dtype=jnp.float32):
    d = cfg.embed_dim
    ks = jax.random.split(key, 6)
    params = {
        "query_tokens": trunc_normal(ks[0], (cfg.num_queries, d), std=cfg.init_std, dtype=dtype),
        "cross": {
            "ln1": layernorm_init(d, dtype),
            "q_w": linear_init(ks[1], d, d, std=cfg.init_std, dtype=dtype)["w"],
            "q_b": jnp.zeros((d,), dtype),
            "kv_w": linear_init(ks[2], d, 2 * d, std=cfg.init_std, dtype=dtype)["w"],
            "kv_b": jnp.zeros((2 * d,), dtype),
            "proj_w": linear_init(
                ks[3], d, d, std=cfg.init_std, rescale=residual_rescale(1), dtype=dtype
            )["w"],
            "proj_b": jnp.zeros((d,), dtype),
        },
    }
    if cfg.complete_block:
        params["cross"]["ln2"] = layernorm_init(d, dtype)
        hd = int(d * cfg.mlp_ratio)
        params["cross"]["mlp"] = {
            "fc1_w": linear_init(ks[4], d, hd, std=cfg.init_std, dtype=dtype)["w"],
            "fc1_b": jnp.zeros((hd,), dtype),
            "fc2_w": linear_init(
                ks[5], hd, d, std=cfg.init_std, rescale=residual_rescale(1), dtype=dtype
            )["w"],
            "fc2_b": jnp.zeros((d,), dtype),
        }
    if cfg.depth > 1:
        # Trailing self-attn blocks; residual rescale continues at layer 2.
        stack = init_block_stack(
            jax.random.fold_in(key, 7), cfg.depth - 1, cfg.block_cfg(), init_std=cfg.init_std, dtype=dtype
        )
        # init_block_stack rescales by layer 1..depth-1; shift to 2..depth.
        corr = jnp.asarray(
            [residual_rescale(i + 1) / residual_rescale(i + 2) for i in range(cfg.depth - 1)],
            dtype=dtype,
        )
        stack["attn"]["proj_w"] = stack["attn"]["proj_w"] * corr[:, None, None]
        stack["mlp"]["fc2_w"] = stack["mlp"]["fc2_w"] * corr[:, None, None]
        params["blocks"] = stack
    return params


def cross_attention(q, x, p, cfg: AttentiveCfg, kv_mask=None):
    """Query tokens attend over feature sequence x. q: [B,n,D], x: [B,N,D]."""
    b, n, d = q.shape
    h = cfg.num_heads
    hd = d // h
    dtype = cfg.compute_dtype
    qh = linear(q, {"w": p["q_w"], "b": p["q_b"]}, dtype).reshape(b, n, h, hd)
    kv = linear(x, {"w": p["kv_w"], "b": p["kv_b"]}, dtype).reshape(b, x.shape[1], 2, h, hd)
    k, v = kv[:, :, 0], kv[:, :, 1]
    out = dot_product_attention(qh, k, v, kv_mask=kv_mask, impl=cfg.attn_impl)
    out = out.reshape(b, n, d)
    if cfg.use_cross_proj:
        return linear(out, {"w": p["proj_w"], "b": p["proj_b"]}, dtype)
    return out.astype(dtype)


def pooler_forward(params, x, cfg: AttentiveCfg, kv_mask=None):
    """x: [B, N, D] frozen features -> [B, num_queries, D]."""
    b = x.shape[0]
    p = params["cross"]
    q = jnp.broadcast_to(
        params["query_tokens"][None].astype(cfg.compute_dtype),
        (b,) + params["query_tokens"].shape,
    )
    x = x.astype(cfg.compute_dtype)
    xn = layer_norm(x, p["ln1"]["scale"], p["ln1"]["bias"], cfg.ln_eps)
    y = cross_attention(q, xn, p, cfg, kv_mask=kv_mask)
    if cfg.complete_block:
        q = q + y
        qn = layer_norm(q, p["ln2"]["scale"], p["ln2"]["bias"], cfg.ln_eps)
        q = q + mlp(qn, p["mlp"], cfg.block_cfg())
    else:
        q = y
    if "blocks" in params:
        bc = cfg.block_cfg()
        depth = cfg.depth - 1
        for i in range(depth):
            layer = jax.tree.map(lambda l: l[i], params["blocks"])
            q = block_forward(q, layer, bc)
    return q


def init_attentive_classifier(key, cfg: AttentiveCfg, dtype=jnp.float32):
    k_pool, k_lin = jax.random.split(key)
    return {
        "pooler": init_attentive_pooler(k_pool, cfg, dtype),
        "linear": linear_init(k_lin, cfg.embed_dim, cfg.num_classes, std=cfg.init_std, dtype=dtype),
    }


def classifier_forward(params, x, cfg: AttentiveCfg, kv_mask=None):
    """x: [B, N, D] -> logits [B, num_classes]."""
    q = pooler_forward(params["pooler"], x, cfg, kv_mask=kv_mask)[:, 0]
    logits = linear(q, params["linear"], cfg.compute_dtype)
    return logits.astype(jnp.float32)
