"""Shared transformer primitives: LayerNorm, MLP, pre-LN blocks.

TPU-first design notes:
  * Blocks are *stacked*: every block-param leaf carries a leading [depth]
    axis and the stack is executed with lax.scan — one compiled block body
    regardless of depth (ViT-H is 32 layers; scan keeps compile time and
    HLO size flat).
  * Matmuls run in a configurable compute dtype (bfloat16 by default on
    TPU) with fp32 accumulation; LayerNorm and softmax stay fp32. This
    mirrors the reference's autocast-bf16 behavior (reference:
    app/vjepa/train.py:445-447) without a grad scaler.
  * Residual wiring matches reference src/models/utils/modules.py:114-120
    (pre-LN, attn then MLP, plain adds).

Block param schema (leaves get a leading [depth] axis when stacked):
  ln1: {scale[D], bias[D]}
  attn: {qkv_w[D,3D], qkv_b[3D], proj_w[D,D], proj_b[D]}
  ln2: {scale[D], bias[D]}
  mlp: {fc1_w[D,Hd], fc1_b[Hd], fc2_w[Hd,D], fc2_b[D]}
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.ad_checkpoint
import jax.numpy as jnp

from jepa_tpu.models.initializers import layernorm_init, linear_init, residual_rescale
from jepa_tpu.ops.attention import dot_product_attention


@dataclasses.dataclass(frozen=True)
class BlockCfg:
    dim: int
    num_heads: int
    mlp_hidden: int
    ln_eps: float = 1e-6
    compute_dtype: jnp.dtype = jnp.bfloat16
    attn_impl: str = "auto"
    qk_scale: Optional[float] = None
    # fused matmul+bias+GELU Pallas fc1: a ~0.4-0.7 ms/layer win on pure
    # FORWARD instances (target encoder, frozen eval encode), but a net
    # LOSS under autodiff (XLA fuses dgelu into the remat recompute, which
    # a custom_vjp cannot) — so callers enable it only on grad-free paths.
    # False | True (auto: fused fc1 kernel on TPU only) | 'force' (always,
    # incl. interpret-mode — kernel tests)
    fused_mlp: object = False

    def __post_init__(self):
        if self.dim % self.num_heads != 0:
            raise ValueError(
                f"dim ({self.dim}) must be divisible by num_heads ({self.num_heads})"
            )


def _fast_gelu_enabled() -> bool:
    """exp2-erfc gelu on trainable bf16 MLPs (see mlp()); bf16-exact values
    (tests/test_fused_mlp.py) and a measured 775 -> 750 ms/step win on the
    fused ViT-L pretrain step (round-3 on-chip A/B, BENCH.md). Default ON;
    JEPA_FAST_GELU=0 restores the exact-erf tail."""
    import os

    return os.environ.get("JEPA_FAST_GELU", "1") == "1"


def layer_norm(x, scale, bias, eps):
    """fp32 LayerNorm over the last axis; returns in x's original dtype."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def linear(x, p, compute_dtype):
    y = jnp.dot(
        x.astype(compute_dtype),
        p["w"].astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )
    return (y + p["b"].astype(jnp.float32)).astype(compute_dtype)


def mlp(x, p, cfg: BlockCfg):
    from jepa_tpu.ops.fused_mlp import resolve_fused_mlp

    cd = cfg.compute_dtype
    # fused-fc1 eligibility is its own resolver (TPU-only; tiles over B*N
    # rows so there is no sequence-length requirement) — NOT the attention
    # dispatch heuristic: forced attn_impl='flash' on CPU must not route
    # the MLP through interpret-mode Pallas. fused_mlp='force' overrides
    # for kernel tests.
    if cfg.fused_mlp and (cfg.fused_mlp == "force" or resolve_fused_mlp()):
        # fused matmul+bias+GELU Pallas kernel: the VPU gelu epilogue of
        # tile i overlaps tile i+1's MXU matmul (XLA's fc1 fusion runs the
        # exact-erf tail serially — 3.03 vs 1.6 ms/layer, round-2 xplane)
        from jepa_tpu.ops.fused_mlp import linear_gelu

        h = linear_gelu(x.astype(cd), p["fc1_w"].astype(cd), p["fc1_b"])
    else:
        h = linear(x, {"w": p["fc1_w"], "b": p["fc1_b"]}, cd)
        # named pre-activation for the selective remat policy: saving it
        # (JEPA_REMAT_SAVE_FC1) lets the backward recompute only the cheap
        # VPU gelu instead of the fc1 matmul (dgelu needs the PRE-activation,
        # so this is the tensor that kills the matmul recompute).
        # NOTE the fused branch above intentionally has no such name: the
        # fused kernel is grad-free-only (BlockCfg.fused_mlp docstring), so
        # a grad-path fused_mlp would silently lose the save-fc1 win.
        h = jax.ad_checkpoint.checkpoint_name(h, "fc1_out")
        if cd == jnp.bfloat16 and _fast_gelu_enabled():
            # exp2-erfc gelu (ops/fused_mlp._gelu_fast): bf16-exact values,
            # derivative within 1.4e-6 of exact, and a division-free VPU
            # tail — XLA's fc1 fusion runs the activation serially after
            # the matmul, so a cheaper tail shortens the whole fusion
            # (A/B'd on chip; lax.erf's lowering is the cost being cut)
            from jepa_tpu.ops.fused_mlp import _gelu_fast

            h = _gelu_fast(h.astype(jnp.float32)).astype(cd)
        else:
            h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(cd)
    return linear(h, {"w": p["fc2_w"], "b": p["fc2_b"]}, cfg.compute_dtype)


def self_attention(x, p, cfg: BlockCfg, kv_mask=None):
    """Fused-QKV multi-head self-attention. x: [B, N, D].

    Flash path: projection + attention run as one differentiable unit
    (ops.flash_attention.flash_self_attention) whose Pallas kernels consume
    the qkv matmul's NATIVE token-major [B, N, 3D] output and return o
    token-major — zero layout changes end to end (the earlier head-major
    packed layout paid a ~2x relayout on the qkv fusion; round-2 xplane)."""
    b, n, d = x.shape
    h = cfg.num_heads
    hd = d // h
    cd = cfg.compute_dtype
    from jepa_tpu.ops.attention import resolve_flash

    if resolve_flash(cfg.attn_impl, n, n):
        from jepa_tpu.ops.flash_attention import flash_self_attention

        out = flash_self_attention(
            x.astype(cd), p["qkv_w"].astype(cd), p["qkv_b"], h,
            kv_mask=kv_mask, scale=cfg.qk_scale,
        )  # [B, N, D] token-major
        return linear(out, {"w": p["proj_w"], "b": p["proj_b"]}, cd)

    qkv = linear(x, {"w": p["qkv_w"], "b": p["qkv_b"]}, cd)
    qkv = qkv.reshape(b, n, 3, h, hd)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    out = dot_product_attention(
        q, k, v, kv_mask=kv_mask, scale=cfg.qk_scale, impl=cfg.attn_impl
    )
    out = out.reshape(b, n, d)
    return linear(out, {"w": p["proj_w"], "b": p["proj_b"]}, cfg.compute_dtype)


def block_forward(x, p, cfg: BlockCfg, kv_mask=None):
    """Pre-LN transformer block: x + attn(ln1 x); x + mlp(ln2 x)."""
    y = layer_norm(x, p["ln1"]["scale"], p["ln1"]["bias"], cfg.ln_eps)
    attn_out = self_attention(y, p["attn"], cfg, kv_mask=kv_mask)
    # named for the selective remat policy (save attention, recompute MLP)
    attn_out = jax.ad_checkpoint.checkpoint_name(attn_out, "attn_out")
    x = x + attn_out
    y = layer_norm(x, p["ln2"]["scale"], p["ln2"]["bias"], cfg.ln_eps)
    return x + mlp(y, p["mlp"], cfg)


def _save_flash_residuals(prim, *_, **params):
    """Checkpoint policy: save the (o, lse) outputs of optimize_remat
    custom_vjp forwards (the Pallas flash-attention kernels) so the backward
    pass never re-runs the forward kernel — only LN/matmul/MLP recompute.
    ~22-34MB/layer at production shapes vs re-running the VPU-bound kernel.
    By default (JEPA_REMAT_SAVE_QKV, see ops.flash_attention._remat_save_qkv)
    also save the named qkv projection outputs ("qkv_out"): the backward then
    skips the per-layer LN1 + projection recompute entirely (more HBM for
    less recompute; 698.7 -> 679.0 ms/step at ViT-L b24, BENCH.md round 4)."""
    if prim.name == "remat_opt":
        return True
    if prim.name == "name" and params.get("name") == "qkv_out":
        from jepa_tpu.ops.flash_attention import _remat_save_qkv

        return _remat_save_qkv()
    if prim.name == "name" and params.get("name") == "attn_out":
        # post-proj attention output: one matmul away from saved o, so
        # saving it only pays when trading ~[B,N,D] bf16/layer of HBM for
        # the out-proj + residual recompute is a measured win (A/B knob)
        import os

        return os.environ.get("JEPA_REMAT_SAVE_ATTN_OUT", "0") == "1"
    if prim.name == "name" and params.get("name") == "fc1_out":
        # fc1 pre-activation: saving it removes the fc1 matmul from the
        # backward recompute (gelu re-runs on the VPU from the saved
        # tensor) for ~[B,N,4D] bf16/layer of HBM. Default ON: measured
        # 678.8 -> 666.5 ms/step at ViT-L b24 (round-4 on-chip A/B,
        # scripts/bench_r4_remat_ab.py); combining with attn_out was
        # WORSE than fc1 alone (672.8), so that knob stays opt-in.
        import os

        return os.environ.get("JEPA_REMAT_SAVE_FC1", "1") == "1"
    return False


def unstack_blocks(stacked, depth: int):
    """Stacked block pytree -> tuple of per-layer pytrees (slice reads).

    Used by the unrolled-grads mode: taking grads w.r.t. the per-layer
    trees makes each dW a standalone buffer instead of a dynamic-update-
    slice into the [depth, ...] stack (the scan-transpose DUS runs at
    whole-stack-copy cost on v5e; BENCH.md round-3/4 measurements)."""
    return tuple(
        jax.tree.map(lambda a: a[i], stacked) for i in range(depth)
    )


def restack_blocks(layers):
    """Tuple of per-layer pytrees -> stacked (one concatenate per leaf).

    The optimization barrier stops XLA from output-fusing each per-layer dW
    producer into a dynamic-update-slice chain over the stacked buffer —
    that chain fails to alias in place and reruns at whole-buffer-copy cost
    (the same pathology as the scan-transpose grad stacking; measured
    ~24 ms/step at ViT-L, BENCH.md round 4). Behind the barrier XLA emits
    one true concatenate per leaf, which runs at HBM bandwidth.
    JEPA_RESTACK_BARRIER=0 disables (A/B knob)."""
    import os

    if os.environ.get("JEPA_RESTACK_BARRIER", "1") == "1":
        layers = jax.lax.optimization_barrier(tuple(layers))
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *layers)


def run_blocks(x, stacked, cfg: BlockCfg, kv_mask=None, collect_layers=False,
               remat=False, unroll: int = 1):
    """Run a block stack: lax.scan over stacked leaves, or an unrolled
    Python loop when ``stacked`` is a tuple/list of per-layer pytrees.

    x: [B, N, D] (cast to compute dtype inside). When ``collect_layers`` is
    true, also returns the per-layer outputs [depth, B, N, D] (for the
    reference's ``out_layers`` feature).

    remat: False | True/'full' (recompute everything in bwd) | 'attn'
    (selective: save per-layer attention outputs, recompute LN/MLP — skips
    re-running the flash kernel in the backward pass at ~2 extra bytes/
    token/layer of HBM).

    unroll: layers per scan iteration (lax.scan unroll). >1 gives XLA
    several per-layer dW updates per loop body to fuse/alias — a lever on
    the scan-transpose grad-stack DUS copies.
    """
    x = x.astype(cfg.compute_dtype)

    if isinstance(stacked, (list, tuple)):
        # Unrolled path (per-layer param trees). prevent_cse stays at the
        # default True here: outside a scan, XLA could otherwise CSE the
        # bwd recompute with the fwd and defeat the remat.
        def one(c, p):
            return block_forward(c, p, cfg, kv_mask=kv_mask)

        if remat == "attn":
            one = jax.checkpoint(one, policy=_save_flash_residuals)
        elif remat:
            one = jax.checkpoint(one)
        layers = [] if collect_layers else None
        for p in stacked:
            x = one(x, p)
            if collect_layers:
                layers.append(x)
        return (x, jnp.stack(layers, axis=0)) if collect_layers else (x, None)

    def body(carry, layer_params):
        out = block_forward(carry, layer_params, cfg, kv_mask=kv_mask)
        return out, (out if collect_layers else None)

    # prevent_cse=False is safe (and recommended) under scan and measured
    # ~7% faster f+b on-chip than the default CSE barrier.
    if remat == "attn":
        # Selective-save policy (see _save_flash_residuals): flash (o, lse)
        # always; qkv_out and fc1_out saved by default (measured wins,
        # BENCH.md round 4); attn_out only via JEPA_REMAT_SAVE_ATTN_OUT.
        body = jax.checkpoint(body, prevent_cse=False, policy=_save_flash_residuals)
    elif remat:
        body = jax.checkpoint(body, prevent_cse=False)
    # _split_transpose lowers the scan transpose as a second scan whose ys
    # are the stacked dW — an A/B lever on the grad-stack DUS copies (the
    # round-2 xplane showed carry-DUS running at whole-buffer-copy cost).
    import os

    split_t = os.environ.get("JEPA_SCAN_SPLIT_TRANSPOSE", "0") == "1"
    final, layers = jax.lax.scan(body, x, stacked, unroll=unroll,
                                 _split_transpose=split_t)
    return (final, layers) if collect_layers else (final, None)


def init_block_stack(key, depth: int, cfg: BlockCfg, init_std: float = 0.02, dtype=jnp.float32):
    """Initialize ``depth`` blocks as stacked leaves (leading [depth] axis).

    Residual-branch projections (attn.proj, mlp.fc2) of layer i (1-indexed)
    are divided by sqrt(2*i), matching the reference's _rescale_blocks.
    """
    d, hd = cfg.dim, cfg.mlp_hidden

    def one(key, layer_id):
        ks = jax.random.split(key, 4)
        return {
            "ln1": layernorm_init(d, dtype),
            "attn": {
                "qkv_w": linear_init(ks[0], d, 3 * d, std=init_std, dtype=dtype)["w"],
                "qkv_b": jnp.zeros((3 * d,), dtype),
                "proj_w": linear_init(
                    ks[1], d, d, std=init_std, rescale=residual_rescale(layer_id), dtype=dtype
                )["w"],
                "proj_b": jnp.zeros((d,), dtype),
            },
            "ln2": layernorm_init(d, dtype),
            "mlp": {
                "fc1_w": linear_init(ks[2], d, hd, std=init_std, dtype=dtype)["w"],
                "fc1_b": jnp.zeros((hd,), dtype),
                "fc2_w": linear_init(
                    ks[3], hd, d, std=init_std, rescale=residual_rescale(layer_id), dtype=dtype
                )["w"],
                "fc2_b": jnp.zeros((d,), dtype),
            },
        }

    keys = jax.random.split(key, depth)
    per_layer = [one(keys[i], i + 1) for i in range(depth)]
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *per_layer)
