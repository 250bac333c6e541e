"""Pallas TPU flash attention (forward + backward), with key-validity mask.

Replaces cuDNN SDPA (reference: src/models/utils/modules.py:66-69) for the
hot self-attention over 1100-4600 video tokens. Design per the TPU kernel
playbook, v2 (round-2 rewrite after an on-chip shootout):

  * MATMULS RUN IN THE INPUT DTYPE (bf16 in production) with fp32
    accumulation — the v1 kernel cast operands to fp32 first, which made
    every dot an fp32 MXU op (~8-12x slower measured on v5e: predictor
    shapes 89.5 -> 7.1 ms fwd). Softmax math stays fp32.
  * SINGLE-PASS softmax: at V-JEPA sequence lengths the whole K/V for one
    head fits VMEM, so each q-block computes its full score row in one shot
    (no online rescale bookkeeping, ~10% over the online loop). Sequences
    longer than _MAX_NK_PAD fall back to XLA attention.
  * HEAD-MAJOR [B, H, N, D] blocks with NO head-dim padding in HBM: D=24
    (predictor) and D=64 (encoder) blocks are legal because the block's
    last dim equals the array dim; Mosaic lane-pads in VMEM for free. The
    v1 kernel materialized zero-padded [B*H, N, 128] copies of q/k/v/o per
    layer.
  * Key padding (nq/nk not block multiples) is masked with a compile-time
    iota comparison — no mask DMA unless the caller passes a real kv_mask.
  * lse/delta ride [B, H, Nq, 8] (8-lane) blocks, not 128-lane broadcasts.
  * backward = two kernels: dQ over q-blocks, dK/dV over k-blocks, using
    the standard ds = p * (dp - delta) recurrence with delta = rowsum(dO*O)
    precomputed by XLA.

Non-TPU backends run the kernels in interpret mode (tests); production CPU
paths should use ops.attention.xla_attention instead.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30
_LSE_LANES = 8
_SUBLANES = 8
# VMEM budgets for choosing q/k block sizes. The _pick_block fit test
# charges 16 bytes per score element (four fp32 score-sized temps, the bwd
# kernels' real footprint; Mosaic's scoped-vmem stack limit is 16MB and
# operands/lse take the remainder). fwd holds ~2.5 temps, so it gets a
# larger budget under the same formula.
_FWD_TEMP_BUDGET = 18 * 2**20
_BWD_TEMP_BUDGET = 11 * 2**20 + 2**19  # 11.5MB
_MAX_NK_PAD = 8192             # beyond this, fall back to XLA attention
DEFAULT_BLOCK_Q = 512
DEFAULT_BLOCK_K = 512  # kept for API compat; single-pass ignores it


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pick_block(n: int, other_len_pad: int, budget: int, requested: int):
    """(block, n_pad) for blocking an axis of true length ``n``.

    Prefers the largest 8-multiple block that EXACTLY divides the
    128-rounded length and fits the VMEM budget — e.g. N=1568 -> (416,
    1664) instead of (512, 2048): a naive 128-multiple block forced XLA to
    pad 1568->2048 (+30% rows of pure waste plus %pad/%slice copies around
    every kernel call, seen in the round-2 xplane trace). Falls back to a
    halving 128-multiple block with round-up padding."""
    n128 = _round_up(n, 128)
    fits = lambda blk: blk * other_len_pad * 16 <= budget
    for k in range(1, 65):
        if n128 % k:
            continue
        blk = n128 // k
        if blk % 8 == 0 and blk <= requested and (fits(blk) or blk == 128):
            return blk, n128
    blk = max(128, (requested // 128) * 128)
    while blk > 128 and not fits(blk):
        blk //= 2
    return blk, _round_up(n, blk)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(q_ref, k_ref, v_ref, *rest, scale, nk_real, has_mask):
    if has_mask:
        mask_ref, o_ref, lse_ref = rest
    else:
        o_ref, lse_ref = rest
    # scale folds into q BEFORE the matmul: one [bq, d] pass instead of a
    # full [bq, nk] fp32 pass over the scores (the softmax path is VPU-bound)
    q = (q_ref[0, 0].astype(jnp.float32) * scale).astype(q_ref.dtype)  # [bq, d]
    k = k_ref[0, 0]  # [nk_pad, d]
    v = v_ref[0, 0]
    nk_pad = k.shape[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # fp32 accumulation
    if has_mask:
        s = jnp.where(mask_ref[0, 0:1, :], s, _NEG_INF)
    elif nk_pad != nk_real:
        valid = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) < nk_real
        s = jnp.where(valid, s, _NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    l_safe = jnp.maximum(l, 1e-30)
    o_ref[0, 0] = (o / l_safe).astype(o_ref.dtype)
    lse = (m + jnp.log(l_safe))[:, 0]
    lse_ref[0, 0] = jax.lax.broadcast_in_dim(lse, (q.shape[0], _LSE_LANES), (0,))


def _fwd(q, k, v, mask, scale, block_q, interpret, nk_real):
    """q,k,v: [B,H,N,D] (padded); mask: [B,8,Nk] or None.
    Returns (o [B,H,Nq,D], lse [B,H,Nq,8])."""
    b, h, nq, d = q.shape
    nk_pad = k.shape[2]
    grid = (b, h, nq // block_q)
    kernel = functools.partial(
        _fwd_kernel, scale=scale, nk_real=nk_real, has_mask=mask is not None
    )
    qspec = pl.BlockSpec((1, 1, block_q, d), lambda b_, h_, i: (b_, h_, i, 0),
                         memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((1, 1, nk_pad, d), lambda b_, h_, i: (b_, h_, 0, 0),
                          memory_space=pltpu.VMEM)
    in_specs = [qspec, kvspec, kvspec]
    args = [q, k, v]
    if mask is not None:
        in_specs.append(
            pl.BlockSpec((1, _SUBLANES, nk_pad), lambda b_, h_, i: (b_, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(mask)
    o, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            qspec,
            pl.BlockSpec((1, 1, block_q, _LSE_LANES), lambda b_, h_, i: (b_, h_, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, nq, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, nq, _LSE_LANES), jnp.float32),
        ],
        interpret=interpret,
    )(*args)
    return o, lse


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, *rest,
               scale, nk_real, has_mask):
    if has_mask:
        mask_ref, dq_ref = rest
    else:
        (dq_ref,) = rest
    q = (q_ref[0, 0].astype(jnp.float32) * scale).astype(q_ref.dtype)  # scale folded
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0]
    lse = lse_ref[0, 0][:, 0:1]
    delta = delta_ref[0, 0][:, 0:1]
    nk_pad = k.shape[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if has_mask:
        s = jnp.where(mask_ref[0, 0:1, :], s, _NEG_INF)
    elif nk_pad != nk_real:
        valid = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) < nk_real
        s = jnp.where(valid, s, _NEG_INF)
    p = jnp.exp(s - lse)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = (p * (dp - delta) * scale).astype(q.dtype)
    dq = jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)


def _dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, *rest,
                scale, has_mask):
    if has_mask:
        mask_ref, dk_ref, dv_ref = rest
    else:
        dk_ref, dv_ref = rest
    # scale folded into q: st is scaled via the matmul, AND dk = dst @ (s*q)
    # absorbs the ds*scale term — two fp32 score-sized passes saved
    q = (q_ref[0, 0].astype(jnp.float32) * scale).astype(q_ref.dtype)  # [nq_pad, d]
    k = k_ref[0, 0]       # [bk, d]
    v = v_ref[0, 0]
    do = do_ref[0, 0]     # [nq_pad, d]
    lse = lse_ref[0, 0][:, 0:1]    # [nq_pad, 1]
    delta = delta_ref[0, 0][:, 0:1]
    # transposed scores: [bk, nq_pad]
    st = jax.lax.dot_general(
        k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if has_mask:
        # column-layout mask [bk, 8lanes]: sublane-aligned, no in-kernel
        # transpose (the row-layout .T pattern failed Mosaic compilation)
        st = jnp.where(mask_ref[0][:, 0:1], st, _NEG_INF)
    pt = jnp.exp(st - lse[:, 0][None, :])
    ptc = pt.astype(do.dtype)
    dv = jax.lax.dot_general(
        ptc, do, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dpt = jax.lax.dot_general(
        v, do, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bk, nq_pad]
    # no *scale here: q is pre-scaled, so dk = dst @ (scale*q) absorbs it
    dst = (pt * (dpt - delta[:, 0][None, :])).astype(q.dtype)
    dk = jax.lax.dot_general(
        dst, q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


def _bwd(q, k, v, mask, o, lse, do, scale, block_q, block_k, interpret, nk_real):
    b, h, nq_pad, d = q.shape
    nk_pad = k.shape[2]
    delta_vec = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    delta = jax.lax.broadcast_in_dim(
        delta_vec, (b, h, nq_pad, _LSE_LANES), (0, 1, 2)
    )
    has_mask = mask is not None

    qspec_blk = pl.BlockSpec((1, 1, block_q, d), lambda b_, h_, i: (b_, h_, i, 0),
                             memory_space=pltpu.VMEM)
    lspec_blk = pl.BlockSpec((1, 1, block_q, _LSE_LANES), lambda b_, h_, i: (b_, h_, i, 0),
                             memory_space=pltpu.VMEM)
    kvspec_full = pl.BlockSpec((1, 1, nk_pad, d), lambda b_, h_, i: (b_, h_, 0, 0),
                               memory_space=pltpu.VMEM)
    in_specs = [qspec_blk, kvspec_full, kvspec_full, qspec_blk, lspec_blk, lspec_blk]
    args = [q, k, v, do, lse, delta]
    if has_mask:
        in_specs.append(
            pl.BlockSpec((1, _SUBLANES, nk_pad), lambda b_, h_, i: (b_, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(mask)
    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale, nk_real=nk_real, has_mask=has_mask),
        grid=(b, h, nq_pad // block_q),
        in_specs=in_specs,
        out_specs=qspec_blk,
        out_shape=jax.ShapeDtypeStruct((b, h, nq_pad, d), q.dtype),
        interpret=interpret,
    )(*args)

    qspec_full = pl.BlockSpec((1, 1, nq_pad, d), lambda b_, h_, j: (b_, h_, 0, 0),
                              memory_space=pltpu.VMEM)
    lspec_full = pl.BlockSpec((1, 1, nq_pad, _LSE_LANES), lambda b_, h_, j: (b_, h_, 0, 0),
                              memory_space=pltpu.VMEM)
    kvspec_blk = pl.BlockSpec((1, 1, block_k, d), lambda b_, h_, j: (b_, h_, j, 0),
                              memory_space=pltpu.VMEM)
    in_specs = [qspec_full, kvspec_blk, kvspec_blk, qspec_full, lspec_full, lspec_full]
    args = [q, k, v, do, lse, delta]
    if has_mask:
        # column layout for the k-blocked kernel (see _dkv_kernel)
        mask_col = jax.lax.broadcast_in_dim(
            mask[:, 0, :], (mask.shape[0], mask.shape[2], _LSE_LANES), (0, 1)
        )
        in_specs.append(
            pl.BlockSpec((1, block_k, _LSE_LANES), lambda b_, h_, j: (b_, j, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(mask_col)
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale, has_mask=has_mask),
        grid=(b, h, nk_pad // block_k),
        in_specs=in_specs,
        out_specs=[kvspec_blk, kvspec_blk],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, nk_pad, d), k.dtype),
            jax.ShapeDtypeStruct((b, h, nk_pad, d), v.dtype),
        ],
        interpret=interpret,
    )(*args)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# custom VJP core (operands already in [B,H,N,D] padded layout)
# ---------------------------------------------------------------------------


def _core_call(q, k, v, mask, meta):
    scale, block_q, block_k, interpret, nk_real = meta
    return _fwd(q, k, v, mask, scale, block_q, interpret, nk_real)


# Both custom_vjps return (o, lse) as PRIMAL outputs and declare the
# residuals (q, k, v, o, lse) with ``optimize_remat=True``: every residual
# then aliases a primal input or output, so under jax.checkpoint with a
# policy that saves the fwd's outputs (transformer.run_blocks remat='attn'),
# the backward pass consumes the SAVED (o, lse) instead of re-running the
# forward kernel — the named-residual design BENCH.md round 2 called for.


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _flash_nomask(meta, q, k, v):
    return _core_call(q, k, v, None, meta)


def _flash_nomask_fwd(meta, q, k, v):
    o, lse = _core_call(q, k, v, None, meta)
    return (o, lse), (q, k, v, o, lse)


def _flash_nomask_bwd(meta, res, cts):
    scale, block_q, block_k, interpret, nk_real = meta
    q, k, v, o, lse = res
    do, _ = cts  # lse is an auxiliary output; its cotangent is dead
    dq, dk, dv = _bwd(q, k, v, None, o, lse, do, scale, block_q, block_k,
                      interpret, nk_real)
    return dq, dk, dv


_flash_nomask.defvjp(_flash_nomask_fwd, _flash_nomask_bwd, optimize_remat=True)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _flash_masked(meta, q, k, v, mask):
    return _core_call(q, k, v, mask, meta)


def _flash_masked_fwd(meta, q, k, v, mask):
    o, lse = _core_call(q, k, v, mask, meta)
    return (o, lse), (q, k, v, mask, o, lse)


def _flash_masked_bwd(meta, res, cts):
    scale, block_q, block_k, interpret, nk_real = meta
    q, k, v, mask, o, lse = res
    do, _ = cts
    dq, dk, dv = _bwd(q, k, v, mask, o, lse, do, scale, block_q, block_k,
                      interpret, nk_real)
    dmask = np.zeros(mask.shape, dtype=jax.dtypes.float0)
    return dq, dk, dv, dmask


_flash_masked.defvjp(_flash_masked_fwd, _flash_masked_bwd, optimize_remat=True)

# custom_vjp nondiff argnums must come first; wrap so meta is arg 0
def _flash_nomask_call(q, k, v, meta):
    o, _ = _flash_nomask(meta, q, k, v)
    return o


def _flash_masked_call(q, k, v, mask, meta):
    o, _ = _flash_masked(meta, q, k, v, mask)
    return o


# ---------------------------------------------------------------------------
# public wrapper (layout + padding)
# ---------------------------------------------------------------------------


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Flash attention. q/k/v: [B, N, H, D]; kv_mask: [B, Nk] bool (True =
    valid key). Returns [B, Nq, H, D] in q's dtype.

    Matmuls run in the INPUT dtype (pass bf16 for production speed; fp32
    inputs give an exact-but-slow kernel for parity tests). Sequences with
    padded key length beyond _MAX_NK_PAD fall back to XLA attention.
    """
    b, nq, h, d = q.shape
    nk = k.shape[1]
    if scale is None:
        scale = d**-0.5
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    nk_pad = _round_up(nk, 128)
    if nk_pad > _MAX_NK_PAD:
        from jepa_tpu.ops.attention import xla_attention

        return xla_attention(q, k, v, kv_mask=kv_mask, scale=scale)

    # one nq padding serves fwd and bwd: size blocks for the tighter (bwd)
    # budget so both passes block the same padded array
    eff_block_q, nq_pad = _pick_block(nq, nk_pad, _BWD_TEMP_BUDGET, block_q)
    block_k, nk_pad = _pick_block(nk, nq_pad, _BWD_TEMP_BUDGET, block_k)

    def to_bhnd(x, n_pad):
        x = jnp.transpose(x, (0, 2, 1, 3))  # [B, H, N, D]
        if n_pad != x.shape[2]:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, n_pad - x.shape[2]), (0, 0)))
        return x

    qp = to_bhnd(q, nq_pad)
    kp = to_bhnd(k, nk_pad)
    vp = to_bhnd(v, nk_pad)

    meta = (float(scale), int(eff_block_q), int(block_k), bool(interpret), int(nk))
    if kv_mask is None:
        # key padding (if any) is handled by a compile-time iota vs nk
        o = _flash_nomask_call(qp, kp, vp, meta)
    else:
        mask = kv_mask.astype(bool)
        mask = jnp.pad(mask, ((0, 0), (0, nk_pad - nk)))
        mask = jax.lax.broadcast_in_dim(mask, (b, _SUBLANES, nk_pad), (0, 2))
        o = _flash_masked_call(qp, kp, vp, mask, meta)
    return jnp.transpose(o[:, :, :nq, :], (0, 2, 1, 3)).astype(v.dtype)
