"""Pallas TPU flash attention (forward + backward), with key-validity mask.

Replaces cuDNN SDPA (reference: src/models/utils/modules.py:66-69) for the
hot self-attention over 1100-4600 video tokens. Design per the TPU kernel
playbook, v3 (round-2 relayout rewrite after xplane analysis):

  * MATMULS RUN IN THE INPUT DTYPE (bf16 in production) with fp32
    accumulation — the v1 kernel cast operands to fp32 first, which made
    every dot an fp32 MXU op (~8-12x slower measured on v5e). Softmax math
    stays fp32.
  * SINGLE-PASS softmax: at V-JEPA sequence lengths the whole K/V for one
    head fits VMEM, so each q-block computes its full score row in one shot
    (no online rescale bookkeeping, ~10% over the online loop). Sequences
    longer than _MAX_NK fall back to XLA attention.
  * TRUE-SHAPE operands, head-major [B, H, N, D]: v2 padded N in HBM
    (1568 -> 1664) and sliced the pad back off around every kernel; the
    round-2 xplane showed ~34 ms/step of %pad + %slice in the ViT-L target
    forward alone. v3 passes unpadded arrays and relies on Mosaic's
    edge-block masking (grid = ceil(N / block)); the only padding left is
    Mosaic's free lane padding in VMEM. No head-dim padding either: D=24
    (predictor) / 64 (encoder) blocks are legal because the block's last
    dim equals the array dim.
  * Key masking: a real ``kv_mask`` rides an 8-sublane VMEM block; without
    one no masking is needed at all (true key length, Mosaic-safe
    reductions).
  * lse/delta ride [B, H, Nq, 8] (8-lane) blocks, not 128-lane broadcasts.
  * backward = two kernels: dQ over q-blocks, dK/dV over k-blocks, using
    the standard ds = p * (dp - delta) recurrence with delta = rowsum(dO*O)
    precomputed by XLA.
  * The custom_vjps return (o, lse) as PRIMAL outputs and declare residuals
    (q, k, v, o, lse) with ``optimize_remat=True``: every residual aliases
    a primal input or output, so under jax.checkpoint with a policy that
    saves the fwd's outputs (transformer.run_blocks remat='attn') the
    backward consumes the SAVED (o, lse) instead of re-running the forward
    kernel.

Non-TPU backends run the kernels in interpret mode (tests); production CPU
paths should use ops.attention.xla_attention instead.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.ad_checkpoint
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30
_LSE_LANES = 8
_SUBLANES = 8
# Softmax runs in base 2: log2(e) folds into the q pre-scale (one [n, d]
# pass) so every exp over the [nq, nk] score tile is a bare exp2 — the VPU
# multiply pass per score element that exp(x) = exp2(x * log2e) would need
# disappears. lse is stored in base-2 units; fwd and bwd agree on it.
_LOG2E = 1.4426950408889634
# VMEM budgets for choosing q/k block sizes. The _pick_block fit test
# charges 16 bytes per score element (four fp32 score-sized temps, the bwd
# kernels' real footprint; Mosaic's scoped-vmem stack limit is 16MB and
# operands/lse take the remainder). fwd holds ~2.5 temps, so it gets a
# larger budget under the same formula.
_FWD_TEMP_BUDGET = 18 * 2**20
_BWD_TEMP_BUDGET = 11 * 2**20 + 2**19  # 11.5MB
_MAX_NK = 8192                 # beyond this, fall back to XLA attention
# Largest N the head-major packed bwd is trusted at: production shapes up
# to 1568 tokens are v5e-validated; N=4608/c=80 Mosaic-crashes (round 5).
# The token-major tiled kernels cover big N, so this gate only matters for
# geometries with no valid tm head split.
_PACKED_SAFE_N = 2048
DEFAULT_BLOCK_Q = 512
DEFAULT_BLOCK_K = 512  # kept for API compat; single-pass ignores it


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _cdiv(a: int, b: int) -> int:
    return (a + b - 1) // b


def _pick_block(n: int, other_len: int, budget: int, requested: int):
    """Block size for tiling an axis of true length ``n``.

    Prefers the largest 8-multiple block that EXACTLY divides the
    128-rounded length and fits the VMEM budget — e.g. N=1568 -> 416 (so
    ceil(1568/416)=4 blocks cover 1664 rows, 6% edge waste) instead of 512
    (4 blocks cover 2048, +30% rows of pure compute waste on the masked
    edge). Falls back to a halving 128-multiple block. VMEM cost is charged
    at the 128-rounded ``other_len`` (Mosaic lane padding is physical)."""
    n128 = _round_up(n, 128)
    other_pad = _round_up(other_len, 128)
    fits = lambda blk: blk * other_pad * 16 <= budget
    for k in range(1, 65):
        if n128 % k:
            continue
        blk = n128 // k
        if blk % 8 == 0 and blk <= requested and (fits(blk) or blk == 128):
            return blk
    blk = max(128, (requested // 128) * 128)
    while blk > 128 and not fits(blk):
        blk //= 2
    return blk


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _mat(ref):
    """Collapse a block ref's leading singleton dims to a [rows, d] matrix.
    Works for both separate rank-4 blocks (1,1,n,d) and packed-qkv rank-5
    blocks (1,1,1,n,d)."""
    return ref[(0,) * (len(ref.shape) - 2)]


def _fwd_kernel(q_ref, k_ref, v_ref, *rest, scale, has_mask):
    if has_mask:
        mask_ref, o_ref, lse_ref = rest
    else:
        o_ref, lse_ref = rest
    # scale (and log2e, see _LOG2E) folds into q BEFORE the matmul: one
    # [bq, d] pass instead of full [bq, nk] fp32 passes over the scores
    # (the softmax path is VPU-bound)
    q = (_mat(q_ref).astype(jnp.float32) * (scale * _LOG2E)).astype(q_ref.dtype)
    k = _mat(k_ref)  # [nk, d]
    v = _mat(v_ref)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # base-2 log-scores, fp32 accumulation
    if has_mask:
        s = jnp.where(mask_ref[0, 0:1, :], s, _NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp2(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    l_safe = jnp.maximum(l, 1e-30)
    o_ref[0, 0] = (o / l_safe).astype(o_ref.dtype)
    lse = (m + jnp.log2(l_safe))[:, 0]  # base-2 units
    lse_ref[0, 0] = jax.lax.broadcast_in_dim(lse, (q.shape[0], _LSE_LANES), (0,))


def _qkv_specs(qkv_args, block_q, nk, d):
    """(args, q_spec, k_spec, v_spec) for separate [B,H,N,D] q/k/v arrays
    or a packed [3,B,H,N,D] array.

    Packed mode passes the SAME array three times with plane-selecting
    index maps: XLA hands the kernel one buffer with three DMA streams, so
    the q/k/v split copies disappear (the round-2 xplane showed ~85 ms/step
    of %slice_bitcast_fusion materializing separate pallas operands)."""
    if isinstance(qkv_args, tuple):  # separate arrays
        q, k, v = qkv_args
        qspec = pl.BlockSpec((1, 1, block_q, d), lambda b_, h_, i: (b_, h_, i, 0),
                             memory_space=pltpu.VMEM)
        kvspec = pl.BlockSpec((1, 1, nk, d), lambda b_, h_, i: (b_, h_, 0, 0),
                              memory_space=pltpu.VMEM)
        return [q, k, v], qspec, kvspec, kvspec
    qkv = qkv_args  # [3, B, H, N, D]
    qspec = pl.BlockSpec((1, 1, 1, block_q, d),
                         lambda b_, h_, i: (0, b_, h_, i, 0),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, 1, 1, nk, d), lambda b_, h_, i: (1, b_, h_, 0, 0),
                         memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((1, 1, 1, nk, d), lambda b_, h_, i: (2, b_, h_, 0, 0),
                         memory_space=pltpu.VMEM)
    return [qkv, qkv, qkv], qspec, kspec, vspec


def _shapes(qkv_args):
    """(b, h, nq, d, nk) for either operand packaging."""
    if isinstance(qkv_args, tuple):
        b, h, nq, d = qkv_args[0].shape
        return b, h, nq, d, qkv_args[1].shape[2]
    _, b, h, n, d = qkv_args.shape
    return b, h, n, d, n


def _fwd(qkv_args, mask, scale, block_q, interpret):
    """qkv_args: (q, k, v) [B,H,N,D] true shapes, or packed [3,B,H,N,D].
    mask: [B,8,Nk] or None. Returns (o [B,H,Nq,D], lse [B,H,Nq,8])."""
    b, h, nq, d, nk = _shapes(qkv_args)
    grid = (b, h, _cdiv(nq, block_q))
    kernel = functools.partial(_fwd_kernel, scale=scale, has_mask=mask is not None)
    args, qspec, kspec, vspec = _qkv_specs(qkv_args, block_q, nk, d)
    in_specs = [qspec, kspec, vspec]
    if mask is not None:
        in_specs.append(
            pl.BlockSpec((1, _SUBLANES, nk), lambda b_, h_, i: (b_, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(mask)
    dtype = args[0].dtype
    o, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda b_, h_, i: (b_, h_, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q, _LSE_LANES), lambda b_, h_, i: (b_, h_, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, nq, d), dtype),
            jax.ShapeDtypeStruct((b, h, nq, _LSE_LANES), jnp.float32),
        ],
        interpret=interpret,
    )(*args)
    return o, lse


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, *rest,
               scale, has_mask):
    if has_mask:
        mask_ref, dq_ref = rest
    else:
        (dq_ref,) = rest
    q = (_mat(q_ref).astype(jnp.float32) * (scale * _LOG2E)).astype(q_ref.dtype)
    k = _mat(k_ref)
    v = _mat(v_ref)
    do = do_ref[0, 0]
    lse = lse_ref[0, 0][:, 0:1]  # base-2 units (see _LOG2E)
    delta = delta_ref[0, 0][:, 0:1]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if has_mask:
        s = jnp.where(mask_ref[0, 0:1, :], s, _NEG_INF)
    p = jnp.exp2(s - lse)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    # the ds*scale term rides the [bq, d] epilogue, not a [bq, nk] pass
    ds = (p * (dp - delta)).astype(q.dtype)
    dq = jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dq_ref[0, 0] = (dq * scale).astype(dq_ref.dtype)


def _dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, *rest,
                scale, has_mask):
    if has_mask:
        mask_ref, dk_ref, dv_ref = rest
    else:
        dk_ref, dv_ref = rest
    # scale*log2e folded into q: st is pre-scaled via the matmul; dk's
    # scale correction rides the [bk, d] epilogue (divide out the log2e)
    q = (_mat(q_ref).astype(jnp.float32) * (scale * _LOG2E)).astype(q_ref.dtype)
    k = _mat(k_ref)       # [bk, d]
    v = _mat(v_ref)
    do = do_ref[0, 0]     # [nq, d]
    lse = lse_ref[0, 0][:, 0:1]    # [nq, 1], base-2 units
    delta = delta_ref[0, 0][:, 0:1]
    # transposed scores: [bk, nq]
    st = jax.lax.dot_general(
        k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if has_mask:
        # column-layout mask [bk, 8lanes]: sublane-aligned, no in-kernel
        # transpose (the row-layout .T pattern failed Mosaic compilation)
        st = jnp.where(mask_ref[0][:, 0:1], st, _NEG_INF)
    pt = jnp.exp2(st - lse[:, 0][None, :])
    ptc = pt.astype(do.dtype)
    dv = jax.lax.dot_general(
        ptc, do, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dpt = jax.lax.dot_general(
        v, do, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bk, nq]
    dst = (pt * (dpt - delta[:, 0][None, :])).astype(q.dtype)
    # dk = dst @ (q*scale); q carries an extra log2e from the exp2 fold
    dk = jax.lax.dot_general(
        dst, q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dk_ref[0, 0] = (dk * (1.0 / _LOG2E)).astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


def _qkv_specs_bwd(qkv_args, q_blocks, k_blocks, d):
    """q/k/v args + specs for a bwd kernel. ``q_blocks``/``k_blocks`` are
    (block, full_len) pairs: block=None means the full axis rides one block.
    Handles separate [B,H,N,D] arrays and packed [3,B,H,N,D]."""
    bq, nq = q_blocks
    bk, nk = k_blocks
    q_idx = (lambda b_, h_, i: (b_, h_, i, 0)) if bq else (lambda b_, h_, i: (b_, h_, 0, 0))
    kv_idx = (lambda b_, h_, i: (b_, h_, i, 0)) if bk else (lambda b_, h_, i: (b_, h_, 0, 0))
    if isinstance(qkv_args, tuple):
        q, k, v = qkv_args
        qspec = pl.BlockSpec((1, 1, bq or nq, d), q_idx, memory_space=pltpu.VMEM)
        kvspec = pl.BlockSpec((1, 1, bk or nk, d), kv_idx, memory_space=pltpu.VMEM)
        return [q, k, v], qspec, kvspec, kvspec
    qkv = qkv_args

    def plane(p, idx):
        return pl.BlockSpec(
            (1, 1, 1, (bq if p == 0 else bk) or (nq if p == 0 else nk), d),
            lambda b_, h_, i: (p,) + idx(b_, h_, i),
            memory_space=pltpu.VMEM,
        )

    return [qkv, qkv, qkv], plane(0, q_idx), plane(1, kv_idx), plane(2, kv_idx)


def _dqkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, *rest,
                 scale, nsteps, nk, block_k, has_mask):
    """Merged backward: one k-blocked pass computes dK/dV for its block AND
    accumulates dQ in a VMEM fp32 scratch — the transposed score matmul and
    its exp2 run ONCE instead of once per split kernel (the split dq/dkv
    pair recomputes p from scratch; at predictor shapes that doubled the
    VPU-bound score passes)."""
    if has_mask:
        mask_ref, dq_ref, dk_ref, dv_ref, acc_ref = rest
    else:
        dq_ref, dk_ref, dv_ref, acc_ref = rest
    jk = pl.program_id(2)
    q = (_mat(q_ref).astype(jnp.float32) * (scale * _LOG2E)).astype(q_ref.dtype)
    k = _mat(k_ref)       # [bk, d]
    v = _mat(v_ref)
    do = do_ref[0, 0]     # [nq, d]
    lse = lse_ref[0, 0][:, 0:1]    # [nq, 1], base-2 units
    delta = delta_ref[0, 0][:, 0:1]
    st = jax.lax.dot_general(
        k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bk, nq]
    if has_mask:
        st = jnp.where(mask_ref[0][:, 0:1], st, _NEG_INF)
    pt = jnp.exp2(st - lse[:, 0][None, :])
    dv = jax.lax.dot_general(
        pt.astype(do.dtype), do, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dpt = jax.lax.dot_general(
        v, do, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bk, nq]
    dst = (pt * (dpt - delta[:, 0][None, :])).astype(q.dtype)
    dk = jax.lax.dot_general(
        dst, q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dk_ref[0, 0] = (dk * (1.0 / _LOG2E)).astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)
    # dq partial: contract the k-block axis of dst [bk, nq] with k [bk, d].
    # Edge-block garbage rows would CONTAMINATE the contraction (unlike
    # dk/dv, whose garbage rows are masked on store) — zero them in BOTH
    # operands (0 * NaN = NaN, so one side is not enough).
    if nk % block_k:
        valid = jk * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (dst.shape[0], 1), 0
        ) < nk
        dst = jnp.where(valid, dst, 0).astype(dst.dtype)
        k = jnp.where(valid, k.astype(jnp.float32), 0).astype(k.dtype)
    dq_part = jax.lax.dot_general(
        dst, k, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [nq, d]
    @pl.when(jk == 0)
    def _init():
        acc_ref[...] = dq_part

    @pl.when(jk > 0)
    def _acc():
        acc_ref[...] += dq_part

    @pl.when(jk == nsteps - 1)
    def _flush():
        dq_ref[0, 0] = (acc_ref[...] * scale).astype(dq_ref.dtype)


def _bwd_merged(qkv_args, mask, lse, do, delta, scale, block_k, interpret):
    b, h, nq, d, nk = _shapes(qkv_args)
    dtype = do.dtype
    nsteps = _cdiv(nk, block_k)
    dospec = pl.BlockSpec((1, 1, nq, d), lambda b_, h_, j: (b_, h_, 0, 0),
                          memory_space=pltpu.VMEM)
    lspec = pl.BlockSpec((1, 1, nq, _LSE_LANES), lambda b_, h_, j: (b_, h_, 0, 0),
                         memory_space=pltpu.VMEM)
    kvspec_blk = pl.BlockSpec((1, 1, block_k, d), lambda b_, h_, j: (b_, h_, j, 0),
                              memory_space=pltpu.VMEM)
    args3, qspec, kspec, vspec = _qkv_specs_bwd(
        qkv_args, (None, nq), (block_k, nk), d
    )
    in_specs = [qspec, kspec, vspec, dospec, lspec, lspec]
    args = args3 + [do, lse, delta]
    if mask is not None:
        mask_col = jax.lax.broadcast_in_dim(
            mask[:, 0, :], (mask.shape[0], mask.shape[2], _LSE_LANES), (0, 1)
        )
        in_specs.append(
            pl.BlockSpec((1, block_k, _LSE_LANES), lambda b_, h_, j: (b_, j, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(mask_col)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_dqkv_kernel, scale=scale, nsteps=nsteps,
                          nk=nk, block_k=block_k, has_mask=mask is not None),
        grid=(b, h, nsteps),
        in_specs=in_specs,
        out_specs=[dospec, kvspec_blk, kvspec_blk],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, nq, d), dtype),
            jax.ShapeDtypeStruct((b, h, nk, d), dtype),
            jax.ShapeDtypeStruct((b, h, nk, d), dtype),
        ],
        scratch_shapes=[pltpu.VMEM((nq, d), jnp.float32)],
        interpret=interpret,
    )(*args)
    return dq, dk, dv


def _merged_fits(nq, nk, d, block_k):
    """Can the merged kernel hold its temps + full-q operands in VMEM?
    Four score-sized fp32/bf16 temps at [block_k, nq] plus q/do/acc rows."""
    nq_pad = _round_up(nq, 128)
    d_pad = _round_up(d, 128)
    temps = block_k * nq_pad * 14          # st/dpt fp32 + pt/dst bf16 + slack
    rows = nq_pad * d_pad * (2 + 2 + 4 + 4)  # q, do (bf16); acc, dq out (fp32)
    return temps + rows <= _BWD_TEMP_BUDGET


def _bwd(qkv_args, mask, o, lse, do, scale, block_q, block_k, interpret):
    b, h, nq, d, nk = _shapes(qkv_args)
    dtype = do.dtype
    delta_vec = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    delta = jax.lax.broadcast_in_dim(delta_vec, (b, h, nq, _LSE_LANES), (0, 1, 2))
    has_mask = mask is not None

    if _merged_fits(nq, nk, d, block_k):
        return _bwd_merged(qkv_args, mask, lse, do, delta, scale, block_k, interpret)

    dospec_blk = pl.BlockSpec((1, 1, block_q, d), lambda b_, h_, i: (b_, h_, i, 0),
                              memory_space=pltpu.VMEM)
    lspec_blk = pl.BlockSpec((1, 1, block_q, _LSE_LANES), lambda b_, h_, i: (b_, h_, i, 0),
                             memory_space=pltpu.VMEM)
    args3, qspec, kspec, vspec = _qkv_specs_bwd(
        qkv_args, (block_q, nq), (None, nk), d
    )
    in_specs = [qspec, kspec, vspec, dospec_blk, lspec_blk, lspec_blk]
    args = args3 + [do, lse, delta]
    if has_mask:
        in_specs.append(
            pl.BlockSpec((1, _SUBLANES, nk), lambda b_, h_, i: (b_, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(mask)
    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale, has_mask=has_mask),
        grid=(b, h, _cdiv(nq, block_q)),
        in_specs=in_specs,
        out_specs=dospec_blk,
        out_shape=jax.ShapeDtypeStruct((b, h, nq, d), dtype),
        interpret=interpret,
    )(*args)

    dospec_full = pl.BlockSpec((1, 1, nq, d), lambda b_, h_, j: (b_, h_, 0, 0),
                               memory_space=pltpu.VMEM)
    lspec_full = pl.BlockSpec((1, 1, nq, _LSE_LANES), lambda b_, h_, j: (b_, h_, 0, 0),
                              memory_space=pltpu.VMEM)
    kvspec_blk = pl.BlockSpec((1, 1, block_k, d), lambda b_, h_, j: (b_, h_, j, 0),
                              memory_space=pltpu.VMEM)
    args3, qspec, kspec, vspec = _qkv_specs_bwd(
        qkv_args, (None, nq), (block_k, nk), d
    )
    in_specs = [qspec, kspec, vspec, dospec_full, lspec_full, lspec_full]
    args = args3 + [do, lse, delta]
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
        grid=(b, h, _cdiv(nk, block_k)),
        in_specs=in_specs,
        out_specs=[kvspec_blk, kvspec_blk],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, nk, d), dtype),
            jax.ShapeDtypeStruct((b, h, nk, d), dtype),
        ],
        interpret=interpret,
    )(*args)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# custom VJP core (operands already in [B,H,N,D] true-shape layout)
# ---------------------------------------------------------------------------


def _core_call(qkv_args, mask, meta):
    scale, block_q, block_k, interpret = meta
    return _fwd(qkv_args, mask, scale, block_q, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _flash_nomask(meta, q, k, v):
    return _core_call((q, k, v), None, meta)


def _flash_nomask_fwd(meta, q, k, v):
    o, lse = _core_call((q, k, v), None, meta)
    return (o, lse), (q, k, v, o, lse)


def _flash_nomask_bwd(meta, res, cts):
    scale, block_q, block_k, interpret = meta
    q, k, v, o, lse = res
    do, _ = cts  # lse is an auxiliary output; its cotangent is dead
    dq, dk, dv = _bwd((q, k, v), None, o, lse, do, scale, block_q, block_k, interpret)
    return dq, dk, dv


_flash_nomask.defvjp(_flash_nomask_fwd, _flash_nomask_bwd, optimize_remat=True)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _flash_masked(meta, q, k, v, mask):
    return _core_call((q, k, v), mask, meta)


def _flash_masked_fwd(meta, q, k, v, mask):
    o, lse = _core_call((q, k, v), mask, meta)
    return (o, lse), (q, k, v, mask, o, lse)


def _flash_masked_bwd(meta, res, cts):
    scale, block_q, block_k, interpret = meta
    q, k, v, mask, o, lse = res
    do, _ = cts
    dq, dk, dv = _bwd((q, k, v), mask, o, lse, do, scale, block_q, block_k, interpret)
    dmask = np.zeros(mask.shape, dtype=jax.dtypes.float0)
    return dq, dk, dv, dmask


_flash_masked.defvjp(_flash_masked_fwd, _flash_masked_bwd, optimize_remat=True)


# Packed variants: one [3, B, H, N, D] operand straight out of the fused qkv
# projection. The kernels stream q/k/v planes from the SAME buffer, so XLA
# never materializes separate q/k/v copies for the custom-call.


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _flash_packed(meta, qkv):
    return _core_call(qkv, None, meta)


def _flash_packed_fwd(meta, qkv):
    o, lse = _core_call(qkv, None, meta)
    return (o, lse), (qkv, o, lse)


def _flash_packed_bwd(meta, res, cts):
    scale, block_q, block_k, interpret = meta
    qkv, o, lse = res
    do, _ = cts
    dq, dk, dv = _bwd(qkv, None, o, lse, do, scale, block_q, block_k, interpret)
    return (jnp.stack([dq, dk, dv], axis=0),)


_flash_packed.defvjp(_flash_packed_fwd, _flash_packed_bwd, optimize_remat=True)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _flash_packed_masked(meta, qkv, mask):
    return _core_call(qkv, mask, meta)


def _flash_packed_masked_fwd(meta, qkv, mask):
    o, lse = _core_call(qkv, mask, meta)
    return (o, lse), (qkv, mask, o, lse)


def _flash_packed_masked_bwd(meta, res, cts):
    scale, block_q, block_k, interpret = meta
    qkv, mask, o, lse = res
    do, _ = cts
    dq, dk, dv = _bwd(qkv, mask, o, lse, do, scale, block_q, block_k, interpret)
    dmask = np.zeros(mask.shape, dtype=jax.dtypes.float0)
    return jnp.stack([dq, dk, dv], axis=0), dmask


_flash_packed_masked.defvjp(
    _flash_packed_masked_fwd, _flash_packed_masked_bwd, optimize_remat=True
)


# ---------------------------------------------------------------------------
# public wrappers
# ---------------------------------------------------------------------------


def flash_attention_packed(
    qkv: jnp.ndarray,
    kv_mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Flash self-attention over a PACKED qkv tensor [3, B, H, N, D] (true,
    unpadded shapes), as produced head-major by a fused qkv projection.
    Returns o [B, H, N, D].

    This is the zero-copy entry point for self-attention: the kernels read
    the q/k/v planes straight from the packed buffer (no split copies, no
    transposes, no HBM padding)."""
    _, b, h, n, d = qkv.shape
    if scale is None:
        scale = d**-0.5
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if n > _MAX_NK:
        from jepa_tpu.ops.attention import xla_attention

        t = jnp.transpose(qkv, (0, 1, 3, 2, 4))  # [3,B,N,H,D]
        o = xla_attention(t[0], t[1], t[2], kv_mask=kv_mask, scale=scale)
        return jnp.transpose(o, (0, 2, 1, 3))

    eff_block_q = _pick_block(n, n, _BWD_TEMP_BUDGET, block_q)
    eff_block_k = _pick_block(n, n, _BWD_TEMP_BUDGET, block_k)
    meta = (float(scale), int(eff_block_q), int(eff_block_k), bool(interpret))
    if kv_mask is None:
        o, _ = _flash_packed(meta, qkv)
    else:
        mask = jax.lax.broadcast_in_dim(
            kv_mask.astype(bool), (b, _SUBLANES, n), (0, 2)
        )
        o, _ = _flash_packed_masked(meta, qkv, mask)
    return o.astype(qkv.dtype)


def flash_attention_bhnd(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Flash attention on head-major operands. q/k/v: [B, H, N, D] (true,
    unpadded shapes); kv_mask: [B, Nk] bool (True = valid key). Returns
    [B, H, Nq, D] in q's dtype.

    This is the zero-relayout entry point: no transposes, no HBM padding —
    callers that can produce [B, H, N, D] directly (transformer.py's fused
    qkv projection) should use it. Matmuls run in the INPUT dtype (pass
    bf16 for production speed; fp32 inputs give an exact-but-slow kernel
    for parity tests).
    """
    b, h, nq, d = q.shape
    nk = k.shape[2]
    if scale is None:
        scale = d**-0.5
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if nk > _MAX_NK:
        from jepa_tpu.ops.attention import xla_attention

        o = xla_attention(
            jnp.transpose(q, (0, 2, 1, 3)),
            jnp.transpose(k, (0, 2, 1, 3)),
            jnp.transpose(v, (0, 2, 1, 3)),
            kv_mask=kv_mask,
            scale=scale,
        )
        return jnp.transpose(o, (0, 2, 1, 3))

    # size blocks for the tighter (bwd) budget so fwd and bwd tile alike
    eff_block_q = _pick_block(nq, nk, _BWD_TEMP_BUDGET, block_q)
    eff_block_k = _pick_block(nk, nq, _BWD_TEMP_BUDGET, block_k)
    meta = (float(scale), int(eff_block_q), int(eff_block_k), bool(interpret))
    if kv_mask is None:
        o, _ = _flash_nomask(meta, q, k, v)
    else:
        mask = jax.lax.broadcast_in_dim(
            kv_mask.astype(bool), (b, _SUBLANES, nk), (0, 2)
        )
        o, _ = _flash_masked(meta, q, k, v, mask)
    return o.astype(v.dtype)


# ---------------------------------------------------------------------------
# token-major kernels: qkv [B, N, 3*H*c] with the head loop INSIDE the kernel
# ---------------------------------------------------------------------------
#
# The head-major packed kernels above still pay one relayout per call: the
# fused qkv projection naturally writes token-major [B, N, 3D] and XLA must
# transpose it into [3, B, H, N, c] (round-2 xplane: 2.47 ms/layer for the
# ViT-L target encoder's qkv-pack fusion vs ~1.2 ms matmul floor). These
# kernels consume the projection's native layout directly — the q/k/v planes
# are lane blocks of one array, heads are lane slices inside the kernel —
# so the relayout disappears on BOTH sides (o comes back token-major, which
# is also exactly what the output projection and its backward consume).
#
# Compiler guardrails (measured on v5e Mosaic, silent HTTP-500 crashes of
# the remote compiler, independent of the VMEM-stack fit):
#   * more than 8 unrolled heads per kernel body is fragile at production
#     sequence lengths (16-head bodies crash at N>=1152 for c>=32 and for
#     c=24 even with small blocks once the lse output is present);
#   * unrolled_heads * block * n128 * head_dim has a hard ceiling;
#   * unrolled_heads * block beyond the validated 1664 (fwd) / 1024 (bwd)
#     products crashed in at least one configuration.
# _pick_tm_params stays inside the validated envelope by adding a
# head_split grid dimension; head dims that admit no 128-aligned split with
# <=8 unrolled heads (e.g. the predictor's c=24) are zero-padded up to a
# multiple of 32 by flash_self_attention (exact math: pad lanes carry
# zero weights, zero outputs, zero grads).

_TM_COMPILE_LIMIT_FWD = int(1.8e8)
_TM_COMPILE_LIMIT_BWD = int(0.9e8)  # bwd has ~2x the per-head temps
_TM_MAX_UNROLLED_HEADS = 8
_TM_MAX_HGBLK_FWD = 1664
_TM_MAX_HGBLK_BWD = 1024
_TM_VMEM_BUDGET = 12 * 2**20


def _pick_tm_params(heads: int, hdim: int, n: int, fwd: bool):
    """(head_split, block) for the token-major kernels, or None when no
    compiler-safe configuration exists (caller falls back to head-major)."""
    hc = heads * hdim
    n128 = _round_up(n, 128)
    limit = _TM_COMPILE_LIMIT_FWD if fwd else _TM_COMPILE_LIMIT_BWD
    if not fwd and hdim > 64:
        # c=96 (ViT-H c=80 / giant c=88 padded): the merged bwd at bk=128
        # (metric 0.82e8) crashes where c<=64 shapes at higher metrics
        # compile; halving the ceiling selects bk=64, validated on v5e.
        limit //= 2
    hgblk = _TM_MAX_HGBLK_FWD if fwd else _TM_MAX_HGBLK_BWD
    splits = [s for s in range(1, heads + 1)
              if heads % s == 0 and (hc // s) % 128 == 0
              and heads // s <= _TM_MAX_UNROLLED_HEADS]
    if not splits:
        return None
    blocks = []
    cap = 448 if fwd else 256
    for kk in range(1, 129):
        if n128 % kk == 0 and (n128 // kk) % 8 == 0 and n128 // kk <= cap:
            blocks.append(n128 // kk)
    if not blocks:
        blocks = [128]
    best = None
    for blk in blocks:  # descending: prefer the largest block
        for s in splits:  # ascending: prefer the fewest splits
            hg, gl = heads // s, hc // s
            if hg * blk > hgblk or hg * blk * n128 * hdim > limit:
                continue
            if fwd:
                vmem = (2 * blk * n128 * 4          # s, p fp32 (serial per head)
                        + 2 * n128 * gl * 2          # k, v group planes
                        + 2 * blk * gl * 2)          # q in, o out
            else:
                vmem = (4 * blk * n128 * 3           # st/dpt fp32 + pt/dst bf16
                        + 3 * n128 * gl * 2          # dqkv out block
                        + n128 * gl * 4              # dq acc scratch
                        + 2 * n128 * gl * 2          # q, do full
                        + 2 * blk * gl * 2)          # k, v blocks
            if vmem > _TM_VMEM_BUDGET:
                continue
            best = (s, blk)
            break
        if best:
            break
    return best


def _pick_tm_tiled_params(heads: int, hdim: int, n: int,
                          force_split: Optional[int] = None):
    """(head_split, block) for the dual-tiled bwd kernels (bq = bk = block),
    or None. Temps are [block, block] per head — the merged kernel's
    compile-limit metric applies with the inner length swapped in for N, so
    geometries far beyond the merged envelope (e.g. c=96/N=4608) fit.
    force_split pins the head split (the custom_vjp primal and fwd rules
    must emit the same lse shape [B, hs, N, hg], so a tiled grad-path fwd
    paired with a one-shot primal must share its split)."""
    hc = heads * hdim
    n128 = _round_up(n, 128)
    limit = _TM_COMPILE_LIMIT_BWD
    if hdim > 64:
        limit //= 2  # same halving as the merged picker (c=96 validated)
    splits = [s for s in range(1, heads + 1)
              if heads % s == 0 and (hc // s) % 128 == 0
              and heads // s <= _TM_MAX_UNROLLED_HEADS
              and (force_split is None or s == force_split)]
    if not splits:
        return None
    blocks = []
    for kk in range(1, 129):
        if n128 % kk == 0 and (n128 // kk) % 8 == 0 and n128 // kk <= 256:
            blocks.append(n128 // kk)
    if not blocks:
        blocks = [128]
    for blk in blocks:  # descending: prefer the largest block
        for s in splits:  # ascending: prefer the fewest splits
            hg, gl = heads // s, hc // s
            if hg * blk > _TM_MAX_HGBLK_BWD or hg * blk * blk * hdim > limit:
                continue
            # dkv kernel is the VMEM worst case: 4 operand blocks, 4
            # score-sized fp32 temps (serialized per head, ~2 live), the
            # [bk, 2*gl] fp32 accumulator, dk/dv out blocks
            vmem = (4 * blk * gl * 2        # q, do, k, v blocks bf16
                    + 4 * blk * blk * 4     # st/pt/dpt/dst fp32
                    + blk * 2 * gl * 4      # dk|dv accumulator scratch
                    + 2 * blk * gl * 2)     # dk, dv out blocks
            if vmem > _TM_VMEM_BUDGET:
                continue
            return (s, blk)
    return None


# Mosaic double-buffers streamed operand blocks; for the ONE-SHOT fwd the
# full-length kv planes are the dominant residents, so the true stack is
# ~(temps + 2*kv + small blocks). The hard scoped-vmem limit is 16MB; keep
# a margin for q/o block double-buffers.
_TM_ONESHOT_VMEM_LIMIT = 15 * 2**20


def _pick_tm_fwd(heads: int, hdim: int, n: int):
    """(pf_primal, pf_grad) fwd modes, or None. Each is ('one', hs, bq)
    — the one-shot kernel, full kv planes resident — or
    ('tiled', hs, bq, bk) — kv-blocked static-shift accumulation.

    The split exists because Mosaic's VMEM accounting differs by context
    (measured, round 5): the one-shot kernel at N=4608/c=96 runs fine in
    inference programs (575 ms ViT-H/384 encode, BENCH.md) but the SAME
    kernel inside a grad program OOMs the 16M scoped-vmem stack at 18.5M
    (double-buffered kv planes counted). jax.custom_vjp gives the
    trace-time signal: the primal rule runs only outside differentiation
    (→ pf_primal, one-shot whenever the validated fwd envelope allows),
    the fwd rule only under it (→ pf_grad, one-shot only when the true
    double-buffered footprint fits, else tiled). Both share one head
    split so the primal and fwd rules emit identical lse shapes."""
    p = _pick_tm_params(heads, hdim, n, fwd=True)
    bq_override = _tm_fwd_bq_override()
    if p is not None and bq_override:
        p = (p[0], bq_override)
    if p is not None:
        s, blk = p
        gl = heads * hdim // s
        n128 = _round_up(n, 128)
        real = (2 * blk * n128 * 4          # s, p fp32 temps
                + 2 * (2 * n128 * gl * 2)   # k, v planes, double-buffered
                + 4 * blk * gl * 2)         # q in / o out, double-buffered
        one = ("one", s, blk)
        if real <= _TM_ONESHOT_VMEM_LIMIT:
            return (one, one)
        t = _pick_tm_tiled_params(heads, hdim, n, force_split=s)
        if t is not None:
            return (one, ("tiled", t[0], t[1], t[1]))
    t = _pick_tm_tiled_params(heads, hdim, n)
    if t is not None:
        tiled = ("tiled", t[0], t[1], t[1])
        return (tiled, tiled)
    return None


def _pick_tm_bwd(heads: int, hdim: int, n: int):
    """Bwd mode for the token-major path: ('merged', hs, bk) when the
    single-pass kernel fits (one score computation for all three grads),
    else ('tiled', hs, blk, blk) from the dual-tiled picker, else None
    (caller falls back to head-major packed / XLA)."""
    p = _pick_tm_params(heads, hdim, n, fwd=False)
    if p is not None:
        return ("merged",) + p
    t = _pick_tm_tiled_params(heads, hdim, n)
    if t is not None:
        return ("tiled", t[0], t[1], t[1])
    return None


def _tm_kv_chunk() -> int:
    """kv-chunk size for the token-major fwd softmax pipeline (0 = one-shot).
    Env knob for on-chip A/B (`JEPA_TM_KV_CHUNK=392` etc.); default off
    until the win is recorded in BENCH.md."""
    import os

    return int(os.environ.get("JEPA_TM_KV_CHUNK", "0"))


# Static softmax shift (base-2 units). Subtracting ANY constant is exact
# softmax math; only the fp RANGE depends on it. With C=64 and p cast to
# the compute dtype (bf16 — 8-bit mantissa, fp32 exponent range), the
# no-max result matches the row-max kernel within bf16-p rounding for all
# base-2 logits up to C+127 ≈ +132 natural units on the high side. The LOW
# side is limited by the l_safe denominator clamp (1e-30 ≈ 2^-99.7), not by
# the fp32 exponent floor: once a row's ENTIRE softmax mass sits below
# ~C-99.7 base-2 (≈ -25 natural units for every logit in the row), the
# clamp fires, silently attenuating o and corrupting lse — a regime the
# row-max kernel handles exactly (its l >= 1, clamp never fires). Rows
# where every key is masked also diverge: this kernel returns zeros, the
# row-max kernel a uniform average. Both regimes are far outside pre-LN-ViT
# logit ranges (LN-bounded q,k; the reference trains in the same bf16
# regime), and the train/eval paths never feed fully-masked rows.
# lse stays exact: C + log2(sum 2^(s-C)).
_TM_STATIC_SHIFT = 64.0


def _tm_no_max() -> bool:
    """Drop the per-row max pass in the fwd kernels: the [bq, nk] fp32 VPU
    max reduction is ~40% of the serial softmax VPU time the round-3 xplane
    shows between the two MXU calls. Default ON after the on-chip A/B
    (fused ViT-L step 748.9 -> 734.4 ms, loss identical to 6 decimals;
    BENCH.md) — exact softmax math within bf16-p rounding across the whole
    pre-LN-ViT logit range (see _TM_STATIC_SHIFT). `JEPA_TM_NO_MAX=0`
    restores the per-row max kernel."""
    import os

    return os.environ.get("JEPA_TM_NO_MAX", "1") == "1"


def _tm_mh_softmax() -> bool:
    """Experiment knob (JEPA_TM_MH_SOFTMAX=1, trace-time): in the one-shot
    fwd kernel, compute ALL unrolled heads' score tiles first, run ONE exp2
    over their lane-concat [bq, hg*nk], then the per-head o matmuls —
    instead of the default per-head serialize (s -> exp2 -> o). Targets the
    predictor's ~23% MFU (VERDICT r4 task 5): fewer, larger VPU passes vs
    hg small ones. Costs VMEM: all hg score tiles live at once (the default
    keeps ~2), so pair with JEPA_TM_FWD_BQ to shrink the q block. Same math
    (static-shift softmax), exactness envelope unchanged."""
    import os

    return os.environ.get("JEPA_TM_MH_SOFTMAX", "0") == "1"


def _tm_fwd_bq_override():
    """Experiment knob (JEPA_TM_FWD_BQ=<int>, trace-time): override the
    one-shot fwd q-block size picked by _pick_tm_params — for kernel
    experiments whose VMEM live-set differs from the picker's model (e.g.
    JEPA_TM_MH_SOFTMAX). No validation: out-of-envelope values Mosaic-crash
    (HTTP 500); use for A/B probes only."""
    import os

    v = os.environ.get("JEPA_TM_FWD_BQ")
    return int(v) if v else None


def _fwd_tm_kernel(q_ref, k_ref, v_ref, *rest, scale, heads, hdim,
                   kv_chunk=0, no_max=False, mh_softmax=False):
    if len(rest) == 3:
        mask_ref, o_ref, lse_ref = rest
    else:
        mask_ref, (o_ref, lse_ref) = None, rest
    q = q_ref[0]  # [bq, gl]
    k = k_ref[0]  # [nk, gl]
    v = v_ref[0]
    if mh_softmax and no_max and heads > 1:
        # Experiment body (JEPA_TM_MH_SOFTMAX, VERDICT r4 task 5): all
        # heads' score matmuls first, ONE exp2 over the lane-concat
        # [bq, hg*nk], then the per-head o matmuls. All hg score tiles are
        # live at once (the serialized body keeps ~2) — pair with
        # JEPA_TM_FWD_BQ to fit VMEM.
        nk_ = k.shape[0]
        ones_ = jnp.ones((nk_, 1), v.dtype)
        ss = []
        for h in range(heads):
            sl = slice(h * hdim, (h + 1) * hdim)
            qh = (q[:, sl].astype(jnp.float32)
                  * (scale * _LOG2E)).astype(q.dtype)
            s = jax.lax.dot_general(
                qh, k[:, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if mask_ref is not None:
                s = jnp.where(mask_ref[0, 0:1, :], s, _NEG_INF)
            ss.append(s)
        p_all = jnp.exp2(
            jnp.concatenate(ss, axis=1) - _TM_STATIC_SHIFT
        ).astype(v.dtype)  # [bq, hg*nk]
        outs, lses = [], []
        for h in range(heads):
            sl = slice(h * hdim, (h + 1) * hdim)
            v_ext = jnp.concatenate([v[:, sl], ones_], axis=1)
            o_l = jax.lax.dot_general(
                p_all[:, h * nk_:(h + 1) * nk_], v_ext,
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            )
            l_safe = jnp.maximum(o_l[:, hdim:hdim + 1], 1e-30)
            outs.append((o_l[:, :hdim] / l_safe).astype(o_ref.dtype))
            lses.append(_TM_STATIC_SHIFT + jnp.log2(l_safe))
        o_ref[0] = jnp.concatenate(outs, axis=1)
        lse_ref[0, 0] = jnp.concatenate(lses, axis=1)
        return
    # The softmax is the VPU bottleneck (round-3 xplane: predictor fwd
    # 2.16 ms/layer vs a 0.35 ms MXU floor), so every score-sized VPU pass
    # counts. Two cuts vs the naive form:
    #   * exp2 writes p in the compute dtype directly (one pass, half the
    #     write bytes) instead of fp32-exp2 + separate cast pass;
    #   * the softmax denominator rides the o matmul as a ones column
    #     appended to v (the MXU output tile is 128 lanes regardless of c,
    #     so the extra column is free) — the [bq, nk] sum pass disappears.
    nk = k.shape[0]
    ones = jnp.ones((nk, 1), v.dtype)
    if kv_chunk and kv_chunk < nk:
        bounds = [(j, min(j + kv_chunk, nk)) for j in range(0, nk, kv_chunk)]
    else:
        bounds = [(0, nk)]
    outs, lses = [], []
    for h in range(heads):
        sl = slice(h * hdim, (h + 1) * hdim)
        qh = (q[:, sl].astype(jnp.float32) * (scale * _LOG2E)).astype(q.dtype)

        def s_chunk(j0, j1, sl=sl, qh=qh):
            s = jax.lax.dot_general(
                qh, k[j0:j1, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if mask_ref is not None:
                s = jnp.where(mask_ref[0, 0:1, j0:j1], s, _NEG_INF)
            return s

        # Chunked-kv software pipeline (kv_chunk>0): issue the NEXT chunk's
        # score matmul (MXU) before the VPU softmax of the current chunk, so
        # the exp2/max passes hide under the matmul. Online rescale keeps the
        # math exact (same o/lse up to fp assoc); an all-masked chunk is
        # benign because _NEG_INF is finite — a later real max zeroes its
        # contribution via alpha = exp2(m_old - m_new) = 0.
        if no_max and len(bounds) == 1:
            # Static-shift softmax: exp2(s - C) with compile-time C — the
            # [bq, nk] fp32 max reduction disappears; exact within bf16-p
            # rounding for |logits| far beyond ViT range (see
            # _TM_STATIC_SHIFT). lse keeps its exact value.
            p = jnp.exp2(s_chunk(*bounds[0]) - _TM_STATIC_SHIFT).astype(v.dtype)
            v_ext = jnp.concatenate([v[:, sl], ones], axis=1)
            o_l = jax.lax.dot_general(
                p, v_ext, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            l_safe = jnp.maximum(o_l[:, hdim:hdim + 1], 1e-30)
            outs.append((o_l[:, :hdim] / l_safe).astype(o_ref.dtype))
            lses.append(_TM_STATIC_SHIFT + jnp.log2(l_safe))
            continue
        m = None
        o_l = None
        s_cur = s_chunk(*bounds[0])
        for ci, (j0, j1) in enumerate(bounds):
            s_next = s_chunk(*bounds[ci + 1]) if ci + 1 < len(bounds) else None
            v_ext = jnp.concatenate([v[j0:j1, sl], ones[j0:j1]], axis=1)
            mc = jnp.max(s_cur, axis=-1, keepdims=True)
            if m is None:
                m = mc
                p = jnp.exp2(s_cur - m).astype(v.dtype)
                o_l = jax.lax.dot_general(
                    p, v_ext, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [bq, c+1]: o unnormalized | l
            else:
                m_new = jnp.maximum(m, mc)
                alpha = jnp.exp2(m - m_new)
                p = jnp.exp2(s_cur - m_new).astype(v.dtype)
                o_l = o_l * alpha + jax.lax.dot_general(
                    p, v_ext, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                m = m_new
            s_cur = s_next
        l_safe = jnp.maximum(o_l[:, hdim:hdim + 1], 1e-30)
        outs.append((o_l[:, :hdim] / l_safe).astype(o_ref.dtype))
        lses.append(m + jnp.log2(l_safe))  # [bq, 1], base-2 units
    o_ref[0] = jnp.concatenate(outs, axis=1)
    lse_ref[0, 0] = jnp.concatenate(lses, axis=1)


def _fwd_tm_tiled_kernel(q_ref, k_ref, v_ref, *rest, scale, heads, hdim,
                         nsteps, nk, block_k):
    """kv-blocked fwd: static-shift softmax (see _TM_STATIC_SHIFT — any
    compile-time shift is exact softmax math) lets the unnormalized o and
    the denominator accumulate across kv blocks in VMEM scratch with NO
    online max/rescale; one divide at the flush. Used where the one-shot
    kernel's full-length kv planes (double-buffered by Mosaic) blow the
    16MB VMEM stack — the vith16_384 geometry (N=4608, c=96) OOMs at
    18.5M inside grad programs."""
    if len(rest) == 5:
        mask_ref, o_ref, lse_ref, acc_ref, l_ref = rest
    else:
        mask_ref, (o_ref, lse_ref, acc_ref, l_ref) = None, rest
    jk = pl.program_id(3)
    nkv = k_ref.shape[1]
    ones = jnp.ones((nkv, 1), v_ref.dtype)
    parts, lparts = [], []
    for h in range(heads):
        sl = slice(h * hdim, (h + 1) * hdim)
        qh = (q_ref[0][:, sl].astype(jnp.float32)
              * (scale * _LOG2E)).astype(q_ref.dtype)
        s = jax.lax.dot_general(
            qh, k_ref[0][:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [bq, bk]
        if mask_ref is not None:
            s = jnp.where(mask_ref[0, 0:1, :], s, _NEG_INF)
        v = v_ref[0][:, sl]
        if nk % block_k:
            # kv edge rows are undefined memory: mask the scores AND zero
            # the v rows — p's zero edge columns times a NaN v row is NaN
            s = jnp.where(_valid_cols(s.shape[0], s.shape[1], jk, block_k, nk),
                          s, _NEG_INF)
            vr = jk * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (v.shape[0], 1), 0) < nk
            v = jnp.where(vr, v.astype(jnp.float32), 0).astype(v.dtype)
        p = jnp.exp2(s - _TM_STATIC_SHIFT).astype(v_ref.dtype)
        v_ext = jnp.concatenate([v, ones], axis=1)
        o_l = jax.lax.dot_general(
            p, v_ext, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [bq, c+1]: unnormalized o | denominator
        parts.append(o_l[:, :hdim])
        lparts.append(o_l[:, hdim:hdim + 1])
    o_part = jnp.concatenate(parts, axis=1)   # [bq, gl]
    l_part = jnp.concatenate(lparts, axis=1)  # [bq, hg]

    @pl.when(jk == 0)
    def _init():
        acc_ref[...] = o_part
        l_ref[...] = l_part

    @pl.when(jk > 0)
    def _acc():
        acc_ref[...] += o_part
        l_ref[...] += l_part

    @pl.when(jk == nsteps - 1)
    def _flush():
        l_safe = jnp.maximum(l_ref[...], 1e-30)
        outs = [acc_ref[:, h * hdim:(h + 1) * hdim] / l_safe[:, h:h + 1]
                for h in range(heads)]
        o_ref[0] = jnp.concatenate(outs, axis=1).astype(o_ref.dtype)
        lse_ref[0, 0] = _TM_STATIC_SHIFT + jnp.log2(l_safe)


def _fwd_tm_tiled(qkv, mask, scale, heads, hdim, hs, bq, bk, interpret):
    b, n, w3 = qkv.shape
    hc = w3 // 3
    hg, gl = heads // hs, hc // hs
    nq_steps, nk_steps = _cdiv(n, bq), _cdiv(n, bk)
    qspec = pl.BlockSpec((1, bq, gl), lambda b_, g, i, j: (b_, i, g),
                         memory_space=pltpu.VMEM)
    kvspec = lambda s: pl.BlockSpec(
        (1, bk, gl), lambda b_, g, i, j, s=s: (b_, j, s * hs + g),
        memory_space=pltpu.VMEM)
    in_specs = [qspec, kvspec(1), kvspec(2)]
    args = [qkv, qkv, qkv]
    if mask is not None:
        in_specs.append(
            pl.BlockSpec((1, _SUBLANES, bk), lambda b_, g, i, j: (b_, 0, j),
                         memory_space=pltpu.VMEM))
        args.append(mask)
    return pl.pallas_call(
        functools.partial(_fwd_tm_tiled_kernel, scale=scale, heads=hg,
                          hdim=hdim, nsteps=nk_steps, nk=n, block_k=bk),
        grid=(b, hs, nq_steps, nk_steps),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, bq, gl), lambda b_, g, i, j: (b_, i, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq, hg), lambda b_, g, i, j: (b_, g, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, hc), qkv.dtype),
            jax.ShapeDtypeStruct((b, hs, n, hg), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((bq, gl), jnp.float32),
                        pltpu.VMEM((bq, hg), jnp.float32)],
        interpret=interpret,
    )(*args)


def _fwd_tm(qkv, mask, meta, grad=False):
    """qkv: [B, N, 3*H*c] token-major. Returns (o [B, N, H*c],
    lse [B, hs_f, N, hg] fp32 base-2 — grouped by the fwd head split; the
    bwd regroups it in XLA). The q/k/v planes and head groups are LANE
    blocks of the one qkv array (Mosaic requires the last two block dims
    to be 8/128-aligned or full, which rules out a size-1 middle dim).

    meta carries (pf_primal, pf_grad) from _pick_tm_fwd; `grad` selects
    (True inside the custom_vjp fwd rules, i.e. under differentiation,
    where Mosaic's scoped-vmem accounting is stricter — see _pick_tm_fwd).
    ('one', hs, bq) is the one-shot kernel (full kv planes resident);
    ('tiled', hs, bq, bk) streams kv blocks with static-shift accumulation
    (bounded VMEM at any N)."""
    scale, heads, hdim, pfs, _pb, interpret = meta
    pf = pfs[1] if grad else pfs[0]
    if pf[0] == "tiled":
        return _fwd_tm_tiled(qkv, mask, scale, heads, hdim, pf[1], pf[2],
                             pf[3], interpret)
    hs_f, bq = pf[1], pf[2]
    b, n, w3 = qkv.shape
    hc = w3 // 3
    hg, gl = heads // hs_f, hc // hs_f
    hs = hs_f
    grid = (b, hs, _cdiv(n, bq))
    qspec = pl.BlockSpec((1, bq, gl), lambda b_, g, i: (b_, i, g),
                         memory_space=pltpu.VMEM)
    kvspec = lambda s: pl.BlockSpec(
        (1, n, gl), lambda b_, g, i, s=s: (b_, 0, s * hs + g),
        memory_space=pltpu.VMEM)
    in_specs = [qspec, kvspec(1), kvspec(2)]
    args = [qkv, qkv, qkv]
    if mask is not None:
        in_specs.append(
            pl.BlockSpec((1, _SUBLANES, n), lambda b_, g, i: (b_, 0, 0),
                         memory_space=pltpu.VMEM))
        args.append(mask)
    o, lse = pl.pallas_call(
        functools.partial(_fwd_tm_kernel, scale=scale, heads=hg, hdim=hdim,
                          kv_chunk=_tm_kv_chunk(), no_max=_tm_no_max(),
                          mh_softmax=_tm_mh_softmax()),
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, bq, gl), lambda b_, g, i: (b_, i, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq, hg), lambda b_, g, i: (b_, g, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, hc), qkv.dtype),
            jax.ShapeDtypeStruct((b, hs, n, hg), jnp.float32),
        ],
        interpret=interpret,
    )(*args)
    return o, lse


def _bwd_tm_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, *rest,
                   scale, heads, hdim, nsteps, nk, block_k):
    if len(rest) == 5:
        mask_ref, dq_ref, dk_ref, dv_ref, acc_ref = rest
    else:
        mask_ref, (dq_ref, dk_ref, dv_ref, acc_ref) = None, rest
    jk = pl.program_id(2)
    dqs, dks, dvs = [], [], []
    for h in range(heads):
        sl = slice(h * hdim, (h + 1) * hdim)
        q = (q_ref[0][:, sl].astype(jnp.float32) * (scale * _LOG2E)).astype(q_ref.dtype)
        k = k_ref[0][:, sl]             # [bk, c]
        v = v_ref[0][:, sl]
        do = do_ref[0][:, sl]           # [nq, c]
        lse = lse_ref[0, 0][:, h][None, :]      # [1, nq] base-2 units
        delta = delta_ref[0, 0][:, h][None, :]  # [1, nq]
        st = jax.lax.dot_general(
            k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [bk, nq]
        if mask_ref is not None:
            st = jnp.where(mask_ref[0][:, 0:1], st, _NEG_INF)
        # exp2 emits the compute dtype directly: kills the separate
        # fp32->bf16 cast pass and halves pt's write/read bytes (the bwd
        # softmax passes are the VPU bottleneck — see _fwd_tm_kernel)
        pt = jnp.exp2(st - lse).astype(do.dtype)
        dv = jax.lax.dot_general(
            pt, do, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dpt = jax.lax.dot_general(
            v, do, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [bk, nq]
        dst = (pt.astype(jnp.float32) * (dpt - delta)).astype(q.dtype)
        dk = jax.lax.dot_general(
            dst, q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dks.append((dk * (1.0 / _LOG2E)).astype(dk_ref.dtype))
        dvs.append(dv.astype(dv_ref.dtype))
        # dq partial over this k-block; zero edge-block garbage in BOTH
        # operands (0 * NaN = NaN — see _dqkv_kernel)
        if nk % block_k:
            valid = jk * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (dst.shape[0], 1), 0
            ) < nk
            dst = jnp.where(valid, dst, 0).astype(dst.dtype)
            k = jnp.where(valid, k.astype(jnp.float32), 0).astype(k.dtype)
        dqs.append(jax.lax.dot_general(
            dst, k, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ))  # [nq, c]
    dk_ref[0] = jnp.concatenate(dks, axis=1)   # block store, edge-masked
    dv_ref[0] = jnp.concatenate(dvs, axis=1)
    dq_part = jnp.concatenate(dqs, axis=1)     # [nq, gl]

    @pl.when(jk == 0)
    def _init():
        acc_ref[...] = dq_part

    @pl.when(jk > 0)
    def _acc():
        acc_ref[...] += dq_part

    @pl.when(jk == nsteps - 1)
    def _flush():
        dq_ref[0] = (acc_ref[...] * scale).astype(dq_ref.dtype)


def _bwd_tm(qkv, mask, o, lse, do, meta):
    """Merged token-major backward. Returns (dq, dk, dv), each [B, N, H*c]
    token-major (head-major lanes) — consumed directly by the projection
    backward's matmuls, no assembly copies.

    qkv: [B, N, 3*H*c]; lse: [B, hs_f, N, hg_f] as emitted by _fwd_tm
    (regrouped here to the bwd's own head split).

    meta carries the bwd mode picked by _pick_tm_bwd: ('merged', hs, bk)
    runs the single-pass kernel above; ('tiled', hs, bq, bk) runs the
    dual-tiled kernel pair (bounded VMEM at any N)."""
    scale, heads, hdim, _pf, pb, interpret = meta
    hs_b, bk = pb[1], pb[-1]
    b, n, w3 = qkv.shape
    hc = w3 // 3
    hg, gl = heads // hs_b, hc // hs_b
    hs = hs_b
    delta = jnp.sum(
        do.astype(jnp.float32).reshape(b, n, heads, hdim)
        * o.astype(jnp.float32).reshape(b, n, heads, hdim), axis=-1
    )  # [B, N, H]
    delta_g = jnp.transpose(delta.reshape(b, n, hs, hg), (0, 2, 1, 3))
    # regroup the fwd's [B, hs_f, N, hg_f] lse to the bwd's split
    lse_g = jnp.transpose(
        jnp.transpose(lse, (0, 2, 1, 3)).reshape(b, n, hs, hg), (0, 2, 1, 3)
    )
    if pb[0] == "tiled":
        return _bwd_tm_tiled(qkv, mask, do, lse_g, delta_g, scale, heads,
                             hdim, hs, pb[2], pb[3], interpret)
    nsteps = _cdiv(n, bk)
    qspec = pl.BlockSpec((1, n, gl), lambda b_, g, j: (b_, 0, g),
                         memory_space=pltpu.VMEM)
    kvspec = lambda s: pl.BlockSpec(
        (1, bk, gl), lambda b_, g, j, s=s: (b_, j, s * hs + g),
        memory_space=pltpu.VMEM)
    dospec = pl.BlockSpec((1, n, gl), lambda b_, g, j: (b_, 0, g),
                          memory_space=pltpu.VMEM)
    hspec = pl.BlockSpec((1, 1, n, hg), lambda b_, g, j: (b_, g, 0, 0),
                         memory_space=pltpu.VMEM)
    in_specs = [qspec, kvspec(1), kvspec(2), dospec, hspec, hspec]
    args = [qkv, qkv, qkv, do, lse_g, delta_g]
    if mask is not None:
        mask_col = jax.lax.broadcast_in_dim(
            mask[:, 0, :], (mask.shape[0], mask.shape[2], _LSE_LANES), (0, 1)
        )
        in_specs.append(
            pl.BlockSpec((1, bk, _LSE_LANES), lambda b_, g, j: (b_, j, 0),
                         memory_space=pltpu.VMEM))
        args.append(mask_col)
    dtype = qkv.dtype
    return pl.pallas_call(
        functools.partial(_bwd_tm_kernel, scale=scale, heads=hg, hdim=hdim,
                          nsteps=nsteps, nk=n, block_k=bk),
        grid=(b, hs_b, nsteps),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, n, gl), lambda b_, g, j: (b_, 0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, gl), lambda b_, g, j: (b_, j, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, gl), lambda b_, g, j: (b_, j, g),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, hc), dtype),
            jax.ShapeDtypeStruct((b, n, hc), dtype),
            jax.ShapeDtypeStruct((b, n, hc), dtype),
        ],
        scratch_shapes=[pltpu.VMEM((n, gl), jnp.float32)],
        interpret=interpret,
    )(*args)


# ---------------------------------------------------------------------------
# dual-tiled token-major backward: BOTH sequence sides blocked, so VMEM and
# the per-head score temps are bounded by (bq, bk) independent of N. This is
# the classic two-kernel flash backward; it covers geometries the merged
# kernel cannot (its per-head temps are [bk, N] and it holds q/do/dq-acc at
# full length — at the vith16_384 train geometry, N=4608 tokens x c=96,
# that blows both the VMEM budget and the measured Mosaic compile ceiling,
# and the head-major packed fallback Mosaic-crashes outright; XLA attention
# there runs at ~3% MFU, bench_vith384_train_attn.py). Cost vs merged: the
# score tile is computed twice (once per kernel) — only used where merged
# has no valid config.
# ---------------------------------------------------------------------------


def _valid_cols(rows, cols, j, blk, n):
    """[rows, cols] bool: lane (column) index j*blk+col < n (edge masking)."""
    return j * blk + jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1) < n


def _dq_tm_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, *rest,
                  scale, heads, hdim, nsteps, nk, block_k):
    if len(rest) == 3:
        mask_ref, dq_ref, acc_ref = rest
    else:
        mask_ref, (dq_ref, acc_ref) = None, rest
    jk = pl.program_id(3)
    dqs = []
    for h in range(heads):
        sl = slice(h * hdim, (h + 1) * hdim)
        q = (q_ref[0][:, sl].astype(jnp.float32) * (scale * _LOG2E)).astype(q_ref.dtype)
        k = k_ref[0][:, sl]               # [bk, c]
        v = v_ref[0][:, sl]
        do = do_ref[0][:, sl]             # [bq, c]
        lse = lse_ref[0, 0][:, h:h + 1]   # [bq, 1] base-2 units
        delta = delta_ref[0, 0][:, h:h + 1]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [bq, bk]
        if mask_ref is not None:
            s = jnp.where(mask_ref[0, 0:1, :], s, _NEG_INF)
        p = jnp.exp2(s - lse)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [bq, bk]
        ds = (p * (dp - delta)).astype(q.dtype)
        # kv edge: garbage k COLUMNS of ds and garbage k ROWS would
        # contaminate the contraction — zero BOTH operands (0*NaN = NaN)
        if nk % block_k:
            vc = _valid_cols(ds.shape[0], ds.shape[1], jk, block_k, nk)
            ds = jnp.where(vc, ds, 0).astype(ds.dtype)
            vr = jk * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (k.shape[0], 1), 0) < nk
            k = jnp.where(vr, k.astype(jnp.float32), 0).astype(k.dtype)
        dqs.append(jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ))  # [bq, c]
    dq_part = jnp.concatenate(dqs, axis=1)  # [bq, gl]

    @pl.when(jk == 0)
    def _init():
        acc_ref[...] = dq_part

    @pl.when(jk > 0)
    def _acc():
        acc_ref[...] += dq_part

    @pl.when(jk == nsteps - 1)
    def _flush():
        dq_ref[0] = (acc_ref[...] * scale).astype(dq_ref.dtype)


def _dkv_tm_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, *rest,
                   scale, heads, hdim, nsteps, nq, block_q):
    if len(rest) == 4:
        mask_ref, dk_ref, dv_ref, acc_ref = rest
    else:
        mask_ref, (dk_ref, dv_ref, acc_ref) = None, rest
    iq = pl.program_id(3)
    dks, dvs = [], []
    for h in range(heads):
        sl = slice(h * hdim, (h + 1) * hdim)
        q = (q_ref[0][:, sl].astype(jnp.float32) * (scale * _LOG2E)).astype(q_ref.dtype)
        k = k_ref[0][:, sl]               # [bk, c]
        v = v_ref[0][:, sl]
        do = do_ref[0][:, sl]             # [bq, c]
        lse = lse_ref[0, 0][:, h][None, :]      # [1, bq]
        delta = delta_ref[0, 0][:, h][None, :]  # [1, bq]
        # q edge: q/do edge rows are undefined memory — zero the ROWS and
        # later the score COLUMNS built from them (both contraction
        # operands, 0*NaN = NaN)
        edge = nq % block_q
        if edge:
            vr = iq * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (q.shape[0], 1), 0) < nq
            q = jnp.where(vr, q.astype(jnp.float32), 0).astype(q.dtype)
            do = jnp.where(vr, do.astype(jnp.float32), 0).astype(do.dtype)
        st = jax.lax.dot_general(
            k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [bk, bq]
        if mask_ref is not None:
            st = jnp.where(mask_ref[0][:, 0:1], st, _NEG_INF)
        pt = jnp.exp2(st - lse)
        dpt = jax.lax.dot_general(
            v, do, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [bk, bq]
        dst = pt * (dpt - delta)
        if edge:
            vc = _valid_cols(pt.shape[0], pt.shape[1], iq, block_q, nq)
            pt = jnp.where(vc, pt, 0)     # lse/delta edge lanes are garbage
            dst = jnp.where(vc, dst, 0)
        dvs.append(jax.lax.dot_general(
            pt.astype(do.dtype), do, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))
        dks.append(jax.lax.dot_general(
            dst.astype(q.dtype), q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * (1.0 / _LOG2E))
    part = jnp.concatenate(
        [jnp.concatenate(dks, axis=1), jnp.concatenate(dvs, axis=1)], axis=1
    )  # [bk, 2*gl]: dk | dv

    @pl.when(iq == 0)
    def _init():
        acc_ref[...] = part

    @pl.when(iq > 0)
    def _acc():
        acc_ref[...] += part

    gl = part.shape[1] // 2

    @pl.when(iq == nsteps - 1)
    def _flush():
        dk_ref[0] = acc_ref[:, :gl].astype(dk_ref.dtype)
        dv_ref[0] = acc_ref[:, gl:].astype(dv_ref.dtype)


def _bwd_tm_tiled(qkv, mask, do, lse_g, delta_g, scale, heads, hdim, hs,
                  bq, bk, interpret):
    """Dual-tiled bwd: dq kernel (outer q blocks, inner kv sweep) + dkv
    kernel (outer kv blocks, inner q sweep). All operand blocks ride the
    grid via BlockSpecs (Pallas pipelines the DMAs); accumulators live in
    VMEM scratch and flush on the last inner step."""
    b, n, w3 = qkv.shape
    hc = w3 // 3
    hg, gl = heads // hs, hc // hs
    nq_steps, nk_steps = _cdiv(n, bq), _cdiv(n, bk)
    dtype = qkv.dtype

    qspec = pl.BlockSpec((1, bq, gl), lambda b_, g, i, j: (b_, i, g),
                         memory_space=pltpu.VMEM)
    kvspec = lambda s: pl.BlockSpec(
        (1, bk, gl), lambda b_, g, i, j, s=s: (b_, j, s * hs + g),
        memory_space=pltpu.VMEM)
    hspec = pl.BlockSpec((1, 1, bq, hg), lambda b_, g, i, j: (b_, g, i, 0),
                         memory_space=pltpu.VMEM)
    in_specs = [qspec, kvspec(1), kvspec(2), qspec, hspec, hspec]
    args = [qkv, qkv, qkv, do, lse_g, delta_g]
    if mask is not None:
        in_specs.append(
            pl.BlockSpec((1, _SUBLANES, bk), lambda b_, g, i, j: (b_, 0, j),
                         memory_space=pltpu.VMEM))
        args.append(mask)
    dq = pl.pallas_call(
        functools.partial(_dq_tm_kernel, scale=scale, heads=hg, hdim=hdim,
                          nsteps=nk_steps, nk=n, block_k=bk),
        grid=(b, hs, nq_steps, nk_steps),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, bq, gl), lambda b_, g, i, j: (b_, i, g),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, hc), dtype),
        scratch_shapes=[pltpu.VMEM((bq, gl), jnp.float32)],
        interpret=interpret,
    )(*args)

    qspec2 = pl.BlockSpec((1, bq, gl), lambda b_, g, j, i: (b_, i, g),
                          memory_space=pltpu.VMEM)
    kvspec2 = lambda s: pl.BlockSpec(
        (1, bk, gl), lambda b_, g, j, i, s=s: (b_, j, s * hs + g),
        memory_space=pltpu.VMEM)
    hspec2 = pl.BlockSpec((1, 1, bq, hg), lambda b_, g, j, i: (b_, g, i, 0),
                          memory_space=pltpu.VMEM)
    in_specs = [qspec2, kvspec2(1), kvspec2(2), qspec2, hspec2, hspec2]
    args = [qkv, qkv, qkv, do, lse_g, delta_g]
    if mask is not None:
        mask_col = jax.lax.broadcast_in_dim(
            mask[:, 0, :], (mask.shape[0], mask.shape[2], _LSE_LANES), (0, 1)
        )
        in_specs.append(
            pl.BlockSpec((1, bk, _LSE_LANES), lambda b_, g, j, i: (b_, j, 0),
                         memory_space=pltpu.VMEM))
        args.append(mask_col)
    kvspec_out = pl.BlockSpec((1, bk, gl), lambda b_, g, j, i: (b_, j, g),
                              memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_tm_kernel, scale=scale, heads=hg, hdim=hdim,
                          nsteps=nq_steps, nq=n, block_q=bq),
        grid=(b, hs, nk_steps, nq_steps),
        in_specs=in_specs,
        out_specs=[kvspec_out, kvspec_out],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, hc), dtype),
            jax.ShapeDtypeStruct((b, n, hc), dtype),
        ],
        scratch_shapes=[pltpu.VMEM((bk, 2 * gl), jnp.float32)],
        interpret=interpret,
    )(*args)
    return dq, dk, dv


def _project_qkv(x, w, bias):
    """x [B,N,D] @ w [D,3HC] + bias, fp32 accumulation, cast to x.dtype."""
    y = jnp.dot(x, w, preferred_element_type=jnp.float32)
    return (y + bias.astype(jnp.float32)).astype(x.dtype)


def _tm_fwd_core(x, w, bias, mask, meta, grad=False):
    return _fwd_tm(_project_qkv(x, w, bias), mask, meta, grad=grad)


def _tm_bwd_core(x, w, bias, mask, o, lse, do, meta):
    """Shared backward: recompute qkv (matches remat='attn' economics — only
    (o, lse) are saved across the scan), run the merged kernel, fold dq/dk/dv
    straight into the projection grads (no dqkv assembly: dx is three matmuls
    summed, dw/db concats are parameter-sized)."""
    b, n, d = x.shape
    hc = w.shape[1] // 3
    qkv = _project_qkv(x, w, bias)
    dq, dk, dv = _bwd_tm(qkv, mask, o, lse, do, meta)
    x2 = x.reshape(b * n, d)
    parts = []
    dx = None
    for i, g in enumerate((dq, dk, dv)):
        g2 = g.reshape(b * n, hc)
        ws = jax.lax.slice_in_dim(w, i * hc, (i + 1) * hc, axis=1)  # [D, HC]
        term = jax.lax.dot_general(
            g2, ws, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        dx = term if dx is None else dx + term
        parts.append(jax.lax.dot_general(
            x2, g2, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ))  # [D, HC]
    dw = jnp.concatenate(parts, axis=1).astype(w.dtype)
    db = jnp.concatenate(
        [jnp.sum(g.astype(jnp.float32), axis=(0, 1)) for g in (dq, dk, dv)]
    ).astype(bias.dtype)
    return dx.reshape(b, n, d).astype(x.dtype), dw, db


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _flash_tm(meta, x, w, bias):
    return _tm_fwd_core(x, w, bias, None, meta)


def _flash_tm_fwd(meta, x, w, bias):
    o, lse = _tm_fwd_core(x, w, bias, None, meta, grad=True)
    return (o, lse), (x, w, bias, o, lse)


def _flash_tm_bwd(meta, res, cts):
    x, w, bias, o, lse = res
    do, _ = cts
    return _tm_bwd_core(x, w, bias, None, o, lse, do, meta)


_flash_tm.defvjp(_flash_tm_fwd, _flash_tm_bwd, optimize_remat=True)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _flash_tm_masked(meta, x, w, bias, mask):
    return _tm_fwd_core(x, w, bias, mask, meta)


def _flash_tm_masked_fwd(meta, x, w, bias, mask):
    o, lse = _tm_fwd_core(x, w, bias, mask, meta, grad=True)
    return (o, lse), (x, w, bias, mask, o, lse)


def _flash_tm_masked_bwd(meta, res, cts):
    x, w, bias, mask, o, lse = res
    do, _ = cts
    dx, dw, db = _tm_bwd_core(x, w, bias, mask, o, lse, do, meta)
    dmask = np.zeros(mask.shape, dtype=jax.dtypes.float0)
    return dx, dw, db, dmask


_flash_tm_masked.defvjp(_flash_tm_masked_fwd, _flash_tm_masked_bwd,
                        optimize_remat=True)


# Save-qkv variants (default; JEPA_REMAT_SAVE_QKV=0 opts out): the projection
# runs OUTSIDE the custom_vjp as a plain matmul whose output is
# checkpoint_name'd "qkv_out"; with the matching remat policy the backward
# consumes the SAVED qkv instead of recomputing LN1 + the projection per
# layer (~20 ms/step at ViT-L b24 for ~3.7 GB extra HBM — BENCH.md round 4).
# Projection grads (dx, dw, db) fall out of XLA autodiff of the matmul; the
# kernel bwd returns one token-major dqkv so the matmul's transpose consumes
# it directly.


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _flash_tm_qkv(meta, qkv):
    return _fwd_tm(qkv, None, meta)


def _flash_tm_qkv_fwd(meta, qkv):
    o, lse = _fwd_tm(qkv, None, meta, grad=True)
    return (o, lse), (qkv, o, lse)


def _flash_tm_qkv_bwd(meta, res, cts):
    qkv, o, lse = res
    do, _ = cts
    dq, dk, dv = _bwd_tm(qkv, None, o, lse, do, meta)
    return (jnp.concatenate([dq, dk, dv], axis=-1).astype(qkv.dtype),)


_flash_tm_qkv.defvjp(_flash_tm_qkv_fwd, _flash_tm_qkv_bwd, optimize_remat=True)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _flash_tm_qkv_masked(meta, qkv, mask):
    return _fwd_tm(qkv, mask, meta)


def _flash_tm_qkv_masked_fwd(meta, qkv, mask):
    o, lse = _fwd_tm(qkv, mask, meta, grad=True)
    return (o, lse), (qkv, mask, o, lse)


def _flash_tm_qkv_masked_bwd(meta, res, cts):
    qkv, mask, o, lse = res
    do, _ = cts
    dq, dk, dv = _bwd_tm(qkv, mask, o, lse, do, meta)
    dmask = np.zeros(mask.shape, dtype=jax.dtypes.float0)
    return jnp.concatenate([dq, dk, dv], axis=-1).astype(qkv.dtype), dmask


_flash_tm_qkv_masked.defvjp(_flash_tm_qkv_masked_fwd, _flash_tm_qkv_masked_bwd,
                            optimize_remat=True)


def _remat_save_qkv() -> bool:
    """Save the qkv projection output across the remat boundary instead of
    recomputing it in the backward (see variants above). Default ON: exact
    (same math, different autodiff factorization — parity test
    tests/test_flash_attention.py::test_save_qkv_remat_matches_default) and
    measured 698.7 -> 679.0 ms/step on the fused ViT-L b24 pretrain step
    (46.1% MFU, BENCH.md round 4) for ~3.7 GB extra HBM at that shape.
    JEPA_REMAT_SAVE_QKV=0 restores the recompute-qkv path (less HBM)."""
    import os

    return os.environ.get("JEPA_REMAT_SAVE_QKV", "1") == "1"


def flash_self_attention(
    x: jnp.ndarray,
    w_qkv: jnp.ndarray,
    b_qkv: jnp.ndarray,
    num_heads: int,
    kv_mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Fused-projection flash self-attention: qkv projection + attention in
    one differentiable unit with NO layout changes anywhere.

    x: [B, N, D] (compute dtype); w_qkv: [D, 3*H*c] with torch-convention
    column order (q|k|v, each head-major — exactly our qkv_w layout);
    b_qkv: [3*H*c]. Returns o [B, N, H*c] token-major, the native input of
    the output projection.

    The qkv projection's natural token-major output feeds the kernels
    directly (the head-major packed path pays a ~2x relayout on the qkv
    fusion, round-2 xplane), and the backward folds the kernels' dq/dk/dv
    into dx/dw directly. The projection is recomputed in the backward; under
    remat='attn' only (o, lse) persist per layer, so total work matches the
    packed path while removing every transpose.
    """
    b, n, d = x.shape
    hc = w_qkv.shape[1] // 3
    assert hc % num_heads == 0, (w_qkv.shape, num_heads)
    head_dim = hc // num_heads
    if scale is None:
        scale = head_dim**-0.5
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    # zero-pad the head dim up to a multiple of 32 when that unlocks a
    # compiler-safe split (e.g. predictor c=24 -> 32, hc 384 -> 512). Exact:
    # pad weight columns are zero, so pad q/k/v lanes, o lanes, and all pad
    # grads are identically zero; the o pad lanes are sliced off below (a
    # differentiable slice, so dw/db flow back through the pad correctly).
    cp = head_dim
    pf = _pick_tm_fwd(num_heads, cp, n)
    pb = _pick_tm_bwd(num_heads, cp, n)
    if (pf is None or pb is None) and head_dim % 32:
        cp = _round_up(head_dim, 32)
        pf = _pick_tm_fwd(num_heads, cp, n)
        pb = _pick_tm_bwd(num_heads, cp, n)
    if n > _MAX_NK or pf is None or pb is None:
        # fall back to the head-major packed kernels (one relayout) or XLA.
        # Beyond _PACKED_SAFE_N the packed bwd Mosaic-crashes (measured:
        # N=4608/c=80 HTTP-500s the remote compiler,
        # scripts/bench_vith384_train_attn.py round 5) — go straight to XLA.
        qkv = _project_qkv(x, w_qkv, b_qkv)
        t = jnp.transpose(
            qkv.reshape(b, n, 3, num_heads, head_dim), (2, 0, 3, 1, 4)
        )  # [3, B, H, N, c]
        if n > _MAX_NK or n > _PACKED_SAFE_N:
            from jepa_tpu.ops.attention import xla_attention

            o = xla_attention(
                jnp.transpose(t[0], (0, 2, 1, 3)),
                jnp.transpose(t[1], (0, 2, 1, 3)),
                jnp.transpose(t[2], (0, 2, 1, 3)),
                kv_mask=kv_mask, scale=scale,
            )
            return o.reshape(b, n, hc)
        o = flash_attention_packed(t, kv_mask=kv_mask, scale=scale,
                                   interpret=interpret)
        return jnp.transpose(o, (0, 2, 1, 3)).reshape(b, n, hc)

    w_eff, b_eff = w_qkv, b_qkv
    if cp != head_dim:
        pad = [(0, 0), (0, 0), (0, 0), (0, cp - head_dim)]
        w_eff = jnp.pad(w_qkv.reshape(d, 3, num_heads, head_dim), pad)
        w_eff = w_eff.reshape(d, 3 * num_heads * cp)
        b_eff = jnp.pad(
            b_qkv.reshape(3, num_heads, head_dim), pad[1:]
        ).reshape(3 * num_heads * cp)

    meta = (float(scale), num_heads, cp, pf, pb, bool(interpret))
    if _remat_save_qkv():
        # projection outside the custom_vjp, its output named for the remat
        # policy: the backward reads SAVED qkv instead of recomputing
        # LN1 + the projection (jepa_tpu.models.transformer policy)
        qkv = jax.ad_checkpoint.checkpoint_name(
            _project_qkv(x, w_eff, b_eff), "qkv_out"
        )
        if kv_mask is None:
            o, _ = _flash_tm_qkv(meta, qkv)
        else:
            mask = jax.lax.broadcast_in_dim(
                kv_mask.astype(bool), (b, _SUBLANES, n), (0, 2)
            )
            o, _ = _flash_tm_qkv_masked(meta, qkv, mask)
    elif kv_mask is None:
        o, _ = _flash_tm(meta, x, w_eff, b_eff)
    else:
        mask = jax.lax.broadcast_in_dim(
            kv_mask.astype(bool), (b, _SUBLANES, n), (0, 2)
        )
        o, _ = _flash_tm_masked(meta, x, w_eff, b_eff, mask)
    if cp != head_dim:
        o = o.reshape(b, n, num_heads, cp)[..., :head_dim].reshape(b, n, hc)
    return o.astype(x.dtype)


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
    """Flash attention, token-major convenience layout. q/k/v: [B, N, H, D];
    returns [B, Nq, H, D]. Transposes to/from the head-major kernel layout —
    hot paths should call :func:`flash_attention_bhnd` instead."""
    o = flash_attention_bhnd(
        jnp.transpose(q, (0, 2, 1, 3)),
        jnp.transpose(k, (0, 2, 1, 3)),
        jnp.transpose(v, (0, 2, 1, 3)),
        kv_mask=kv_mask,
        scale=scale,
        block_q=block_q,
        block_k=block_k,
        interpret=interpret,
    )
    return jnp.transpose(o, (0, 2, 1, 3))
