"""Pallas TPU flash attention (forward + backward), with key-validity mask.

Replaces cuDNN SDPA (reference: src/models/utils/modules.py:66-69) for the
hot self-attention over 1568-4608 video tokens. Design per the TPU kernel
playbook:

  * online-softmax forward: one grid step per (batch*head, q-block); full
    K/V for the head resident in VMEM (<= 4608x128 bf16 = 1.2MB each), the
    q-block streams k-chunks with a fori_loop carrying (m, l, acc) in fp32
  * logsumexp is saved for the backward pass (no O(N^2) residuals)
  * backward = two kernels: dQ over q-blocks, dK/dV over k-blocks, using
    the standard ds = p * (dp - delta) recurrence with delta = rowsum(dO*O)
    precomputed by XLA
  * head_dim is zero-padded to the 128-lane width outside the kernel
    (zeros are exact no-ops in QK^T and P@V); sequence padding rides the
    same kv-mask used for padded-parity masking
  * Mosaic layout rules: the kv-mask is broadcast to 8 sublanes
    [B, 8, Nk] and lse/delta carry a 128-lane axis [BH, Nq, 128] so every
    block shape tiles (8, 128)
  * all matmuls run on the MXU with fp32 accumulation

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
_LANES = 128
_SUBLANES = 8
# 512/512 won the on-chip sweep at V-JEPA shapes (1568-2048 tokens):
# bigger tiles beat lower k-padding; 128-blocks lose 2.3x to loop overhead.
DEFAULT_BLOCK_Q = 512
DEFAULT_BLOCK_K = 512


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref, *, scale, block_k):
    q = q_ref[0].astype(jnp.float32)  # [bq, d]
    bq, d = q.shape
    kv_len = k_ref.shape[1]
    nk = kv_len // block_k

    def body(i, carry):
        m_prev, l_prev, acc = carry  # [bq,1], [bq,1], [bq,d]
        k = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # [bq, bk]
        mask = mask_ref[0, 0:1, pl.ds(i * block_k, block_k)]  # [1, bk]
        s = jnp.where(mask, s, _NEG_INF)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return m_new, l_new, acc

    m0 = jnp.full((bq, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc0 = jnp.zeros((bq, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, nk, body, (m0, l0, acc0))
    l_safe = jnp.maximum(l, 1e-30)
    o_ref[0] = (acc / l_safe).astype(o_ref.dtype)
    lse = (m + jnp.log(l_safe))[:, 0]  # [bq]
    lse_ref[0] = jax.lax.broadcast_in_dim(lse, (bq, _LANES), (0,))


def _fwd(q, k, v, mask, scale, block_q, block_k, interpret, num_heads):
    """q,k,v: [BH, N, D] padded; mask: [B, 8, Nk]. -> (o, lse[BH, Nq, 128])."""
    bh, nq, d = q.shape
    nk = k.shape[1]
    h = num_heads
    grid = (bh, nq // block_q)
    o, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, block_k=block_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _SUBLANES, nk), lambda b, i: (b // h, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, _LANES), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, nq, d), q.dtype),
            jax.ShapeDtypeStruct((bh, nq, _LANES), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, mask)
    return o, lse


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _dq_kernel(q_ref, k_ref, v_ref, mask_ref, do_ref, lse_ref, delta_ref, dq_ref,
               *, scale, block_k):
    q = q_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0][:, 0:1]  # [bq, 1]
    delta = delta_ref[0][:, 0:1]
    kv_len = k_ref.shape[1]
    nk = kv_len // block_k

    def body(i, dq):
        k = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        mask = mask_ref[0, 0:1, pl.ds(i * block_k, block_k)]
        s = jnp.where(mask, s, _NEG_INF)
        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta) * scale
        return dq + jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)

    dq = jax.lax.fori_loop(0, nk, body, jnp.zeros_like(q))
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _dkv_kernel(q_ref, k_ref, v_ref, mask_ref, do_ref, lse_ref, delta_ref,
                dk_ref, dv_ref, *, scale, block_q):
    k = k_ref[0].astype(jnp.float32)  # [bk, d]
    v = v_ref[0].astype(jnp.float32)
    mask = mask_ref[0, 0:1, :]  # [1, bk]
    q_len = q_ref.shape[1]
    nq = q_len // block_q

    def body(i, carry):
        dk, dv = carry
        q = q_ref[0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        do = do_ref[0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        lse = lse_ref[0, pl.ds(i * block_q, block_q), 0:1]  # [bq, 1]
        delta = delta_ref[0, pl.ds(i * block_q, block_q), 0:1]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale  # [bq, bk]
        s = jnp.where(mask, s, _NEG_INF)
        p = jnp.exp(s - lse)
        dv = dv + jax.lax.dot_general(p, do, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta) * scale
        dk = dk + jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        return dk, dv

    dk, dv = jax.lax.fori_loop(0, nq, body, (jnp.zeros_like(k), jnp.zeros_like(v)))
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _bwd(q, k, v, mask, o, lse, do, scale, block_q, block_k, interpret, num_heads):
    bh, nq, d = q.shape
    nk = k.shape[1]
    h = num_heads
    delta_vec = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    delta = jax.lax.broadcast_in_dim(delta_vec, (bh, nq, _LANES), (0, 1))

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale, block_k=block_k),
        grid=(bh, nq // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _SUBLANES, nk), lambda b, i: (b // h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, _LANES), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, _LANES), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, nq, d), q.dtype),
        interpret=interpret,
    )(q, k, v, mask, do, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale, block_q=block_q),
        grid=(bh, nk // block_k),
        in_specs=[
            pl.BlockSpec((1, nq, d), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _SUBLANES, block_k), lambda b, j: (b // h, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nq, d), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nq, _LANES), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nq, _LANES), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, d), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, nk, d), k.dtype),
            jax.ShapeDtypeStruct((bh, nk, d), v.dtype),
        ],
        interpret=interpret,
    )(q, k, v, mask, do, lse, delta)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# public wrapper (padding + custom VJP)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _flash(q, k, v, mask, scale, block_q, block_k, interpret, num_heads):
    o, _ = _fwd(q, k, v, mask, scale, block_q, block_k, interpret, num_heads)
    return o


def _flash_fwd(q, k, v, mask, scale, block_q, block_k, interpret, num_heads):
    o, lse = _fwd(q, k, v, mask, scale, block_q, block_k, interpret, num_heads)
    return o, (q, k, v, mask, o, lse)


def _flash_bwd(scale, block_q, block_k, interpret, num_heads, res, do):
    q, k, v, mask, o, lse = res
    dq, dk, dv = _bwd(q, k, v, mask, o, lse, do, scale, block_q, block_k, interpret, num_heads)
    dmask = np.zeros(mask.shape, dtype=jax.dtypes.float0)
    return dq, dk, dv, dmask


_flash.defvjp(_flash_fwd, _flash_bwd)


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
    valid key). Returns [B, Nq, H, D] in q's dtype."""
    b, nq, h, d = q.shape
    nk = k.shape[1]
    if scale is None:
        scale = d**-0.5
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    block_q = min(block_q, _round_up(nq, 128))
    block_k = min(block_k, _round_up(nk, 128))
    nq_pad = _round_up(nq, block_q)
    nk_pad = _round_up(nk, block_k)
    d_pad = _round_up(d, 128)

    def to_bh(x, n_pad):
        # rows laid out batch-major, heads fastest: row index = b*h + head
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, x.shape[1], d)
        return jnp.pad(x, ((0, 0), (0, n_pad - x.shape[1]), (0, d_pad - d)))

    qp = to_bh(q, nq_pad)
    kp = to_bh(k, nk_pad)
    vp = to_bh(v, nk_pad)

    if kv_mask is None:
        mask = jnp.ones((b, nk), bool)
    else:
        mask = kv_mask.astype(bool)
    mask = jnp.pad(mask, ((0, 0), (0, nk_pad - nk)))
    mask = jax.lax.broadcast_in_dim(mask, (b, _SUBLANES, nk_pad), (0, 2))

    o = _flash(qp, kp, vp, mask, float(scale), int(block_q), int(block_k),
               bool(interpret), int(h))
    o = o[:, :nq, :d_pad][:, :, :d].reshape(b, h, nq, d).transpose(0, 2, 1, 3)
    return o.astype(v.dtype)
