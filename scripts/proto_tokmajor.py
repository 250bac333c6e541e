"""Prototype: alternative flash-attention layouts/blockings vs the current
head-major packed kernel.

Variants under test (round-2 xplane: target encoder qkv-pack fusion
2.47 ms/layer vs ~1.2 ms matmul floor; flash fwd 3.85 ms vs ~2.45 MXU
floor):
  tm : token-major [B, N, 3*H*c] operands (the fused qkv matmul's NATIVE
       output — kills the head-major relayout), head loop unrolled inside
       the kernel. Output assembled bf16 and stored once (per-head
       partial-lane stores blow the VMEM stack: measured 45M).
  hg2: current packed head-major layout, but TWO heads per kernel
       invocation — tests whether Mosaic overlaps head 0's VPU softmax
       with head 1's MXU matmuls.

Run on TPU: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/proto_tokmajor.py
"""

from __future__ import annotations

import functools
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

_LOG2E = 1.4426950408889634


# --------------------------------------------------------------------------
# variant tm: token-major, in-kernel head loop
# --------------------------------------------------------------------------


def _fwd_tm_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, heads, hdim):
    q = q_ref[0]  # [bq, H*c]
    k = k_ref[0]  # [nk, H*c]
    v = v_ref[0]
    outs = []
    for h in range(heads):
        sl = slice(h * hdim, (h + 1) * hdim)
        qh = (q[:, sl].astype(jnp.float32) * (scale * _LOG2E)).astype(q.dtype)
        s = jax.lax.dot_general(
            qh, k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        outs.append((o / jnp.maximum(l, 1e-30)).astype(o_ref.dtype))
    o_ref[0] = jnp.concatenate(outs, axis=1)


def flash_tm_fwd(qkv, heads, hdim, scale=None, block_q=208, head_split=1):
    """qkv: [B, N, 3*H*c] token-major (q|k|v column blocks, each h-major).
    Returns o [B, N, H*c]. ``head_split`` > 1 adds a grid dim over head
    groups (the Mosaic compiler crashes on 16 unrolled heads at N>=1152)."""
    b, n, w3 = qkv.shape
    hc = heads * hdim
    assert w3 == 3 * hc
    assert heads % head_split == 0 and hc % head_split == 0
    hg = heads // head_split          # heads per kernel invocation
    gl = hc // head_split             # lanes per head group
    assert gl % 128 == 0
    if scale is None:
        scale = hdim**-0.5
    n128 = ((n + 127) // 128) * 128
    bq = n128
    for kk in range(1, 65):
        if n128 % kk == 0 and (n128 // kk) % 8 == 0 and n128 // kk <= block_q:
            bq = n128 // kk
            break
    grid = (b, head_split, (n + bq - 1) // bq)
    hs = head_split
    qspec = pl.BlockSpec((1, bq, gl), lambda b_, g, i: (b_, i, g),
                         memory_space=pltpu.VMEM)
    kvspec = lambda s: pl.BlockSpec(
        (1, n, gl), lambda b_, g, i, s=s: (b_, 0, s * hs + g),
        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fwd_tm_kernel, scale=scale, heads=hg, hdim=hdim),
        grid=grid,
        in_specs=[qspec, kvspec(1), kvspec(2)],
        out_specs=pl.BlockSpec((1, bq, gl), lambda b_, g, i: (b_, i, g),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, hc), qkv.dtype),
        interpret=jax.default_backend() == "cpu",
    )(qkv, qkv, qkv)


# --------------------------------------------------------------------------
# variant hg2: packed head-major, 2 heads per invocation
# --------------------------------------------------------------------------


def _fwd_hg_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, hgroup):
    for h in range(hgroup):
        q = (q_ref[0, 0, h].astype(jnp.float32) * (scale * _LOG2E)).astype(q_ref.dtype)
        k = k_ref[0, 0, h]
        v = v_ref[0, 0, h]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, 0, h] = (o / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def flash_hg_fwd(qkv, hgroup=2, scale=None, block_q=416):
    """qkv packed head-major [3, B, H, N, c]; ``hgroup`` heads per kernel
    invocation (unrolled) for cross-head MXU/VPU overlap."""
    _, b, h, n, c = qkv.shape
    if scale is None:
        scale = c**-0.5
    n128 = ((n + 127) // 128) * 128
    bq = n128
    for kk in range(1, 65):
        if n128 % kk == 0 and (n128 // kk) % 8 == 0 and n128 // kk <= block_q:
            bq = n128 // kk
            break
    grid = (b, h // hgroup, (n + bq - 1) // bq)
    qspec = pl.BlockSpec((1, 1, hgroup, bq, c), lambda b_, g, i: (0, b_, g, i, 0),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, 1, hgroup, n, c), lambda b_, g, i: (1, b_, g, 0, 0),
                         memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((1, 1, hgroup, n, c), lambda b_, g, i: (2, b_, g, 0, 0),
                         memory_space=pltpu.VMEM)
    o = pl.pallas_call(
        functools.partial(_fwd_hg_kernel, scale=scale, hgroup=hgroup),
        grid=grid,
        in_specs=[qspec, kspec, vspec],
        out_specs=pl.BlockSpec((1, 1, hgroup, bq, c),
                               lambda b_, g, i: (0, b_, g, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, b, h, n, c), qkv.dtype),
        interpret=jax.default_backend() == "cpu",
    )(qkv, qkv, qkv)
    return o[0]


def timeit(fn, args, iters=10, label=""):
    try:
        out = fn(*args)
        _ = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        t0 = time.perf_counter()
        for i in range(iters):
            a0 = args[0] + jnp.bfloat16(1e-3 * (i + 1))
            out = fn(a0, *args[1:])
        _ = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        dt = (time.perf_counter() - t0) / iters * 1000
        print(f"  {label:48s} {dt:8.2f} ms", flush=True)
        return dt
    except Exception as e:
        print(f"  {label:48s} FAILED: {str(e).splitlines()[0][:120]}", flush=True)
        return None


def main():
    from jepa_tpu.ops.flash_attention import flash_attention_packed

    for name, b, h, c, n in [
        ("encoder full", 24, 16, 64, 1568),
        ("predictor long", 24, 16, 24, 1191),
        ("enc ctx short", 24, 16, 64, 376),
    ]:
        d = h * c
        print(f"== {name}: B={b} H={h} c={c} N={n}  (D={d})", flush=True)
        kx, kw, kp = jax.random.split(jax.random.PRNGKey(0), 3)
        x = jax.random.normal(kx, (b, n, d), jnp.bfloat16)
        wqkv = jax.random.normal(kw, (d, 3 * d), jnp.bfloat16) * 0.02
        wproj = jax.random.normal(kp, (d, d), jnp.bfloat16) * 0.02

        def cur(x):
            w = wqkv.reshape(d, 3, h, c)
            qkv = jnp.einsum("bnd,dshc->sbhnc", x, w,
                             preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            o = flash_attention_packed(qkv)  # [B,H,N,c]
            wp = wproj.reshape(h, c, d)
            return jnp.einsum("bhnc,hcd->bnd", o, wp,
                              preferred_element_type=jnp.float32).astype(jnp.bfloat16)

        def tm(x):
            qkv = jnp.dot(x, wqkv, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            o = flash_tm_fwd(qkv, h, c)  # [B,N,D]
            return jnp.dot(o, wproj, preferred_element_type=jnp.float32).astype(jnp.bfloat16)

        def hg(x, hgroup):
            w = wqkv.reshape(d, 3, h, c)
            qkv = jnp.einsum("bnd,dshc->sbhnc", x, w,
                             preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            o = flash_hg_fwd(qkv, hgroup=hgroup)
            wp = wproj.reshape(h, c, d)
            return jnp.einsum("bhnc,hcd->bnd", o, wp,
                              preferred_element_type=jnp.float32).astype(jnp.bfloat16)

        a = jax.jit(cur)(x)
        for lbl, f in [("tm", jax.jit(tm)), ("hg2", jax.jit(lambda x: hg(x, 2)))]:
            try:
                bb = f(x)
                err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - bb.astype(jnp.float32))))
                print(f"  max |cur - {lbl}| = {err:.2e}", flush=True)
            except Exception as e:
                print(f"  {lbl} correctness FAILED: {str(e).splitlines()[0][:120]}", flush=True)

        timeit(jax.jit(cur), (x,), label="current: einsum-pack + packed kernel + einsum")
        timeit(jax.jit(tm), (x,), label="tm:      matmul + tok-major kernel + matmul")
        timeit(jax.jit(lambda x: hg(x, 2)), (x,), label="hg2:     einsum-pack + 2-head kernel + einsum")
        timeit(jax.jit(lambda x: hg(x, 4)), (x,), label="hg4:     einsum-pack + 4-head kernel + einsum")


if __name__ == "__main__":
    main()


# --------------------------------------------------------------------------
# variant tm backward: merged dQ/dK/dV, k-blocked, in-kernel head loop
# --------------------------------------------------------------------------


def _bwd_tm_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                   dqkv_ref, acc_ref, *, scale, heads, hdim, nsteps, nk, block_k):
    jk = pl.program_id(2)
    dqs = []
    for h in range(heads):
        sl = slice(h * hdim, (h + 1) * hdim)
        q = (q_ref[0][:, sl].astype(jnp.float32) * (scale * _LOG2E)).astype(q_ref.dtype)
        k = k_ref[0][:, sl]       # [bk, c]
        v = v_ref[0][:, sl]
        do = do_ref[0][:, sl]     # [nq, c]
        lse = lse_ref[0][:, h][None, :]      # [1, nq] base-2 units
        delta = delta_ref[0][:, h][None, :]  # [1, nq]
        st = jax.lax.dot_general(
            k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [bk, nq]
        pt = jnp.exp2(st - lse)
        dv = jax.lax.dot_general(
            pt.astype(do.dtype), do, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dpt = jax.lax.dot_general(
            v, do, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [bk, nq]
        dst = (pt * (dpt - delta)).astype(q.dtype)
        dk = jax.lax.dot_general(
            dst, q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dqkv_ref[0, :, 1, sl] = (dk * (1.0 / _LOG2E)).astype(dqkv_ref.dtype)
        dqkv_ref[0, :, 2, sl] = dv.astype(dqkv_ref.dtype)
        if nk % block_k:
            valid = jk * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (dst.shape[0], 1), 0
            ) < nk
            dst = jnp.where(valid, dst, 0).astype(dst.dtype)
            k = jnp.where(valid, k.astype(jnp.float32), 0).astype(k.dtype)
        dqs.append(jax.lax.dot_general(
            dst, k, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ))  # [nq, c]
    dq_part = jnp.concatenate(dqs, axis=1)  # [nq, gl]

    @pl.when(jk == 0)
    def _init():
        acc_ref[...] = dq_part

    @pl.when(jk > 0)
    def _acc():
        acc_ref[...] += dq_part

    @pl.when(jk == nsteps - 1)
    def _flush():
        dqkv_ref[0, :, 0, :] = (acc_ref[...] * scale).astype(dqkv_ref.dtype)


def flash_tm_bwd(qkv, o, lse, do, heads, hdim, scale=None, block_k=128,
                 head_split=1):
    """qkv [B,N,3,H*c] (4D view of token-major), o/do [B,N,H*c],
    lse [B,N,H] fp32 base-2. Returns dqkv [B,N,3,H*c]."""
    b, n, _, hc = qkv.shape
    assert hc == heads * hdim and heads % head_split == 0
    hg = heads // head_split
    gl = hc // head_split
    if scale is None:
        scale = hdim**-0.5
    delta = jnp.sum(
        do.astype(jnp.float32).reshape(b, n, heads, hdim)
        * o.astype(jnp.float32).reshape(b, n, heads, hdim), axis=-1
    )  # [B, N, H]
    n128 = ((n + 127) // 128) * 128
    bk = n128
    for kk in range(1, 129):
        if n128 % kk == 0 and (n128 // kk) % 8 == 0 and n128 // kk <= block_k:
            bk = n128 // kk
            break
    nsteps = (n + bk - 1) // bk
    hs = head_split
    fullspec = lambda s: pl.BlockSpec(
        (1, n, 1, gl), lambda b_, g, j, s=s: (b_, 0, s, g),
        memory_space=pltpu.VMEM)
    blkspec = lambda s: pl.BlockSpec(
        (1, bk, 1, gl), lambda b_, g, j, s=s: (b_, j, s, g),
        memory_space=pltpu.VMEM)
    dospec = pl.BlockSpec((1, n, gl), lambda b_, g, j: (b_, 0, g),
                          memory_space=pltpu.VMEM)
    hspec = pl.BlockSpec((1, n, hg), lambda b_, g, j: (b_, 0, g),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_bwd_tm_kernel, scale=scale, heads=hg, hdim=hdim,
                          nsteps=nsteps, nk=n, block_k=bk),
        grid=(b, hs, nsteps),
        in_specs=[fullspec(0), blkspec(1), blkspec(2), dospec, hspec, hspec],
        out_specs=pl.BlockSpec((1, n, 3, gl), lambda b_, g, j: (b_, 0, 0, g),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, 3, hc), qkv.dtype),
        scratch_shapes=[pltpu.VMEM((n, gl), jnp.float32)],
        interpret=jax.default_backend() == "cpu",
    )(qkv, qkv, qkv, do, lse, delta)
