"""Mosaic compile-envelope probe for the dual-tiled tm backward at the
vith16_384 train geometry (c=96 padded, N=4608). Each invocation compiles
ONE kernel so HTTP-500 crashes are attributable:

  python scripts/probe_tiled_bwd.py fwd          # tm fwd (round-4 validated)
  python scripts/probe_tiled_bwd.py dq  [blk]    # dq kernel alone
  python scripts/probe_tiled_bwd.py dkv [blk]    # dkv kernel alone
  python scripts/probe_tiled_bwd.py both [blk]   # full _bwd_tm via grad
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import functools

import jax
import jax.numpy as jnp

import jepa_tpu.ops.flash_attention as fa

B, H, C, N = 1, 16, 96, 4608
HC = H * C
MODE = sys.argv[1] if len(sys.argv) > 1 else "both"
BLK = int(sys.argv[2]) if len(sys.argv) > 2 else 256
S = 4  # head split -> hg=4, gl=384


def main():
    print(f"probe {MODE} blk={BLK}: B={B} H={H} c={C} N={N}", flush=True)
    qkv = jax.random.normal(jax.random.PRNGKey(0), (B, N, 3 * HC), jnp.bfloat16)
    do = jax.random.normal(jax.random.PRNGKey(1), (B, N, HC), jnp.bfloat16)
    scale = 80 ** -0.5

    if MODE in ("fwd", "fwd_oneshot"):
        if MODE == "fwd":
            pfs = fa._pick_tm_fwd(H, C, N)  # (primal, grad) pair
        else:  # the legacy full-kv-plane kernel, for A/B against tiled
            p = fa._pick_tm_params(H, C, N, fwd=True)
            pfs = (("one",) + p,) * 2
        print("fwd mode:", pfs, flush=True)
        meta = (scale, H, C, pfs, ("tiled", S, BLK, BLK), False)
        import time
        f = jax.jit(lambda q: fa._fwd_tm(q, None, meta))
        o, lse = f(qkv)
        jax.block_until_ready(o)
        t0 = time.perf_counter()
        for i in range(8):
            o, lse = f(qkv + jnp.bfloat16(i * 1e-3))
        jax.block_until_ready(o)
        print(f"FWD_OK {o.shape} {lse.shape} "
              f"{(time.perf_counter()-t0)/8*1e3:.2f} ms/iter", flush=True)
        return

    hg, gl = H // S, HC // S
    lse_g = jax.random.normal(jax.random.PRNGKey(2), (B, S, N, hg), jnp.float32) + 8.0
    delta_g = jax.random.normal(jax.random.PRNGKey(3), (B, S, N, hg), jnp.float32)

    if MODE in ("dq", "dkv"):
        import jax.experimental.pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        bq = bk = BLK
        nq_steps = nk_steps = N // BLK
        if MODE == "dq":
            qspec = pl.BlockSpec((1, bq, gl), lambda b_, g, i, j: (b_, i, g),
                                 memory_space=pltpu.VMEM)
            kvspec = lambda s: pl.BlockSpec(
                (1, bk, gl), lambda b_, g, i, j, s=s: (b_, j, s * S + g),
                memory_space=pltpu.VMEM)
            hspec = pl.BlockSpec((1, 1, bq, hg), lambda b_, g, i, j: (b_, g, i, 0),
                                 memory_space=pltpu.VMEM)
            out = pl.pallas_call(
                functools.partial(fa._dq_tm_kernel, scale=scale, heads=hg,
                                  hdim=C, nsteps=nk_steps, nk=N, block_k=bk),
                grid=(B, S, nq_steps, nk_steps),
                in_specs=[qspec, kvspec(1), kvspec(2), qspec, hspec, hspec],
                out_specs=pl.BlockSpec((1, bq, gl), lambda b_, g, i, j: (b_, i, g),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((B, N, HC), qkv.dtype),
                scratch_shapes=[pltpu.VMEM((bq, gl), jnp.float32)],
            )
            r = jax.jit(lambda *a: out(*a))(qkv, qkv, qkv, do, lse_g, delta_g)
            jax.block_until_ready(r)
            print("DQ_OK", r.shape, flush=True)
        else:
            qspec2 = pl.BlockSpec((1, bq, gl), lambda b_, g, j, i: (b_, i, g),
                                  memory_space=pltpu.VMEM)
            kvspec2 = lambda s: pl.BlockSpec(
                (1, bk, gl), lambda b_, g, j, i, s=s: (b_, j, s * S + g),
                memory_space=pltpu.VMEM)
            hspec2 = pl.BlockSpec((1, 1, bq, hg), lambda b_, g, j, i: (b_, g, i, 0),
                                  memory_space=pltpu.VMEM)
            kvspec_out = pl.BlockSpec((1, bk, gl), lambda b_, g, j, i: (b_, j, g),
                                      memory_space=pltpu.VMEM)
            out = pl.pallas_call(
                functools.partial(fa._dkv_tm_kernel, scale=scale, heads=hg,
                                  hdim=C, nsteps=nq_steps, nq=N, block_q=bq),
                grid=(B, S, nk_steps, nq_steps),
                in_specs=[qspec2, kvspec2(1), kvspec2(2), qspec2, hspec2, hspec2],
                out_specs=[kvspec_out, kvspec_out],
                out_shape=[jax.ShapeDtypeStruct((B, N, HC), qkv.dtype)] * 2,
                scratch_shapes=[pltpu.VMEM((bk, 2 * gl), jnp.float32)],
            )
            r = jax.jit(lambda *a: out(*a))(qkv, qkv, qkv, do, lse_g, delta_g)
            jax.block_until_ready(r)
            print("DKV_OK", r[0].shape, flush=True)
        return

    # both: full custom_vjp grad at the real geometry
    pfs = fa._pick_tm_fwd(H, C, N)  # (primal, grad) pair
    print("fwd mode:", pfs, flush=True)
    meta = (scale, H, C, pfs, ("tiled", S, BLK, BLK), False)
    x = jax.random.normal(jax.random.PRNGKey(4), (B, N, 1280), jnp.bfloat16)
    w = (jax.random.normal(jax.random.PRNGKey(5), (1280, 3 * HC), jnp.float32)
         * 0.02).astype(jnp.bfloat16)
    bias = jnp.zeros((3 * HC,), jnp.bfloat16)

    def loss(x, w, bias):
        o, _ = fa._flash_tm(meta, x, w, bias)
        return jnp.sum(o.astype(jnp.float32))

    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(x, w, bias)
    jax.block_until_ready(g)
    print("BOTH_OK |dx|=", float(jnp.abs(g[0].astype(jnp.float32)).mean()),
          flush=True)


if __name__ == "__main__":
    main()
