"""Sweep (head_split, block) variants of the token-major flash kernels at
the predictor/encoder production shapes and print device-side ms — finds
whether smaller blocks (more concurrent per-head temps) buy cross-unit
overlap that the default largest-block pick leaves on the table.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/bench_tm_variants.py
"""

from __future__ import annotations

import glob
import os
import shutil

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from jepa_tpu.ops import flash_attention as fa  # noqa: E402

TRACE_DIR = "/tmp/jepa_tmv_xplane"
ITERS = 4


def device_ms(fn, *args):
    f = jax.jit(fn)
    o = f(*args)
    jax.block_until_ready(o)
    shutil.rmtree(TRACE_DIR, ignore_errors=True)
    with jax.profiler.trace(TRACE_DIR):
        for i in range(ITERS):
            o = f(args[0] + jnp.bfloat16(1e-3 * (i + 1)), *args[1:])
        jax.block_until_ready(o)
    paths = sorted(glob.glob(os.path.join(TRACE_DIR, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    data = jax.profiler.ProfileData.from_serialized_xspace(open(paths[-1], "rb").read())
    total = 0.0
    for plane in data.planes:
        if "TPU" not in plane.name:
            continue
        for line in plane.lines:
            if line.name == "XLA Ops":
                for ev in line.events:
                    total += ev.duration_ns / 1e6
    return total / ITERS


def main():
    orig_pick = fa._pick_tm_params

    for name, b, h, c, n, fwd_vars, bwd_vars in [
        # (hs, blk) fwd variants; (hs, blk) bwd variants — None = default
        # every variant checked against the validated Mosaic envelope
        # (hg*blk ceilings, 128-multiple group lanes, 8-multiple blocks)
        ("predictor", 24, 16, 24, 1191,
         [None, (2, 160), (2, 128), (4, 256), (4, 128)],
         [None, (2, 128), (4, 128), (4, 64), (2, 64)]),
        ("encoder", 24, 16, 64, 1568,
         [None, (2, 208), (8, 128), (4, 208)],
         [None, (4, 104), (8, 104), (4, 64), (8, 208)]),
    ]:
        d = h * c
        kx, kw = jax.random.split(jax.random.PRNGKey(0))
        x = jax.random.normal(kx, (b, n, d), jnp.bfloat16)
        w = (jax.random.normal(kw, (d, 3 * d), jnp.float32) * 0.02).astype(jnp.bfloat16)
        bias = jnp.zeros((3 * d,), jnp.float32)

        def make_fns():
            # fresh function objects per variant: jax caches traced jaxprs
            # by function identity, which would otherwise reuse the FIRST
            # variant's trace and ignore the patched picker
            def fwd_only(x):
                return fa.flash_self_attention(x, w, bias, h)

            def fb(x):
                def loss(x):
                    return jnp.sum(
                        fa.flash_self_attention(x, w, bias, h).astype(jnp.float32) ** 2
                    )
                return jax.grad(loss)(x)

            return fwd_only, fb

        print(f"== {name}: B={b} H={h} c={c} N={n}", flush=True)
        base = None
        for fv in fwd_vars:
            def pick(heads, hdim, nn, fwd, _fv=fv):
                # only override the padded/legal head-dim call; the c=24
                # probe call must keep returning None so padding happens
                if fwd and _fv is not None and hdim % 32 == 0:
                    return _fv
                return orig_pick(heads, hdim, nn, fwd)
            fa._pick_tm_params = pick
            try:
                fwd_only, _ = make_fns()
                ms = device_ms(fwd_only, x)
                print(f"  fwd {fv or 'default'}: {ms:7.2f} ms", flush=True)
            except Exception as e:
                print(f"  fwd {fv}: FAILED {type(e).__name__} {str(e)[:80]}", flush=True)
        for bv in bwd_vars:
            def pick(heads, hdim, nn, fwd, _bv=bv):
                if not fwd and _bv is not None and hdim % 32 == 0:
                    return _bv
                return orig_pick(heads, hdim, nn, fwd)
            fa._pick_tm_params = pick
            try:
                _, fb = make_fns()
                ms = device_ms(fb, x)
                print(f"  f+b {bv or 'default'}: {ms:7.2f} ms", flush=True)
            except Exception as e:
                print(f"  f+b {bv}: FAILED {type(e).__name__} {str(e)[:80]}", flush=True)
        fa._pick_tm_params = orig_pick


if __name__ == "__main__":
    main()
