"""Isolate the scan-bwd grad-stack DUS cost (BENCH.md round-3 target).

The fused step's backward writes per-layer dW into stacked [depth, ...]
fp32 buffers; the round-2 xplane showed those dynamic-update-slices running
at whole-buffer-copy cost (~30 ms/step). This microbench reproduces the
pattern in isolation — an fc1-shaped matmul per scan layer — and compares:

  scan        lax.scan over stacked weights (the production structure)
  scan_u2/u4  the same with unroll=2/4
  unrolled    a Python-loop over per-layer weights (no stacked buffer at
              all — the lower bound with zero DUS)

Usage: PYTHONPATH=/root/repo python scripts/bench_gradstack.py [rows] [depth]
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def body(x, w):
    h = jnp.dot(x, w, preferred_element_type=jnp.float32).astype(x.dtype)
    return jnp.dot(h, w.T, preferred_element_type=jnp.float32).astype(x.dtype)


def make_scan(unroll, split_transpose=False):
    def f(x, ws):  # ws: [depth, d, f] fp32
        def step(c, w):
            return body(c, w.astype(jnp.bfloat16)), None

        out, _ = jax.lax.scan(step, x, ws, unroll=unroll,
                              _split_transpose=split_transpose)
        return jnp.sum(out.astype(jnp.float32))

    return f


def f_unrolled(x, ws_list):
    for w in ws_list:
        x = body(x, w.astype(jnp.bfloat16))
    return jnp.sum(x.astype(jnp.float32))


def timeit(fn, *args, iters=20):
    g = jax.jit(jax.grad(fn, argnums=1))
    out = g(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = g(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1000


def main():
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    depth = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    d, f = 1024, 4096
    x = jax.random.normal(jax.random.PRNGKey(0), (rows, d), jnp.bfloat16)
    ws = jax.random.normal(jax.random.PRNGKey(1), (depth, d, f), jnp.float32) * 0.02
    ws_list = list(ws)

    # dW buffer traffic if every DUS copies the whole stack once per layer:
    stack_mb = depth * d * f * 4 / 2**20
    print(f"rows={rows} depth={depth} d={d} f={f}; dW stack {stack_mb:.0f} MB "
          f"(full-copy-per-layer would be {stack_mb * depth / 1024:.1f} GB/step)")

    for name, fn, args in [
        ("scan",     make_scan(1), (x, ws)),
        ("scan_st",  make_scan(1, split_transpose=True), (x, ws)),
        ("scan_u2",  make_scan(2), (x, ws)),
        ("scan_u4",  make_scan(4), (x, ws)),
        ("unrolled", f_unrolled,   (x, ws_list)),
    ]:
        try:
            ms = timeit(fn, *args)
            print(f"  {name:9s} {ms:8.2f} ms/grad")
        except Exception as e:
            print(f"  {name:9s} FAILED: {str(e)[:120]}")


if __name__ == "__main__":
    main()
