"""Isolate the scan-bwd grad-stack DUS cost (BENCH.md round-3 target).

The fused step's backward writes per-layer dW into stacked [depth, ...]
fp32 buffers; the round-3 xplane shows those dynamic-update-slice fusions
running at full-buffer-WRITE cost (0.455 ms for a 16 MB slice into a 402 MB
stack = the whole stack rewritten) in the K=376 ctx-encoder bwd scan, while
the SAME shapes in the K=96 scan run in-place (0.12 ms). This microbench
reproduces the pattern — an fc1-shaped matmul per scan layer — and times
variants via DEVICE-SIDE xplane op sums (wall clock through the axon tunnel
is dominated by async dispatch and reads absurdly fast; CLAUDE.md).

  scan        lax.scan over stacked weights (the production structure)
  scan_rmt    the same under jax.checkpoint (the production remat body)
  scan_g3/g6  depth split into 3/6 sequential scans (smaller dW stacks)
  g3_rmt      3-way split under remat
  bf16w       weight stacks already bf16 (no convert riding the dW DUS)
  unrolled    a Python-loop over per-layer weights (zero-DUS lower bound;
              shipped as the train step's unroll_grads mode)

Round-3 verdicts (v5e, rows=9024 depth=24): transposed stacks, the
_split_transpose lowering, and two-scan loss summing were measured and
refuted (no DUS change); those builders have been removed.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/bench_gradstack.py [rows] [depth]
"""

from __future__ import annotations

import collections
import glob
import os
import shutil
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

TRACE_DIR = "/tmp/gradstack_xplane"


def body(x, w):
    h = jnp.dot(x, w, preferred_element_type=jnp.float32).astype(x.dtype)
    return jnp.dot(h, w.T, preferred_element_type=jnp.float32).astype(x.dtype)


def make_scan():
    def f(x, ws):
        def step(c, w):
            return body(c, w.astype(jnp.bfloat16)), None

        out, _ = jax.lax.scan(step, x, ws)
        return jnp.sum(out.astype(jnp.float32))

    return f


def make_scan_groups(groups, remat=False):
    """Python loop over `groups` sequential scans of depth/groups layers:
    each group's dW stack is 1/groups the bytes, so the per-layer DUS
    full-stack write shrinks proportionally, at ~groups x the HLO size."""

    def f(x, ws_groups):
        def step(c, w):
            return body(c, w.astype(jnp.bfloat16)), None

        st = jax.checkpoint(step, prevent_cse=False) if remat else step
        for wg in ws_groups:
            x, _ = jax.lax.scan(st, x, wg)
        return jnp.sum(x.astype(jnp.float32))

    return f


def make_scan_remat():
    def f(x, ws):
        def step(c, w):
            return body(c, w.astype(jnp.bfloat16)), None

        out, _ = jax.lax.scan(jax.checkpoint(step, prevent_cse=False), x, ws)
        return jnp.sum(out.astype(jnp.float32))

    return f


def make_scan_bf16w():
    """Weight stacks already bf16 — no cast in the body, so the grad path
    has no convert riding the dW DUS and the stack is half the bytes.
    Isolates whether the per-layer DUS tax is the fused f32 convert."""

    def f(x, ws):
        def step(c, w):
            return body(c, w), None

        out, _ = jax.lax.scan(step, x, ws)
        return jnp.sum(out.astype(jnp.float32))

    return f


def f_unrolled(x, ws_list):
    for w in ws_list:
        x = body(x, w.astype(jnp.bfloat16))
    return jnp.sum(x.astype(jnp.float32))


def device_ms(trace_dir, iters):
    """Sum device-side op durations from the newest xplane; returns
    (total_ms_per_iter, dus_ms_per_iter, top_lines)."""
    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    data = jax.profiler.ProfileData.from_serialized_xspace(
        open(paths[-1], "rb").read())
    agg = collections.Counter()
    for plane in data.planes:
        if "TPU" not in plane.name:
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                agg[ev.name] += ev.duration_ns / 1e6
    # while.* totals include their bodies — count only leaf ops
    leaf = {n: ms for n, ms in agg.items() if not n.lstrip("%").startswith("while")}
    total = sum(leaf.values()) / iters
    dus = sum(ms for n, ms in leaf.items() if "dynamic-update-slice" in n) / iters
    top = sorted(leaf.items(), key=lambda kv: -kv[1])[:4]
    return total, dus, [(n[:90], ms / iters) for n, ms in top]


def timeit(fn, *args, iters=10, grad_args=1):
    g = jax.jit(jax.grad(fn, argnums=grad_args))
    out = g(*args)
    jax.block_until_ready(out)
    shutil.rmtree(TRACE_DIR, ignore_errors=True)
    with jax.profiler.trace(TRACE_DIR):
        for _ in range(iters):
            out = g(*args)
        jax.block_until_ready(out)
    return device_ms(TRACE_DIR, iters)


def main():
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 9024
    depth = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    d, f = 1024, 4096
    x = jax.random.normal(jax.random.PRNGKey(0), (rows, d), jnp.bfloat16)
    ws = jax.random.normal(jax.random.PRNGKey(1), (depth, d, f), jnp.float32) * 0.02
    ws_list = list(ws)

    stack_mb = depth * d * f * 4 / 2**20
    slice_ms = d * f * 4 / 819e9 * 1e3  # one in-place slice write at HBM bw
    print(f"rows={rows} depth={depth} d={d} f={f}; dW stack {stack_mb:.0f} MB; "
          f"in-place DUS floor ~{slice_ms:.3f} ms/layer "
          f"({slice_ms * depth:.2f} ms/grad)")

    ws_g3 = [ws[i:i + depth // 3] for i in range(0, depth, depth // 3)]
    ws_g6 = [ws[i:i + depth // 6] for i in range(0, depth, depth // 6)]
    for name, fn, args in [
        ("scan",     make_scan(), (x, ws)),
        ("scan_rmt", make_scan_remat(), (x, ws)),
        ("scan_g3",  make_scan_groups(3), (x, ws_g3)),
        ("scan_g6",  make_scan_groups(6), (x, ws_g6)),
        ("g3_rmt",   make_scan_groups(3, remat=True), (x, ws_g3)),
        ("bf16w",    make_scan_bf16w(), (x, ws.astype(jnp.bfloat16))),
        ("unrolled", f_unrolled, (x, ws_list)),
    ]:
        try:
            total, dus, top = timeit(fn, *args)
            print(f"  {name:9s} device {total:8.2f} ms/grad   DUS {dus:7.2f} ms")
            for n, ms in top:
                print(f"      {ms:7.2f} ms  {n}")
        except Exception as e:
            print(f"  {name:9s} FAILED: {str(e)[:140]}")


if __name__ == "__main__":
    main()
