"""Find a restack recipe that runs at HBM bandwidth (BENCH.md round 4).

The per-layer-grads train modes need 24 x [4096,1024] f32 buffers stacked
into [24,4096,1024] once per step. XLA lowers jnp.stack of independently-
produced operands into a dynamic-update-slice chain that fails to alias in
place (whole-buffer-copy cost per slice — the same pathology as the scan
transpose). This microbench times candidate recipes via device-side xplane
op sums:

  stack      jnp.stack(list)                       (the DUS chain baseline)
  barrier    optimization_barrier then stack
  cat_flat   concatenate([x.ravel() ...]).reshape
  cat_none   concatenate([x[None] ...])
  donate_dus explicit DUS loop into a DONATED [24,...] buffer

Each recipe consumes producers (per-layer matmuls, like real dW) and its
output feeds an elementwise consumer (like AdamW).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/bench_restack.py
"""

from __future__ import annotations

import collections
import glob
import os
import shutil

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

TRACE_DIR = "/tmp/restack_xplane"
DEPTH, D, F = 24, 1024, 4096


def producers(xs, w):
    """Per-layer [F, D] f32 'grads' from real matmuls (like dW dots)."""
    return [jnp.dot(w.T * (i + 1), xs, preferred_element_type=jnp.float32)
            for i in range(DEPTH)]


def consume(stacked, m):
    """AdamW-ish elementwise pass over the stacked buffer."""
    new_m = 0.9 * m + 0.1 * stacked
    return new_m, jnp.sum(new_m[:, 0, 0])


def make(recipe):
    def f(xs, w, m):
        gs = producers(xs, w)
        if recipe == "stack":
            st = jnp.stack(gs, 0)
        elif recipe == "barrier":
            st = jnp.stack(jax.lax.optimization_barrier(tuple(gs)), 0)
        elif recipe == "cat_flat":
            st = jnp.concatenate([g.ravel() for g in gs]).reshape(DEPTH, F, D)
        elif recipe == "cat_none":
            st = jnp.concatenate([g[None] for g in gs], 0)
        else:
            raise ValueError(recipe)
        return consume(st, m)

    return f


def f_donate_dus(xs, w, m, buf):
    gs = producers(xs, w)
    for i, g in enumerate(gs):
        buf = jax.lax.dynamic_update_slice(buf, g[None], (i, 0, 0))
    return consume(buf, m) + (buf,)


def device_ms(iters):
    paths = sorted(glob.glob(os.path.join(TRACE_DIR, "**", "*.xplane.pb"),
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
    leaf = {n: ms for n, ms in agg.items()
            if not n.lstrip("%").startswith("while")}
    total = sum(leaf.values()) / iters
    dus = sum(ms for n, ms in leaf.items() if "dynamic-update-slice" in n) / iters
    cat = sum(ms for n, ms in leaf.items() if "concatenate" in n) / iters
    cp = sum(ms for n, ms in leaf.items()
             if n.lstrip("%").startswith("copy")) / iters
    return total, dus, cat, cp


def timeit(fn, args, iters=10, donate=()):
    jf = jax.jit(fn, donate_argnums=donate)
    out = jf(*args)
    jax.block_until_ready(out)
    shutil.rmtree(TRACE_DIR, ignore_errors=True)
    with jax.profiler.trace(TRACE_DIR):
        for _ in range(iters):
            out = jf(*args)
            if donate:
                args = (*args[:3], out[-1])
        jax.block_until_ready(out)
    return device_ms(iters)


def main():
    stack_mb = DEPTH * D * F * 4 / 2**20
    print(f"stack {stack_mb:.0f} MB; bandwidth floor ~{stack_mb/2**10/819*1e3:.2f} ms "
          f"(write) + producers")
    xs = jax.random.normal(jax.random.PRNGKey(0), (D, D), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (D, F), jnp.float32)
    m = jnp.zeros((DEPTH, F, D), jnp.float32)
    for recipe in ("stack", "barrier", "cat_flat", "cat_none"):
        total, dus, cat, cp = timeit(make(recipe), (xs, w, m))
        print(f"  {recipe:10s} device {total:7.2f} ms  DUS {dus:6.2f}  "
              f"concat {cat:6.2f}  copy {cp:6.2f}")
    buf = jnp.zeros((DEPTH, F, D), jnp.float32)
    total, dus, cat, cp = timeit(f_donate_dus, (xs, w, m, buf), donate=(3,))
    print(f"  donate_dus device {total:7.2f} ms  DUS {dus:6.2f}  "
          f"concat {cat:6.2f}  copy {cp:6.2f}")


if __name__ == "__main__":
    main()
