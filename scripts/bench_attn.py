"""On-chip attention benchmark: the library flash kernel vs XLA einsum at
V-JEPA shapes, forward and forward+backward.

Run on the real TPU: `PYTHONPATH=/root/repo:$PYTHONPATH python
scripts/bench_attn.py` (keeps axon path, no torch import). Fresh inputs +
host readback per iteration (axon serves cached results for repeated
identical executions, see CLAUDE.md).
"""

from __future__ import annotations

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from jepa_tpu.ops.attention import xla_attention
from jepa_tpu.ops.flash_attention import flash_attention


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
        print(f"  {label:40s} {dt:8.2f} ms")
        return dt
    except Exception as e:
        print(f"  {label:40s} FAILED: {str(e).splitlines()[0][:90]}")
        return None


def main():
    shapes = [
        ("predictor short", 24, 16, 24, 1109),
        ("predictor long", 24, 16, 24, 1191),
        ("encoder full", 24, 16, 64, 1568),
    ]
    for name, b, h, d, n in shapes:
        print(f"== {name}: B={b} H={h} D={d} N={n}")
        kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(kq, (b, n, h, d), jnp.bfloat16)
        k = jax.random.normal(kk, (b, n, h, d), jnp.bfloat16)
        v = jax.random.normal(kv, (b, n, h, d), jnp.bfloat16)
        mask = jnp.asarray(np.arange(n) < int(n * 0.9))[None].repeat(b, 0)

        f_fwd = jax.jit(lambda q, k, v: flash_attention(q, k, v))
        timeit(f_fwd, (q, k, v), label="flash fwd")
        x_fwd = jax.jit(lambda q, k, v: xla_attention(q, k, v))
        timeit(x_fwd, (q, k, v), label="xla fwd")

        def fb(attn):
            def loss(q, k, v):
                return jnp.sum(attn(q, k, v).astype(jnp.float32) ** 2)
            return jax.jit(jax.grad(loss, argnums=(0, 1, 2)))

        timeit(fb(flash_attention), (q, k, v), label="flash fwd+bwd")
        timeit(fb(xla_attention), (q, k, v), label="xla fwd+bwd")

        fm = jax.jit(
            jax.grad(
                lambda q, k, v: jnp.sum(
                    flash_attention(q, k, v, kv_mask=mask).astype(jnp.float32) ** 2
                ),
                argnums=(0, 1, 2),
            )
        )
        timeit(fm, (q, k, v), label="flash fwd+bwd (kv_mask)")

        a = f_fwd(q, k, v).astype(jnp.float32)
        r = x_fwd(q, k, v).astype(jnp.float32)
        print(f"  flash-vs-xla max abs err: {float(jnp.max(jnp.abs(a - r))):.2e}")


if __name__ == "__main__":
    main()
