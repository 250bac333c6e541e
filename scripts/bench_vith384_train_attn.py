"""fwd+bwd attention at the vith16_384 TRAIN geometry (VERDICT round-4
task 2): N=4608 tokens, 16 heads, c=80 (padded to 96 in-kernel).

Before round 5 the token-major bwd picker had no valid config here (the
merged kernel's per-head temps scale with full N; hg*blk and VMEM
ceilings), the head-major packed fallback Mosaic-crashed outright
(HTTP 500, reproduced twice), and XLA attention ran ~2.6x slower. The
dual-tiled tm backward (_bwd_tm_tiled: dq + dkv kernels, both sequence
sides blocked) now covers the geometry. This bench times the real train
composition (qkv projection + attention, fwd+bwd) for:

  xla     — projection + xla_attention (the old fallback)
  flash   — flash_self_attention as shipped (tm tiled-grad-fwd +
            dual-tiled bwd at this geometry)

Measured on v5e round 5 (B=2): xla 89.3 ms, flash 34.4 ms -> 2.59x.
Run on the real chip: python scripts/bench_vith384_train_attn.py [batch]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 2
H, C, N, D = 16, 80, 4608, 1280
ITERS = 6


def make_arm(impl: str):
    from jepa_tpu.ops.attention import xla_attention
    from jepa_tpu.ops.flash_attention import flash_self_attention

    def fwd(x, w, b):
        if impl == "flash":
            o = flash_self_attention(x, w, b, H)
        else:
            qkv = (jnp.dot(x, w, preferred_element_type=jnp.float32)
                   + b.astype(jnp.float32)).astype(x.dtype)
            q, k, v = [
                qkv[..., i * H * C:(i + 1) * H * C].reshape(x.shape[0], N, H, C)
                for i in range(3)
            ]
            o = xla_attention(q, k, v).reshape(x.shape[0], N, H * C)
        return jnp.sum(o.astype(jnp.float32))

    return jax.jit(jax.grad(fwd, argnums=(0, 1, 2)))


def main():
    print(f"devices: {jax.devices()}  B={B} H={H} c={C} N={N}", flush=True)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, N, D), jnp.bfloat16)
    w = (jax.random.normal(jax.random.PRNGKey(1), (D, 3 * H * C), jnp.float32)
         * 0.02).astype(jnp.bfloat16)
    b = jnp.zeros((3 * H * C,), jnp.bfloat16)

    results = {}
    for impl in ("xla", "flash"):
        try:
            f = make_arm(impl)
            t0 = time.perf_counter()
            g = f(x, w, b)
            jax.block_until_ready(g)
            t_compile = time.perf_counter() - t0
            t0 = time.perf_counter()
            for i in range(ITERS):
                g = f(x + jnp.bfloat16(i * 1e-3), w, b)
            jax.block_until_ready(g)
            dt = (time.perf_counter() - t0) / ITERS
            results[impl] = dt
            print(f"{impl}: {dt*1e3:.1f} ms fwd+bwd (compile {t_compile:.0f}s, "
                  f"|dx|={float(jnp.abs(g[0].astype(jnp.float32)).mean()):.3e})",
                  flush=True)
        except Exception as e:  # Mosaic HTTP-500s surface as opaque errors
            print(f"{impl}: FAILED — {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
    if len(results) == 2:
        print(f"speedup flash vs xla: {results['xla']/results['flash']:.2f}x",
              flush=True)


if __name__ == "__main__":
    main()
