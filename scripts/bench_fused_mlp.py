"""On-chip fused linear+GELU kernel vs XLA's fc1 fusion at production
shapes. Run: PYTHONPATH=/root/repo:/root/repo/scripts:$PYTHONPATH python
scripts/bench_fused_mlp.py
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from proto_tokmajor_prof import device_ms as _dms  # noqa: E402


def device_ms(fn, x):
    return _dms(fn, x)[0]

from jepa_tpu.ops.fused_mlp import linear_gelu  # noqa: E402


def main():
    for label, M, K, F in (("fc1 encoder", 24 * 1568, 1024, 4096),
                           ("fc1 predictor", 24 * 1191, 384, 1536)):
        kx, kw = jax.random.split(jax.random.PRNGKey(0), 2)
        x = jax.random.normal(kx, (M, K), jnp.bfloat16)
        w = (jax.random.normal(kw, (K, F), jnp.float32) * 0.02).astype(jnp.bfloat16)
        b = jnp.zeros((F,), jnp.float32)

        def mm(x):
            return jnp.dot(x, w, preferred_element_type=jnp.float32).astype(jnp.bfloat16)

        def mm_gelu(x):
            h = jnp.dot(x, w, preferred_element_type=jnp.float32) + b
            return jax.nn.gelu(h.astype(jnp.bfloat16).astype(jnp.float32),
                               approximate=False).astype(jnp.bfloat16)

        def fused(x):
            return linear_gelu(x, w, b)

        a = jax.jit(mm_gelu)(x)
        c = jax.jit(fused)(x)
        err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - c.astype(jnp.float32))))
        print(f"== {label}: max |xla - fused| = {err:.2e}", flush=True)
        print(f"  matmul only      {device_ms(mm, x):6.2f} ms", flush=True)
        print(f"  xla mm+gelu      {device_ms(mm_gelu, x):6.2f} ms", flush=True)
        print(f"  fused kernel     {device_ms(fused, x):6.2f} ms", flush=True)

        def fb(f):
            return jax.grad(lambda x: jnp.sum(f(x).astype(jnp.float32) ** 2))

        print(f"  xla   f+b        {device_ms(fb(mm_gelu), x):6.2f} ms", flush=True)
        print(f"  fused f+b        {device_ms(fb(fused), x):6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
