"""On-chip validation + device-side timing of the token-major fused
flash_self_attention path at production shapes, vs the head-major packed
path it replaces.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/bench_tm_attn.py
"""

from __future__ import annotations

import collections
import glob
import os
import shutil

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from jepa_tpu.ops.flash_attention import (  # noqa: E402
    flash_attention_packed,
    flash_self_attention,
)

TRACE_DIR = "/tmp/jepa_tm_xplane"
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
    for name, b, h, c, n in [
        ("encoder full", 24, 16, 64, 1568),
        ("predictor long", 24, 16, 24, 1191),
        ("enc ctx short", 24, 16, 64, 376),
    ]:
        d = h * c
        print(f"== {name}: B={b} H={h} c={c} N={n}", flush=True)
        kx, kw, kb2, kp = jax.random.split(jax.random.PRNGKey(0), 4)
        x = jax.random.normal(kx, (b, n, d), jnp.bfloat16)
        w = (jax.random.normal(kw, (d, 3 * d), jnp.float32) * 0.02).astype(jnp.bfloat16)
        bias = jnp.zeros((3 * d,), jnp.float32)
        wproj = (jax.random.normal(kp, (d, d), jnp.float32) * 0.02).astype(jnp.bfloat16)

        def tm(x):
            o = flash_self_attention(x, w, bias, h)
            return jnp.dot(o, wproj, preferred_element_type=jnp.float32).astype(jnp.bfloat16)

        def packed(x):
            wr = w.reshape(d, 3, h, c)
            qkv = jnp.einsum("bnd,dshc->sbhnc", x, wr,
                             preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            o = flash_attention_packed(qkv)
            wp = wproj.reshape(h, c, d)
            return jnp.einsum("bhnc,hcd->bnd", o, wp,
                              preferred_element_type=jnp.float32).astype(jnp.bfloat16)

        # correctness on-chip
        a = jax.jit(packed)(x)
        bb = jax.jit(tm)(x)
        err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - bb.astype(jnp.float32))))
        print(f"  fwd max |packed - tm| = {err:.2e}", flush=True)

        def fb(f):
            def loss(x):
                return jnp.sum(f(x).astype(jnp.float32) ** 2)
            return jax.grad(loss)

        ga = jax.jit(fb(packed))(x)
        gb = jax.jit(fb(tm))(x)
        gerr = float(jnp.max(jnp.abs(ga.astype(jnp.float32) - gb.astype(jnp.float32))))
        gmax = float(jnp.max(jnp.abs(ga.astype(jnp.float32))))
        print(f"  dx  max |packed - tm| = {gerr:.2e} (scale {gmax:.2e})", flush=True)

        print(f"  packed fwd   {device_ms(packed, x):7.2f} ms", flush=True)
        print(f"  tm     fwd   {device_ms(tm, x):7.2f} ms", flush=True)
        print(f"  packed f+b   {device_ms(fb(packed), x):7.2f} ms", flush=True)
        print(f"  tm     f+b   {device_ms(fb(tm), x):7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
