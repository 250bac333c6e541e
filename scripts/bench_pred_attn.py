"""On-chip A/B of predictor-geometry attention (c=24 heads): token-major
flash (current default, zero-pads c to 32) vs head-major packed (true c=24)
vs plain XLA attention, fwd+bwd through the same qkv/out projections.

Motivation: the round-4 per-layer xplane puts the two predictors at
~238 ms/step of the 679 ms fused step, with the tm flash BWD kernel at
~4.6 ms/layer (vs 1.9 ms fwd) — the largest remaining above-floor block.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/bench_pred_attn.py
"""

from __future__ import annotations

import glob
import os
import shutil

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from jepa_tpu.ops.attention import xla_attention  # noqa: E402
from jepa_tpu.ops.flash_attention import (  # noqa: E402
    flash_attention_packed,
    flash_self_attention,
)

TRACE_DIR = "/tmp/jepa_pred_xplane"
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
        ("pred1", 24, 16, 24, 1191),
        ("pred2", 24, 16, 24, 1109),
    ]:
        d = h * c
        print(f"== {name}: B={b} H={h} c={c} N={n}", flush=True)
        kx, kw, kp = jax.random.split(jax.random.PRNGKey(0), 3)
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

        def xla(x):
            qkv = jnp.dot(x, w, preferred_element_type=jnp.float32)
            qkv = qkv.astype(jnp.bfloat16).reshape(b, n, 3, h, c)
            o = xla_attention(qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2])
            o = o.reshape(b, n, d)
            return jnp.dot(o, wproj, preferred_element_type=jnp.float32).astype(jnp.bfloat16)

        ref = jax.jit(xla)(x)
        for vname, v in (("tm", tm), ("packed", packed)):
            a = jax.jit(v)(x)
            err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - ref.astype(jnp.float32))))
            print(f"  fwd max |{vname} - xla| = {err:.2e}", flush=True)

        def fb(f):
            def loss(x):
                return jnp.sum(f(x).astype(jnp.float32) ** 2)
            return jax.grad(loss)

        for vname, v in (("tm", tm), ("packed", packed), ("xla", xla)):
            print(f"  {vname:6s} fwd {device_ms(v, x):7.2f} ms   "
                  f"f+b {device_ms(fb(v), x):7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
