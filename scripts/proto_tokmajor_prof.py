"""Device-side (xplane) timing of the flash layout variants — the wall-clock
harness is dominated by axon tunnel dispatch overhead, so aggregate real
TPU op durations instead.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/proto_tokmajor_prof.py
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

from proto_tokmajor import flash_hg_fwd, flash_tm_fwd  # noqa: E402

from jepa_tpu.ops.flash_attention import flash_attention_packed  # noqa: E402

TRACE_DIR = "/tmp/jepa_proto_xplane"
ITERS = 4


def device_ms(fn, x):
    """Total device op ms per call of jitted fn(x)."""
    f = jax.jit(fn)
    o = f(x)
    jax.block_until_ready(o)
    shutil.rmtree(TRACE_DIR, ignore_errors=True)
    with jax.profiler.trace(TRACE_DIR):
        for i in range(ITERS):
            o = f(x + jnp.bfloat16(1e-3 * (i + 1)))
        jax.block_until_ready(o)
    paths = sorted(glob.glob(os.path.join(TRACE_DIR, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    data = jax.profiler.ProfileData.from_serialized_xspace(open(paths[-1], "rb").read())
    per_op = collections.Counter()
    total = 0.0
    for plane in data.planes:
        if "TPU" not in plane.name:
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                per_op[ev.name.split(" ")[0].lstrip("%")] += ev.duration_ns / 1e6
                total += ev.duration_ns / 1e6
    top = ", ".join(f"{k.split('=')[0]}:{v/ITERS:.2f}" for k, v in per_op.most_common(4))
    return total / ITERS, top


def main():
    for name, b, h, c, n in [
        ("encoder full", 24, 16, 64, 1568),
        ("predictor long", 24, 16, 24, 1191),
        ("enc ctx short", 24, 16, 64, 376),
    ]:
        d = h * c
        print(f"== {name}: B={b} H={h} c={c} N={n}  (D={d})", flush=True)
        kx, kw, kp = jax.random.split(jax.random.PRNGKey(0), 3)
        x = jax.random.normal(kx, (b, n, d), jnp.bfloat16)
        wqkv = jax.random.normal(kw, (d, 3 * d), jnp.bfloat16) * 0.02
        wproj = jax.random.normal(kp, (d, d), jnp.bfloat16) * 0.02

        def cur(x):
            w = wqkv.reshape(d, 3, h, c)
            qkv = jnp.einsum("bnd,dshc->sbhnc", x, w,
                             preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            o = flash_attention_packed(qkv)
            wp = wproj.reshape(h, c, d)
            return jnp.einsum("bhnc,hcd->bnd", o, wp,
                              preferred_element_type=jnp.float32).astype(jnp.bfloat16)

        def tm(x):
            qkv = jnp.dot(x, wqkv, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            o = flash_tm_fwd(qkv, h, c)
            return jnp.dot(o, wproj, preferred_element_type=jnp.float32).astype(jnp.bfloat16)

        def hg(hgroup):
            def f(x):
                w = wqkv.reshape(d, 3, h, c)
                qkv = jnp.einsum("bnd,dshc->sbhnc", x, w,
                                 preferred_element_type=jnp.float32).astype(jnp.bfloat16)
                o = flash_hg_fwd(qkv, hgroup=hgroup)
                wp = wproj.reshape(h, c, d)
                return jnp.einsum("bhnc,hcd->bnd", o, wp,
                                  preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            return f

        for lbl, f in [("current", cur), ("tm", tm), ("hg2", hg(2)), ("hg4", hg(4))]:
            try:
                ms, top = device_ms(f, x)
                print(f"  {lbl:8s} {ms:7.2f} ms/call   [{top}]", flush=True)
            except Exception as e:
                print(f"  {lbl:8s} FAILED: {str(e).splitlines()[0][:110]}", flush=True)


if __name__ == "__main__":
    main()
