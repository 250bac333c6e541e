"""On-chip A/B: cost of the kv-validity mask in the token-major flash
kernels, at padded-mode geometries (VERDICT r4 task 3 attribution follow-up:
the padded tier-0 profile shows predictor flash fwd ~4.66 ms/layer at
N=1280 masked vs 2.22 ms at N=1191 unmasked — is that the mask or the
shape?).

Arms per geometry: nomask / mask-all-valid / mask-80%-valid; fwd and f+b.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/bench_kvmask.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench_pred_attn import device_ms  # noqa: E402
from jepa_tpu.ops.flash_attention import flash_self_attention  # noqa: E402

B = 24

# (label, H, c, N) — predictor cfg1 (pred cap 1152 + enc 128), predictor at
# the unmasked microbench shape, ctx encoder at tier-0 cap
GEOMS = [
    ("pred-N1280-c24", 16, 24, 1280),
    ("pred-N1191-c24", 16, 24, 1191),
    ("ctx-N384-c64", 16, 64, 384),
]


def main():
    print(f"devices: {jax.devices()}  B={B}", flush=True)
    for label, h, c, n in GEOMS:
        d = h * c
        kx, kw = jax.random.split(jax.random.PRNGKey(0))
        x = jax.random.normal(kx, (B, n, d), jnp.bfloat16)
        w = (jax.random.normal(kw, (d, 3 * d), jnp.float32) * 0.02).astype(
            jnp.bfloat16)
        bias = jnp.zeros((3 * d,), jnp.float32)
        masks = {
            "nomask": None,
            "mask-all": jnp.ones((B, n), bool),
            "mask-80p": jnp.arange(n)[None, :] < int(n * 0.8),
        }
        if masks["mask-80p"].shape[0] == 1:
            masks["mask-80p"] = jnp.broadcast_to(masks["mask-80p"], (B, n))
        for name, m in masks.items():
            def f(x):
                return flash_self_attention(x, w, bias, h, kv_mask=m)

            def loss(x):
                return jnp.sum(f(x).astype(jnp.float32) ** 2)

            try:
                ms_f = device_ms(f, x)
                ms_fb = device_ms(jax.grad(loss), x)
                print(f"  {label:16s} {name:9s} fwd {ms_f:7.2f} ms   "
                      f"f+b {ms_fb:7.2f} ms", flush=True)
            except Exception as e:
                print(f"  {label:16s} {name:9s} FAILED — "
                      f"{type(e).__name__}: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
