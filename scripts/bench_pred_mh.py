"""On-chip A/B for the multi-head-softmax fwd kernel experiment (VERDICT
round-4 task 5): at predictor geometry (c=24 padded to 32), does ONE exp2
over the lane-concat of all unrolled heads' score tiles beat the default
per-head serialize?

Arms (same math — CPU-interpret bit-exact, see JEPA_TM_MH_SOFTMAX):
  base       — shipped kernel, picker bq
  base160    — shipped kernel, bq=160 (isolates the bq effect)
  mh160      — JEPA_TM_MH_SOFTMAX=1 at bq=160 (hg=4 score tiles live:
               4*160*1280*4 = 3.3M, safe VMEM)
  mh320      — the picker bq; ~12M live — only tried if mh160 survives

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/bench_pred_mh.py
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

B, H, C, N = 24, 16, 24, 1191
D = H * C


def main():
    print(f"devices: {jax.devices()}  B={B} H={H} c={C} N={N}", flush=True)
    kx, kw, kp = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(kx, (B, N, D), jnp.bfloat16)
    w = (jax.random.normal(kw, (D, 3 * D), jnp.float32) * 0.02).astype(jnp.bfloat16)
    bias = jnp.zeros((3 * D,), jnp.float32)
    wproj = (jax.random.normal(kp, (D, D), jnp.float32) * 0.02).astype(jnp.bfloat16)

    def arm(mh: bool, bq):
        def f(x):
            os.environ["JEPA_TM_MH_SOFTMAX"] = "1" if mh else "0"
            if bq:
                os.environ["JEPA_TM_FWD_BQ"] = str(bq)
            else:
                os.environ.pop("JEPA_TM_FWD_BQ", None)
            o = flash_self_attention(x, w, bias, H)
            return jnp.dot(o, wproj,
                           preferred_element_type=jnp.float32).astype(jnp.bfloat16)

        def loss(x):
            return jnp.sum(f(x).astype(jnp.float32) ** 2)

        return f, jax.grad(loss)

    arms = [("base", False, None), ("base160", False, 160),
            ("mh160", True, 160)]
    if "--mh320" in sys.argv:
        arms.append(("mh320", True, None))
    ref = None
    for name, mh, bq in arms:
        f, g = arm(mh, bq)
        try:
            out = jax.jit(f)(x)
            if ref is None:
                ref = out
            err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                        - ref.astype(jnp.float32))))
            ms_f = device_ms(f, x)
            ms_fb = device_ms(g, x)
            print(f"  {name:8s} fwd {ms_f:7.2f} ms   f+b {ms_fb:7.2f} ms   "
                  f"max|out-base| {err:.2e}", flush=True)
        except Exception as e:  # Mosaic HTTP-500s are opaque
            print(f"  {name:8s} FAILED — {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
