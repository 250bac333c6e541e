"""End-to-end ViT-H/16 @ 384 ENCODER forward+backward on one v5e chip.

Round 5's dual-tiled token-major flash backward (_bwd_tm_tiled) was
measured at the isolated-attention level (scripts/bench_vith384_train_attn
.py: 2.6-3.3x over XLA at B2 H16 c80 N=4608). This script proves and times
the full 32-layer grad program at the production geometry
(configs/pretrain/vith16_384.yaml: N = 8*24*24 = 4608 tokens, head dim 80
zero-padded to 96 in-kernel) — i.e. 32 tiled-fwd + dual-tiled-bwd kernel
instances under remat='attn' in ONE program, flash vs the XLA fallback.
The full vith PRETRAIN step does not fit a 16GB v5e (params+EMA+AdamW
~10.5GB fp32 before activations, BENCH.md), so encoder f+b is the largest
train-path composition this chip admits at 384px.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/bench_vith384_encoder_fb.py [batch] [impls...]
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

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1
IMPLS = sys.argv[2:] or ["flash", "xla"]
ITERS = 5


def run(impl: str):
    from jepa_tpu.models.factory import vit_cfg
    from jepa_tpu.models.vit import init_vit, vit_forward

    cfg = vit_cfg("vit_huge", img_size=384, num_frames=16, tubelet_size=2,
                  uniform_power=True, remat="attn", attn_impl=impl)
    params, consts = init_vit(jax.random.PRNGKey(0), cfg)
    n = sum(x.size for x in jax.tree.leaves(params))
    clips = jax.random.normal(jax.random.PRNGKey(1),
                              (B, 16, 384, 384, 3), jnp.bfloat16)

    def loss_fn(p, x):
        out = vit_forward(p, consts, x, cfg)  # [B, 4608, 1280] fp32
        return jnp.mean(jnp.square(out))

    step = jax.jit(jax.grad(loss_fn), donate_argnums=(0,))

    t0 = time.perf_counter()
    grads = step(params, clips)
    jax.block_until_ready(grads)
    print(f"{impl}: params {n/1e6:.0f}M, compile+first {time.perf_counter()-t0:.0f}s",
          flush=True)
    # donate_argnums(0) consumed params; feed grads (same pytree) back in so
    # each iteration is a fresh fwd+bwd over new buffers.
    t0 = time.perf_counter()
    for _ in range(ITERS):
        grads = step(grads, clips)
    jax.block_until_ready(grads)
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{impl}: encoder f+b b{B} N=4608 c=80: {dt:.1f} ms "
          f"= {B / dt * 1e3:.2f} clips/s", flush=True)
    return dt


def main():
    print(f"devices: {jax.devices()}  B={B}", flush=True)
    res = {}
    for impl in IMPLS:
        try:
            res[impl] = run(impl)
        except Exception as e:
            print(f"{impl} FAILED: {str(e).splitlines()[0][:140]}", flush=True)
    if "flash" in res and "xla" in res:
        print(f"speedup flash over xla: {res['xla'] / res['flash']:.2f}x", flush=True)


if __name__ == "__main__":
    main()
