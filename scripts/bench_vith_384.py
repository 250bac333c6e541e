"""First-ever execution of the vith16_384 production geometry on a chip
(VERDICT round-3 item 2).

The reference ships ViT-H/16 at 384px (configs/pretrain/vith16_384.yaml:
crop 384, 16 frames -> N = 8*24*24 = 4608 tokens, head dim 80) plus five
384px eval configs; until round 4 no jepa_tpu test, script, or bench had
ever compiled that geometry. This script proves it on the real chip:

  1. ViT-H/16 @ 384 encode forward (grad-free eval path: fused fc1 +
     token-major flash kernels at N=4608, c=80 zero-padded to 96) with
     measured clips/s.
  2. The eval multi-view path at resolution 384: ClipAggregation over
     S=2 temporal segments x V=3 spatial views with
     attend_across_segments=True (seq 2*4608=9216 tokens into the
     attentive probe), i.e. the vith16_384 K400 16x8x3 protocol's compute
     shape at smaller S.

Run: python scripts/bench_vith_384.py (from anywhere; repo root self-added)
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


def main():
    import dataclasses

    from jepa_tpu.evals.aggregation import clip_aggregation
    from jepa_tpu.models.attentive import (
        AttentiveCfg,
        classifier_forward,
        init_attentive_classifier,
    )
    from jepa_tpu.models.factory import vit_cfg
    from jepa_tpu.models.vit import init_vit, vit_forward
    from jepa_tpu.ops.flash_attention import _pick_tm_bwd, _pick_tm_fwd

    enc_cfg = vit_cfg("vit_huge", img_size=384, num_frames=16, tubelet_size=2,
                      uniform_power=True, fused_mlp=True)
    n = enc_cfg.num_patches
    c = enc_cfg.embed_dim // enc_cfg.num_heads
    print(f"vit_huge@384: N={n} heads={enc_cfg.num_heads} c={c} "
          f"(padded {((c + 31) // 32) * 32})", flush=True)
    cp = ((c + 31) // 32) * 32
    print("tm picker fwd (primal, grad):",
          _pick_tm_fwd(enc_cfg.num_heads, cp, n),
          " bwd:", _pick_tm_bwd(enc_cfg.num_heads, cp, n), flush=True)

    params, consts = init_vit(jax.random.PRNGKey(0), enc_cfg)
    enc_fn = jax.jit(lambda p, cs, x: vit_forward(p, cs, x, enc_cfg))

    last_err = None
    for batch in (4, 2, 1):
        try:
            x = jax.random.normal(jax.random.PRNGKey(1),
                                  (batch, 16, 384, 384, 3), jnp.bfloat16)
            t0 = time.perf_counter()
            o = enc_fn(params, consts, x)
            _ = float(jnp.sum(o.astype(jnp.float32)))
            t_compile = time.perf_counter() - t0
            iters = 6
            t0 = time.perf_counter()
            for i in range(iters):
                o = enc_fn(params, consts, x + jnp.bfloat16(i * 1e-3))
            _ = float(jnp.sum(o.astype(jnp.float32)))  # hard sync
            dt = (time.perf_counter() - t0) / iters
            print(f"ENCODE_384 ok b{batch}: {dt*1e3:.1f} ms = "
                  f"{batch/dt:.2f} clips/s/chip (N={o.shape[1]}, "
                  f"compile {t_compile:.0f}s)", flush=True)
            break
        except Exception as e:
            last_err = e
            print(f"b{batch} failed: {str(e).splitlines()[0][:120]}", flush=True)
    else:
        raise last_err

    # ---- eval multi-view path at 384 (16x2x3 shape of the 16x8x3 recipe)
    s, v, b = 2, 3, 1
    clips = jax.random.normal(jax.random.PRNGKey(2),
                              (b, s, v, 16, 384, 384, 3), jnp.bfloat16)
    att_cfg = AttentiveCfg(embed_dim=enc_cfg.embed_dim,
                           num_heads=enc_cfg.num_heads, num_classes=400)
    clf = init_attentive_classifier(jax.random.PRNGKey(3), att_cfg)

    def multiview_logits(params, consts, clf, clips):
        views = clip_aggregation(params, consts, clips, enc_cfg,
                                 attend_across_segments=True)
        logits = [classifier_forward(clf, seq, att_cfg) for seq in views]
        return sum(logits) / len(logits)

    mv_fn = jax.jit(multiview_logits)
    t0 = time.perf_counter()
    lg = mv_fn(params, consts, clf, clips)
    _ = float(jnp.sum(lg.astype(jnp.float32)))
    t_compile = time.perf_counter() - t0
    iters = 3
    t0 = time.perf_counter()
    for i in range(iters):
        lg = mv_fn(params, consts, clf, clips + jnp.bfloat16(i * 1e-3))
    _ = float(jnp.sum(lg.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / iters
    views_per = s * v * b
    print(f"MULTIVIEW_384 ok: SxV={s}x{v} b{b} -> logits {lg.shape}, "
          f"{dt*1e3:.1f} ms = {views_per/dt:.2f} views/s/chip "
          f"(pooler seq {s*n} tokens, compile {t_compile:.0f}s)", flush=True)
    print("VITH16_384_ON_CHIP_OK", flush=True)


if __name__ == "__main__":
    main()
