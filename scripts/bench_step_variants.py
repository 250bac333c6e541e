"""Fused-step variants on the real TPU: predictor remat policies.

Usage: python scripts/bench_step_variants.py (repo root on sys.path via cwd)
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def build(pred_remat, enc_remat=True):
    from jepa_tpu.masks.multiblock3d import MaskGrid, MaskSpec, calibrate_keep_counts
    from jepa_tpu.models.factory import predictor_cfg_for, vit_cfg
    from jepa_tpu.train.step import TrainCfg, build_train_step, init_train_state
    from jepa_tpu.utils.schedulers import build_schedules

    enc_cfg = vit_cfg("vit_large", img_size=224, num_frames=16, tubelet_size=2,
                      uniform_power=True, remat=enc_remat)
    pred_cfg = predictor_cfg_for(enc_cfg, predictor_embed_dim=384, depth=12,
                                 num_mask_tokens=2, remat=pred_remat)
    grid = MaskGrid.from_data_cfg(224, enc_cfg.patch_size, 16, 2)
    specs = [
        MaskSpec(num_blocks=8, spatial_scale=(0.15, 0.15), aspect_ratio=(0.75, 1.5)),
        MaskSpec(num_blocks=2, spatial_scale=(0.7, 0.7), aspect_ratio=(0.75, 1.5)),
    ]
    kc = [calibrate_keep_counts(s, grid, 24) for s in specs]
    lr_s, wd_s, mom_s = build_schedules(
        ipe=300, num_epochs=300, warmup_epochs=40, start_lr=2e-4, ref_lr=6.25e-4,
        final_lr=1e-6, wd=0.04, final_wd=0.4, ema=(0.998, 1.0), ipe_scale=1.25,
    )
    state, consts = init_train_state(jax.random.PRNGKey(0), enc_cfg, pred_cfg)
    tc = TrainCfg(num_clips=1, batch_size=24, mask_mode="fixed",
                  clip_grad=10.0, clip_after_step=0, seed=0)
    fn = jax.jit(
        build_train_step(enc_cfg, pred_cfg, consts, tc, lr_s, wd_s, mom_s,
                         specs, grid, kc),
        donate_argnums=(0,),
    )
    return fn, state


def main():
    import sys as _sys

    variants = [
        (True, True),        # r2 baseline: full remat everywhere
        (True, "attn"),      # predictor saves flash (o, lse)
        ("attn", "attn"),    # ctx encoder saves them too
        ("attn", False),     # predictor activations fully saved
    ]
    if len(_sys.argv) > 1:  # e.g. "attn,attn" to run one variant
        e, p = _sys.argv[1].split(",")
        cv = lambda s: {"True": True, "False": False}.get(s, s)
        variants = [(cv(e), cv(p))]
    clips = jax.random.normal(jax.random.PRNGKey(1), (24, 16, 224, 224, 3), jnp.bfloat16)
    for enc_remat, pred_remat in variants:
        try:
            fn, state = build(pred_remat, enc_remat)
            st = jax.device_put(state)
            st, m = fn(st, {"clips": clips})
            jax.block_until_ready(m["loss"])
            t0 = time.perf_counter()
            for _ in range(8):
                st, m = fn(st, {"clips": clips})
            jax.block_until_ready(m["loss"])
            dt = (time.perf_counter() - t0) / 8
            print(f"enc={enc_remat!r:7} pred={pred_remat!r:7} step {dt*1000:8.1f} ms "
                  f"({24/dt:.2f} clips/s) loss={float(m['loss']):.4f}", flush=True)
            del st, fn
        except Exception as e:
            print(f"enc={enc_remat!r:7} pred={pred_remat!r:7} FAILED: "
                  f"{str(e).splitlines()[0][:120]}", flush=True)


if __name__ == "__main__":
    main()
