"""Padded-parity-mode fused step on the real TPU (VERDICT round-1 item 9).

The padded mode is the checkpoint-parity story: host collator masks padded
to static caps with validity weights, kv-masked flash attention. One number
for BENCH.md next to the fixed-mode headline.

Usage: python scripts/bench_padded.py (from the repo root).
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


def main():
    from jepa_tpu.masks.multiblock3d import (
        MaskCollator,
        MaskGrid,
        MaskSpec,
        calibrate_pad_caps,
    )
    from jepa_tpu.masks.padding import pad_masks
    from jepa_tpu.models.factory import predictor_cfg_for, vit_cfg
    from jepa_tpu.train.step import TrainCfg, build_train_step, init_train_state
    from jepa_tpu.utils.schedulers import build_schedules

    batch = 24
    enc_cfg = vit_cfg("vit_large", img_size=224, num_frames=16, tubelet_size=2,
                      uniform_power=True, remat=True)
    pred_cfg = predictor_cfg_for(enc_cfg, predictor_embed_dim=384, depth=12,
                                 num_mask_tokens=2)
    grid = MaskGrid.from_data_cfg(224, enc_cfg.patch_size, 16, 2)
    specs = [
        MaskSpec(num_blocks=8, spatial_scale=(0.15, 0.15), aspect_ratio=(0.75, 1.5)),
        MaskSpec(num_blocks=2, spatial_scale=(0.7, 0.7), aspect_ratio=(0.75, 1.5)),
    ]
    pad_caps = [calibrate_pad_caps(s, grid, batch) for s in specs]
    print("pad caps:", pad_caps)
    lr_s, wd_s, mom_s = build_schedules(
        ipe=300, num_epochs=300, warmup_epochs=40, start_lr=2e-4, ref_lr=6.25e-4,
        final_lr=1e-6, wd=0.04, final_wd=0.4, ema=(0.998, 1.0), ipe_scale=1.25,
    )
    state, consts = init_train_state(jax.random.PRNGKey(0), enc_cfg, pred_cfg)
    tc = TrainCfg(num_clips=1, batch_size=batch, mask_mode="padded",
                  clip_grad=10.0, clip_after_step=0, seed=0)
    fn = jax.jit(
        build_train_step(enc_cfg, pred_cfg, consts, tc, lr_s, wd_s, mom_s,
                         specs, grid, [(0, 0)] * len(specs)),
        donate_argnums=(0,),
    )
    collator = MaskCollator(specs, grid, seed=0)
    clips = jax.random.normal(jax.random.PRNGKey(1), (batch, 16, 224, 224, 3),
                              jnp.bfloat16)

    def make_batch():
        me_list, mp_list = collator(batch)
        b = {"clips": clips, "masks_enc": [], "enc_weights": [],
             "masks_pred": [], "pred_weights": []}
        for (me, mp), (ce, cp) in zip(zip(me_list, mp_list), pad_caps):
            m, w = pad_masks(me, ce)
            b["masks_enc"].append(jnp.asarray(m))
            b["enc_weights"].append(jnp.asarray(w))
            m, w = pad_masks(mp, cp)
            b["masks_pred"].append(jnp.asarray(m))
            b["pred_weights"].append(jnp.asarray(w))
        return b

    st = jax.device_put(state)
    st, m = fn(st, make_batch())
    jax.block_until_ready(m["loss"])
    iters = 8
    t0 = time.perf_counter()
    for _ in range(iters):
        st, m = fn(st, make_batch())
    jax.block_until_ready(m["loss"])
    dt = (time.perf_counter() - t0) / iters
    print(f"padded-parity step: {dt*1000:.1f} ms = {batch/dt:.2f} clips/s/chip "
          f"(caps {pad_caps}) "
          f"loss={float(m['loss']):.4f}")


if __name__ == "__main__":
    main()
