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
        calibrate_pad_tiers,
        select_pad_tier,
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
    tiers = calibrate_pad_tiers(specs, grid, batch)
    print("pad cap tiers:", tiers)
    lr_s, wd_s, mom_s = build_schedules(
        ipe=300, num_epochs=300, warmup_epochs=40, start_lr=2e-4, ref_lr=6.25e-4,
        final_lr=1e-6, wd=0.04, final_wd=0.4, ema=(0.998, 1.0), ipe_scale=1.25,
    )
    # per-layer block state, same default as bench.py's fixed-mode headline
    # (JEPA_UNROLL_GRADS=0 restores the stacked scan layout for A/B)
    unroll_blocks = os.environ.get("JEPA_UNROLL_GRADS", "2") == "2"
    state, consts = init_train_state(jax.random.PRNGKey(0), enc_cfg, pred_cfg,
                                     unroll_blocks=unroll_blocks)
    tc = TrainCfg(num_clips=1, batch_size=batch, mask_mode="padded",
                  clip_grad=10.0, clip_after_step=0, seed=0)
    # JEPA_PADDED_DONATE=0: skip state donation. The axon client panics
    # (client.rs:2008 index==len, rc=134) when two executables (the two pad
    # tiers) alternate over donated state buffers — donation is a memory
    # optimization, not a speed one, so the undonated measurement is
    # timing-faithful. Real TPU VMs don't have this client.
    donate = os.environ.get("JEPA_PADDED_DONATE", "1") == "1"
    fn = jax.jit(
        build_train_step(enc_cfg, pred_cfg, consts, tc, lr_s, wd_s, mom_s,
                         specs, grid, [(0, 0)] * len(specs)),
        donate_argnums=(0,) if donate else (),
    )
    collator = MaskCollator(specs, grid, seed=0)
    clips = jax.random.normal(jax.random.PRNGKey(1), (batch, 16, 224, 224, 3),
                              jnp.bfloat16)

    tier_hits = [0] * len(tiers)

    def make_batch():
        me_list, mp_list = collator(batch)
        t = select_pad_tier(tiers, me_list, mp_list)
        tier_hits[t] += 1
        b = {"clips": clips, "masks_enc": [], "enc_weights": [],
             "masks_pred": [], "pred_weights": []}
        for (me, mp), (ce, cp) in zip(zip(me_list, mp_list), tiers[t]):
            m, w = pad_masks(me, ce)
            b["masks_enc"].append(jnp.asarray(m))
            b["enc_weights"].append(jnp.asarray(w))
            m, w = pad_masks(mp, cp)
            b["masks_pred"].append(jnp.asarray(m))
            b["pred_weights"].append(jnp.asarray(w))
        return b

    st = jax.device_put(state)
    # compile every tier up front (jit caches per shape) so the timed loop
    # measures steady state; the collator is counter-seeded, so replaying
    # the same iteration sequence afterwards reproduces the tier choices
    import copy

    warm_collator = copy.deepcopy(collator)
    seen = set()
    warm_hits = 0
    while len(seen) < len(tiers) and warm_hits < 64:
        me_list, mp_list = warm_collator(batch)
        t = select_pad_tier(tiers, me_list, mp_list)
        warm_hits += 1
        if t in seen:
            continue
        seen.add(t)
        b = {"clips": clips, "masks_enc": [], "enc_weights": [],
             "masks_pred": [], "pred_weights": []}
        for (me, mp), (ce, cp) in zip(zip(me_list, mp_list), tiers[t]):
            m, w = pad_masks(me, ce)
            b["masks_enc"].append(jnp.asarray(m))
            b["enc_weights"].append(jnp.asarray(w))
            m, w = pad_masks(mp, cp)
            b["masks_pred"].append(jnp.asarray(m))
            b["pred_weights"].append(jnp.asarray(w))
        st, m = fn(st, b)
        jax.block_until_ready(m["loss"])
        print(f"  compiled tier {t}: {tiers[t]}")

    iters = 24
    t0 = time.perf_counter()
    for _ in range(iters):
        st, m = fn(st, make_batch())
    jax.block_until_ready(m["loss"])
    dt = (time.perf_counter() - t0) / iters
    print(f"padded-parity step: {dt*1000:.1f} ms = {batch/dt:.2f} clips/s/chip "
          f"(tier hits {tier_hits} of {tiers}) "
          f"loss={float(m['loss']):.4f}")


if __name__ == "__main__":
    main()
