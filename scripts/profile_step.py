"""Profile the fused pretrain step on the TPU and print the top device ops.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_step.py
Parses the captured xplane with jax.profiler.ProfileData (no tensorboard
needed) and aggregates op durations per device line.
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

TRACE_DIR = "/tmp/jepa_xplane"


def build_step():
    from jepa_tpu.masks.multiblock3d import MaskGrid, MaskSpec, calibrate_keep_counts
    from jepa_tpu.models.factory import predictor_cfg_for, vit_cfg
    from jepa_tpu.train.step import TrainCfg, build_train_step, init_train_state
    from jepa_tpu.utils.schedulers import build_schedules

    enc_unroll = int(os.environ.get("ENC_UNROLL", "1"))
    pred_unroll = int(os.environ.get("PRED_UNROLL", "1"))
    enc_cfg = vit_cfg("vit_large", img_size=224, num_frames=16, tubelet_size=2,
                      uniform_power=True, remat="attn", scan_unroll=enc_unroll)
    pred_cfg = predictor_cfg_for(enc_cfg, predictor_embed_dim=384, depth=12,
                                 num_mask_tokens=2, remat="attn",
                                 scan_unroll=pred_unroll)
    grid = MaskGrid.from_data_cfg(224, enc_cfg.patch_size, 16, 2)
    specs = [
        MaskSpec(num_blocks=8, spatial_scale=(0.15, 0.15), aspect_ratio=(0.75, 1.5)),
        MaskSpec(num_blocks=2, spatial_scale=(0.7, 0.7), aspect_ratio=(0.75, 1.5)),
    ]
    kc = [calibrate_keep_counts(s, grid, 24) for s in specs]
    print("keep counts:", kc)
    lr_s, wd_s, mom_s = build_schedules(
        ipe=300, num_epochs=300, warmup_epochs=40, start_lr=2e-4, ref_lr=6.25e-4,
        final_lr=1e-6, wd=0.04, final_wd=0.4, ema=(0.998, 1.0), ipe_scale=1.25,
    )
    # JEPA_UNROLL_GRADS: "1" = per-layer grads w/ restack, "2" = fully
    # per-layer train state (zero stacking; see train/step.py)
    # default "2" = fully per-layer train state, matching bench.py's default
    unroll_state = os.environ.get("JEPA_UNROLL_GRADS", "2") == "2"
    state, consts = init_train_state(jax.random.PRNGKey(0), enc_cfg, pred_cfg,
                                     unroll_blocks=unroll_state)
    tc = TrainCfg(num_clips=1, batch_size=24, mask_mode="fixed",
                  clip_grad=10.0, clip_after_step=0, seed=0)
    fn = jax.jit(
        build_train_step(enc_cfg, pred_cfg, consts, tc, lr_s, wd_s, mom_s, specs, grid, kc),
        donate_argnums=(0,),
    )
    clips = jax.random.normal(jax.random.PRNGKey(1), (24, 16, 224, 224, 3), jnp.bfloat16)
    return fn, jax.device_put(state), clips


def main():
    fn, state, clips = build_step()
    state, m = fn(state, {"clips": clips})
    jax.block_until_ready(m["loss"])
    with jax.profiler.trace(TRACE_DIR):
        for _ in range(2):
            state, m = fn(state, {"clips": clips})
        jax.block_until_ready(m["loss"])
    print("loss:", float(m["loss"]))

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from xplane_util import print_xplane_summary

    print_xplane_summary(TRACE_DIR)


if __name__ == "__main__":
    main()
