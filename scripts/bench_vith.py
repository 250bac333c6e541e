"""ViT-H/16 fused pretrain step on one v5e chip (the BASELINE north star
is ViT-H pretrain at 45% MFU on v5p-64; this is the single-chip v5e floor
number). Params+opt (~10GB fp32) fit; per-chip batch is scanned downward.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/bench_vith.py
"""

from __future__ import annotations

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    from jepa_tpu.masks.multiblock3d import MaskGrid, MaskSpec, calibrate_keep_counts
    from jepa_tpu.models.factory import predictor_cfg_for, vit_cfg
    from jepa_tpu.train.step import TrainCfg, build_train_step, init_train_state
    from jepa_tpu.utils.logging import train_step_flops
    from jepa_tpu.utils.schedulers import build_schedules

    enc_cfg = vit_cfg("vit_huge", img_size=224, num_frames=16, tubelet_size=2,
                      uniform_power=True, remat=True)
    pred_cfg = predictor_cfg_for(enc_cfg, predictor_embed_dim=384, depth=12,
                                 num_mask_tokens=2, remat="attn")
    grid = MaskGrid.from_data_cfg(224, enc_cfg.patch_size, 16, 2)
    specs = [
        MaskSpec(num_blocks=8, spatial_scale=(0.15, 0.15), aspect_ratio=(0.75, 1.5)),
        MaskSpec(num_blocks=2, spatial_scale=(0.7, 0.7), aspect_ratio=(0.75, 1.5)),
    ]
    kc = [calibrate_keep_counts(s, grid, 24) for s in specs]  # reference rank batch
    lr_s, wd_s, mom_s = build_schedules(
        ipe=300, num_epochs=300, warmup_epochs=40, start_lr=2e-4, ref_lr=6.25e-4,
        final_lr=1e-6, wd=0.04, final_wd=0.4, ema=(0.998, 1.0), ipe_scale=1.25,
    )
    state0, consts = init_train_state(jax.random.PRNGKey(0), enc_cfg, pred_cfg)
    n_params = sum(x.size for x in jax.tree.leaves(state0["params"]))
    print(f"params: {n_params/1e6:.0f}M", flush=True)

    last_err = None
    for batch in (8, 4, 2):
        try:
            tc = TrainCfg(num_clips=1, batch_size=batch, mask_mode="fixed",
                          clip_grad=10.0, clip_after_step=0, seed=0)
            fn = jax.jit(
                build_train_step(enc_cfg, pred_cfg, consts, tc, lr_s, wd_s,
                                 mom_s, specs, grid, kc),
                donate_argnums=(0,),
            )
            clips = jax.random.normal(jax.random.PRNGKey(1),
                                      (batch, 16, 224, 224, 3), jnp.bfloat16)
            st = jax.device_put(state0)
            st, m = fn(st, {"clips": clips})
            jax.block_until_ready(m["loss"])
            t0 = time.perf_counter()
            for _ in range(10):
                st, m = fn(st, {"clips": clips})
            jax.block_until_ready(m["loss"])
            dt = (time.perf_counter() - t0) / 10
            flops = train_step_flops(
                enc_dim=enc_cfg.embed_dim, enc_depth=enc_cfg.depth,
                enc_mlp=enc_cfg.mlp_ratio, pred_dim=pred_cfg.predictor_embed_dim,
                pred_depth=pred_cfg.depth, n_full=grid.n,
                ctx_lens=[k[0] for k in kc], tgt_lens=[k[1] for k in kc],
                batch=batch, patch_dim=enc_cfg.patch_dim,
            )
            mfu = flops / dt / 197e12
            print(f"vit_huge b{batch}: step {dt*1e3:.1f} ms = "
                  f"{batch/dt:.2f} clips/s/chip, MFU {mfu*100:.1f}% "
                  f"(loss {float(m['loss']):.3f})", flush=True)
            return
        except Exception as e:
            last_err = e
            print(f"b{batch} failed: {str(e).splitlines()[0][:110]}", flush=True)
    raise last_err


if __name__ == "__main__":
    main()
