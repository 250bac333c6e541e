"""Benchmark: fused V-JEPA pretrain step throughput on the local accelerator.

Measures the real workload — ViT-L/16 @ 224, 16 frames, the two-config
multiblock3d fused train step (target fwd + 2x context fwd + 2x predictor
fwd + loss + AdamW + EMA, on-device masks) in bf16 — and reports
clips/sec/chip, the primary metric in BASELINE.json. The reference
publishes no throughput numbers, so vs_baseline is measured model-FLOPs
utilization relative to the 45% MFU north star (BASELINE.json).

Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

PEAK_BF16 = {
    "v5e": 197e12,
    "v5litepod": 197e12,
    "v5p": 459e12,
    "v4": 275e12,
    "v6e": 918e12,
    "cpu": 1e12,  # nominal, so CPU runs still print something sane
}


def detect_peak() -> float:
    d = jax.devices()[0]
    kind = getattr(d, "device_kind", "").lower().replace(" ", "")
    for k, v in PEAK_BF16.items():
        if k in kind:
            return v
    if d.platform == "cpu":
        return PEAK_BF16["cpu"]
    return 197e12


def main():
    from jepa_tpu.masks.multiblock3d import (
        MaskGrid,
        MaskSpec,
        calibrate_keep_counts,
    )
    from jepa_tpu.models.factory import predictor_cfg_for, vit_cfg
    from jepa_tpu.train.step import TrainCfg, build_train_step, init_train_state
    from jepa_tpu.utils.logging import train_step_flops
    from jepa_tpu.utils.schedulers import build_schedules

    on_cpu = jax.devices()[0].platform == "cpu"
    model = "vit_tiny" if on_cpu else "vit_large"
    crop, frames = (64, 4) if on_cpu else (224, 16)
    batch_candidates = [2] if on_cpu else [24, 16, 8, 4]

    enc_cfg = vit_cfg(
        model, img_size=crop, num_frames=frames, tubelet_size=2,
        uniform_power=True, remat="attn" if not on_cpu else False,
    )
    pred_cfg = predictor_cfg_for(enc_cfg, predictor_embed_dim=384 if not on_cpu else 96,
                                 depth=12 if not on_cpu else 2, num_mask_tokens=2,
                                 remat="attn" if not on_cpu else False)
    grid = MaskGrid.from_data_cfg(crop, enc_cfg.patch_size, frames, 2)
    specs = [
        MaskSpec(num_blocks=8, spatial_scale=(0.15, 0.15), aspect_ratio=(0.75, 1.5)),
        MaskSpec(num_blocks=2, spatial_scale=(0.7, 0.7), aspect_ratio=(0.75, 1.5)),
    ]
    # effective shapes calibrated to the reference's batch-min distribution
    # (what production pretraining actually runs)
    kc = [calibrate_keep_counts(s, grid, batch_candidates[0]) for s in specs]
    lr_s, wd_s, mom_s = build_schedules(
        ipe=300, num_epochs=300, warmup_epochs=40, start_lr=2e-4, ref_lr=6.25e-4,
        final_lr=1e-6, wd=0.04, final_wd=0.4, ema=(0.998, 1.0), ipe_scale=1.25,
    )
    # per-layer block state on TPU: kills the scan-transpose / restack DUS
    # copies (731.6 -> 695.1 ms/step at ViT-L b24; BENCH.md round 4).
    # JEPA_UNROLL_GRADS=0 restores the stacked lax.scan layout for A/B.
    unroll_blocks = (not on_cpu) and os.environ.get("JEPA_UNROLL_GRADS", "2") == "2"
    state, consts = init_train_state(jax.random.PRNGKey(0), enc_cfg, pred_cfg,
                                     unroll_blocks=unroll_blocks)

    result = None
    for batch in batch_candidates:
        try:
            tc = TrainCfg(num_clips=1, batch_size=batch, mask_mode="fixed",
                          clip_grad=10.0, clip_after_step=0, seed=0)
            fn = jax.jit(
                build_train_step(enc_cfg, pred_cfg, consts, tc, lr_s, wd_s, mom_s, specs, grid, kc),
                donate_argnums=(0,),
            )
            clips = jax.random.normal(
                jax.random.PRNGKey(1), (batch, frames, crop, crop, 3), jnp.bfloat16
            )
            st = jax.device_put(state)
            st, m = fn(st, {"clips": clips})  # compile + 1 step
            jax.block_until_ready(m["loss"])
            n_iters = 3 if on_cpu else 10
            t0 = time.perf_counter()
            for _ in range(n_iters):
                st, m = fn(st, {"clips": clips})
            jax.block_until_ready(m["loss"])
            dt = (time.perf_counter() - t0) / n_iters
            result = (batch, dt)
            break
        except Exception as e:  # OOM at this batch -> try smaller
            last_err = e
            continue
    if result is None:
        raise last_err

    batch, dt = result
    clips_per_sec = batch / dt

    # secondary metric: frozen-encoder encode throughput (the eval path,
    # BASELINE.json "clips/sec/chip for ViT-L/H encode")
    from jepa_tpu.models.vit import init_vit, vit_forward

    ep, ec = init_vit(jax.random.PRNGKey(2), enc_cfg)
    import dataclasses

    # the eval/encode path is grad-free -> fused fc1 GELU kernel applies
    encode_cfg = dataclasses.replace(enc_cfg, fused_mlp=True)
    enc_fn = jax.jit(lambda p, c, x: vit_forward(p, c, x, encode_cfg))
    ex = jax.random.normal(jax.random.PRNGKey(3), (batch, frames, crop, crop, 3), jnp.bfloat16)
    o = enc_fn(ep, ec, ex)
    _ = float(jnp.sum(o.astype(jnp.float32)))  # host readback = hard sync
    encode_iters = 2 if on_cpu else 10
    t0 = time.perf_counter()
    for i in range(encode_iters):
        # vary input so the axon runtime can't serve cached results
        o = enc_fn(ep, ec, ex + jnp.bfloat16(i * 1e-3))
    _ = float(jnp.sum(o.astype(jnp.float32)))
    encode_dt = (time.perf_counter() - t0) / encode_iters
    encode_clips_per_sec = batch / encode_dt
    flops = train_step_flops(
        enc_dim=enc_cfg.embed_dim, enc_depth=enc_cfg.depth, enc_mlp=enc_cfg.mlp_ratio,
        pred_dim=pred_cfg.predictor_embed_dim, pred_depth=pred_cfg.depth,
        n_full=grid.n, ctx_lens=[k[0] for k in kc], tgt_lens=[k[1] for k in kc],
        batch=batch, patch_dim=enc_cfg.patch_dim,
    )
    mfu = flops / dt / detect_peak()
    print(
        json.dumps(
            {
                "metric": f"pretrain_clips_per_sec_per_chip_{model}_{crop}px_{frames}f",
                "value": round(clips_per_sec, 3),
                "unit": "clips/s/chip",
                "vs_baseline": round(mfu / 0.45, 4),
                "detail": {
                    "step_ms": round(dt * 1000, 2),
                    "batch_per_chip": batch,
                    "mfu": round(mfu, 4),
                    "encode_clips_per_sec_per_chip": round(encode_clips_per_sec, 2),
                    "device": str(jax.devices()[0].device_kind),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
