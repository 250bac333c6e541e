"""Prove the PRODUCTION ViT-H/16 two-config fused step end-to-end on an
8-device virtual CPU mesh (VERDICT round-2 item 5).

BENCH.md round 2 reported the full two-mask-config ViT-H step dying inside
the axon remote-compile helper (same class as the remat=False crash) and
attributed it to the tunnel. This script is the evidence that the program
itself is framework-clean: real model dims (1280 x depth 32), the real
224px/16f token grid (1568 tokens), BOTH production mask configs from
configs/pretrain/vith16.yaml with keep-counts calibrated at the reference
per-rank batch 24, ZeRO-1 fsdp=2 sharding — compiled by the stock local
CPU backend and executed for one step.

Run:
  PYTHONPATH= python scripts/dryrun_vith_production.py [--img 384]

--img 384 proves the vith16_384 geometry (N = 8*24*24 = 4608 tokens,
configs/pretrain/vith16_384.yaml) instead of the default 224. At 384 the
mesh becomes {'data': 1, 'fsdp': 8} with batch 1: activations scale ~3x
and the replicated-per-virtual-device state already peaked at 99.3GB RSS
at 224/batch 4 on this 125GB host (VERDICT r3 item 2).

Prints one summary line with compile time, step wall time and peak RSS;
exits nonzero on any failure. fp32 compute (CPU has no native bf16); the
program structure (two-config fused step + shardings) is identical to the
on-chip bf16 one.
"""

from __future__ import annotations

import os
import resource
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_DEVICES = 8
IMG = 384 if "--img" in sys.argv and "384" in sys.argv else 224

# Self-provision the virtual CPU mesh BEFORE jax imports: this proof must
# never touch the TPU tunnel (and a stale JAX_PLATFORMS=axon with a stripped
# PYTHONPATH would fail outright).
if os.environ.get("_VITH_DRYRUN_CHILD") != "1":
    import subprocess

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={N_DEVICES}"
    env["PYTHONPATH"] = REPO
    env["_VITH_DRYRUN_CHILD"] = "1"
    r = subprocess.run([sys.executable, os.path.abspath(__file__)] + sys.argv[1:],
                       env=env, cwd=REPO)
    sys.exit(r.returncode)


def main(n_devices: int = N_DEVICES) -> None:
    import jax

    import yaml
    import jax.numpy as jnp

    from jepa_tpu.masks.multiblock3d import (
        MaskGrid,
        MaskSpec,
        calibrate_keep_counts,
    )
    from jepa_tpu.models.factory import predictor_cfg_for, vit_cfg
    from jepa_tpu.parallel.mesh import batch_sharding, make_mesh, train_state_shardings
    from jepa_tpu.train.step import TrainCfg, build_train_step, init_train_state
    from jepa_tpu.utils.schedulers import build_schedules

    cfg_name = "vith16_384.yaml" if IMG == 384 else "vith16.yaml"
    cfg = yaml.safe_load(open(os.path.join(REPO, "configs/pretrain", cfg_name)))
    cd = cfg["data"]
    cm = cfg["model"]
    crop, frames, tub, patch = (
        cd["crop_size"], cd["num_frames"], cd["tubelet_size"], cd["patch_size"],
    )
    ref_batch = cd["batch_size"]  # 24/GPU — calibrates the mask keep-counts

    enc_cfg = vit_cfg(
        cm["model_name"], img_size=crop, num_frames=frames, tubelet_size=tub,
        patch_size=patch, uniform_power=cm["uniform_power"],
        compute_dtype=jnp.float32, remat=True,
    )
    pred_cfg = predictor_cfg_for(
        enc_cfg, predictor_embed_dim=cm["pred_embed_dim"],
        depth=cm["pred_depth"], num_mask_tokens=len(cfg["mask"]),
    )
    grid = MaskGrid.from_data_cfg(crop, patch, frames, tub)
    specs = [
        MaskSpec(
            num_blocks=m["num_blocks"],
            spatial_scale=tuple(m["spatial_scale"]),
            aspect_ratio=tuple(m["aspect_ratio"]),
            temporal_scale=tuple(m["temporal_scale"]),
        )
        for m in cfg["mask"]
    ]
    kc = [calibrate_keep_counts(s, grid, ref_batch) for s in specs]
    print(f"grid n={grid.n} keep_counts={kc}", flush=True)

    # 384px: batch 1 on a {'data':1,'fsdp':8} mesh — the N=4608 activations
    # at batch 4 would OOM the 125GB host (see module docstring)
    mesh = make_mesh(fsdp=8 if IMG == 384 else 2, devices=jax.devices()[:n_devices])
    batch = mesh.shape["data"]  # 1 clip per data-parallel group: tiny batch

    t0 = time.time()
    # unroll_blocks=True: the SHIPPED pretrain-config default (per-layer
    # block params + AdamW moments, configs/pretrain/vith16*.yaml
    # meta.unroll_blocks) — so this proof covers the layout production runs
    # actually use, not just the stacked lax.scan variant.
    state, consts = init_train_state(
        jax.random.PRNGKey(0), enc_cfg, pred_cfg, unroll_blocks=True
    )
    n_params = sum(x.size for x in jax.tree.leaves(state["params"]))
    print(f"init {time.time()-t0:.1f}s params={n_params/1e6:.1f}M", flush=True)

    lr_s, wd_s, mom_s = build_schedules(
        ipe=300, num_epochs=300, warmup_epochs=40, start_lr=2e-4, ref_lr=6.25e-4,
        final_lr=1e-6, wd=0.04, final_wd=0.4, ema=(0.998, 1.0), ipe_scale=1.25,
    )
    tc = TrainCfg(num_clips=1, batch_size=batch, mask_mode="fixed", seed=234)
    shardings = train_state_shardings(mesh, state)
    # donate the input state: on the virtual CPU mesh every one of the 8
    # devices materializes the replicated 654M-param state (~63GB across
    # the mesh), so an undonated output state doubles that and OOMs a
    # 125GB host (first attempt died at 130GB RSS)
    step_fn = jax.jit(
        build_train_step(enc_cfg, pred_cfg, consts, tc, lr_s, wd_s, mom_s, specs, grid, kc),
        out_shardings=(shardings, None),
        donate_argnums=(0,),
    )
    state = jax.device_put(state, shardings)
    clips = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(1), (batch, frames, crop, crop, 3)),
        batch_sharding(mesh),
    )

    t0 = time.time()
    compiled = step_fn.lower(state, {"clips": clips}).compile()
    t_compile = time.time() - t0
    print(f"compile {t_compile:.1f}s", flush=True)

    t0 = time.time()
    new_state, metrics = compiled(state, {"clips": clips})
    jax.block_until_ready(new_state)
    t_step = time.time() - t0

    assert int(new_state["step"]) == 1
    loss = float(metrics["loss"])
    assert jnp.isfinite(loss), loss
    rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    print(
        f"VITH_PRODUCTION_OK img={IMG} mesh={dict(mesh.shape)} batch={batch} "
        f"tokens={grid.n} params={n_params/1e6:.0f}M compile={t_compile:.0f}s "
        f"step={t_step:.0f}s loss={loss:.4f} peak_rss={rss_gb:.1f}GB "
        f"unroll_blocks=True",
        flush=True,
    )


if __name__ == "__main__":
    main()
