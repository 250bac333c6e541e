"""V-JEPA pretraining application (the reference's app/vjepa/train.py:66-586
re-designed TPU-first).

Differences that matter:
  * ONE jitted fused train step (masks + forwards + loss + AdamW + EMA);
    the Python loop only feeds batches and logs.
  * Masks are sampled on device (fixed mode) or host-collated + padded
    (parity mode, meta.mask_mode: padded).
  * Augmentation is a jitted device program over raw uint8 frames.
  * Schedules are pure functions of the step in the state — resume never
    replays iterators.
  * bfloat16 is native compute dtype (fp32 params/opt state); no GradScaler.

Config schema: identical to the reference YAML (configs/pretrain/*.yaml).
"""

from __future__ import annotations

import os
import time
import jax
import jax.numpy as jnp
import numpy as np

from jepa_tpu.configs import dump_config
from jepa_tpu.data.loader import make_video_loader
from jepa_tpu.data.transforms import AugmentCfg, pretrain_augment
from jepa_tpu.masks.multiblock3d import MaskGrid, MaskSpec, resolve_keep_counts
from jepa_tpu.masks.multiblock3d import select_pad_rungs, select_pad_tier
from jepa_tpu.masks.padding import pad_masks, static_cap
from jepa_tpu.masks.multiblock3d import MaskCollator as MB3DCollator
from jepa_tpu.masks.random_tube import TubeMaskCollator, TubeSpec, keep_counts as tube_keep_counts
from jepa_tpu.models.factory import predictor_cfg_for, vit_cfg
from jepa_tpu.parallel import mesh as mesh_lib
from jepa_tpu.parallel.dist import initialize as dist_init
from jepa_tpu.train.step import TrainCfg, build_train_step, init_train_state
from jepa_tpu.utils import checkpoint as ckpt_lib
from jepa_tpu.utils.logging import AverageMeter, CSVLogger, get_logger
from jepa_tpu.utils.schedulers import build_schedules

LOG_FREQ = 10
CHECKPOINT_FREQ = 1


def main(args: dict, resume_preempt: bool = False):
    # ---- config unpack (same keys as the reference) --------------------
    cfgs_meta = args.get("meta", {})
    load_model = bool(cfgs_meta.get("load_checkpoint")) or resume_preempt
    r_file = cfgs_meta.get("read_checkpoint", None)
    seed = int(cfgs_meta.get("seed", 0))
    save_every_freq = int(cfgs_meta.get("save_every_freq", -1))
    export_torch = bool(cfgs_meta.get("export_torch_checkpoint", False))
    which_dtype = str(cfgs_meta.get("dtype", "bfloat16")).lower()
    compute_dtype = {"bfloat16": jnp.bfloat16, "float16": jnp.bfloat16, "float32": jnp.float32}[which_dtype]
    mask_mode = cfgs_meta.get("mask_mode", "fixed")  # jepa_tpu extension

    cfgs_mask = args.get("mask", [])

    cfgs_model = args.get("model", {})
    model_name = cfgs_model.get("model_name", "vit_base")
    pred_depth = int(cfgs_model.get("pred_depth", 6))
    pred_embed_dim = int(cfgs_model.get("pred_embed_dim", 384))
    uniform_power = bool(cfgs_model.get("uniform_power", True))
    use_mask_tokens = bool(cfgs_model.get("use_mask_tokens", True))
    zero_init_mask_tokens = bool(cfgs_model.get("zero_init_mask_tokens", True))

    cfgs_data = args.get("data", {})
    dataset_type = str(cfgs_data.get("dataset_type", "videodataset")).lower()
    dataset_paths = cfgs_data.get("datasets", [])
    datasets_weights = cfgs_data.get("datasets_weights", None)
    batch_size = int(cfgs_data.get("batch_size"))
    num_clips = int(cfgs_data.get("num_clips", 1))
    num_frames = int(cfgs_data.get("num_frames", 16))
    tubelet_size = int(cfgs_data.get("tubelet_size", 2))
    sampling_rate = int(cfgs_data.get("sampling_rate", 4))
    duration = cfgs_data.get("clip_duration", None)
    crop_size = int(cfgs_data.get("crop_size", 224))
    patch_size = int(cfgs_data.get("patch_size", 16))
    num_workers = int(cfgs_data.get("num_workers", 8))
    filter_short_videos = bool(cfgs_data.get("filter_short_videos", False))
    decode_backend = cfgs_data.get("decode_backend", "auto")  # jepa_tpu extension

    cfgs_aug = args.get("data_aug", {})
    aug_cfg = AugmentCfg(
        crop_size=crop_size,
        random_resize_scale=tuple(cfgs_aug.get("random_resize_scale", (0.3, 1.0))),
        random_resize_aspect_ratio=tuple(cfgs_aug.get("random_resize_aspect_ratio", (0.75, 1.35))),
        motion_shift=bool(cfgs_aug.get("motion_shift", False)),
        reprob=float(cfgs_aug.get("reprob", 0.0)),
        auto_augment=(
            "rand-m7-n4-mstd0.5-inc1" if cfgs_aug.get("auto_augment", False) else None
        ),
    )

    cfgs_loss = args.get("loss", {})
    loss_exp = float(cfgs_loss.get("loss_exp", 1.0))
    reg_coeff = float(cfgs_loss.get("reg_coeff", 0.0))

    cfgs_opt = args.get("optimization", {})
    ipe = cfgs_opt.get("ipe", None)
    ipe_scale = float(cfgs_opt.get("ipe_scale", 1.0))
    clip_grad = cfgs_opt.get("clip_grad", None)
    wd = float(cfgs_opt.get("weight_decay"))
    final_wd = float(cfgs_opt.get("final_weight_decay"))
    num_epochs = int(cfgs_opt.get("epochs"))
    warmup = float(cfgs_opt.get("warmup"))
    start_lr = float(cfgs_opt.get("start_lr"))
    lr = float(cfgs_opt.get("lr"))
    final_lr = float(cfgs_opt.get("final_lr"))
    ema = cfgs_opt.get("ema", (0.998, 1.0))
    betas = tuple(cfgs_opt.get("betas", (0.9, 0.999)))
    eps = float(cfgs_opt.get("eps", 1e-8))

    cfgs_logging = args.get("logging", {})
    folder = cfgs_logging.get("folder", "./runs")
    tag = cfgs_logging.get("write_tag", "jepa")
    profile_steps = cfgs_logging.get("profile_steps", None)  # e.g. [20, 25]
    log_resources = bool(
        cfgs_data.get("log_resource_utilization", False)
        or cfgs_logging.get("log_resources", False)
    )

    # ---- runtime --------------------------------------------------------
    world_size, rank = dist_init()
    logger = get_logger(__name__, rank=rank)
    logger.info("initialized rank/world: %d/%d over %d devices", rank, world_size, jax.device_count())
    os.makedirs(folder, exist_ok=True)
    if rank == 0:
        dump_config(args, os.path.join(folder, "params-pretrain.yaml"))

    devices_per_host = jax.local_device_count()
    global_batch = batch_size * world_size * devices_per_host
    # meta.fsdp > 1 shards the optimizer moments over an fsdp mesh axis
    # (ZeRO-1-style) for models whose opt state won't fit replicated
    fsdp = int(cfgs_meta.get("fsdp", 1))
    mesh = mesh_lib.make_mesh(fsdp=fsdp)

    # ---- model ----------------------------------------------------------
    enc_cfg = vit_cfg(
        model_name,
        img_size=crop_size,
        patch_size=patch_size,
        num_frames=num_frames,
        tubelet_size=tubelet_size,
        uniform_power=uniform_power,
        compute_dtype=compute_dtype,
        # rematerialize block activations in the backward pass; without it
        # ViT-L @ b24 wants ~72GB of HBM (activations of 24 scanned layers).
        # Default 'attn' additionally saves the flash kernels' (o, lse) so
        # the backward never re-runs the attention kernel (~0.9GB HBM at
        # ViT-L/b24, measured 800 vs 803 ms/step vs full remat; meta.remat
        # accepts true (full) / 'attn' / false).
        remat=cfgs_meta.get("remat", "attn"),
    )
    pred_cfg = predictor_cfg_for(
        enc_cfg,
        predictor_embed_dim=pred_embed_dim,
        depth=pred_depth,
        use_mask_tokens=use_mask_tokens,
        num_mask_tokens=len(cfgs_mask),
        zero_init_mask_tokens=zero_init_mask_tokens,
        # selective remat: save the flash kernels' (o, lse) across the scan
        # so the predictor backward never re-runs the attention forward
        # (~2% step win for ~0.8GB HBM at ViT-L/b24; meta.pred_remat opts out)
        remat=cfgs_meta.get("pred_remat", "attn" if cfgs_meta.get("remat", True) else False),
    )
    # per-layer block state (meta.unroll_blocks): kills the scan-transpose /
    # restack DUS copies on TPU (BENCH.md round 4: 731.6 -> 695.1 ms/step at
    # ViT-L b24). Checkpoints stay in the canonical stacked layout via
    # stack_train_state/unstack_train_state at the save/load boundaries.
    unroll_blocks = bool(cfgs_meta.get("unroll_blocks", False))
    state, consts = init_train_state(
        jax.random.PRNGKey(seed), enc_cfg, pred_cfg, unroll_blocks=unroll_blocks
    )
    n_enc = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(state["params"]["encoder"]))
    n_pred = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(state["params"]["predictor"]))
    logger.info("encoder parameters: %d", n_enc)
    logger.info("predictor parameters: %d", n_pred)

    # ---- masks ----------------------------------------------------------
    grid = MaskGrid.from_data_cfg(crop_size, patch_size, num_frames, tubelet_size)
    mask_type = cfgs_data.get("mask_type", "multiblock3d")
    if mask_type == "multiblock3d":
        from jepa_tpu.masks.multiblock3d import calibrate_keep_counts, calibrate_pad_tiers

        specs = [MaskSpec.from_cfg(m) for m in cfgs_mask]
        # calibrate fixed-mode K at the REFERENCE's per-rank collator batch
        # (the YAML batch_size, e.g. 24): its batch-min truncation operates on
        # the per-GPU batch (reference multiblock3d.py:194-201), so the
        # effective-K distribution must not depend on our local device count
        kc = [calibrate_keep_counts(s, grid, batch_size) for s in specs]
        host_collator = MB3DCollator(specs, grid, seed=seed) if mask_mode == "padded" else None
        # padded-mode bucketed cap tiers (2-3 compiled shapes; each step pads
        # to the smallest tier covering the collator's actual K, rare heavier
        # masks truncate like the reference's max_keep slice). Calibrated at
        # the runtime chunking: per-device collates of the YAML batch_size,
        # requirement = max over all global devices' chunks. Host-side cost
        # scales with global device count, so only padded mode pays it.
        # meta.pad_tier_scope "spec" (round-5 default, measured 852.3 ms vs
        # joint tiers' 918.5/990 — BENCH.md): per-spec cap ladders picked
        # independently per mask config, so each spec lands on its cheap
        # rung at its own rate instead of only when ALL specs draw cheap
        # together (executables = product of ladder lengths, 6 cells
        # observed at the reference 2-spec config; real TPU VMs cache them)
        pad_scope = cfgs_meta.get("pad_tier_scope", "spec")
        pad_tiers = pad_ladders = None
        if mask_mode == "padded":
            if pad_scope == "spec":
                from jepa_tpu.masks.multiblock3d import calibrate_pad_ladders

                pad_ladders = calibrate_pad_ladders(
                    specs, grid, batch_size,
                    n_chunks=world_size * devices_per_host)
            else:
                pad_tiers = calibrate_pad_tiers(
                    specs, grid, batch_size,
                    n_chunks=world_size * devices_per_host)
    else:
        specs = [TubeSpec.from_cfg(m) for m in cfgs_mask]
        kc = [tube_keep_counts(s, grid) for s in specs]
        host_collator = TubeMaskCollator(specs, grid, seed=seed) if mask_mode == "padded" else None
        if mask_mode == "fixed":
            mask_mode = "tube"
        # tube masks are exact-K by construction: one tier, caps rounded up
        pad_ladders = None
        pad_tiers = [[
            (static_cap(grid.n, ke / grid.n), static_cap(grid.n, kp / grid.n))
            for ke, kp in kc
        ]]
    logger.info("mask grid %s keep counts %s mode %s", (grid.t, grid.h, grid.w), kc, mask_mode)
    if mask_mode == "padded":
        logger.info("padded-mode cap %s: %s",
                    "ladders" if pad_ladders is not None else "tiers",
                    pad_ladders if pad_ladders is not None else pad_tiers)

    # ---- data -----------------------------------------------------------
    if dataset_type == "synthetic":
        # Manifest-free smoke/bench mode: fabricate a manifest of synthetic
        # clip ids; the synthetic decode backend renders deterministic video.
        n_fake = int(cfgs_data.get("num_synthetic_videos", 512))
        manifest = os.path.join(folder, f"synthetic_r{rank}.csv")
        with open(manifest, "w") as f:
            for i in range(n_fake):
                f.write(f"synthetic://video{i} 0\n")
        ds, loader, sampler = make_video_loader(
            data_paths=[manifest],
            batch_size=batch_size * devices_per_host,
            frames_per_clip=num_frames,
            frame_step=sampling_rate,
            num_clips=num_clips,
            decode_backend="synthetic",
            rank=rank, world_size=world_size, num_workers=num_workers, seed=seed,
        )
    else:
        # The jitted device augmentation and np.stack collation need ONE
        # static frame shape across mixed-resolution videos. Default:
        # aspect-preserving decode (per-video short-side resize onto a
        # letterbox canvas + valid-region sidecar, like the reference's
        # undistorted RRC source frames, reference transforms.py:545-577).
        # data.decode_size opts into a fixed (distorting) canvas instead.
        decode_short = int(cfgs_data.get(
            "decode_short_side", int(crop_size * 256 / 224)
        ))
        if cfgs_data.get("decode_size") is not None:
            geom = dict(decode_size=tuple(cfgs_data["decode_size"]))
        else:
            canvas = tuple(cfgs_data.get(
                "decode_canvas", (2 * decode_short, 2 * decode_short)
            ))
            geom = dict(decode_short_side=decode_short, decode_canvas=canvas)
        ds, loader, sampler = make_video_loader(
            data_paths=dataset_paths,
            datasets_weights=datasets_weights,
            batch_size=batch_size * devices_per_host,
            frames_per_clip=num_frames,
            frame_step=sampling_rate,
            num_clips=num_clips,
            duration=duration,
            filter_short_videos=filter_short_videos,
            filter_long_videos=int(cfgs_data.get("filter_long_videos", 1e9)),
            decode_backend=decode_backend,
            rank=rank, world_size=world_size, num_workers=num_workers, seed=seed,
            **geom,
        )
    if ipe is None:
        ipe = len(loader)
    ipe = int(ipe)
    logger.info("iterations per epoch: %d (loader length %d)", ipe, len(loader))

    # ---- schedules + step -----------------------------------------------
    lr_sched, wd_sched, mom_sched = build_schedules(
        ipe=ipe, num_epochs=num_epochs, warmup_epochs=warmup,
        start_lr=start_lr, ref_lr=lr, final_lr=final_lr,
        wd=wd, final_wd=final_wd, ema=tuple(ema), ipe_scale=ipe_scale,
    )
    train_cfg = TrainCfg(
        loss_exp=loss_exp, reg_coeff=reg_coeff,
        clip_grad=None if clip_grad is None else float(clip_grad),
        clip_after_step=int((warmup + 1) * ipe),  # reference: epoch > warmup
        betas=betas, eps=eps, num_clips=num_clips,
        batch_size=batch_size, mask_mode=mask_mode, seed=seed,
    )
    state_shardings = mesh_lib.train_state_shardings(mesh, state)
    step_fn = jax.jit(
        build_train_step(
            enc_cfg, pred_cfg, consts, train_cfg,
            lr_sched, wd_sched, mom_sched, specs, grid, kc,
        ),
        donate_argnums=(0,),
        out_shardings=(state_shardings, None),
    )
    batch_sharding = mesh_lib.batch_sharding(mesh)
    state = jax.device_put(state, state_shardings)

    # ---- resume ----------------------------------------------------------
    start_epoch = 0
    latest_exists = os.path.exists(os.path.join(os.path.abspath(folder), f"{tag}-latest"))
    if load_model or latest_exists:
        if unroll_blocks:
            # checkpoints are canonical stacked: restore against a stacked
            # template, then return to the per-layer runtime layout
            from jepa_tpu.train.step import stack_train_state, unstack_train_state

            stacked, start_epoch = ckpt_lib.load_checkpoint(
                folder, tag, stack_train_state(state), read_path=r_file
            )
            state = unstack_train_state(stacked, enc_cfg.depth, pred_cfg.depth)
            state = jax.device_put(state, state_shardings)
        else:
            state, start_epoch = ckpt_lib.load_checkpoint(folder, tag, state, read_path=r_file)
        if host_collator is not None:
            host_collator.set_step(start_epoch * ipe)

    # ---- logging ---------------------------------------------------------
    csv_logger = CSVLogger(
        os.path.join(folder, f"{tag}_r{rank}.csv"),
        ("%d", "epoch"), ("%d", "itr"), ("%.5f", "loss"),
        ("%.5f", "loss-jepa"), ("%.5f", "reg-loss"),
        ("%.5f", "enc-grad-norm"), ("%.5f", "pred-grad-norm"),
        ("%d", "step-time(ms)"), ("%d", "wall-time(ms)"),
    )

    # analytic per-step model FLOPs for live MFU (jax equivalent of the
    # reference's CUDA-event timing + memory line, SURVEY §5.1)
    from jepa_tpu.utils.logging import train_step_flops

    step_flops = train_step_flops(
        enc_dim=enc_cfg.embed_dim, enc_depth=enc_cfg.depth, enc_mlp=enc_cfg.mlp_ratio,
        pred_dim=pred_cfg.predictor_embed_dim, pred_depth=pred_cfg.depth,
        n_full=grid.n, ctx_lens=[k[0] for k in kc], tgt_lens=[k[1] for k in kc],
        batch=batch_size * devices_per_host * num_clips, patch_dim=enc_cfg.patch_dim,
    )

    monitor = None
    if log_resources:
        from jepa_tpu.utils.monitoring import ResourceMonitoringThread

        monitor = ResourceMonitoringThread(interval_s=30.0, log_dir=folder, rank=rank)
        monitor.start()

    aug_key = jax.random.PRNGKey(seed + 11)

    def put_global(arr):
        return mesh_lib.put_global(batch_sharding, arr)

    def device_batch(np_batch, step):
        clips = put_global(np_batch["clips"])  # [nc*B, T, H, W, 3] uint8
        vhw = put_global(np_batch["valid_hw"]) if "valid_hw" in np_batch else None
        clips = pretrain_augment(
            jax.random.fold_in(aug_key, step), clips, aug_cfg, valid_hw=vhw
        )
        clips = clips.astype(compute_dtype)
        batch = {"clips": clips}
        if mask_mode == "padded":
            # one collate chunk per GLOBAL device (the reference's per-GPU
            # collate_fn granularity): samples get i.i.d. masks with a
            # per-chunk batch-min, identical for any process topology.
            # Every process generates ALL chunks (cheap numpy) so the tier
            # choice — hence the compiled shape — agrees across hosts, then
            # uploads only its own devices' rows (put_global alignment
            # matches the loader's rank-sliced clips).
            n_chunks = world_size * devices_per_host
            me_list, mp_list = host_collator.collate_chunks(batch_size, n_chunks)
            if pad_ladders is not None:
                rungs = select_pad_rungs(pad_ladders, me_list, mp_list)
                tier = [pad_ladders[s][r] for s, r in enumerate(rungs)]
            else:
                tier = pad_tiers[select_pad_tier(pad_tiers, me_list, mp_list)]
            lo, hi = rank * devices_per_host, (rank + 1) * devices_per_host
            batch["masks_enc"], batch["enc_weights"] = [], []
            batch["masks_pred"], batch["pred_weights"] = [], []
            for (mes, mps), (ce, cp) in zip(zip(me_list, mp_list), tier):
                pads = [pad_masks(m, ce) for m in mes[lo:hi]]
                batch["masks_enc"].append(put_global(np.concatenate([p[0] for p in pads])))
                batch["enc_weights"].append(put_global(np.concatenate([p[1] for p in pads])))
                pads = [pad_masks(m, cp) for m in mps[lo:hi]]
                batch["masks_pred"].append(put_global(np.concatenate([p[0] for p in pads])))
                batch["pred_weights"].append(put_global(np.concatenate([p[1] for p in pads])))
        return batch

    # ---- loop ------------------------------------------------------------
    loader_iter = iter(loader)
    profiling = False
    skip_batches = int(cfgs_meta.get("skip_batches", -1))
    if skip_batches > 0:
        logger.info("Skip %d batches", skip_batches)
        sampler.set_epoch(start_epoch)
        for itr in range(skip_batches):
            if itr % 10 == 0:
                logger.info("Skip %d/%d batches", itr, skip_batches)
            try:
                next(loader_iter)
            except StopIteration:
                loader_iter = iter(loader)
                next(loader_iter)
    for epoch in range(start_epoch, num_epochs):
        logger.info("Epoch %d", epoch + 1)
        sampler.set_epoch(epoch)
        meters = {k: AverageMeter() for k in ("loss", "jepa", "reg", "step_ms", "wall_ms", "ivar", "ivar_min")}

        for itr in range(ipe):
            t0 = time.time()
            try:
                np_batch = next(loader_iter)
            except StopIteration:
                logger.info("Exhausted data loaders. Refreshing...")
                loader_iter = iter(loader)
                np_batch = next(loader_iter)

            global_step = epoch * ipe + itr
            if profile_steps and global_step == int(profile_steps[0]):
                jax.profiler.start_trace(os.path.join(folder, "xplane"))
                profiling = True
            batch = device_batch(np_batch, global_step)
            t1 = time.time()
            state, metrics = step_fn(state, batch)
            metrics = jax.device_get(metrics)
            step_ms = (time.time() - t1) * 1000
            wall_ms = (time.time() - t0) * 1000
            if profiling and global_step >= int(profile_steps[1]):
                jax.profiler.stop_trace()
                profiling = False
                logger.info("wrote profiler trace to %s/xplane", folder)

            loss = float(metrics["loss"])
            meters["loss"].update(loss)
            meters["jepa"].update(float(metrics["loss_jepa"]))
            meters["reg"].update(float(metrics["loss_reg"]))
            meters["step_ms"].update(step_ms)
            meters["wall_ms"].update(wall_ms)
            meters["ivar"].update(float(metrics["input_var"]))
            meters["ivar_min"].update(float(metrics["input_var_min"]))

            csv_logger.log(
                epoch + 1, itr, loss,
                float(metrics["loss_jepa"]), float(metrics["loss_reg"]),
                float(metrics["enc_grad_norm"]), float(metrics["pred_grad_norm"]),
                step_ms, wall_ms,
            )
            if itr % LOG_FREQ == 0 or not np.isfinite(loss):
                mfu = step_flops / max(1e-9, meters["step_ms"].avg / 1000.0)
                logger.info(
                    "[%d, %5d] loss: %.3f | p%.3f r%.3f | input_var: %.3f %.3f "
                    "[wd: %.2e] [lr: %.2e] [step: %.1f ms] [wall: %.1f ms] "
                    "[tflops: %.1f] [m1: %.2e m2: %.2e] [g: %.2e %.2e]",
                    epoch + 1, itr, meters["loss"].avg, meters["jepa"].avg,
                    meters["reg"].avg, meters["ivar"].avg, meters["ivar_min"].avg,
                    float(metrics["wd"]), float(metrics["lr"]),
                    meters["step_ms"].avg, meters["wall_ms"].avg,
                    mfu / 1e12,
                    float(metrics["exp_avg_abs_mean"]), float(metrics["exp_avg_sq_mean"]),
                    float(metrics["enc_grad_norm"]), float(metrics["pred_grad_norm"]),
                )
                logger.info(
                    "[%d, %5d] enc_qkv_grads: f/l[%.2e %.2e] mn/mx(%.2e, %.2e) | "
                    "pred_qkv_grads: f/l[%.2e %.2e] mn/mx(%.2e, %.2e)",
                    epoch + 1, itr,
                    float(metrics["enc_qkv_first"]), float(metrics["enc_qkv_last"]),
                    float(metrics["enc_qkv_min"]), float(metrics["enc_qkv_max"]),
                    float(metrics["pred_qkv_first"]), float(metrics["pred_qkv_last"]),
                    float(metrics["pred_qkv_min"]), float(metrics["pred_qkv_max"]),
                )
            assert np.isfinite(loss), "loss is nan"

        logger.info("avg. loss %.3f", meters["loss"].avg)
        if epoch % CHECKPOINT_FREQ == 0 or epoch == num_epochs - 1:
            # canonical stacked layout on disk regardless of the runtime
            # block layout (stack_train_state is a no-op when stacked)
            from jepa_tpu.train.step import stack_train_state

            ckpt_state = jax.device_get(stack_train_state(state))
            # EVERY process calls the orbax save (it coordinates internally
            # and process 0 writes) — a rank-0-only call deadlocks in
            # orbax's multihost barrier when process_count > 1
            ckpt_lib.save_checkpoint(folder, tag, ckpt_state, epoch + 1, save_every_freq)
            if export_torch and rank == 0:
                # reference-compatible .pth.tar so original-framework users
                # can consume jepa_tpu pretrained weights directly
                from jepa_tpu.utils.checkpoint_port import save_torch_checkpoint

                host = ckpt_state
                save_torch_checkpoint(
                    os.path.join(folder, f"{tag}-latest.pth.tar"),
                    encoder=(host["params"]["encoder"], consts["encoder"]),
                    target_encoder=(host["target"], consts["encoder"]),
                    epoch=epoch + 1,
                    cfg=enc_cfg,
                    extra={"batch_size": batch_size, "world_size": world_size, "lr": lr},
                )

    if profiling:
        jax.profiler.stop_trace()
        logger.info("wrote profiler trace to %s/xplane", folder)
    if monitor is not None:
        monitor.stop()
    return state
