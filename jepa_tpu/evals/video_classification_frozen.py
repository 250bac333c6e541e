"""Frozen-encoder attentive-probe video classification (K400 / SSv2).

Re-design of reference evals/video_classification_frozen/eval.py:67-561:
a pretrained encoder (ported .pth.tar zoo checkpoint or jepa_tpu orbax
run) is frozen; an AttentiveClassifier trains with cross-entropy on top of
aggregated clip features; validation is multi-segment x multi-view with
softmax-averaged top-1.

TPU-native structure: TWO jitted programs — a probe train step (encoder
fwd + classifier fwd/bwd + clip(1.0) + AdamW fused) and a val step (one
batched encoder fwd over all S*V views + per-view classifier + softmax
average). Probe schedules are pure functions of step; the encoder forward
is shared and cached across both programs' compilations.
"""

from __future__ import annotations

import os
import jax
import jax.numpy as jnp
import numpy as np

from jepa_tpu.data.loader import make_video_loader
from jepa_tpu.data.transforms import AugmentCfg, multiview_crops, pretrain_augment
from jepa_tpu.evals.aggregation import clip_aggregation, frame_aggregation
from jepa_tpu.models.attentive import (
    AttentiveCfg,
    classifier_forward,
    init_attentive_classifier,
)
from jepa_tpu.models.factory import vit_cfg
from jepa_tpu.models.vit import init_vit
from jepa_tpu.parallel import mesh as mesh_lib
from jepa_tpu.parallel.dist import initialize as dist_init
from jepa_tpu.train.optimizer import (
    adamw_update,
    clip_by_global_norm,
    decay_mask,
    init_adamw_state,
)
from jepa_tpu.utils import checkpoint as ckpt_lib
from jepa_tpu.utils.checkpoint_port import load_pretrained_encoder
from jepa_tpu.utils.logging import AverageMeter, CSVLogger, get_logger
from jepa_tpu.utils.schedulers import CosineWD, WarmupCosine


def _load_encoder(pretrained_path, enc_cfg, checkpoint_key, logger):
    """Ported torch zoo checkpoint (.pth.tar) or jepa_tpu orbax run dir."""
    if pretrained_path.endswith((".pth.tar", ".pth", ".pt")):
        return load_pretrained_encoder(
            pretrained_path, enc_cfg, checkpoint_key, tolerant=True
        )
    # orbax checkpoint from jepa_tpu pretraining: restore only the requested
    # encoder subtree, STRICTLY — a probe trained on a silently-random
    # encoder is worse than a crash (reference torch.load raises the same way,
    # evals/video_classification_frozen/eval.py:422-434).
    params, consts = init_vit(jax.random.PRNGKey(0), enc_cfg)
    if {"target_encoder": "target", "encoder": "params"}.get(checkpoint_key, "target") == "target":
        params = ckpt_lib.load_subtree(pretrained_path, {"target": params})["target"]
    else:
        params = ckpt_lib.load_subtree(
            pretrained_path, {"params": {"encoder": params}}
        )["params"]["encoder"]
    logger.info("restored jepa_tpu encoder (%s) from %s", checkpoint_key, pretrained_path)
    return params, consts


def _pad_clip_major(arr, segments, pad):
    """Pad a clip-major [S*B, ...] batch to [S*(B+pad), ...] by repeating
    each segment's last sample (consumed with zero validity weight)."""
    arr = np.asarray(arr)
    b = arr.shape[0] // segments
    a = arr.reshape((segments, b) + arr.shape[1:])
    a = np.concatenate([a, np.repeat(a[:, -1:], pad, axis=1)], axis=1)
    return a.reshape((segments * (b + pad),) + arr.shape[1:])


def main(args_eval: dict, resume_preempt: bool = False):
    # ---- config (reference schema) --------------------------------------
    args_pretrain = args_eval.get("pretrain", {})
    checkpoint_key = args_pretrain.get("checkpoint_key", "target_encoder")
    model_name = args_pretrain.get("model_name")
    patch_size = int(args_pretrain.get("patch_size", 16))
    pretrain_folder = args_pretrain.get("folder", ".")
    ckp_fname = args_pretrain.get("checkpoint", "")
    tag = args_pretrain.get("write_tag", "jepa")
    uniform_power = bool(args_pretrain.get("uniform_power", False))
    tubelet_size = int(args_pretrain.get("tubelet_size", 2))
    pretrain_frames_per_clip = int(args_pretrain.get("frames_per_clip", 1))
    eval_frame_step = int(args_pretrain.get("frame_step", 4))
    eval_duration = args_pretrain.get("clip_duration", None)
    pretrained_path = os.path.join(pretrain_folder, ckp_fname)

    args_data = args_eval.get("data", {})
    train_data_path = [args_data.get("dataset_train")]
    val_data_path = [args_data.get("dataset_val")]
    num_classes = int(args_data.get("num_classes"))
    eval_num_segments = int(args_data.get("num_segments", 1))
    eval_frames_per_clip = int(args_data.get("frames_per_clip", 16))
    eval_num_views_per_segment = int(args_data.get("num_views_per_segment", 1))
    decode_backend = args_data.get("decode_backend", "auto")
    num_workers = int(args_data.get("num_workers", 8))

    args_opt = args_eval.get("optimization", {})
    resolution = int(args_opt.get("resolution", 224))
    batch_size = int(args_opt.get("batch_size"))
    attend_across_segments = bool(args_opt.get("attend_across_segments", False))
    # opt-in 1D temporal sin-cos pos-embed over aggregated segments, indexed
    # by true clip frame indices (reference ClipAggregation(use_pos_embed=),
    # utils.py:106-119; the reference eval leaves it at the default False)
    use_pos_embed = bool(args_opt.get("use_pos_embed", False))
    num_epochs = int(args_opt.get("num_epochs"))
    wd = float(args_opt.get("weight_decay", 0.01))
    start_lr = float(args_opt.get("start_lr"))
    lr = float(args_opt.get("lr"))
    final_lr = float(args_opt.get("final_lr"))
    warmup = float(args_opt.get("warmup", 0.0))
    use_bfloat16 = bool(args_opt.get("use_bfloat16", True))

    resume_checkpoint = bool(args_eval.get("resume_checkpoint", False)) or resume_preempt
    eval_tag = args_eval.get("tag", None)

    world_size, rank = dist_init()
    logger = get_logger(__name__, rank=rank)
    # optimization.batch_size is per-DEVICE (reference: per-GPU); see
    # eval_batch_geometry for the full-machine batch/mesh layout
    mesh, local_batch = mesh_lib.eval_batch_geometry(batch_size)
    compute_dtype = jnp.bfloat16 if use_bfloat16 else jnp.float32

    folder = os.path.join(pretrain_folder, "video_classification_frozen/")
    if eval_tag is not None:
        folder = os.path.join(folder, eval_tag)
    os.makedirs(folder, exist_ok=True)

    # ---- frozen encoder ---------------------------------------------------
    enc_cfg = vit_cfg(
        model_name,
        img_size=resolution,
        patch_size=patch_size,
        num_frames=pretrain_frames_per_clip,
        tubelet_size=tubelet_size,
        uniform_power=uniform_power,
        compute_dtype=compute_dtype,
        fused_mlp=True,  # encoder is frozen (stop_gradient): grad-free fwd
    )
    enc_params, enc_consts = _load_encoder(pretrained_path, enc_cfg, checkpoint_key, logger)
    is_video_encoder = pretrain_frames_per_clip > 1

    # ---- probe --------------------------------------------------------------
    acfg = AttentiveCfg(
        embed_dim=enc_cfg.embed_dim,
        num_heads=enc_cfg.num_heads,
        depth=1,
        num_classes=num_classes,
        compute_dtype=compute_dtype,
    )
    clf_params = init_attentive_classifier(jax.random.PRNGKey(0), acfg)
    opt_state = init_adamw_state(clf_params)
    wd_mask = decay_mask(clf_params)

    # ---- data ----------------------------------------------------------------
    # Aspect-preserving decode (default): per-video short-side resize onto a
    # static letterbox canvas with a valid-region sidecar — matches the
    # reference's short-side Resize geometry (utils.py:286-323) for any
    # source aspect. data.aspect_preserving: false reverts to a fixed
    # (distorting) 4:3 canvas.
    aspect = bool(args_data.get("aspect_preserving", True))
    train_short = int(resolution * 256 / 224)
    if aspect:
        train_geom = dict(decode_short_side=train_short,
                          decode_canvas=(2 * train_short, 2 * train_short))
        val_geom = dict(decode_short_side=resolution,
                        decode_canvas=(2 * resolution, 2 * resolution))
    else:
        train_geom = dict(decode_size=(train_short, int(train_short * 4 / 3)))
        val_geom = dict(decode_size=(resolution, int(resolution * 4 / 3)))
    train_segments = eval_num_segments if attend_across_segments else 1
    _, train_loader, train_sampler = make_video_loader(
        data_paths=train_data_path,
        batch_size=local_batch,
        frames_per_clip=eval_frames_per_clip,
        frame_step=eval_frame_step,
        num_clips=train_segments,
        duration=eval_duration,
        allow_clip_overlap=True,
        decode_backend=decode_backend,
        rank=rank, world_size=world_size, num_workers=num_workers,
        training=True, **train_geom,
    )
    val_ds, val_loader, val_sampler = make_video_loader(
        data_paths=val_data_path,
        batch_size=local_batch,
        frames_per_clip=eval_frames_per_clip,
        frame_step=eval_frame_step,
        num_clips=eval_num_segments,
        duration=eval_duration,
        allow_clip_overlap=True,
        decode_backend=decode_backend,
        rank=rank, world_size=world_size, num_workers=num_workers,
        training=False, drop_last=False, **val_geom,
    )
    ipe = len(train_loader)
    logger.info("train iterations per epoch: %d", ipe)

    lr_sched = WarmupCosine(
        warmup_steps=int(warmup * ipe), start_lr=start_lr, ref_lr=lr,
        final_lr=final_lr, t_max=int(num_epochs * ipe),
    )
    # probe wd cosine-decays config wd -> 1e-6: the reference's init_opt
    # defaults final_wd=1e-6 and eval.py:555-558 never overrides it — part
    # of the published 80.8-K400 probe recipe
    wd_sched = CosineWD(ref_wd=wd, final_wd=1e-6, t_max=int(num_epochs * ipe))

    aug_cfg = AugmentCfg(
        crop_size=resolution,
        random_resize_scale=(0.08, 1.0),
        random_resize_aspect_ratio=(0.75, 4 / 3),
        random_horizontal_flip=False,
        reprob=0.25,
        # reference hardcodes auto-augment for probe training
        # (utils.py:227-231); data.auto_augment=false opts out
        auto_augment=(
            "rand-m7-n4-mstd0.5-inc1" if args_data.get("auto_augment", True) else None
        ),
    )

    # ---- jitted programs ------------------------------------------------------
    from jepa_tpu.evals.aggregation import temporal_pos_embed_table

    # table rows: ClipAggregation indexes temporal TOKEN slots
    # (max_frames // tubelet_size rows, reference utils.py:106-112);
    # FrameAggregation indexes raw FRAME indices (full max_frames rows,
    # reference utils.py:43-47) — an image encoder has no tubelets.
    pos_table = (
        temporal_pos_embed_table(
            enc_cfg.embed_dim,
            tubelet_size=tubelet_size if is_video_encoder else 1,
        )
        if use_pos_embed
        else None
    )

    def encode(clips, clip_indices=None):
        """clips [B, S, V, T, H, W, C] -> list of aggregated feature seqs.
        clip_indices [B, S, T]: true frame indices (pos-embed opt-in)."""
        if is_video_encoder:
            return clip_aggregation(
                enc_params, enc_consts, clips, enc_cfg,
                attend_across_segments=attend_across_segments,
                pos_embed_table=pos_table, clip_indices=clip_indices,
            )
        return frame_aggregation(
            enc_params, enc_consts, clips, enc_cfg,
            pos_embed_table=pos_table, clip_indices=clip_indices,
        )

    def _all_logits(clf, feats):
        if attend_across_segments or not is_video_encoder:
            return [classifier_forward(clf, o, acfg) for o in feats]
        return [classifier_forward(clf, o, acfg) for views in feats for o in views]

    def train_step(clf, opt, step, clips, labels, clip_indices=None):
        clips = jax.lax.stop_gradient(clips)
        feats = [jax.lax.stop_gradient(f) for f in encode(clips, clip_indices)]
        sched_step = (step + 1).astype(jnp.float32)
        lr_now = lr_sched(sched_step)
        wd_now = wd_sched(sched_step)

        def loss_fn(clf):
            logits = _all_logits(clf, feats)
            onehot = jax.nn.one_hot(labels, num_classes)
            ce = sum(
                -jnp.mean(jnp.sum(onehot * jax.nn.log_softmax(l), axis=-1))
                for l in logits
            ) / len(logits)
            probs = sum(jax.nn.softmax(l) for l in logits) / len(logits)
            acc = jnp.mean((jnp.argmax(probs, -1) == labels).astype(jnp.float32))
            return ce, acc

        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(clf)
        grads, gnorm = clip_by_global_norm(grads, 1.0, jnp.asarray(True))
        clf, opt, _ = adamw_update(
            clf, grads, opt, lr=lr_now, wd=wd_now, mask=wd_mask, step=sched_step
        )
        return clf, opt, step + 1, {"loss": loss, "acc": acc * 100.0, "lr": lr_now}

    def val_step(clf, clips, labels, weights, clip_indices=None):
        # returns GLOBAL (correct, total): the sums run over the
        # data-sharded global batch, so XLA's reduction IS the cross-rank
        # AllReduce the reference does by hand (eval.py:359) — every
        # process reads the same replicated scalars
        feats = encode(clips, clip_indices)
        logits = _all_logits(clf, feats)
        probs = sum(jax.nn.softmax(l) for l in logits) / len(logits)
        hit = (jnp.argmax(probs, -1) == labels).astype(jnp.float32)
        return jnp.sum(hit * weights), jnp.sum(weights)

    train_step = jax.jit(train_step, donate_argnums=(0, 1, 2))
    val_step = jax.jit(val_step)
    batch_sharding = mesh_lib.batch_sharding(mesh)

    def put_global(arr):
        return mesh_lib.put_global(batch_sharding, arr)

    def put_clip_indices(np_batch, pad=0):
        """collate's per-sample clip-index lists -> global [B, S, T] int32
        (None unless the pos-embed opt-in is on)."""
        if not use_pos_embed:
            return None
        ci = np.stack(
            [np.stack(s) for s in np_batch["clip_indices"]]
        ).astype(np.int32)
        if pad:
            ci = np.concatenate([ci, np.repeat(ci[-1:], pad, 0)])
        return put_global(ci)

    def _sample_major(arr, segments):
        """Clip-major [S*B_local, ...] -> sample-major [B_local*S, ...].

        The GLOBAL batch axis must lead before put_global: multi-process
        assembly concatenates each process's block, and only a sample-major
        local layout makes that concatenation a valid global batch (a
        clip-major global array would interleave segment s of process p with
        segment s+1 of process p-1 under reshape)."""
        arr = np.asarray(arr)
        sb = arr.shape[0]
        b = sb // segments
        arr = arr.reshape((segments, b) + arr.shape[1:])
        arr = np.moveaxis(arr, 1, 0)
        return np.ascontiguousarray(arr).reshape((b * segments,) + arr.shape[2:])

    # ---- resume -----------------------------------------------------------
    latest = os.path.join(folder, f"{tag}-latest")
    start_epoch = 0
    step = jnp.zeros((), jnp.int32)
    probe_state = {"classifier": clf_params, "opt": opt_state, "step": step}
    if resume_checkpoint and os.path.exists(latest):
        probe_state, start_epoch = ckpt_lib.load_checkpoint(folder, tag, probe_state)
    clf_params, opt_state, step = (
        probe_state["classifier"], probe_state["opt"], probe_state["step"],
    )

    csv_logger = CSVLogger(
        os.path.join(folder, f"{tag}_r{rank}.csv"),
        ("%d", "epoch"), ("%.5f", "loss"), ("%.5f", "acc"),
    )
    aug_key = jax.random.PRNGKey(1234)

    def to_views_train(np_batch, gstep):
        # [S*B, T, H, W, 3] uint8 clip-major -> sample-major global array
        clips = put_global(_sample_major(np_batch["clips"], train_segments))
        vhw = put_global(_sample_major(np_batch["valid_hw"], train_segments))
        t, c = clips.shape[1], clips.shape[-1]
        out = pretrain_augment(
            jax.random.fold_in(aug_key, gstep), clips, aug_cfg, valid_hw=vhw
        )
        gb = out.shape[0] // train_segments
        out = out.reshape(gb, train_segments, 1, t, resolution, resolution, c)
        return out.astype(compute_dtype)  # [B, S, 1, T, H', W', C]

    def to_views_val(np_batch):
        clips = np.asarray(np_batch["clips"])  # [S*B, T, H, W, 3]
        sb, t, h, w, c = clips.shape
        b = sb // eval_num_segments
        clips = _sample_major(clips, eval_num_segments)
        clips = put_global(clips.reshape(b, eval_num_segments, t, h, w, c))
        # valid_hw rows are clip-major [S*B, 2], identical across a sample's
        # segments: the first B rows are segment 0's per-sample dims
        vhw = put_global(np.asarray(np_batch["valid_hw"][:b]))
        out = multiview_crops(
            clips, resolution, eval_num_views_per_segment, valid_hw=vhw
        )
        return out.astype(compute_dtype)

    val_accs = []
    for epoch in range(start_epoch, num_epochs):
        logger.info("Epoch %d", epoch + 1)
        train_sampler.set_epoch(epoch)
        train_meter = AverageMeter()
        for itr, np_batch in enumerate(train_loader):
            clips = to_views_train(np_batch, epoch * ipe + itr)
            labels = put_global(np_batch["labels"])
            clf_params, opt_state, step, metrics = train_step(
                clf_params, opt_state, step, clips, labels,
                put_clip_indices(np_batch),
            )
            train_meter.update(float(metrics["acc"]))
            if itr % 20 == 0:
                logger.info(
                    "[%5d] train acc %.3f%% (loss %.3f, lr %.1e)",
                    itr, train_meter.avg, float(metrics["loss"]), float(metrics["lr"]),
                )

        # Top-1 accounting (reference eval.py:260-272 AllReduces across ranks;
        # unlike it, padded duplicates from the non-drop_last sampler are
        # EXCLUDED: the k-th item this rank yields sits at global position
        # rank + k*world in the padded order, and positions >= len(val_ds)
        # are wrap-around duplicates).
        correct = total = 0.0
        k_item = 0
        for np_batch in val_loader:
            b = len(np_batch["labels"])
            pos = rank + (k_item + np.arange(b)) * world_size
            w = (pos < len(val_ds)).astype(np.float32)
            k_item += b
            clip_indices = put_clip_indices(np_batch, pad=local_batch - b)
            if b < local_batch:
                # pad the final partial batch to the compiled shape with
                # zero-weight repeats: one compiled val program, and the
                # global batch stays device-divisible under put_global
                # (ShardedSampler pads every rank to equal counts, so all
                # processes pad identically here)
                pad = local_batch - b
                np_batch = dict(np_batch)
                np_batch["clips"] = _pad_clip_major(
                    np_batch["clips"], eval_num_segments, pad
                )
                np_batch["valid_hw"] = _pad_clip_major(
                    np_batch["valid_hw"], eval_num_segments, pad
                )
                np_batch["labels"] = np.concatenate(
                    [np_batch["labels"], np.zeros(pad, np_batch["labels"].dtype)]
                )
                w = np.concatenate([w, np.zeros(pad, np.float32)])
            clips = to_views_val(np_batch)
            labels = put_global(np_batch["labels"])
            weights = put_global(w)
            c, t = val_step(clf_params, clips, labels, weights, clip_indices)
            correct += float(c)
            total += float(t)
        val_acc = 100.0 * correct / max(1, total)
        val_accs.append(val_acc)
        logger.info("[%5d] train: %.3f%% test: %.3f%%", epoch + 1, train_meter.avg, val_acc)
        csv_logger.log(epoch + 1, train_meter.avg, val_acc)
        # all processes participate in the orbax save (process 0 writes)
        ckpt_lib.save_checkpoint(
            folder, tag,
            {"classifier": jax.device_get(clf_params),
             "opt": jax.device_get(opt_state),
             "step": jax.device_get(step)},
            epoch + 1,
        )
    return val_accs
