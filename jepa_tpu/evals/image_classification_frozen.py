"""Frozen-encoder attentive-probe image classification (IN1K/Places/iNat).

Re-design of reference evals/image_classification_frozen/eval.py:63-503.
The video encoder consumes images through the image->tubelet replication
path: the reference registers a forward-pre-hook replicating each image
frames_per_clip times on the time axis (reference eval.py:452-457); here
that's an explicit tiling function feeding the same video ViT forward.

Train transform: random-resized crop + hflip + the device AutoAugment
'original' policy (data.auto_augment, on by default — the reference uses
timm create_transform(auto_augment='original'), eval.py:394-403; see
data/randaugment.py:_AA_ORIGINAL_POLICY) + normalize + random erasing,
all on device over host-decoded fixed-canvas uint8 images. Val:
resize(256/224 * res) + center-crop, per reference eval.py:405-409.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from jepa_tpu.data.image_dataset import make_image_loader
from jepa_tpu.data.transforms import AugmentCfg, pretrain_augment, IMAGENET_MEAN, IMAGENET_STD
from jepa_tpu.models.attentive import (
    AttentiveCfg,
    classifier_forward,
    init_attentive_classifier,
)
from jepa_tpu.models.factory import vit_cfg
from jepa_tpu.models.vit import vit_forward
from jepa_tpu.parallel import mesh as mesh_lib
from jepa_tpu.parallel.dist import initialize as dist_init
from jepa_tpu.train.optimizer import (
    adamw_update,
    clip_by_global_norm,
    decay_mask,
    init_adamw_state,
)
from jepa_tpu.utils import checkpoint as ckpt_lib
from jepa_tpu.utils.logging import AverageMeter, CSVLogger, get_logger
from jepa_tpu.utils.schedulers import CosineWD, WarmupCosine
from jepa_tpu.evals.video_classification_frozen import _load_encoder


def _resolve_aa(val):
    """Config value -> AugmentCfg.auto_augment string (or None)."""
    if val is True:
        return "original"
    if not val:
        return None
    return str(val)


def main(args_eval: dict, resume_preempt: bool = False):
    args_pretrain = args_eval.get("pretrain", {})
    checkpoint_key = args_pretrain.get("checkpoint_key", "target_encoder")
    model_name = args_pretrain.get("model_name")
    patch_size = int(args_pretrain.get("patch_size", 16))
    pretrain_folder = args_pretrain.get("folder", ".")
    ckp_fname = args_pretrain.get("checkpoint", "")
    tag = args_pretrain.get("write_tag", "jepa")
    uniform_power = bool(args_pretrain.get("uniform_power", False))
    tubelet_size = int(args_pretrain.get("tubelet_size", 2))
    frames_per_clip = int(args_pretrain.get("frames_per_clip", 1))
    pretrained_path = os.path.join(pretrain_folder, ckp_fname)

    args_data = args_eval.get("data", {})
    num_classes = int(args_data.get("num_classes"))
    root_path = args_data.get("root_path")
    image_folder = args_data.get("image_folder", "")
    resolution = int(args_data.get("resolution", 224))
    num_workers = int(args_data.get("num_workers", 8))

    args_opt = args_eval.get("optimization", {})
    batch_size = int(args_opt.get("batch_size"))
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

    folder = os.path.join(pretrain_folder, "image_classification_frozen/")
    if eval_tag is not None:
        folder = os.path.join(folder, eval_tag)
    os.makedirs(folder, exist_ok=True)

    enc_cfg = vit_cfg(
        model_name,
        img_size=resolution,
        patch_size=patch_size,
        num_frames=frames_per_clip,
        tubelet_size=tubelet_size,
        uniform_power=uniform_power,
        compute_dtype=compute_dtype,
        fused_mlp=True,  # encoder is frozen (stop_gradient): grad-free fwd
    )
    enc_params, enc_consts = _load_encoder(pretrained_path, enc_cfg, checkpoint_key, logger)

    acfg = AttentiveCfg(
        embed_dim=enc_cfg.embed_dim, num_heads=enc_cfg.num_heads,
        depth=1, num_classes=num_classes, compute_dtype=compute_dtype,
    )
    clf_params = init_attentive_classifier(jax.random.PRNGKey(0), acfg)
    opt_state = init_adamw_state(clf_params)
    wd_mask = decay_mask(clf_params)

    _, train_loader, train_sampler = make_image_loader(
        root_path=root_path, image_folder=image_folder, batch_size=local_batch,
        training=True, output_size=int(resolution * 256 / 224),
        rank=rank, world_size=world_size, num_workers=num_workers,
    )
    val_ds, val_loader, _ = make_image_loader(
        root_path=root_path, image_folder=image_folder, batch_size=local_batch,
        training=False, output_size=resolution,
        resize_short=int(resolution * 256 / 224),
        rank=rank, world_size=world_size, num_workers=num_workers,
    )
    ipe = len(train_loader)
    logger.info("train iterations per epoch: %d", ipe)

    lr_sched = WarmupCosine(
        warmup_steps=int(warmup * ipe), start_lr=start_lr, ref_lr=lr,
        final_lr=final_lr, t_max=int(num_epochs * ipe),
    )
    # final_wd=1e-6 per reference init_opt defaults (image eval.py init_opt
    # mirrors video eval.py:529-534; config wd only sets ref_wd)
    wd_sched = CosineWD(ref_wd=wd, final_wd=1e-6, t_max=int(num_epochs * ipe))
    aug_cfg = AugmentCfg(
        crop_size=resolution,
        random_resize_scale=(0.08, 1.0),
        random_resize_aspect_ratio=(3 / 4, 4 / 3),
        random_horizontal_flip=True,
        reprob=0.25,
        # reference default: timm auto-augment 'original' (eval.py:394-403);
        # data.auto_augment accepts false (off), true/'original', or a
        # 'rand-...' timm config string
        auto_augment=_resolve_aa(args_data.get("auto_augment", True)),
    )

    def encode_images(images):
        """[B, H, W, C] -> tokens via image->tubelet replication.

        Explicit form of the reference's forward-pre-hook
        (eval.py:452-457): tile each image frames_per_clip times on the
        time axis and run the video encoder.
        """
        if frames_per_clip > 1:
            clips = jnp.broadcast_to(
                images[:, None], (images.shape[0], frames_per_clip) + images.shape[1:]
            )
            return vit_forward(enc_params, enc_consts, clips, enc_cfg)
        return vit_forward(enc_params, enc_consts, images, enc_cfg)

    def train_step(clf, opt, step, images, labels):
        feats = jax.lax.stop_gradient(encode_images(images))
        sched_step = (step + 1).astype(jnp.float32)
        lr_now = lr_sched(sched_step)
        wd_now = wd_sched(sched_step)

        def loss_fn(clf):
            logits = classifier_forward(clf, feats, acfg)
            onehot = jax.nn.one_hot(labels, num_classes)
            ce = -jnp.mean(jnp.sum(onehot * jax.nn.log_softmax(logits), axis=-1))
            acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
            return ce, acc

        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(clf)
        grads, _ = clip_by_global_norm(grads, 1.0, jnp.asarray(True))
        clf, opt, _ = adamw_update(
            clf, grads, opt, lr=lr_now, wd=wd_now, mask=wd_mask, step=sched_step
        )
        return clf, opt, step + 1, {"loss": loss, "acc": acc * 100.0}

    def val_step(clf, images, labels, weights):
        # GLOBAL (correct, total) over the data-sharded batch: XLA's
        # reduction is the cross-rank AllReduce (see video eval val_step)
        logits = classifier_forward(clf, encode_images(images), acfg)
        hit = (jnp.argmax(logits, -1) == labels).astype(jnp.float32)
        return jnp.sum(hit * weights), jnp.sum(weights)

    train_step = jax.jit(train_step, donate_argnums=(0, 1, 2))
    val_step = jax.jit(val_step)
    batch_sharding = mesh_lib.batch_sharding(mesh)

    def put_global(arr):
        return mesh_lib.put_global(batch_sharding, arr)

    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32) * 255.0
    std = jnp.asarray(IMAGENET_STD, jnp.float32) * 255.0

    @jax.jit
    def normalize_val(imgs):
        return ((imgs.astype(jnp.float32) - mean) / std).astype(compute_dtype)

    aug_key = jax.random.PRNGKey(4321)

    start_epoch = 0
    step = jnp.zeros((), jnp.int32)
    probe_state = {"classifier": clf_params, "opt": opt_state, "step": step}
    if resume_checkpoint and os.path.exists(os.path.join(folder, f"{tag}-latest")):
        probe_state, start_epoch = ckpt_lib.load_checkpoint(folder, tag, probe_state)
    clf_params, opt_state, step = (
        probe_state["classifier"], probe_state["opt"], probe_state["step"],
    )

    csv_logger = CSVLogger(
        os.path.join(folder, f"{tag}_r{rank}.csv"),
        ("%d", "epoch"), ("%.5f", "loss"), ("%.5f", "acc"),
    )

    val_accs = []
    for epoch in range(start_epoch, num_epochs):
        logger.info("Epoch %d", epoch + 1)
        train_sampler.set_epoch(epoch)
        meter = AverageMeter()
        for itr, np_batch in enumerate(train_loader):
            imgs = put_global(np_batch["images"])
            # treat as 1-frame clip for the shared device augmentation
            aug = pretrain_augment(
                jax.random.fold_in(aug_key, epoch * ipe + itr), imgs[:, None], aug_cfg
            )[:, 0].astype(compute_dtype)
            labels = put_global(np_batch["labels"])
            clf_params, opt_state, step, metrics = train_step(
                clf_params, opt_state, step, aug, labels
            )
            meter.update(float(metrics["acc"]))
            if itr % 20 == 0:
                logger.info("[%5d] train acc %.3f%% (loss %.3f)", itr, meter.avg, float(metrics["loss"]))

        # dedupe non-drop_last wrap padding + AllReduce across processes,
        # same accounting as the video eval (see its val loop comment)
        correct = total = 0.0
        k_item = 0
        for np_batch in val_loader:
            b = len(np_batch["labels"])
            pos = rank + (k_item + np.arange(b)) * world_size
            w = (pos < len(val_ds)).astype(np.float32)
            k_item += b
            images = np.asarray(np_batch["images"])
            labels_np = np.asarray(np_batch["labels"])
            if b < local_batch:
                # zero-weight pad to the compiled shape (see video eval)
                pad = local_batch - b
                images = np.concatenate([images, np.repeat(images[-1:], pad, 0)])
                labels_np = np.concatenate([labels_np, np.zeros(pad, labels_np.dtype)])
                w = np.concatenate([w, np.zeros(pad, np.float32)])
            imgs = normalize_val(put_global(images))
            labels = put_global(labels_np)
            weights = put_global(w)
            c, t = val_step(clf_params, imgs, labels, weights)
            correct += float(c)
            total += float(t)
        val_acc = 100.0 * correct / max(1, total)
        val_accs.append(val_acc)
        logger.info("[%5d] train: %.3f%% test: %.3f%%", epoch + 1, meter.avg, val_acc)
        csv_logger.log(epoch + 1, meter.avg, val_acc)
        # all processes participate in the orbax save (process 0 writes)
        ckpt_lib.save_checkpoint(
            folder, tag,
            {"classifier": jax.device_get(clf_params),
             "opt": jax.device_get(opt_state),
             "step": jax.device_get(step)},
            epoch + 1,
        )
    return val_accs
