"""Representation-quality A/B: pretrained encoder vs random init under the
frozen-probe protocol (reference README.md:95-115), on synthetic
structure-separable grating videos (jepa_tpu/data/synthetic.py).

Runs the REAL pretrain app end to end (native decode -> device augs ->
masks -> fused step -> orbax checkpoint), then the REAL
video_classification_frozen eval twice — once on the pretrained
checkpoint, once on a random-init checkpoint — and prints both top-1
curves. The pinned test lives in tests/test_repr_quality.py; this script
is the tuning/measurement harness.

Run: PYTHONPATH= JAX_PLATFORMS=cpu python scripts/exp_repr_quality.py
"""

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pretrain_cfg(folder, train_csv, *, crop, frames, epochs, ipe, batch,
                 lr, ema0, patch=16, reg_coeff=0.0, warmup=None, ema1=1.0):
    return {
        "app": "vjepa",
        "meta": {"seed": 11, "dtype": "float32", "mask_mode": "fixed",
                 "remat": False, "load_checkpoint": False},
        "model": {"model_name": "vit_tiny", "pred_depth": 2,
                  "pred_embed_dim": 96, "uniform_power": True,
                  "use_mask_tokens": True, "zero_init_mask_tokens": True},
        "data": {"dataset_type": "videodataset", "datasets": [train_csv],
                 "batch_size": batch, "num_clips": 1, "num_frames": frames,
                 "sampling_rate": 1, "tubelet_size": 2, "crop_size": crop,
                 "patch_size": patch, "num_workers": 2,
                 "decode_backend": "native", "filter_short_videos": False},
        "data_aug": {"random_resize_aspect_ratio": [0.9, 1.1],
                     "random_resize_scale": [0.4, 1.0],
                     "motion_shift": False, "auto_augment": False,
                     "reprob": 0.0},
        "loss": {"loss_exp": 1.0, "reg_coeff": reg_coeff},
        "mask": [
            {"num_blocks": 2, "spatial_scale": [0.3, 0.3],
             "temporal_scale": [1.0, 1.0], "aspect_ratio": [0.75, 1.5],
             "max_temporal_keep": 1.0, "max_keep": None},
        ],
        "optimization": {"ipe": ipe, "ipe_scale": 1.0, "epochs": epochs,
                         "warmup": warmup or max(1, epochs // 8),
                         "clip_grad": 10.0,
                         "lr": lr, "start_lr": lr / 5, "final_lr": lr / 20,
                         "weight_decay": 0.04, "final_weight_decay": 0.4,
                         "ema": [ema0, ema1]},
        "logging": {"folder": folder, "write_tag": "pre"},
    }


def eval_cfg(folder, ckpt, train_csv, val_csv, *, crop, frames, epochs, lr,
             batch, seed=5):
    return {
        "eval_name": "video_classification_frozen",
        "resume_checkpoint": False,
        "pretrain": {"model_name": "vit_tiny",
                     "checkpoint_key": "target_encoder", "folder": folder,
                     "checkpoint": ckpt, "write_tag": "probe",
                     "patch_size": 16, "tubelet_size": 2,
                     "frames_per_clip": frames, "frame_step": 1,
                     "uniform_power": True, "seed": seed},
        "data": {"dataset_train": train_csv, "dataset_val": val_csv,
                 "num_classes": 2, "frames_per_clip": frames,
                 "num_segments": 1, "num_views_per_segment": 1,
                 "decode_backend": "native", "num_workers": 2,
                 "auto_augment": False},
        "optimization": {"resolution": crop, "batch_size": batch,
                         "attend_across_segments": True,
                         "num_epochs": epochs, "weight_decay": 0.01,
                         "lr": lr, "start_lr": lr / 3, "final_lr": lr / 10,
                         "warmup": 1.0, "use_bfloat16": False},
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--crop", type=int, default=48)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--vid-frames", type=int, default=16)
    ap.add_argument("--n-train", type=int, default=24, help="per class")
    ap.add_argument("--n-val", type=int, default=12, help="per class")
    ap.add_argument("--amp-lo", type=float, default=25.0)
    ap.add_argument("--amp-hi", type=float, default=60.0)
    ap.add_argument("--noise", type=float, default=8.0)
    ap.add_argument("--kind", default="grating", choices=["grating", "gabor"])
    ap.add_argument("--no-photometric", action="store_true",
                    help="fix per-video color/brightness (see synthetic.py)")
    ap.add_argument("--n-patches", type=int, default=10,
                    help="gabor patches per video: denser = stronger "
                    "orientation signal (easier SSL task, but also a "
                    "stronger second-order leak into random features)")
    ap.add_argument("--ema1", type=float, default=1.0,
                    help="EMA momentum endpoint (< 1.0 keeps the target "
                    "tracking late-training encoder gains at toy scale)")
    ap.add_argument("--reg-coeff", type=float, default=0.0)
    ap.add_argument("--warmup", type=int, default=None)
    ap.add_argument("--skip-probes", action="store_true",
                    help="stop after pretraining (pair with diag_repr.py)")
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--ipe", type=int, default=16)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1.5e-3)
    ap.add_argument("--ema0", type=float, default=0.99)
    ap.add_argument("--probe-epochs", type=int, default=8)
    ap.add_argument("--probe-lr", type=float, default=0.01)
    ap.add_argument("--probe-batch", type=int, default=8)
    ap.add_argument("--probe-train-per-class", type=int, default=None,
                    help="label-scarce probe regime: probes train on only N "
                    "clips/class (pretraining still uses the full pool) — "
                    "an information-preserving random encoder lets the "
                    "attentive probe memorize but not generalize, a "
                    "pretrained low-dim representation generalizes")
    ap.add_argument("--data-seed", type=int, default=0,
                    help="synthetic dataset draw (video content); pin "
                    "robustness = the margin must hold across draws")
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--skip-pretrain", action="store_true",
                    help="reuse an existing workdir's checkpoint")
    args = ap.parse_args()

    work = args.workdir or tempfile.mkdtemp(prefix="reprq_")
    print("workdir:", work, flush=True)
    data_dir = os.path.join(work, "data")

    from jepa_tpu.data.synthetic import write_grating_dataset

    if not os.path.exists(os.path.join(data_dir, "train.csv")):
        train_csv, val_csv = write_grating_dataset(
            data_dir, args.n_train, args.n_val,
            num_frames=args.vid_frames, size=args.size, seed=args.data_seed,
            amp_range=(args.amp_lo, args.amp_hi), noise=args.noise,
            kind=args.kind, photometric=not args.no_photometric,
            n_patches=args.n_patches)
    else:
        train_csv = os.path.join(data_dir, "train.csv")
        val_csv = os.path.join(data_dir, "val.csv")
    print("dataset:", train_csv, flush=True)

    # ---- random-init checkpoint (same geometry as the pretrain run) ------
    import jax
    import jax.numpy as jnp

    from jepa_tpu.models.factory import predictor_cfg_for, vit_cfg
    from jepa_tpu.train.step import init_train_state
    from jepa_tpu.utils import checkpoint as ckpt_lib

    rand_dir = os.path.join(work, "rand_ckpt")
    if not os.path.exists(os.path.join(rand_dir, "rand-latest")):
        enc_cfg = vit_cfg(
            "vit_tiny", img_size=args.crop, patch_size=16,
            num_frames=args.frames, tubelet_size=2, uniform_power=True,
            compute_dtype=jnp.float32, attn_impl="xla")
        pred_cfg = predictor_cfg_for(
            enc_cfg, predictor_embed_dim=96, depth=2, num_mask_tokens=1)
        state, _ = init_train_state(jax.random.PRNGKey(7), enc_cfg, pred_cfg)
        os.makedirs(rand_dir, exist_ok=True)
        ckpt_lib.save_checkpoint(rand_dir, "rand", jax.device_get(state), epoch=0)
    rand_ckpt = os.path.join(rand_dir, "rand-latest")

    # ---- pretrain --------------------------------------------------------
    pre_dir = os.path.join(work, "pretrain")
    pre_ckpt = os.path.join(pre_dir, "pre-latest")
    if not args.skip_pretrain or not os.path.exists(pre_ckpt):
        os.makedirs(pre_dir, exist_ok=True)
        from jepa_tpu.apps.vjepa.train import main as train_main

        cfg = pretrain_cfg(pre_dir, train_csv, crop=args.crop,
                           frames=args.frames, epochs=args.epochs,
                           ipe=args.ipe, batch=args.batch, lr=args.lr,
                           ema0=args.ema0, reg_coeff=args.reg_coeff,
                           warmup=args.warmup, ema1=args.ema1)
        state = train_main(cfg)
        print("pretrained steps:", int(state["step"]), flush=True)

    if args.skip_probes:
        return

    # ---- probes ----------------------------------------------------------
    from jepa_tpu.evals.scaffold import main as eval_main

    probe_train_csv = train_csv
    if args.probe_train_per_class is not None:
        rows = [l.strip() for l in open(train_csv) if l.strip()]
        by_cls = {}
        for r in rows:
            by_cls.setdefault(r.rsplit(" ", 1)[1], []).append(r)
        sub = [r for rs in by_cls.values()
               for r in rs[: args.probe_train_per_class]]
        probe_train_csv = os.path.join(data_dir, "probe_train.csv")
        with open(probe_train_csv, "w") as f:
            f.write("\n".join(sub) + "\n")
        print(f"probe train subset: {len(sub)} clips", flush=True)

    results = {}
    for name, ckpt in (("random", rand_ckpt), ("pretrained", pre_ckpt)):
        folder = os.path.join(work, f"probe_{name}")
        os.makedirs(folder, exist_ok=True)
        cfg = eval_cfg(folder, ckpt, probe_train_csv, val_csv, crop=args.crop,
                       frames=args.frames, epochs=args.probe_epochs,
                       lr=args.probe_lr, batch=args.probe_batch)
        accs = eval_main("video_classification_frozen", args_eval=cfg)
        results[name] = accs
        print(f"{name}: {[round(a, 2) for a in accs]}", flush=True)

    print("RESULT random best:", max(results["random"]),
          "pretrained best:", max(results["pretrained"]), flush=True)


if __name__ == "__main__":
    main()
