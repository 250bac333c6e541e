"""End-to-end representation-quality proof: pretraining beats random init.

The framework's reason to exist is that V-JEPA pretraining produces
transferable features (reference README.md:95-115 evaluates them with
frozen probes). This test runs the REAL pretrain app end to end — native
decode -> device augs -> on-device masks -> fused step -> EMA -> orbax
checkpoint — on synthetic gabor-field videos whose only class-predictive
structure is local orientation (jepa_tpu/data/synthetic.py), then measures
a closed-form ridge readout of mean-pooled encoder tokens on held-out
clips. The pretrained encoder must beat a random-init encoder of the same
geometry by a wide margin.

A linear readout is the right toy-scale protocol: the reference's
attentive probe was REFUTED at this scale (BENCH.md "Representation
quality" — a softmax probe on random ViT features solves synthetic
orientation outright because random projections preserve raw pixels,
while toy JEPA compresses to the low-dim predictive manifold). The ridge
readout isolates what pretraining added: linearly-accessible structure.

Arm pinned from the round-5 sweep (scripts/exp_repr_quality.py harness).
The pretrain runs in a SINGLE-DEVICE subprocess: dataset rng is
item-keyed (bit-reproducible), so on one device the measured accuracy is
a constant of the codebase (75.0% vs random ~chance) — whereas under the
conftest's 8-virtual-device mesh the psum reduction order perturbs the
knife-edge toy trajectory (measured 62.5% there). Budget: one 384-step
vit_tiny pretrain at crop 48 (~3.5 min measured on the 1-core CI box) —
among the slowest tests in the suite, and worth it: nothing else proves
the SSL objective learns through the full stack.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

CROP = 48
FRAMES = 8

_PRETRAIN_WORKER = r"""
import json, os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
sys.path = [p for p in sys.path if ".axon_site" not in p]
sys.path.insert(0, os.environ["REPO"])
from jepa_tpu.apps.vjepa.train import main
state = main(json.load(open(os.environ["CFG"])))
print("STEPS", int(state["step"]), flush=True)
"""


def _ridge_acc(ftr_tr, y_tr, ftr_va, y_va, lam=1e-3):
    x = ftr_tr - ftr_tr.mean(0)
    xv = ftr_va - ftr_tr.mean(0)
    t = np.eye(2)[y_tr] - 0.5
    w = np.linalg.solve(x.T @ x + lam * len(x) * np.eye(x.shape[1]), x.T @ t)
    return float(((xv @ w).argmax(1) == y_va).mean())


def _load_clips(csv_path):
    """Center-crop eval-style clips: [N, T, CROP, CROP, 3] float in [0,1]."""
    from jepa_tpu.native.videodec import VideoReader

    clips, labels = [], []
    for line in open(csv_path):
        path, lab = line.rsplit(" ", 1)
        rd = VideoReader(path)
        idx = np.linspace(0, rd.num_frames - 1, FRAMES).round().astype(int)
        fr = rd.get_batch(idx)
        h, w = fr.shape[1:3]
        y0, x0 = (h - CROP) // 2, (w - CROP) // 2
        clips.append(
            fr[:, y0:y0 + CROP, x0:x0 + CROP].astype(np.float32) / 255.0)
        labels.append(int(lab))
    return np.stack(clips), np.asarray(labels)


def _encode(params, consts, cfg, clips):
    import jax
    import jax.numpy as jnp

    from jepa_tpu.models.vit import vit_forward

    mean = jnp.asarray([0.485, 0.456, 0.406])
    std = jnp.asarray([0.229, 0.224, 0.225])
    x = (jnp.asarray(clips) - mean) / std
    f = jax.jit(lambda p, xs: vit_forward(p, consts, xs, cfg))
    out = [np.asarray(f(params, x[i:i + 8])) for i in range(0, len(x), 8)]
    return np.concatenate(out)  # [N, tokens, D] -> mean-pool over tokens


@pytest.mark.timeout(1200)
def test_pretraining_beats_random_init(tmp_path):
    import jax
    import jax.numpy as jnp

    from jepa_tpu.data.synthetic import write_grating_dataset
    from jepa_tpu.models.factory import vit_cfg
    from jepa_tpu.models.vit import init_vit
    from jepa_tpu.utils.checkpoint import load_subtree

    data_dir = str(tmp_path / "data")
    train_csv, val_csv = write_grating_dataset(
        data_dir, 24, 12, num_frames=16, size=64, seed=0,
        kind="gabor", noise=20.0, n_patches=10, photometric=True)

    folder = str(tmp_path / "pretrain")
    os.makedirs(folder)
    cfg = {
        "app": "vjepa",
        "meta": {"seed": 11, "dtype": "float32", "mask_mode": "fixed",
                 "remat": False, "load_checkpoint": False},
        "model": {"model_name": "vit_tiny", "pred_depth": 2,
                  "pred_embed_dim": 96, "uniform_power": True,
                  "use_mask_tokens": True, "zero_init_mask_tokens": True},
        "data": {"dataset_type": "videodataset", "datasets": [train_csv],
                 "batch_size": 8, "num_clips": 1, "num_frames": FRAMES,
                 "sampling_rate": 1, "tubelet_size": 2, "crop_size": CROP,
                 "patch_size": 16, "num_workers": 2,
                 "decode_backend": "native", "filter_short_videos": False},
        "data_aug": {"random_resize_aspect_ratio": [0.9, 1.1],
                     "random_resize_scale": [0.4, 1.0],
                     "motion_shift": False, "auto_augment": False,
                     "reprob": 0.0},
        "loss": {"loss_exp": 1.0, "reg_coeff": 1.0},
        "mask": [{"num_blocks": 2, "spatial_scale": [0.3, 0.3],
                  "temporal_scale": [1.0, 1.0], "aspect_ratio": [0.75, 1.5],
                  "max_temporal_keep": 1.0, "max_keep": None}],
        "optimization": {"ipe": 16, "ipe_scale": 1.0, "epochs": 24,
                         "warmup": 3, "clip_grad": 10.0,
                         "lr": 1.5e-3, "start_lr": 3e-4, "final_lr": 7.5e-5,
                         "weight_decay": 0.04, "final_weight_decay": 0.4,
                         "ema": [0.99, 1.0]},
        "logging": {"folder": folder, "write_tag": "pre"},
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    worker = tmp_path / "pretrain_worker.py"
    worker.write_text(_PRETRAIN_WORKER)
    env = {k: v for k, v in os.environ.items() if ".axon_site" not in v}
    env.update(REPO=os.getcwd(), CFG=str(cfg_path), PYTHONPATH="")
    p = subprocess.run(
        [sys.executable, str(worker)], env=env, timeout=1100,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    assert p.returncode == 0, p.stdout[-2000:]
    assert "STEPS 384" in p.stdout, p.stdout[-2000:]

    enc_cfg = vit_cfg("vit_tiny", img_size=CROP, patch_size=16,
                      num_frames=FRAMES, tubelet_size=2, uniform_power=True,
                      compute_dtype=jnp.float32, attn_impl="xla")
    tmpl, consts = init_vit(jax.random.PRNGKey(0), enc_cfg)

    # pretrained encoder from the saved checkpoint (canonical stacked layout)
    ckpt = os.path.join(folder, "pre-latest")
    pre_params = load_subtree(
        ckpt, {"params": {"encoder": tmpl}})["params"]["encoder"]
    # random init of the SAME geometry (different key than the template so
    # the baseline is not the zero-distance pytree)
    rand_params, _ = init_vit(jax.random.PRNGKey(7), enc_cfg)

    tr, y_tr = _load_clips(train_csv)
    va, y_va = _load_clips(val_csv)

    accs = {}
    for name, params in (("random", rand_params), ("pretrained", pre_params)):
        f_tr = _encode(params, consts, enc_cfg, tr).mean(1)
        f_va = _encode(params, consts, enc_cfg, va).mean(1)
        accs[name] = _ridge_acc(f_tr, y_tr, f_va, y_va)
    print("repr-quality ridge val acc:", accs)

    # measured round 5 (BENCH.md "Representation quality"): pretrained
    # 0.79 / random at chance; thresholds leave run-to-run margin
    assert accs["pretrained"] >= 0.70, accs
    assert accs["pretrained"] >= accs["random"] + 0.125, accs
