"""Diagnostic for the representation-quality experiment: skip the attentive
probe and measure the features directly.

For each checkpoint arm (random init, pretrained `encoder`, pretrained
`target_encoder`) over the grating val set:
  - mean-pooled feature class separability: ridge-regression train/val
    accuracy (closed form, no probe optimizer in the loop);
  - feature effective rank (entropy of normalized singular values) over
    token features — a collapse detector.

Run: PYTHONPATH= JAX_PLATFORMS=cpu python scripts/diag_repr.py <workdir>
(workdir = an exp_repr_quality.py --workdir with data/ + checkpoints)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def load_clips(csv_path, frames, crop):
    """Center-crop eval-style clips: [N, T, crop, crop, 3] float in [0,1]."""
    from jepa_tpu.native.videodec import VideoReader

    clips, labels = [], []
    for line in open(csv_path):
        path, lab = line.rsplit(" ", 1)
        rd = VideoReader(path)
        idx = np.linspace(0, rd.num_frames - 1, frames).round().astype(int)
        fr = rd.get_batch(idx)  # [T, H, W, 3] uint8
        h, w = fr.shape[1:3]
        y0, x0 = (h - crop) // 2, (w - crop) // 2
        clips.append(fr[:, y0:y0 + crop, x0:x0 + crop].astype(np.float32) / 255.0)
        labels.append(int(lab))
    return np.stack(clips), np.asarray(labels)


def encode(params, consts, cfg, clips):
    import jax
    import jax.numpy as jnp

    from jepa_tpu.models.vit import vit_forward

    mean = jnp.asarray([0.485, 0.456, 0.406])
    std = jnp.asarray([0.229, 0.224, 0.225])
    x = (jnp.asarray(clips) - mean) / std
    f = jax.jit(lambda p, xs: vit_forward(p, consts, xs, cfg))
    out = []
    for i in range(0, x.shape[0], 8):
        out.append(np.asarray(f(params, x[i:i + 8])))
    return np.concatenate(out)  # [N, tokens, D]


def ridge_acc(ftr_tr, y_tr, ftr_va, y_va, lam=1e-3):
    x = ftr_tr - ftr_tr.mean(0)
    xv = ftr_va - ftr_tr.mean(0)
    t = np.eye(2)[y_tr] - 0.5
    w = np.linalg.solve(x.T @ x + lam * len(x) * np.eye(x.shape[1]), x.T @ t)
    return ((xv @ w).argmax(1) == y_va).mean()


def eff_rank(tokens):
    x = tokens.reshape(-1, tokens.shape[-1])
    x = x - x.mean(0)
    s = np.linalg.svd(x[:4096], compute_uv=False)
    p = (s ** 2) / (s ** 2).sum()
    return float(np.exp(-(p * np.log(p + 1e-12)).sum()))


def main():
    work = sys.argv[1]
    crop = int(sys.argv[2]) if len(sys.argv) > 2 else 80
    frames = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    import jax
    import jax.numpy as jnp

    from jepa_tpu.models.factory import vit_cfg

    cfg = vit_cfg("vit_tiny", img_size=crop, patch_size=16, num_frames=frames,
                  tubelet_size=2, uniform_power=True,
                  compute_dtype=jnp.float32, attn_impl="xla")

    tr, y_tr = load_clips(os.path.join(work, "data/train.csv"), frames, crop)
    va, y_va = load_clips(os.path.join(work, "data/val.csv"), frames, crop)
    print(f"clips: train {tr.shape} val {va.shape}", flush=True)

    from jepa_tpu.models.vit import init_vit
    from jepa_tpu.utils.checkpoint import load_subtree

    tmpl, consts = init_vit(jax.random.PRNGKey(0), cfg)
    arms = [("random", os.path.join(work, "rand_ckpt/rand-latest"), "target"),
            ("pre-enc", os.path.join(work, "pretrain/pre-latest"), "encoder"),
            ("pre-tgt", os.path.join(work, "pretrain/pre-latest"), "target")]
    for name, path, key in arms:
        if key == "target":
            params = load_subtree(path, {"target": tmpl})["target"]
        else:
            params = load_subtree(
                path, {"params": {"encoder": tmpl}})["params"]["encoder"]
        f_tr = encode(params, consts, cfg, tr)
        f_va = encode(params, consts, cfg, va)
        acc = ridge_acc(f_tr.mean(1), y_tr, f_va.mean(1), y_va)
        print(f"{name:8s} ridge val acc {acc*100:5.1f}%  "
              f"eff-rank {eff_rank(f_va):6.1f}  "
              f"tokvar {float(f_va.var(1).mean()):.4f}", flush=True)


if __name__ == "__main__":
    main()
