"""On-device video augmentation (jitted uint8 -> normalized float).

The reference runs its augmentation pipeline on CPU inside DataLoader
workers with torch/PIL ops (reference: app/vjepa/transforms.py,
src/datasets/utils/video/transforms.py). TPU-native design: decode workers
hand over raw uint8 frames; everything after decode — random-resized crop
(plain or motion-shift), horizontal flip, normalization, cube random
erasing — is ONE jitted, vmapped program on device, overlapping the
previous step's compute via async dispatch.

Capability parity:
  * random_resized_crop: per-sample box from (scale, ratio) via the
    reference's 10-try rejection loop (uniform area x log-uniform ratio,
    accept if the box fits, center-crop fallback) run branchlessly in-jit
    (10 fixed candidate draws, first-accept select), bilinear resample —
    KS-tested against the torch sampler (reference transforms.py:545-577,
    _get_param_spatial_crop :503-542)
  * motion-shift: boxes sampled at the first/last frame and linearly
    interpolated per frame (reference transforms.py:580-622)
  * horizontal_flip with p=0.5 (reference transforms.py:160)
  * normalize with 0-255-scaled ImageNet stats (reference
    app/vjepa/transforms.py:61-66, _tensor_normalize_inplace)
  * RandomErasing 'pixel' mode incl. cube=True spatio-temporal erase
    (reference randerase.py:116-156)
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


@dataclasses.dataclass(frozen=True)
class AugmentCfg:
    crop_size: int = 224
    random_resize_scale: Tuple[float, float] = (0.3, 1.0)
    random_resize_aspect_ratio: Tuple[float, float] = (0.75, 1.35)
    random_horizontal_flip: bool = True
    motion_shift: bool = False
    reprob: float = 0.0
    # timm RandAugment config string (e.g. 'rand-m7-n4-mstd0.5-inc1') or None
    auto_augment: Optional[str] = None
    normalize_mean: Tuple[float, float, float] = IMAGENET_MEAN
    normalize_std: Tuple[float, float, float] = IMAGENET_STD


_RRC_TRIES = 10


def _sample_crop_box(rng, h: int, w: int, scale, ratio):
    """One crop box (i, j, bh, bw) in source pixels.

    Implements the reference's 10-try rejection loop (reference
    src/datasets/utils/video/transforms.py:503-542, torchvision-style)
    with static shapes: 10 candidate (area, aspect) draws are sampled at
    once — area uniform in [scale0, scale1]*HW, aspect log-uniform in
    ratio — and the FIRST in-bounds candidate wins. If all 10 miss
    (probability ~0.18^10 at pretrain settings), fall back to the
    reference's centered max-area crop with the aspect clamped into
    ``ratio``. h/w may be traced (aspect-preserving decode's valid_hw).
    """
    k_area, k_ar, k_i, k_j = jax.random.split(rng, 4)
    hw = h * w
    area = hw * jax.random.uniform(
        k_area, (_RRC_TRIES,), minval=scale[0], maxval=scale[1]
    )
    log_r = jax.random.uniform(
        k_ar, (_RRC_TRIES,), minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1])
    )
    r = jnp.exp(log_r)
    bws = jnp.sqrt(area * r)
    bhs = jnp.sqrt(area / r)
    ok = (bws <= w) & (bhs <= h)
    first = jnp.argmax(ok)  # index of the first True (0 if none)
    any_ok = jnp.any(ok)
    # fallback: whole image, aspect clamped into [ratio0, ratio1], centered
    in_r = w / h
    fb_w = jnp.where(in_r < ratio[0], w, jnp.where(in_r > ratio[1], h * ratio[1], w))
    fb_h = jnp.where(in_r < ratio[0], w / ratio[0], jnp.where(in_r > ratio[1], h, h))
    bw = jnp.where(any_ok, bws[first], fb_w)
    bh = jnp.where(any_ok, bhs[first], fb_h)
    u_i = jnp.where(any_ok, jax.random.uniform(k_i, ()), 0.5)
    u_j = jnp.where(any_ok, jax.random.uniform(k_j, ()), 0.5)
    i = u_i * (h - bh)
    j = u_j * (w - bw)
    return i, j, bh, bw


def _bilinear_crop_resize(frames, i, j, bh, bw, out_hw, valid_hw=None):
    """Crop box (i,j,bh,bw) from [T?, H, W, C] and resize to out_hw.

    Gather-based bilinear sampling; i/j/bh/bw may be per-frame arrays
    (motion shift) or scalars. frames: [T, H, W, C] float32. valid_hw (two
    traced ints) clamps sampling to the un-letterboxed region so aspect-
    preserving decode padding never bleeds into the crop.
    """
    t, h, w, c = frames.shape
    if valid_hw is not None:
        h = valid_hw[0]
        w = valid_hw[1]
    oh, ow = out_hw
    # Align-corners=False sampling positions within the box.
    ys = (jnp.arange(oh, dtype=jnp.float32) + 0.5) / oh  # [oh] in (0,1)
    xs = (jnp.arange(ow, dtype=jnp.float32) + 0.5) / ow
    i = jnp.broadcast_to(jnp.asarray(i, jnp.float32), (t,))
    j = jnp.broadcast_to(jnp.asarray(j, jnp.float32), (t,))
    bh = jnp.broadcast_to(jnp.asarray(bh, jnp.float32), (t,))
    bw = jnp.broadcast_to(jnp.asarray(bw, jnp.float32), (t,))
    src_y = i[:, None] + ys[None, :] * bh[:, None] - 0.5  # [T, oh]
    src_x = j[:, None] + xs[None, :] * bw[:, None] - 0.5  # [T, ow]

    y0 = jnp.floor(src_y)
    x0 = jnp.floor(src_x)
    wy = src_y - y0
    wx = src_x - x0
    y0 = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x0 = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)

    def gather_rows(fr, yy):
        # fr [H, W, C], yy [oh] -> [oh, W, C]
        return fr[yy]

    def per_frame(fr, y0t, y1t, x0t, x1t, wyt, wxt):
        r0 = fr[y0t]  # [oh, W, C]
        r1 = fr[y1t]
        c00 = r0[:, x0t]  # [oh, ow, C]
        c01 = r0[:, x1t]
        c10 = r1[:, x0t]
        c11 = r1[:, x1t]
        top = c00 * (1 - wxt[None, :, None]) + c01 * wxt[None, :, None]
        bot = c10 * (1 - wxt[None, :, None]) + c11 * wxt[None, :, None]
        return top * (1 - wyt[:, None, None]) + bot * wyt[:, None, None]

    return jax.vmap(per_frame)(frames, y0, y1, x0, x1, wy, wx)


def random_resized_crop_clip(rng, clip, cfg: AugmentCfg, valid_hw=None):
    """clip: [T, H, W, C] float32 -> [T, crop, crop, C].

    valid_hw ([2] int array) restricts the crop box to the un-letterboxed
    region (aspect-preserving decode) — the reference's RRC operates on
    undistorted frames (reference transforms.py:545-577)."""
    t = clip.shape[0]
    if valid_hw is not None:
        src_h, src_w = valid_hw[0].astype(jnp.float32), valid_hw[1].astype(jnp.float32)
    else:
        src_h, src_w = clip.shape[1], clip.shape[2]
    if cfg.motion_shift:
        k1, k2 = jax.random.split(rng)
        i0, j0, bh0, bw0 = _sample_crop_box(
            k1, src_h, src_w, cfg.random_resize_scale, cfg.random_resize_aspect_ratio
        )
        i1, j1, bh1, bw1 = _sample_crop_box(
            k2, src_h, src_w, cfg.random_resize_scale, cfg.random_resize_aspect_ratio
        )
        a = jnp.linspace(0.0, 1.0, t)
        box = tuple(p0 * (1 - a) + p1 * a for p0, p1 in ((i0, i1), (j0, j1), (bh0, bh1), (bw0, bw1)))
    else:
        box = _sample_crop_box(
            rng, src_h, src_w, cfg.random_resize_scale, cfg.random_resize_aspect_ratio
        )
    return _bilinear_crop_resize(
        clip, *box, (cfg.crop_size, cfg.crop_size), valid_hw=valid_hw
    )


def _erase_cube(rng, clip, cfg: AugmentCfg):
    """RandomErasing pixel-mode cube: one [t0:t1, y0:y1, x0:x1] noise block."""
    t, h, w, c = clip.shape
    ks = jax.random.split(rng, 7)
    apply = jax.random.uniform(ks[0], ()) < cfg.reprob
    area = h * w
    target = area * jax.random.uniform(ks[1], (), minval=0.02, maxval=1 / 3)
    log_r = jax.random.uniform(ks[2], (), minval=jnp.log(0.3), maxval=jnp.log(10 / 3))
    r = jnp.exp(log_r)
    eh = jnp.clip(jnp.sqrt(target * r), 1, h - 1)
    ew = jnp.clip(jnp.sqrt(target / r), 1, w - 1)
    y0 = jax.random.uniform(ks[3], ()) * (h - eh)
    x0 = jax.random.uniform(ks[4], ()) * (w - ew)
    t0 = jax.random.uniform(ks[5], ()) * (t - 1)
    t1 = t0 + jax.random.uniform(ks[6], ()) * (t - t0)
    yy = jnp.arange(h, dtype=jnp.float32)
    xx = jnp.arange(w, dtype=jnp.float32)
    tt = jnp.arange(t, dtype=jnp.float32)
    inside = (
        ((tt >= t0) & (tt <= t1))[:, None, None, None]
        & ((yy >= y0) & (yy < y0 + eh))[None, :, None, None]
        & ((xx >= x0) & (xx < x0 + ew))[None, None, :, None]
    )
    noise = jax.random.normal(jax.random.fold_in(rng, 1), clip.shape, clip.dtype)
    return jnp.where(apply & inside, noise, clip)


@partial(jax.jit, static_argnames=("cfg",))
def pretrain_augment(rng, clips_uint8, cfg: AugmentCfg, valid_hw=None):
    """[B, T, H, W, C] uint8 -> [B, T, crop, crop, C] float32 normalized.

    The whole pretrain VideoTransform (reference app/vjepa/transforms.py:
    86-115) as one fused device program. valid_hw [B, 2] int32 marks the
    un-letterboxed region per sample (aspect-preserving decode mode).
    """
    b = clips_uint8.shape[0]
    x = clips_uint8.astype(jnp.float32)
    keys = jax.random.split(rng, b)

    if cfg.auto_augment == "original":
        # AutoAugment ImageNet policy, the reference image probe's default
        # (reference evals/image_classification_frozen/eval.py:394-403)
        from jepa_tpu.data.randaugment import autoaugment_original_batch

        x = autoaugment_original_batch(jax.random.fold_in(rng, 999), x)
    elif cfg.auto_augment:
        from jepa_tpu.data.randaugment import RandAugmentCfg, randaugment_batch

        ra_cfg = RandAugmentCfg.from_string(cfg.auto_augment)
        x = randaugment_batch(jax.random.fold_in(rng, 999), x, ra_cfg)

    def per_sample(key, clip, hw):
        k_crop, k_flip, k_erase = jax.random.split(key, 3)
        out = random_resized_crop_clip(k_crop, clip, cfg, valid_hw=hw)
        if cfg.random_horizontal_flip:
            flip = jax.random.uniform(k_flip, ()) < 0.5
            out = jnp.where(flip, out[:, :, ::-1, :], out)
        mean = jnp.asarray(cfg.normalize_mean, jnp.float32) * 255.0
        std = jnp.asarray(cfg.normalize_std, jnp.float32) * 255.0
        out = (out - mean) / std
        if cfg.reprob > 0:
            out = _erase_cube(k_erase, out, cfg)
        return out

    if valid_hw is None:
        return jax.vmap(lambda k, c: per_sample(k, c, None))(keys, x)
    return jax.vmap(per_sample)(keys, x, valid_hw)


@partial(jax.jit, static_argnames=("crop_size", "num_views"))
def multiview_crops(clips: jnp.ndarray, crop_size: int, num_views: int,
                    mean=IMAGENET_MEAN, std=IMAGENET_STD, valid_hw=None):
    """Val-side multi-view: slide `num_views` square crops along the long
    side of short-side==crop_size frames and normalize (reference
    EvalVideoTransform, evals/video_classification_frozen/utils.py:286-323).

    clips: [B, S, T, H, W, C] uint8 with min(H, W) == crop_size (in
    aspect-preserving mode the un-letterboxed region of each sample has
    short side crop_size; ``valid_hw`` [B, 2] gives that region, and the
    views slide along the sample's TRUE long side).
    Returns [B, S, num_views, T, crop, crop, C] float32.
    """
    b, s, t, h, w, c = clips.shape
    x = clips.astype(jnp.float32)
    if valid_hw is None:
        long_side = max(h, w)
        step = (long_side - crop_size) // max(1, num_views - 1)
        views = []
        for i in range(num_views):
            start = i * step
            if h > w:
                views.append(x[:, :, :, start : start + crop_size, :, :])
            else:
                views.append(x[:, :, :, :, start : start + crop_size, :])
        out = jnp.stack(views, axis=2)
    else:
        def per_sample(xs, hw):  # xs: [S, T, H, W, C]
            hv, wv = hw[0], hw[1]
            long_len = jnp.maximum(hv, wv)
            denom = max(1, num_views - 1)
            step = jnp.maximum(long_len - crop_size, 0).astype(jnp.float32) / denom
            vs = []
            for i in range(num_views):
                start = jnp.round(i * step).astype(jnp.int32)
                sy = jnp.where(hv > wv, start, 0)
                sx = jnp.where(hv > wv, 0, start)
                sy = jnp.clip(sy, 0, h - crop_size)
                sx = jnp.clip(sx, 0, w - crop_size)
                vs.append(jax.lax.dynamic_slice(
                    xs, (0, 0, sy, sx, 0), (s, t, crop_size, crop_size, c)
                ))
            return jnp.stack(vs, axis=1)  # [S, V, T, crop, crop, C]

        out = jax.vmap(per_sample)(x, valid_hw)
    m = jnp.asarray(mean, jnp.float32) * 255.0
    sd = jnp.asarray(std, jnp.float32) * 255.0
    return (out - m) / sd


@partial(jax.jit, static_argnames=("out_size",))
def resize_short_side(clips_uint8, out_size: int):
    """Eval-side: resize so the SHORT side == out_size (aspect preserved is
    approximated by resizing to a fixed [out, out*W/H] shape per config; for
    the common center-crop path use `eval_resize_center_crop`)."""
    x = clips_uint8.astype(jnp.float32)
    b, t, h, w, c = x.shape
    scale = out_size / min(h, w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    x = jax.image.resize(x, (b, t, nh, nw, c), method="bilinear")
    return x


def eval_transform(clips_uint8, crop_size: int = 224, resize_size: Optional[int] = None,
                   mean=IMAGENET_MEAN, std=IMAGENET_STD):
    """Val-path transform: short-side resize -> center crop -> normalize.

    (reference evals/video_classification_frozen/utils.py EvalVideoTransform)
    """
    if resize_size is None:
        resize_size = int(crop_size * 256 / 224)
    x = resize_short_side(clips_uint8, resize_size)
    h, w = x.shape[2], x.shape[3]
    i = (h - crop_size) // 2
    j = (w - crop_size) // 2
    x = x[:, :, i : i + crop_size, j : j + crop_size, :]
    m = jnp.asarray(mean, jnp.float32) * 255.0
    s = jnp.asarray(std, jnp.float32) * 255.0
    return (x - m) / s
