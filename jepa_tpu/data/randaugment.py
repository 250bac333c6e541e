"""Device-side RandAugment for video clips (timm-policy parity).

The reference ports timm's RandAugment to lists of PIL frames with one
sampled op/magnitude set per clip — temporal consistency (reference:
src/datasets/utils/video/randaugment.py:351-465, AugmentOp applies the same
params to all frames). Here the whole policy is a jitted device program
over [T, H, W, C] float(0..255) clips: per clip, ``num_layers`` ops are
drawn uniformly with replacement from the 'inc1' op set, each applied with
probability 0.5 at a gaussian-jittered magnitude (m +/- mstd), identical
across the clip's frames — exactly the 'rand-mN-nK-mstdS-inc1' config
family the eval probes use ('rand-m7-n4-mstd0.5-inc1',
reference evals/video_classification_frozen/utils.py:227-231).

Geometric ops (rotate/shear/translate) are affine warps with a per-op
random BILINEAR|BICUBIC filter (reference randaugment.py:34,48
_RANDOM_INTERPOLATION; both PIL-exact up to uint8 rounding) and the
PIL-style gray fill (128). Equalize uses a 256-bin histogram LUT per frame
and channel. All ops are branchless under vmap (lax.switch).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

_FILL = 128.0


# ---------------------------------------------------------------------------
# pixel ops (clip: [T, H, W, C] float in 0..255)
# ---------------------------------------------------------------------------


def _blend(a, b, factor):
    return b + (a - b) * factor


def _gray(clip):
    r, g, b = clip[..., 0], clip[..., 1], clip[..., 2]
    return (0.299 * r + 0.587 * g + 0.114 * b)[..., None]


def op_identity(clip, m):
    return clip


def op_invert(clip, m):
    return 255.0 - clip


def op_autocontrast(clip, m):
    # per frame & channel min/max rescale
    lo = jnp.min(clip, axis=(1, 2), keepdims=True)
    hi = jnp.max(clip, axis=(1, 2), keepdims=True)
    scale = 255.0 / jnp.maximum(hi - lo, 1e-5)
    out = (clip - lo) * scale
    return jnp.where(hi > lo, out, clip)


def op_equalize(clip, m):
    # per frame & channel histogram equalization (PIL semantics approx)
    def eq_channel(img):  # [H, W]
        x = jnp.clip(img, 0, 255).astype(jnp.int32)
        hist = jnp.zeros((256,), jnp.int32).at[x.reshape(-1)].add(1)
        # PIL: step = (total - last_nonzero_bin) // 255;
        # lut[i] = (step//2 + exclusive_cumsum(hist)[i]) // step
        nz = hist > 0
        last_idx = 255 - jnp.argmax(nz[::-1])
        step = (jnp.sum(hist) - hist[last_idx]) // 255
        excl = jnp.cumsum(hist) - hist
        lut = (step // 2 + excl) // jnp.maximum(step, 1)
        lut = jnp.where(step > 0, jnp.clip(lut, 0, 255), jnp.arange(256))
        return lut[x].astype(jnp.float32)

    t, h, w, c = clip.shape
    flat = clip.transpose(0, 3, 1, 2).reshape(t * c, h, w)
    out = jax.vmap(eq_channel)(flat)
    return out.reshape(t, c, h, w).transpose(0, 2, 3, 1)


def op_posterize(clip, m):
    # 'inc': bits = 4 - int(m/10*4) applied as PosterizeIncreasing: more
    # magnitude -> fewer bits, min 4-4=0 -> clamp to >=1 like timm? timm
    # PosterizeIncreasing: 4 - _round(m/10*4), can hit 0 (image -> 0)
    bits = 4 - jnp.round(m / 10.0 * 4.0)
    shift = jnp.clip(8.0 - (4.0 + bits), 0.0, 8.0)  # keep (4+bits) MSBs
    q = 2.0 ** shift
    return jnp.floor(jnp.clip(clip, 0, 255) / q) * q


def op_solarize(clip, m):
    thresh = 256.0 - m / 10.0 * 256.0
    return jnp.where(clip < thresh, clip, 255.0 - clip)


def op_solarize_add(clip, m):
    add = m / 10.0 * 110.0
    return jnp.where(clip < 128.0, jnp.clip(clip + add, 0, 255), clip)


def _enhance_factor(m):
    # timm increasing enhance: factor = 1 + sign * m/10 * 0.9
    return 1.0 + (m / 10.0) * 0.9


def op_color(clip, m, sign):
    return _blend(clip, _gray(clip), 1.0 + sign * (m / 10.0) * 0.9)


def op_contrast(clip, m, sign):
    mean = jnp.mean(_gray(clip), axis=(1, 2, 3), keepdims=True)
    return _blend(clip, mean, 1.0 + sign * (m / 10.0) * 0.9)


def op_brightness(clip, m, sign):
    return _blend(clip, jnp.zeros_like(clip), 1.0 + sign * (m / 10.0) * 0.9)


def op_sharpness(clip, m, sign):
    # PIL SMOOTH kernel [[1,1,1],[1,5,1],[1,1,1]]/13, borders unfiltered
    return _blend(clip, _smooth(clip), 1.0 + sign * (m / 10.0) * 0.9)


# ---------------------------------------------------------------------------
# geometric ops (affine warp, bilinear, gray fill)
# ---------------------------------------------------------------------------


def _cubic_weights(d):
    """PIL Geometry.c BICUBIC tap weights at offsets -1, 0, 1, 2.

    Expansion of PIL's macro v = p1 + d*(p2 + d*(p3 + d*p4)) with
    p1=v2, p2=v3-v1, p3=2v1-2v2+v3-v4, p4=-v1+v2-v3+v4 (pinned
    empirically against Image.transform(..., BICUBIC) with delta
    images; max error vs PIL is the uint8 rounding bit)."""
    w1 = d * (-1.0 + d * (2.0 - d))
    w2 = 1.0 + d * d * (-2.0 + d)
    w3 = d * (1.0 + d * (1.0 - d))
    w4 = d * d * (-1.0 + d)
    return (w1, w2, w3, w4)


def _affine_sample(clip, a, b, c, d, e, f, interp=None):
    """PIL ``Image.transform(AFFINE, (a,b,c,d,e,f))`` semantics.

    PIL maps the CENTER of output pixel (x, y): src = M @ (x+0.5, y+0.5),
    then its filter samples at src - 0.5 (Geometry.c). Net:
    sx = a*x + b*y + (c + 0.5*(a+b) - 0.5). Identity stays identity; the
    half-pixel term is what makes shear/translate match PIL exactly
    (verified per-op in test_randaugment's PIL-oracle parity tests).

    ``interp``: None -> bilinear (static). Otherwise a traced {0, 1}
    scalar choosing bilinear (0) or bicubic (1) per call — the reference
    samples the resample filter per op from (BILINEAR, BICUBIC)
    (reference src/datasets/utils/video/randaugment.py:34,48
    _RANDOM_INTERPOLATION). The bicubic path is PIL's Geometry.c cubic
    (taps floor(s)-1..+2, edge taps clamped); its validity window is
    PIL's generic-transform one, 0 <= a(x+.5)+b(y+.5)+c < w per axis,
    which is TIGHTER than the bilinear fast path's."""
    t, h, w, ch = clip.shape
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    sx = a * xx + b * yy + (c + 0.5 * (a + b) - 0.5)
    sy = d * xx + e * yy + (f + 0.5 * (d + e) - 0.5)
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    wx = sx - x0
    wy = sy - y0
    valid = (sx >= -1) & (sx <= w) & (sy >= -1) & (sy <= h)
    # clamp each tap independently (PIL edge behavior): at sx in (-1, 0)
    # BOTH taps must clamp to column 0 — clamping x0 first and adding 1
    # would wrongly blend columns 0 and 1
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    x1i = jnp.clip(x0.astype(jnp.int32) + 1, 0, w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y0.astype(jnp.int32) + 1, 0, h - 1)

    def warp_frame(fr):
        c00 = fr[y0i, x0i]
        c01 = fr[y0i, x1i]
        c10 = fr[y1i, x0i]
        c11 = fr[y1i, x1i]
        top = c00 * (1 - wx)[..., None] + c01 * wx[..., None]
        bot = c10 * (1 - wx)[..., None] + c11 * wx[..., None]
        out = top * (1 - wy)[..., None] + bot * wy[..., None]
        return jnp.where(valid[..., None], out, _FILL)

    bl = jax.vmap(warp_frame)(clip)
    if interp is None:
        return bl

    # PIL center-of-pixel source coords (== sx + 0.5 algebraically)
    xin = sx + 0.5
    yin = sy + 0.5
    valid_bc = (xin >= 0) & (xin < w) & (yin >= 0) & (yin < h)
    wxs = _cubic_weights(wx)
    wys = _cubic_weights(wy)
    xti = [jnp.clip(x0.astype(jnp.int32) - 1 + i, 0, w - 1) for i in range(4)]
    yti = [jnp.clip(y0.astype(jnp.int32) - 1 + j, 0, h - 1) for j in range(4)]

    def warp_frame_bicubic(fr):
        out = 0.0
        for i in range(4):
            row = 0.0
            for j in range(4):
                row = row + wys[j][..., None] * fr[yti[j], xti[i]]
            out = out + wxs[i][..., None] * row
        return jnp.where(valid_bc[..., None], out, _FILL)

    bc = jax.vmap(warp_frame_bicubic)(clip)
    return jnp.where(jnp.asarray(interp, jnp.bool_), bc, bl)


def op_rotate(clip, m, sign, interp=None):
    # PIL img.rotate(deg) == transform(AFFINE) about center (w/2, h/2)
    # with angle = -radians(deg) (reference randaugment.py:95-125); under
    # _affine_sample's half-pixel convention the effective sampling center
    # lands at ((w-1)/2, (h-1)/2), exactly PIL's.
    deg = sign * m / 10.0 * 30.0
    rad = jnp.deg2rad(deg)
    t, h, w, _ = clip.shape
    cx, cy = w / 2.0, h / 2.0
    cos, sin = jnp.cos(rad), jnp.sin(rad)
    a, b = cos, -sin
    d, e = sin, cos
    c = cx - a * cx - b * cy
    f = cy - d * cx - e * cy
    return _affine_sample(clip, a, b, c, d, e, f, interp)


def op_shear_x(clip, m, sign, interp=None):
    s = sign * m / 10.0 * 0.3
    return _affine_sample(clip, 1.0, s, 0.0, 0.0, 1.0, 0.0, interp)


def op_shear_y(clip, m, sign, interp=None):
    s = sign * m / 10.0 * 0.3
    return _affine_sample(clip, 1.0, 0.0, 0.0, s, 1.0, 0.0, interp)


def op_translate_x(clip, m, sign, interp=None):
    t = sign * m / 10.0 * 0.45 * clip.shape[2]
    return _affine_sample(clip, 1.0, 0.0, t, 0.0, 1.0, 0.0, interp)


def op_translate_y(clip, m, sign, interp=None):
    t = sign * m / 10.0 * 0.45 * clip.shape[1]
    return _affine_sample(clip, 1.0, 0.0, 0.0, 0.0, 1.0, t, interp)


# signed ops consume a random direction; unsigned ignore it. Geometric ops
# additionally consume a random resample-filter choice (bilinear|bicubic,
# reference randaugment.py:34,48 _RANDOM_INTERPOLATION).
_OPS = [
    ("AutoContrast", lambda c, m, s, i: op_autocontrast(c, m)),
    ("Equalize", lambda c, m, s, i: op_equalize(c, m)),
    ("Invert", lambda c, m, s, i: op_invert(c, m)),
    ("Rotate", op_rotate),
    ("Posterize", lambda c, m, s, i: op_posterize(c, m)),
    ("Solarize", lambda c, m, s, i: op_solarize(c, m)),
    ("SolarizeAdd", lambda c, m, s, i: op_solarize_add(c, m)),
    ("Color", lambda c, m, s, i: op_color(c, m, s)),
    ("Contrast", lambda c, m, s, i: op_contrast(c, m, s)),
    ("Brightness", lambda c, m, s, i: op_brightness(c, m, s)),
    ("Sharpness", lambda c, m, s, i: op_sharpness(c, m, s)),
    ("ShearX", op_shear_x),
    ("ShearY", op_shear_y),
    ("TranslateX", op_translate_x),
    ("TranslateY", op_translate_y),
]
OP_NAMES = [n for n, _ in _OPS]


@dataclasses.dataclass(frozen=True)
class RandAugmentCfg:
    magnitude: float = 7.0
    num_layers: int = 4
    mstd: float = 0.5
    prob: float = 0.5

    @staticmethod
    def from_string(spec: str) -> "RandAugmentCfg":
        """Parse 'rand-m7-n4-mstd0.5-inc1' (timm config string)."""
        m, n, mstd = 10.0, 2, 0.0
        for part in spec.split("-")[1:]:
            if part.startswith("mstd"):
                mstd = float(part[4:])
            elif part.startswith("m"):
                m = float(part[1:])
            elif part.startswith("n"):
                n = int(part[1:])
            elif part.startswith("inc"):
                pass  # increasing severity is the only mode implemented
            elif part.startswith("p"):
                pass
        return RandAugmentCfg(magnitude=m, num_layers=n, mstd=mstd)


def randaugment_clip(rng, clip, cfg: RandAugmentCfg):
    """One clip [T, H, W, C] float 0..255 -> augmented, same params for all
    frames (temporal consistency)."""

    def layer(i, carry):
        clip = carry
        k = jax.random.fold_in(rng, i)
        k_op, k_apply, k_mag, k_sign, k_interp = jax.random.split(k, 5)
        op_idx = jax.random.randint(k_op, (), 0, len(_OPS))
        mag = cfg.magnitude + cfg.mstd * jax.random.normal(k_mag)
        mag = jnp.clip(mag, 0.0, 10.0)
        sign = jnp.where(jax.random.bernoulli(k_sign), 1.0, -1.0)
        interp = jax.random.bernoulli(k_interp)  # 0=bilinear 1=bicubic
        branches = [
            partial(lambda c, f: f(c, mag, sign, interp), f=fn) for _, fn in _OPS
        ]
        out = jax.lax.switch(op_idx, branches, clip)
        apply = jax.random.bernoulli(k_apply, cfg.prob)
        return jnp.where(apply, jnp.clip(out, 0.0, 255.0), clip)

    return jax.lax.fori_loop(0, cfg.num_layers, layer, clip)


def randaugment_batch(rng, clips, cfg: RandAugmentCfg):
    """[B, T, H, W, C] float 0..255, per-clip independent policies."""
    keys = jax.random.split(rng, clips.shape[0])
    return jax.vmap(lambda k, c: randaugment_clip(k, c, cfg))(keys, clips)


# ---------------------------------------------------------------------------
# AutoAugment 'original' (the AutoAugment ImageNet policy, Cubuk et al. 2019)
# ---------------------------------------------------------------------------
#
# The reference image probe trains with timm's create_transform(...,
# auto_augment='original') (reference evals/image_classification_frozen/
# eval.py:394-403): one of 25 sub-policies is drawn per image, each applying
# two ops with fixed (probability, level). Level->arg mappings follow the
# 'original' (non-increasing) timm scheme: enhance factor = level/10*1.8+0.1,
# posterize bits = int(level/10*4)+4, solarize threshold = int(level/10*256),
# rotate = level/10*30 deg (random sign), shear = level/10*0.3 (random sign).

_AA_ORIGINAL_POLICY = [
    [("PosterizeOriginal", 0.4, 8), ("Rotate", 0.6, 9)],
    [("Solarize", 0.6, 5), ("AutoContrast", 0.6, 5)],
    [("Equalize", 0.8, 8), ("Equalize", 0.6, 3)],
    [("PosterizeOriginal", 0.6, 7), ("PosterizeOriginal", 0.6, 6)],
    [("Equalize", 0.4, 7), ("Solarize", 0.2, 4)],
    [("Equalize", 0.4, 4), ("Rotate", 0.8, 8)],
    [("Solarize", 0.6, 3), ("Equalize", 0.6, 7)],
    [("PosterizeOriginal", 0.8, 5), ("Equalize", 1.0, 2)],
    [("Rotate", 0.2, 3), ("Solarize", 0.6, 8)],
    [("Equalize", 0.6, 8), ("PosterizeOriginal", 0.4, 6)],
    [("Rotate", 0.8, 8), ("Color", 0.4, 0)],
    [("Rotate", 0.4, 9), ("Equalize", 0.6, 2)],
    [("Equalize", 0.0, 7), ("Equalize", 0.8, 8)],
    [("Invert", 0.6, 4), ("Equalize", 1.0, 8)],
    [("Color", 0.6, 4), ("Contrast", 1.0, 8)],
    [("Rotate", 0.8, 8), ("Color", 1.0, 2)],
    [("Color", 0.8, 8), ("Solarize", 0.8, 7)],
    [("Sharpness", 0.4, 7), ("Invert", 0.6, 8)],
    [("ShearX", 0.6, 5), ("Equalize", 1.0, 9)],
    [("Color", 0.4, 0), ("Equalize", 0.6, 3)],
    [("Equalize", 0.4, 7), ("Solarize", 0.2, 4)],
    [("Solarize", 0.6, 5), ("AutoContrast", 0.6, 5)],
    [("Invert", 0.6, 4), ("Equalize", 1.0, 8)],
    [("Color", 0.6, 4), ("Contrast", 1.0, 8)],
    [("Equalize", 0.8, 8), ("Equalize", 0.6, 3)],
]


def _posterize_keep_bits(clip, bits):
    if bits >= 8:
        return clip
    q = 2.0 ** (8 - bits)
    return jnp.floor(jnp.clip(clip, 0, 255) / q) * q


def _solarize_at(clip, thresh):
    return jnp.where(clip < thresh, clip, 255.0 - clip)


def _smooth(clip):
    """PIL SMOOTH filter with unfiltered borders (shared with op_sharpness)."""
    k = jnp.array([[1.0, 1.0, 1.0], [1.0, 5.0, 1.0], [1.0, 1.0, 1.0]]) / 13.0
    pad = jnp.pad(clip, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    sm = sum(
        k[i, j] * pad[:, i : i + clip.shape[1], j : j + clip.shape[2], :]
        for i in range(3)
        for j in range(3)
    )
    t, h, w, c = clip.shape
    yy = jnp.arange(h)[None, :, None, None]
    xx = jnp.arange(w)[None, None, :, None]
    interior = (yy > 0) & (yy < h - 1) & (xx > 0) & (xx < w - 1)
    return jnp.where(interior, sm, clip)


def _rotate_deg(clip, deg, interp=None):
    # PIL center convention — see op_rotate
    rad = jnp.deg2rad(deg)
    t, h, w, _ = clip.shape
    cx, cy = w / 2.0, h / 2.0
    cos, sin = jnp.cos(rad), jnp.sin(rad)
    a, b = cos, -sin
    d, e = sin, cos
    c = cx - a * cx - b * cy
    f = cy - d * cx - e * cy
    return _affine_sample(clip, a, b, c, d, e, f, interp)


def _aa_apply(name: str, level: float, clip, sign, interp=None):
    """One 'original'-policy op with its level resolved to the final arg."""
    l10 = level / 10.0
    if name == "PosterizeOriginal":
        return _posterize_keep_bits(clip, int(l10 * 4) + 4)
    if name == "Solarize":
        return _solarize_at(clip, float(int(l10 * 256)))
    if name == "Rotate":
        return _rotate_deg(clip, sign * (l10 * 30.0), interp)
    if name == "ShearX":
        return _affine_sample(
            clip, 1.0, sign * (l10 * 0.3), 0.0, 0.0, 1.0, 0.0, interp
        )
    if name == "AutoContrast":
        return op_autocontrast(clip, 0.0)
    if name == "Equalize":
        return op_equalize(clip, 0.0)
    if name == "Invert":
        return op_invert(clip, 0.0)
    factor = l10 * 1.8 + 0.1
    if name == "Color":
        return _blend(clip, _gray(clip), factor)
    if name == "Contrast":
        mean = jnp.mean(_gray(clip), axis=(1, 2, 3), keepdims=True)
        return _blend(clip, mean, factor)
    if name == "Sharpness":
        return _blend(clip, _smooth(clip), factor)
    raise ValueError(f"unknown AA op {name}")


def autoaugment_original_clip(rng, clip):
    """One clip [T, H, W, C] float 0..255 through a random sub-policy,
    identical params across frames (temporal consistency, like RandAugment)."""
    k_pol, k_ops = jax.random.split(rng)

    def make_branch(entries):
        def branch(clip):
            for j, (name, prob, level) in enumerate(entries):
                k = jax.random.fold_in(k_ops, j)
                k_apply, k_sign, k_interp = jax.random.split(k, 3)
                sign = jnp.where(jax.random.bernoulli(k_sign), 1.0, -1.0)
                interp = jax.random.bernoulli(k_interp)
                out = jnp.clip(
                    _aa_apply(name, float(level), clip, sign, interp), 0.0, 255.0
                )
                gate = jax.random.bernoulli(k_apply, prob)
                clip = jnp.where(gate, out, clip)
            return clip

        return branch

    idx = jax.random.randint(k_pol, (), 0, len(_AA_ORIGINAL_POLICY))
    return jax.lax.switch(idx, [make_branch(e) for e in _AA_ORIGINAL_POLICY], clip)


def autoaugment_original_batch(rng, clips):
    """[B, T, H, W, C] float 0..255, per-clip independent sub-policies."""
    keys = jax.random.split(rng, clips.shape[0])
    return jax.vmap(autoaugment_original_clip)(keys, clips)
