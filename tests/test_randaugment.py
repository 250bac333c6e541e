"""Device RandAugment vs PIL oracles (pixel ops exact-ish, geometry sane)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from jepa_tpu.data.randaugment import (
    OP_NAMES,
    RandAugmentCfg,
    op_autocontrast,
    op_equalize,
    op_invert,
    op_posterize,
    op_rotate,
    op_shear_x,
    op_shear_y,
    op_solarize,
    op_translate_x,
    op_translate_y,
    randaugment_batch,
    randaugment_clip,
)

PIL = pytest.importorskip("PIL")
from PIL import Image, ImageOps


def _img(seed=0, h=24, w=32):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)


def _as_clip(img):
    return jnp.asarray(img[None].astype(np.float32))  # [T=1, H, W, C]


def test_invert_matches_pil():
    img = _img()
    got = np.asarray(op_invert(_as_clip(img), 0.0))[0]
    want = np.asarray(ImageOps.invert(Image.fromarray(img)), dtype=np.float32)
    np.testing.assert_allclose(got, want)


def test_solarize_matches_pil():
    img = _img(1)
    m = 5.0
    thresh = 256 - m / 10 * 256
    got = np.asarray(op_solarize(_as_clip(img), m))[0]
    want = np.asarray(ImageOps.solarize(Image.fromarray(img), threshold=thresh), np.float32)
    np.testing.assert_allclose(got, want)


def test_posterize_matches_pil():
    img = _img(2)
    m = 5.0  # bits = 4 - round(0.5*4) = 2 -> keep 4+2=6 MSBs
    got = np.asarray(op_posterize(_as_clip(img), m))[0]
    want = np.asarray(ImageOps.posterize(Image.fromarray(img), bits=6), np.float32)
    np.testing.assert_allclose(got, want)


def test_autocontrast_close_to_pil():
    img = _img(3)
    got = np.asarray(op_autocontrast(_as_clip(img), 0.0))[0]
    want = np.asarray(ImageOps.autocontrast(Image.fromarray(img)), np.float32)
    # PIL uses integer LUTs; allow rounding differences
    assert np.abs(got - want).max() <= 2.0


def test_equalize_close_to_pil():
    img = _img(4)
    got = np.asarray(op_equalize(_as_clip(img), 0.0))[0]
    want = np.asarray(ImageOps.equalize(Image.fromarray(img)), np.float32)
    assert np.abs(got - want).mean() <= 4.0


def test_rotate_zero_is_identity_and_fill_appears():
    img = _img(5)
    clip = _as_clip(img)
    got0 = np.asarray(op_rotate(clip, 0.0, 1.0))[0]
    np.testing.assert_allclose(got0, img.astype(np.float32), atol=1e-3)
    got = np.asarray(op_rotate(clip, 10.0, 1.0))[0]  # 30 degrees
    assert np.any(np.all(got == 128.0, axis=-1)), "gray fill expected at corners"


def test_temporal_consistency_and_determinism():
    rng = np.random.default_rng(6)
    # clip with identical frames -> augmented frames must stay identical
    frame = rng.integers(0, 256, size=(16, 16, 3)).astype(np.float32)
    clip = jnp.asarray(np.stack([frame] * 4))
    cfg = RandAugmentCfg.from_string("rand-m7-n4-mstd0.5-inc1")
    assert cfg.magnitude == 7 and cfg.num_layers == 4 and cfg.mstd == 0.5
    out = np.asarray(randaugment_clip(jax.random.PRNGKey(0), clip, cfg))
    for t in range(1, 4):
        np.testing.assert_allclose(out[t], out[0], atol=1e-4)
    # determinism
    out2 = np.asarray(randaugment_clip(jax.random.PRNGKey(0), clip, cfg))
    np.testing.assert_allclose(out, out2)
    # different key -> (almost surely) different result
    out3 = np.asarray(randaugment_clip(jax.random.PRNGKey(9), clip, cfg))
    assert not np.allclose(out, out3)


def test_batch_jit_and_range():
    clips = jnp.asarray(
        np.random.default_rng(7).integers(0, 256, size=(3, 2, 16, 16, 3)).astype(np.float32)
    )
    cfg = RandAugmentCfg(magnitude=9.0, num_layers=2)
    f = jax.jit(lambda k, c: randaugment_batch(k, c, cfg))
    out = np.asarray(f(jax.random.PRNGKey(0), clips))
    assert out.shape == clips.shape
    assert out.min() >= 0.0 and out.max() <= 255.0
    assert len(OP_NAMES) == 15


# ---------------------------------------------------------------------------
# AutoAugment 'original' (the reference image probe's policy)
# ---------------------------------------------------------------------------


def test_aa_original_level_to_arg_matches_pil():
    from PIL import ImageEnhance

    from jepa_tpu.data.randaugment import _aa_apply

    img = _img(7)
    clip = _as_clip(img)
    # PosterizeOriginal level 6 -> bits = int(0.6*4)+4 = 6
    got = np.asarray(_aa_apply("PosterizeOriginal", 6.0, clip, 1.0))[0]
    want = np.asarray(ImageOps.posterize(Image.fromarray(img), bits=6), np.float32)
    np.testing.assert_allclose(got, want)
    # Solarize level 5 -> threshold int(0.5*256) = 128
    got = np.asarray(_aa_apply("Solarize", 5.0, clip, 1.0))[0]
    want = np.asarray(ImageOps.solarize(Image.fromarray(img), threshold=128), np.float32)
    np.testing.assert_allclose(got, want)
    # Color level 4 -> enhance factor 0.4*1.8+0.1 = 0.82 (no negate)
    got = np.asarray(jnp.clip(_aa_apply("Color", 4.0, clip, 1.0), 0, 255))[0]
    want = np.asarray(
        ImageEnhance.Color(Image.fromarray(img)).enhance(0.82), np.float32
    )
    assert np.mean(np.abs(got - want)) < 1.0  # PIL rounds per-op
    # Invert exact
    got = np.asarray(_aa_apply("Invert", 0.0, clip, 1.0))[0]
    want = np.asarray(ImageOps.invert(Image.fromarray(img)), np.float32)
    np.testing.assert_allclose(got, want)


def test_aa_original_batch_jit_range_and_determinism():
    from jepa_tpu.data.randaugment import (
        _AA_ORIGINAL_POLICY,
        autoaugment_original_batch,
    )

    assert len(_AA_ORIGINAL_POLICY) == 25
    assert all(len(sp) == 2 for sp in _AA_ORIGINAL_POLICY)
    rng = np.random.default_rng(0)
    clips = jnp.asarray(
        rng.integers(0, 256, size=(4, 2, 24, 32, 3)).astype(np.float32)
    )
    f = jax.jit(autoaugment_original_batch)
    out = f(jax.random.PRNGKey(3), clips)
    assert out.shape == clips.shape
    assert float(out.min()) >= 0.0 and float(out.max()) <= 255.0
    out2 = f(jax.random.PRNGKey(3), clips)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    # frames of one clip share the op params (temporal consistency):
    # an op either changed both frames the same way structurally or neither;
    # check via per-frame mean shift correlation across many keys
    diffs = []
    for s in range(6):
        o = f(jax.random.PRNGKey(s), clips)
        d = np.asarray(o - clips)
        diffs.append((np.abs(d[:, 0]).mean(), np.abs(d[:, 1]).mean()))
    diffs = np.asarray(diffs)
    np.testing.assert_allclose(diffs[:, 0], diffs[:, 1], rtol=0.35, atol=2.0)


def _pil_affine(img, coeffs, resample):
    return np.asarray(
        Image.fromarray(img).transform(
            (img.shape[1], img.shape[0]), Image.AFFINE, coeffs,
            resample=resample, fillcolor=(128, 128, 128),
        ),
        dtype=np.float32,
    )


def test_geometric_ops_match_pil_bilinear():
    """VERDICT round-2 item 7: quantified PIL parity for the warp ops.

    _affine_sample implements PIL's exact AFFINE convention (center-of-
    pixel mapping + the bilinear filter's half-pixel shift), so shear/
    translate/rotate must agree with PIL BILINEAR up to uint8 rounding:
    PIL rounds each output to uint8 while the device op stays float, so
    per-pixel deltas up to ~1 plus a <=1px fill-boundary band are the
    expected envelope."""
    img = _img(7, h=40, w=56)
    clip = _as_clip(img)

    cases = []
    for m in (3.0, 6.0, 9.0):
        for sign in (1.0, -1.0):
            s = sign * m / 10.0 * 0.3
            tx = sign * m / 10.0 * 0.45 * img.shape[1]
            ty = sign * m / 10.0 * 0.45 * img.shape[0]
            cases += [
                (f"shear_x m{m} s{sign}", op_shear_x(clip, m, sign),
                 _pil_affine(img, (1, s, 0, 0, 1, 0), Image.BILINEAR)),
                (f"shear_y m{m} s{sign}", op_shear_y(clip, m, sign),
                 _pil_affine(img, (1, 0, 0, s, 1, 0), Image.BILINEAR)),
                (f"translate_x m{m} s{sign}", op_translate_x(clip, m, sign),
                 _pil_affine(img, (1, 0, tx, 0, 1, 0), Image.BILINEAR)),
                (f"translate_y m{m} s{sign}", op_translate_y(clip, m, sign),
                 _pil_affine(img, (1, 0, 0, 0, 1, ty), Image.BILINEAR)),
                (f"rotate m{m} s{sign}",
                 op_rotate(clip, m, sign),
                 np.asarray(Image.fromarray(img).rotate(
                     sign * m / 10.0 * 30.0, resample=Image.BILINEAR,
                     fillcolor=(128, 128, 128)), dtype=np.float32)),
            ]
    for name, got, want in cases:
        got = np.asarray(got)[0]
        delta = np.abs(got - want)
        # Measured envelope (this test's cases, 40x56 random-noise image —
        # the worst case for interpolation deltas): PIL truncates each
        # bilinear output to uint8 (|d| <= 1 in the interior; median well
        # under 1) and quantizes coordinates in fixed point along the
        # fill seam (a <=1px band, <=2.5% of pixels, where |d| can reach
        # the fill-vs-content range). Bounds set at that envelope + slack.
        assert float(np.median(delta)) <= 1.0, (name, float(np.median(delta)))
        assert float(np.mean(delta)) < 2.2, (name, float(np.mean(delta)))
        frac_off = float(np.mean(delta > 1.5))
        assert frac_off < 0.03, (name, frac_off, float(delta.max()))


def test_geometric_ops_match_pil_bicubic():
    """VERDICT round-3 item 7: the reference samples BILINEAR or BICUBIC
    per-op at random (_RANDOM_INTERPOLATION, reference randaugment.py:34,48);
    the device warps now implement both. The bicubic path is PIL's
    Geometry.c cubic (taps floor(s)-1..+2, clamped edges) under the
    generic-transform validity window, so with interp=1 every geometric op
    must agree with PIL BICUBIC up to uint8 rounding — a probe across
    shear/translate/rotate measured max |delta| == 1 after rounding (no
    fill-seam band at all: the bicubic validity window is exact, unlike
    the bilinear fast path's fixed-point seam)."""
    img = _img(11, h=40, w=56)
    clip = _as_clip(img)

    cases = []
    for m in (3.0, 9.0):
        for sign in (1.0, -1.0):
            s = sign * m / 10.0 * 0.3
            tx = sign * m / 10.0 * 0.45 * img.shape[1]
            ty = sign * m / 10.0 * 0.45 * img.shape[0]
            cases += [
                (f"shear_x m{m} s{sign}", op_shear_x(clip, m, sign, 1),
                 _pil_affine(img, (1, s, 0, 0, 1, 0), Image.BICUBIC)),
                (f"shear_y m{m} s{sign}", op_shear_y(clip, m, sign, 1),
                 _pil_affine(img, (1, 0, 0, s, 1, 0), Image.BICUBIC)),
                (f"translate_x m{m} s{sign}", op_translate_x(clip, m, sign, 1),
                 _pil_affine(img, (1, 0, tx, 0, 1, 0), Image.BICUBIC)),
                (f"translate_y m{m} s{sign}", op_translate_y(clip, m, sign, 1),
                 _pil_affine(img, (1, 0, 0, 0, 1, ty), Image.BICUBIC)),
                (f"rotate m{m} s{sign}",
                 op_rotate(clip, m, sign, 1),
                 np.asarray(Image.fromarray(img).rotate(
                     sign * m / 10.0 * 30.0, resample=Image.BICUBIC,
                     fillcolor=(128, 128, 128)), dtype=np.float32)),
            ]
    for name, got, want in cases:
        # PIL clamps the cubic overshoot into uint8; mirror that before
        # comparing (the float device output legitimately over/undershoots)
        got = np.clip(np.round(np.asarray(got)[0]), 0, 255)
        delta = np.abs(got - want)
        assert float(np.median(delta)) <= 1.0, (name, float(np.median(delta)))
        assert float(np.mean(delta)) < 0.8, (name, float(np.mean(delta)))
        # float32 tap-boundary wobble allowance on top of the measured
        # max==1 float64 envelope
        frac_off = float(np.mean(delta > 1.5))
        assert frac_off < 0.01, (name, frac_off, float(delta.max()))


def test_interp_zero_matches_bilinear_path():
    """interp=0 through the dual-filter warp must be bit-identical to the
    static bilinear path (interp=None)."""
    img = _img(5, h=24, w=32)
    clip = _as_clip(img)
    a = np.asarray(op_rotate(clip, 7.0, -1.0))
    b = np.asarray(op_rotate(clip, 7.0, -1.0, 0))
    np.testing.assert_array_equal(a, b)
