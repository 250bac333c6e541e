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
    op_solarize,
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
