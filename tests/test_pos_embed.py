"""Golden-numerics tests for sin-cos pos-embeds vs independent formulas.

The reference builds these with numpy meshgrid tricks; here we verify our
generator against a direct elementwise construction and against torch's
trilinear interpolation for the resize path.
"""

import math

import numpy as np
import pytest

from jepa_tpu.models.pos_embed import (
    get_1d_sincos_pos_embed,
    get_2d_sincos_pos_embed,
    get_3d_sincos_pos_embed,
    resize_pos_embed_3d,
)


def _ref_1d(dim, pos):
    half = dim // 2
    out = np.zeros((len(pos), dim))
    for m, p in enumerate(pos):
        for j in range(half):
            w = 1.0 / 10000 ** (j / half)
            out[m, j] = math.sin(p * w)
            out[m, half + j] = math.cos(p * w)
    return out


def test_1d_matches_direct_formula():
    got = get_1d_sincos_pos_embed(16, 7)
    want = _ref_1d(16, list(range(7)))
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_2d_layout_and_values():
    dim, g = 8, 3
    got = get_2d_sincos_pos_embed(dim, g)
    assert got.shape == (9, 8)
    # Row-major (h, w): token (h=1, w=2) at row 1*3+2.
    hw = got[1 * g + 2]
    np.testing.assert_allclose(hw[: dim // 2], _ref_1d(dim // 2, [1])[0], atol=1e-12)
    np.testing.assert_allclose(hw[dim // 2 :], _ref_1d(dim // 2, [2])[0], atol=1e-12)


@pytest.mark.parametrize("uniform_power", [False, True])
def test_3d_layout_and_values(uniform_power):
    dim, g, d = 24, 4, 2
    got = get_3d_sincos_pos_embed(dim, g, d, uniform_power=uniform_power)
    assert got.shape == (d * g * g, dim)
    # Token (t=1, h=2, w=3) lives at row ((1*g)+2)*g+3.
    row = got[(1 * g + 2) * g + 3]
    if uniform_power:
        per = int(np.ceil(dim / 6) * 2)  # 8
        np.testing.assert_allclose(row[:per], _ref_1d(per, [1])[0], atol=1e-12)
        np.testing.assert_allclose(row[per : 2 * per], _ref_1d(per, [2])[0], atol=1e-12)
        np.testing.assert_allclose(
            row[2 * per : dim], _ref_1d(per, [3])[0][: dim - 2 * per], atol=1e-12
        )
    else:
        np.testing.assert_allclose(row[: dim // 2], _ref_1d(dim // 2, [1])[0], atol=1e-12)
        np.testing.assert_allclose(
            row[dim // 2 : 3 * dim // 4], _ref_1d(dim // 4, [2])[0], atol=1e-12
        )
        np.testing.assert_allclose(row[3 * dim // 4 :], _ref_1d(dim // 4, [3])[0], atol=1e-12)


def test_3d_vitl_defaults_shape():
    # ViT-L/16 @ 224, 16 frames, tubelet 2 -> 8*14*14 tokens, dim 1024.
    got = get_3d_sincos_pos_embed(1024, 14, 8, uniform_power=True)
    assert got.shape == (1568, 1024)
    # sin(0)=0 / cos(0)=1 structure at the origin token.
    per = int(np.ceil(1024 / 6) * 2)
    np.testing.assert_allclose(got[0, : per // 2], 0.0, atol=1e-12)
    np.testing.assert_allclose(got[0, per // 2 : per], 1.0, atol=1e-12)


def test_trilinear_resize_matches_torch():
    torch = pytest.importorskip("torch")
    dim = 12
    src = get_3d_sincos_pos_embed(dim, 4, 2, uniform_power=True).astype(np.float32)
    got = np.asarray(resize_pos_embed_3d(src, (2, 4, 4), (3, 6, 6)))
    t = torch.from_numpy(src).reshape(1, 2, 4, 4, dim).permute(0, 4, 1, 2, 3)
    want = (
        torch.nn.functional.interpolate(t, scale_factor=(1.5, 1.5, 1.5), mode="trilinear")
        .permute(0, 2, 3, 4, 1)
        .reshape(-1, dim)
        .numpy()
    )
    np.testing.assert_allclose(got, want, atol=2e-5)
