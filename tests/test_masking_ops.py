"""Gather / tiling semantics vs the reference's torch implementations."""

import numpy as np
import pytest

from jepa_tpu.ops.masking import (
    apply_masks,
    gather_tokens,
    masked_mean,
    repeat_interleave_batch,
)


def test_gather_tokens_basic():
    x = np.arange(2 * 5 * 3, dtype=np.float32).reshape(2, 5, 3)
    idx = np.array([[0, 2], [4, 1]], dtype=np.int32)
    out = np.asarray(gather_tokens(x, idx))
    np.testing.assert_array_equal(out[0], x[0, [0, 2]])
    np.testing.assert_array_equal(out[1], x[1, [4, 1]])


def test_apply_masks_matches_torch_gather():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    x = rng.normal(size=(3, 10, 4)).astype(np.float32)
    masks = [
        rng.integers(0, 10, size=(3, 6)).astype(np.int64),
        rng.integers(0, 10, size=(3, 6)).astype(np.int64),
    ]
    got = np.asarray(apply_masks(x, [m.astype(np.int32) for m in masks]))

    tx = torch.from_numpy(x)
    outs = []
    for m in masks:
        mk = torch.from_numpy(m).unsqueeze(-1).repeat(1, 1, x.shape[-1])
        outs.append(torch.gather(tx, dim=1, index=mk))
    want = torch.cat(outs, dim=0).numpy()
    np.testing.assert_allclose(got, want)


def test_repeat_interleave_batch_matches_torch():
    torch = pytest.importorskip("torch")
    x = np.arange(12, dtype=np.float32).reshape(6, 2)  # N=3 chunks of B=2
    got = np.asarray(repeat_interleave_batch(x, b=2, repeat=3))

    tx = torch.from_numpy(x)
    B, repeat = 2, 3
    N = len(tx) // B
    want = torch.cat(
        [
            torch.cat([tx[i * B : (i + 1) * B] for _ in range(repeat)], dim=0)
            for i in range(N)
        ],
        dim=0,
    ).numpy()
    np.testing.assert_array_equal(got, want)


def test_masked_mean_ignores_padding():
    x = np.array([[[1.0], [2.0], [100.0]]], dtype=np.float32)
    w = np.array([[1.0, 1.0, 0.0]], dtype=np.float32)
    np.testing.assert_allclose(float(masked_mean(x, w)), 1.5)
    np.testing.assert_allclose(float(masked_mean(x, None)), (1 + 2 + 100) / 3)
