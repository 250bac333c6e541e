"""Extra transform/mask-distribution/factory coverage."""

import numpy as np

import jax
import jax.numpy as jnp

from jepa_tpu.data.transforms import AugmentCfg, multiview_crops, pretrain_augment
from jepa_tpu.masks.multiblock3d import (
    HostMaskGenerator,
    MaskGrid,
    MaskSpec,
    resolve_keep_counts,
)
from jepa_tpu.models.factory import vit_cfg


def test_multiview_crops_slide_along_long_side():
    # frames [B=1, S=1, T=2, H=32, W=48]: 3 views at x = 0, 8, 16
    base = np.zeros((1, 1, 2, 32, 48, 3), np.uint8)
    base[..., :, 0:48, 0] = np.arange(48, dtype=np.uint8)[None, None, None, None, :]
    out = np.asarray(multiview_crops(jnp.asarray(base), crop_size=32, num_views=3))
    assert out.shape == (1, 1, 3, 2, 32, 32, 3)
    # un-normalize channel 0 to recover source x offsets
    mean, std = 0.485 * 255, 0.229 * 255
    xs = out[0, 0, :, 0, 0, 0, 0] * std + mean
    np.testing.assert_allclose(xs, [0, 8, 16], atol=0.5)


def test_pretrain_augment_shapes_and_stats():
    cfg = AugmentCfg(crop_size=32, reprob=0.0, random_horizontal_flip=True)
    clips = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, size=(4, 2, 48, 64, 3)).astype(np.uint8)
    )
    out = np.asarray(pretrain_augment(jax.random.PRNGKey(0), clips, cfg))
    assert out.shape == (4, 2, 32, 32, 3)
    # normalized stats: roughly centered, std O(1)
    assert abs(out.mean()) < 2.0 and 0.1 < out.std() < 3.0
    # determinism per key
    out2 = np.asarray(pretrain_augment(jax.random.PRNGKey(0), clips, cfg))
    np.testing.assert_allclose(out, out2)


def test_calibrated_k_matches_host_distribution():
    """calibrate_keep_counts targets the reference's batch-min effective
    shapes (the analytic expected-union K overshoots because the reference
    truncates to the batch minimum, multiblock3d.py:194-201)."""
    from jepa_tpu.masks.multiblock3d import calibrate_keep_counts

    grid = MaskGrid(t=8, h=14, w=14)
    spec = MaskSpec(num_blocks=8, spatial_scale=(0.15, 0.15), aspect_ratio=(0.75, 1.5))
    ke, kp = calibrate_keep_counts(spec, grid, batch_size=4, seed=7)
    gen = HostMaskGenerator(spec, grid, seed=99)  # independent stream
    enc_sizes, pred_sizes = [], []
    for _ in range(30):
        enc, pred = gen(batch_size=4)
        enc_sizes.append(enc.shape[1])
        pred_sizes.append(pred.shape[1])
    assert abs(kp - np.mean(pred_sizes)) / grid.n < 0.05, (kp, np.mean(pred_sizes))
    assert abs(ke - np.mean(enc_sizes)) / grid.n < 0.05, (ke, np.mean(enc_sizes))
    # sampler invariant: context can always come from the selected-pred complement
    assert ke + kp <= grid.n
    # analytic counts remain a valid (upper-coverage) configuration
    ka_e, ka_p = resolve_keep_counts(spec, grid)
    assert ka_e + ka_p == grid.n


def test_factory_giant_gigantic_math():
    g = vit_cfg("vit_giant")
    assert (g.embed_dim, g.depth, g.num_heads) == (1408, 40, 16)
    assert g.mlp_hidden == int(1408 * 48 / 11)
    gg = vit_cfg("vit_gigantic")
    assert (gg.embed_dim, gg.depth, gg.num_heads, gg.patch_size) == (1664, 48, 16, 14)
    # effective 4.0 (reference mpl_ratio typo) so zoo checkpoints port;
    # see test_model_extras.test_gigantic_matches_reference_effective_mlp_ratio
    assert gg.mlp_hidden == 1664 * 4
