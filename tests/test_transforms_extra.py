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


# ---------------------------------------------------------------------------
# aspect-preserving decode geometry (VERDICT round-1 item 5)
# ---------------------------------------------------------------------------


def test_scaled_size_and_letterbox():
    from jepa_tpu.native.videodec import letterbox, scaled_size

    # 16:9 landscape, short side -> 96
    assert scaled_size(180, 320, 96, (192, 192)) == (96, 171)
    # portrait 9:16
    assert scaled_size(320, 180, 96, (192, 192)) == (171, 96)
    # extreme aspect capped by the canvas long side
    h, w = scaled_size(100, 500, 96, (192, 192))
    assert w == 192 and h == 38
    fr = np.full((2, 96, 171, 3), 200, np.uint8)
    boxed = letterbox(fr, (192, 192))
    assert boxed.shape == (2, 192, 192, 3)
    assert (boxed[:, :96, :171] == 200).all()
    assert boxed[:, 96:].sum() == 0 and boxed[:, :, 171:].sum() == 0


def test_multiview_slides_along_true_long_side():
    from jepa_tpu.data.transforms import multiview_crops

    crop, views = 32, 3
    h = w = 64  # square canvas
    # landscape sample: valid (32, 56); encode x coordinate in channel 0
    canvas = np.zeros((1, 1, 2, h, w, 3), np.uint8)
    xx = np.arange(w, dtype=np.uint8)
    canvas[0, 0, :, :32, :, 0] = xx[None, None, :]
    vhw = np.asarray([[32, 56]], np.int32)
    out = multiview_crops(jnp.asarray(canvas), crop, views, valid_hw=jnp.asarray(vhw))
    assert out.shape == (1, 1, views, 2, crop, crop, 3)
    mean = jnp.asarray((0.485, 0.456, 0.406)) * 255.0
    std = jnp.asarray((0.229, 0.224, 0.225)) * 255.0
    x0 = np.asarray(out[0, 0, :, 0, 0, 0, 0]) * float(std[0]) + float(mean[0])
    # starts at round(i * (56-32)/2) = 0, 12, 24 along the true long side
    np.testing.assert_allclose(x0, [0.0, 12.0, 24.0], atol=0.51)
    # portrait sample: valid (56, 32) -> slides along y
    canvas_p = np.zeros((1, 1, 2, h, w, 3), np.uint8)
    yy = np.arange(h, dtype=np.uint8)
    canvas_p[0, 0, :, :, :32, 0] = yy[None, :, None]
    out_p = multiview_crops(
        jnp.asarray(canvas_p), crop, views,
        valid_hw=jnp.asarray([[56, 32]], np.int32),
    )
    y0 = np.asarray(out_p[0, 0, :, 0, 0, 0, 0]) * float(std[0]) + float(mean[0])
    np.testing.assert_allclose(y0, [0.0, 12.0, 24.0], atol=0.51)


def test_rrc_never_bleeds_letterbox_padding():
    from jepa_tpu.data.transforms import AugmentCfg, pretrain_augment

    cfg = AugmentCfg(crop_size=16, random_resize_scale=(0.3, 1.0),
                     random_horizontal_flip=True)
    clips = np.zeros((4, 2, 64, 64, 3), np.uint8)
    clips[:, :, :33, :57] = 255  # valid region, bright; padding black
    vhw = np.tile(np.asarray([[33, 57]], np.int32), (4, 1))
    out = pretrain_augment(
        jax.random.PRNGKey(0), jnp.asarray(clips), cfg, valid_hw=jnp.asarray(vhw)
    )
    # normalized 255 for channel 0: (255 - 0.485*255)/(0.229*255)
    want = (255.0 - 0.485 * 255.0) / (0.229 * 255.0)
    np.testing.assert_allclose(np.asarray(out[..., 0]), want, atol=1e-3)


def test_video_loader_aspect_mode_end_to_end(tmp_path):
    from jepa_tpu.data.loader import make_video_loader

    manifest = tmp_path / "m.csv"
    manifest.write_text("".join(f"synthetic://v{i} 0\n" for i in range(8)))
    ds, loader, _ = make_video_loader(
        data_paths=[str(manifest)], batch_size=4, frames_per_clip=4,
        frame_step=2, num_clips=2, decode_backend="synthetic",
        decode_short_side=48, decode_canvas=(96, 96), num_workers=2,
    )
    batch = next(iter(loader))
    assert batch["clips"].shape == (8, 4, 96, 96, 3)  # nc*B on the canvas
    assert batch["valid_hw"].shape == (8, 2)
    hw = batch["valid_hw"]
    assert (hw.min(axis=1) == 48).all()  # short side == requested
    assert (hw.max(axis=1) <= 96).all()
    # segments of the same sample share dims (clip-major tiling)
    np.testing.assert_array_equal(hw[:4], hw[4:])


def test_rrc_distribution_vs_reference_sampler():
    """The in-jit 10-try RRC sampler (data/transforms.py:_sample_crop_box)
    matches the reference's rejection loop (reference
    src/datasets/utils/video/transforms.py:503-542, torchvision-style)
    distribution: KS distance of crop-area-fraction and aspect sits at the
    two-sample noise floor (~0.014 at n=20k) even at pretrain settings
    where ~18% of raw draws go out of bounds."""
    from jepa_tpu.data.transforms import _sample_crop_box

    h = w = 256
    scale = (0.3, 1.0)
    ratio = (0.75, 1.35)
    n = 20000

    keys = jax.random.split(jax.random.PRNGKey(0), n)
    boxes = jax.vmap(lambda k: _sample_crop_box(k, h, w, scale, ratio))(keys)
    _, _, bh, bw = (np.asarray(x) for x in boxes)
    ours_frac = (bh * bw) / (h * w)
    ours_ar = bw / bh

    # reference oracle: independent numpy rejection sampler (accept the
    # first in-bounds draw of 10; the center-crop fallback fires with
    # probability ~0.18^10 ~ 3e-8 and is ignored here)
    rng = np.random.default_rng(1)
    m = 0
    ref_bh = np.empty(n)
    ref_bw = np.empty(n)
    while m < n:
        area = h * w * rng.uniform(scale[0], scale[1], size=4 * n)
        r = np.exp(rng.uniform(np.log(ratio[0]), np.log(ratio[1]), size=4 * n))
        cw = np.sqrt(area * r)
        ch = np.sqrt(area / r)
        ok = (cw <= w) & (ch <= h) & (cw > 0) & (ch > 0)
        take = min(n - m, int(ok.sum()))
        ref_bw[m : m + take] = cw[ok][:take]
        ref_bh[m : m + take] = ch[ok][:take]
        m += take
    ref_frac = (ref_bh * ref_bw) / (h * w)
    ref_ar = ref_bw / ref_bh

    def ks(a, b):
        xs = np.sort(np.concatenate([a, b]))
        ca = np.searchsorted(np.sort(a), xs, side="right") / len(a)
        cb = np.searchsorted(np.sort(b), xs, side="right") / len(b)
        return float(np.max(np.abs(ca - cb)))

    ks_frac = ks(ours_frac, ref_frac)
    ks_ar = ks(ours_ar, ref_ar)
    # measured 0.0078 / 0.0093 (noise floor) with the 10-try sampler; the
    # old single clamped draw measured 0.158 on area fraction
    assert ks_frac < 0.02, ks_frac
    assert ks_ar < 0.02, ks_ar
    # bulk statistics agree tightly
    assert abs(ours_frac.mean() - ref_frac.mean()) < 0.02
    assert abs(np.log(ours_ar).mean() - np.log(ref_ar).mean()) < 0.02
