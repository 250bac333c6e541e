"""High-level inference API (jepa_tpu.api): loading + feature extraction."""

import numpy as np

import jax
import jax.numpy as jnp

from jepa_tpu.api import load_encoder
from jepa_tpu.models.factory import predictor_cfg_for, vit_cfg
from jepa_tpu.models.vit import vit_forward
from jepa_tpu.train.step import init_train_state
from jepa_tpu.utils import checkpoint as ckpt_lib


def _pretrain_ckpt(tmp_path):
    enc_cfg = vit_cfg("vit_tiny", img_size=32, patch_size=16, num_frames=4,
                      tubelet_size=2, uniform_power=True,
                      compute_dtype=jnp.float32)
    pred_cfg = predictor_cfg_for(enc_cfg, predictor_embed_dim=48, depth=1,
                                 num_mask_tokens=2)
    state, consts = init_train_state(jax.random.PRNGKey(3), enc_cfg, pred_cfg)
    ckpt_lib.save_checkpoint(str(tmp_path), "run", jax.device_get(state), epoch=1)
    return str(tmp_path / "run-latest"), state, consts, enc_cfg


def test_load_encoder_from_orbax_and_encode(tmp_path):
    path, state, consts, enc_cfg = _pretrain_ckpt(tmp_path)
    enc = load_encoder(path, "vit_tiny", img_size=32, patch_size=16,
                       num_frames=4, tubelet_size=2, uniform_power=True,
                       compute_dtype=jnp.float32)
    assert enc.embed_dim == enc_cfg.embed_dim

    # uint8 input: normalized internally; matches a manual vit_forward on
    # the target params with the same normalization
    clips = np.random.default_rng(0).integers(
        0, 255, size=(2, 4, 32, 32, 3), dtype=np.uint8
    )
    feats = enc.encode(clips)
    n_tokens = (4 // 2) * (32 // 16) ** 2
    assert feats.shape == (2, n_tokens, enc_cfg.embed_dim)
    assert feats.dtype == jnp.float32

    mean = np.array((0.485, 0.456, 0.406), np.float32)
    std = np.array((0.229, 0.224, 0.225), np.float32)
    xn = (clips.astype(np.float32) / 255.0 - mean) / std
    want = vit_forward(state["target"], consts["encoder"], jnp.asarray(xn), enc_cfg)
    np.testing.assert_allclose(np.asarray(feats), np.asarray(want),
                               atol=2e-5, rtol=2e-5)

    # pre-normalized float input skips normalization by default
    feats2 = enc.encode(xn.astype(np.float32))
    np.testing.assert_allclose(np.asarray(feats2), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_load_encoder_from_zoo_pth(tmp_path):
    import pytest

    torch = pytest.importorskip("torch")
    from jepa_tpu.utils.checkpoint_port import save_torch_checkpoint
    from jepa_tpu.models.vit import init_vit

    cfg = vit_cfg("vit_tiny", img_size=32, patch_size=16, num_frames=4,
                  tubelet_size=2, uniform_power=True, compute_dtype=jnp.float32)
    params, consts = init_vit(jax.random.PRNGKey(5), cfg)
    src = str(tmp_path / "zoo.pth.tar")
    save_torch_checkpoint(src, target_encoder=(params, consts), epoch=1, cfg=cfg)

    enc = load_encoder(src, "vit_tiny", img_size=32, patch_size=16,
                       num_frames=4, tubelet_size=2, uniform_power=True,
                       compute_dtype=jnp.float32)
    x = np.random.default_rng(1).normal(size=(1, 4, 32, 32, 3)).astype(np.float32)
    want = vit_forward(params, consts, jnp.asarray(x), cfg)
    np.testing.assert_allclose(np.asarray(enc.encode(x)), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_load_encoder_validates_key_and_defaults_strict(tmp_path):
    import pytest

    torch = pytest.importorskip("torch")
    from jepa_tpu.models.vit import init_vit
    from jepa_tpu.utils.checkpoint_port import save_torch_checkpoint

    # typo'd checkpoint_key raises instead of silently mapping elsewhere
    with pytest.raises(ValueError, match="checkpoint_key"):
        load_encoder("whatever.pth.tar", "vit_tiny", checkpoint_key="target")

    # strict-by-default porting: a geometry-mismatched zoo file must raise,
    # not silently serve a partially-random encoder
    cfg_small = vit_cfg("vit_tiny", img_size=32, patch_size=16, num_frames=4,
                        tubelet_size=2, compute_dtype=jnp.float32)
    params, consts = init_vit(jax.random.PRNGKey(7), cfg_small)
    src = str(tmp_path / "mismatch.pth.tar")
    save_torch_checkpoint(src, target_encoder=(params, consts), epoch=1, cfg=cfg_small)
    with pytest.raises(Exception):
        load_encoder(src, "vit_small", img_size=32, patch_size=16,
                     num_frames=4, tubelet_size=2, compute_dtype=jnp.float32)
    # tolerant=True opts into the reference's tolerant merge
    enc = load_encoder(src, "vit_small", img_size=32, patch_size=16,
                       num_frames=4, tubelet_size=2,
                       compute_dtype=jnp.float32, tolerant=True)
    assert enc.embed_dim == 384
