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


def test_load_classifier_orbax_and_classify(tmp_path):
    """VideoClassifier serving path: eval probe checkpoint + encoder ->
    softmax probabilities matching a manual encode->classifier_forward."""
    from jepa_tpu.api import load_classifier
    from jepa_tpu.models.attentive import (
        AttentiveCfg,
        classifier_forward,
        init_attentive_classifier,
    )
    from jepa_tpu.train.optimizer import init_adamw_state

    path, state, consts, enc_cfg = _pretrain_ckpt(tmp_path)
    enc = load_encoder(path, "vit_tiny", img_size=32, patch_size=16,
                       num_frames=4, tubelet_size=2, uniform_power=True,
                       compute_dtype=jnp.float32)
    acfg = AttentiveCfg(embed_dim=enc.embed_dim, num_heads=3, depth=1,
                        num_classes=7, compute_dtype=jnp.float32)
    clf = init_attentive_classifier(jax.random.PRNGKey(5), acfg)
    probe_dir = tmp_path / "probe"
    ckpt_lib.save_checkpoint(
        str(probe_dir), "k400",
        {"classifier": jax.device_get(clf),
         "opt": jax.device_get(init_adamw_state(clf)), "step": 0},
        epoch=3,
    )
    vc = load_classifier(str(probe_dir / "k400-latest"), enc, num_classes=7)
    clips = np.random.default_rng(1).integers(0, 255, size=(2, 4, 32, 32, 3),
                                              dtype=np.uint8)
    probs = np.asarray(vc.classify(clips))
    assert probs.shape == (2, 7)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)
    want = jax.nn.softmax(classifier_forward(clf, enc.encode(clips), acfg))
    np.testing.assert_allclose(probs, np.asarray(want), atol=1e-5, rtol=1e-5)

    # wrong probe geometry must raise, not serve garbage
    import pytest

    with pytest.raises((KeyError, ValueError)):
        load_classifier(str(probe_dir / "k400-latest"), enc, num_classes=9)


def test_load_classifier_from_torch_pth(tmp_path):
    """Ported reference-format probe matches the torch oracle's forward."""
    import pytest

    torch = pytest.importorskip("torch")
    from tests.torch_oracle import OracleAttentiveClassifier
    from jepa_tpu.api import load_classifier

    path, state, consts, enc_cfg = _pretrain_ckpt(tmp_path)
    enc = load_encoder(path, "vit_tiny", img_size=32, patch_size=16,
                       num_frames=4, tubelet_size=2, uniform_power=True,
                       compute_dtype=jnp.float32)
    oracle = OracleAttentiveClassifier(dim=enc.embed_dim, heads=3, num_classes=5)
    for p in oracle.parameters():
        torch.nn.init.normal_(p, std=0.05)
    pth = str(tmp_path / "probe.pth.tar")
    torch.save({"classifier": oracle.state_dict()}, pth)

    vc = load_classifier(pth, enc, num_classes=5)
    clips = np.random.default_rng(2).integers(0, 255, size=(2, 4, 32, 32, 3),
                                              dtype=np.uint8)
    probs = np.asarray(vc.classify(clips))
    feats = torch.from_numpy(np.asarray(enc.encode(clips)))
    with torch.no_grad():
        want = torch.softmax(oracle(feats), dim=-1).numpy()
    np.testing.assert_allclose(probs, want, atol=2e-5, rtol=2e-5)
