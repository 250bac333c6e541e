"""Coverage for secondary model APIs: out_layers, deep attentive pooler,
tolerant checkpoint loading."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from jepa_tpu.models.attentive import AttentiveCfg, classifier_forward, init_attentive_classifier
from jepa_tpu.models.vit import ViTCfg, init_vit, vit_forward

CFG = ViTCfg(
    img_size=32, patch_size=8, num_frames=4, tubelet_size=2,
    embed_dim=64, depth=3, num_heads=4, compute_dtype=jnp.float32, attn_impl="xla",
)


def test_out_layers_returns_normed_intermediates():
    params, consts = init_vit(jax.random.PRNGKey(0), CFG)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 32, 32, 3))
    outs = vit_forward(params, consts, x, CFG, out_layers=[0, 2])
    assert isinstance(outs, list) and len(outs) == 2
    assert outs[0].shape == (2, 32, 64)
    # last requested layer equals the default output (both are LN(final))
    final = vit_forward(params, consts, x, CFG)
    np.testing.assert_allclose(np.asarray(outs[1]), np.asarray(final), atol=1e-5)
    assert not np.allclose(np.asarray(outs[0]), np.asarray(outs[1]))


def test_attentive_pooler_depth2():
    acfg = AttentiveCfg(
        embed_dim=64, num_heads=4, depth=2, num_classes=5, compute_dtype=jnp.float32
    )
    params = init_attentive_classifier(jax.random.PRNGKey(2), acfg)
    assert "blocks" in params["pooler"]
    # trailing self-attn block rescale continues at layer 2: its proj std is
    # smaller than a layer-1-scaled fresh block would be
    x = jax.random.normal(jax.random.PRNGKey(3), (3, 12, 64))
    logits = classifier_forward(params, x, acfg)
    assert logits.shape == (3, 5)
    assert np.isfinite(np.asarray(logits)).all()


def test_tolerant_loading_substitutes_mismatched_shapes(tmp_path):
    torch = pytest.importorskip("torch")
    from jepa_tpu.utils.checkpoint_port import load_pretrained_encoder, save_torch_checkpoint

    params, consts = init_vit(jax.random.PRNGKey(4), CFG)
    path = str(tmp_path / "ck.pth.tar")
    save_torch_checkpoint(path, target_encoder=(params, consts), epoch=1, cfg=CFG)

    # different resolution -> pos_embed table size mismatch
    import dataclasses

    big = dataclasses.replace(CFG, img_size=48)
    p2, c2 = load_pretrained_encoder(path, big, tolerant=True)
    # blocks ported; pos_embed kept from init at the new grid size
    np.testing.assert_allclose(
        np.asarray(p2["blocks"]["attn"]["qkv_w"]),
        np.asarray(params["blocks"]["attn"]["qkv_w"]),
        atol=1e-7,
    )
    assert c2["pos_embed"].shape == (2 * 6 * 6, 64)
    # and the model runs at the new resolution
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 4, 48, 48, 3))
    out = vit_forward(p2, c2, x, big)
    assert out.shape == (1, 72, 64)

    # strict mode resolves the pos-embed grid mismatch the same way the
    # reference's loader does — regenerate the (non-learned, deterministic)
    # sincos table at the model grid — while still porting every weight
    p3, c3 = load_pretrained_encoder(path, big, tolerant=False)
    assert c3["pos_embed"].shape == (2 * 6 * 6, 64)
    np.testing.assert_allclose(np.asarray(c3["pos_embed"]), np.asarray(c2["pos_embed"]), atol=1e-7)


def test_gigantic_matches_reference_effective_mlp_ratio():
    """Reference vit_gigantic passes a typo'd `mpl_ratio=64/13` kwarg that
    torch silently swallows (vision_transformer.py:291-295), so REAL
    gigantic zoo checkpoints carry mlp_ratio 4.0. Our default factory must
    shape-match those checkpoints; the intended 64/13 stays opt-in."""
    from jepa_tpu.models.factory import vit_cfg

    g = vit_cfg("vit_gigantic")
    assert g.embed_dim == 1664 and g.depth == 48 and g.patch_size == 14
    assert g.mlp_ratio == 4.0 and g.mlp_hidden == 6656  # == torch default 4.0
    gi = vit_cfg("vit_gigantic_intended")
    assert abs(gi.mlp_ratio - 64 / 13) < 1e-9 and gi.mlp_hidden == int(1664 * 64 / 13)
