"""Export (jax -> torch .pth.tar) then re-port: must round-trip exactly,
and the torch oracle must produce the same forward on exported weights."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from jepa_tpu.models.vit import ViTCfg, init_vit, vit_forward
from jepa_tpu.utils.checkpoint_port import (
    export_encoder,
    load_pretrained_encoder,
    port_encoder,
    save_torch_checkpoint,
)

CFG = ViTCfg(
    img_size=32, patch_size=8, num_frames=4, tubelet_size=2,
    embed_dim=64, depth=3, num_heads=4, compute_dtype=jnp.float32, attn_impl="xla",
)


def test_export_port_roundtrip(tmp_path):
    params, consts = init_vit(jax.random.PRNGKey(5), CFG)
    path = str(tmp_path / "export.pth.tar")
    save_torch_checkpoint(
        path, target_encoder=(params, consts), epoch=42, cfg=CFG,
        extra={"batch_size": 24},
    )
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    assert ckpt["epoch"] == 42 and ckpt["batch_size"] == 24
    assert "target_encoder" in ckpt

    p2, c2 = load_pretrained_encoder(path, CFG, checkpoint_key="target_encoder")
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(consts["pos_embed"]), np.asarray(c2["pos_embed"]), atol=1e-7
    )


def test_strict_load_across_resolutions_regenerates_pos_embed(tmp_path):
    """Loading a checkpoint into a different eval resolution is a supported
    reference workflow; the reference resolves the pos-embed grid mismatch by
    keeping the freshly-initialized table (eval.py:428-434), which is exact
    because the table is non-learned deterministic sincos
    (vision_transformer.py:79-86). Strict mode must do the same — and still
    raise on a REAL geometry mismatch."""
    params, consts = init_vit(jax.random.PRNGKey(7), CFG)
    path = str(tmp_path / "zoo224.pth.tar")
    save_torch_checkpoint(path, target_encoder=(params, consts), epoch=1, cfg=CFG)

    big_res = ViTCfg(
        img_size=48, patch_size=8, num_frames=4, tubelet_size=2,
        embed_dim=64, depth=3, num_heads=4,
        compute_dtype=jnp.float32, attn_impl="xla",
    )
    p2, c2 = load_pretrained_encoder(path, big_res, checkpoint_key="target_encoder")
    # weights port verbatim; pos-embed is the model-grid sincos
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
    _, init_consts = init_vit(jax.random.PRNGKey(0), big_res)
    assert c2["pos_embed"].shape == init_consts["pos_embed"].shape
    np.testing.assert_allclose(
        np.asarray(c2["pos_embed"]), np.asarray(init_consts["pos_embed"]), atol=1e-7
    )
    # the loaded encoder must run at the new resolution
    x = jnp.zeros((1, 4, 48, 48, 3), jnp.float32)
    out = vit_forward(p2, c2, x, big_res)
    assert out.shape == (1, (4 // 2) * (48 // 8) ** 2, 64)

    # a REAL mismatch (embed dim) still raises strictly
    wrong = ViTCfg(
        img_size=32, patch_size=8, num_frames=4, tubelet_size=2,
        embed_dim=128, depth=3, num_heads=4,
        compute_dtype=jnp.float32, attn_impl="xla",
    )
    with pytest.raises(ValueError, match="strict checkpoint port"):
        load_pretrained_encoder(path, wrong, checkpoint_key="target_encoder")


def test_exported_weights_run_in_torch_oracle():
    from tests.torch_oracle import OracleViT

    params, consts = init_vit(jax.random.PRNGKey(6), CFG)
    sd = {k: torch.from_numpy(v) for k, v in export_encoder(params, consts, CFG).items()}
    model = OracleViT()
    missing = model.load_state_dict(sd, strict=True)
    x = np.random.default_rng(0).normal(size=(2, 3, 4, 32, 32)).astype(np.float32)
    with torch.no_grad():
        want = model(torch.from_numpy(x)).numpy()
    got = np.asarray(vit_forward(params, consts, jnp.asarray(x.transpose(0, 2, 3, 4, 1)), CFG))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_eval_restores_encoder_from_orbax_pretrain_checkpoint(tmp_path):
    """Round-1 ADVICE regression: the eval's orbax restore path silently fell
    back to random init because its template lacked opt/predictor/epoch.
    Now it must restore the true target encoder — strictly."""
    import logging

    from jepa_tpu.evals.video_classification_frozen import _load_encoder
    from jepa_tpu.models.factory import predictor_cfg_for
    from jepa_tpu.train.step import init_train_state
    from jepa_tpu.utils import checkpoint as ckpt_lib

    pred_cfg = predictor_cfg_for(CFG, predictor_embed_dim=48, depth=1, num_mask_tokens=2)
    state, consts = init_train_state(jax.random.PRNGKey(3), CFG, pred_cfg)
    # make target visibly different from a PRNGKey(0) re-init
    state["target"] = jax.tree.map(lambda x: x + 1.0, state["target"])
    ckpt_lib.save_checkpoint(str(tmp_path), "jepa", jax.device_get(state), epoch=7)
    path = str(tmp_path / "jepa-latest")

    logger = logging.getLogger("test")
    got, _ = _load_encoder(path, CFG, "target_encoder", logger)
    for a, b in zip(jax.tree.leaves(state["target"]), jax.tree.leaves(got)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)

    got, _ = _load_encoder(path, CFG, "encoder", logger)
    for a, b in zip(jax.tree.leaves(state["params"]["encoder"]), jax.tree.leaves(got)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)

    # wrong model size must raise, not silently return random init
    big = ViTCfg(img_size=32, patch_size=8, num_frames=4, tubelet_size=2,
                 embed_dim=128, depth=3, num_heads=4,
                 compute_dtype=jnp.float32, attn_impl="xla")
    with pytest.raises((KeyError, ValueError)):
        _load_encoder(path, big, "target_encoder", logger)
    # missing checkpoint must raise too
    with pytest.raises(FileNotFoundError):
        _load_encoder(str(tmp_path / "nope-latest"), CFG, "target_encoder", logger)


def test_port_cli_converts_zoo_checkpoint_to_orbax(tmp_path):
    """The offline converter (jepa_tpu.utils.port_cli): a reference-format
    .pth.tar becomes an orbax checkpoint the evals restore STRICTLY under
    both checkpoint keys."""
    from jepa_tpu.models.factory import vit_cfg
    from jepa_tpu.utils import checkpoint as ckpt_lib
    from jepa_tpu.utils.port_cli import convert

    cfg = vit_cfg("vit_tiny", img_size=32, patch_size=16, num_frames=4,
                  tubelet_size=2, uniform_power=True)
    params, consts = init_vit(jax.random.PRNGKey(9), cfg)
    src = str(tmp_path / "zoo.pth.tar")
    save_torch_checkpoint(src, target_encoder=(params, consts), epoch=3, cfg=cfg)

    out = convert(src, str(tmp_path / "out"), "vit_tiny", patch_size=16,
                  num_frames=4, tubelet_size=2, img_size=32,
                  uniform_power=True, checkpoint_key="target_encoder",
                  tag="ported")
    assert out.endswith("ported-latest")

    # both eval restore paths find the encoder
    t = ckpt_lib.load_subtree(out, {"target": params})["target"]
    e = ckpt_lib.load_subtree(out, {"params": {"encoder": params}})["params"]["encoder"]
    for restored in (t, e):
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
