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
