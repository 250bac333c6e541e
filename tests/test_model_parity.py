"""Golden parity: jepa_tpu forward == torch oracle forward on ported weights.

Runs everything in float32 (compute_dtype override) so differences reflect
layout/porting bugs, not mixed-precision noise.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from jepa_tpu.models.attentive import AttentiveCfg, classifier_forward
from jepa_tpu.models.predictor import PredictorCfg, predictor_forward
from jepa_tpu.models.vit import ViTCfg, vit_forward
from jepa_tpu.utils.checkpoint_port import (
    port_attentive_classifier,
    port_encoder,
    port_predictor,
)
from tests.torch_oracle import (
    OracleAttentiveClassifier,
    OraclePredictor,
    OracleViT,
    randomize,
)

CFG = ViTCfg(
    img_size=32,
    patch_size=8,
    num_frames=4,
    tubelet_size=2,
    embed_dim=64,
    depth=3,
    num_heads=4,
    compute_dtype=jnp.float32,
    attn_impl="xla",
)


def _video(b=2, seed=1):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(b, 3, 4, 32, 32)).astype(np.float32)


def test_encoder_forward_parity():
    model = randomize(OracleViT(), seed=3)
    params, consts = port_encoder(model.state_dict(), CFG)
    x = _video()
    with torch.no_grad():
        want = model(torch.from_numpy(x)).numpy()
    # jepa_tpu is channels-last.
    got = np.asarray(vit_forward(params, consts, jnp.asarray(x.transpose(0, 2, 3, 4, 1)), CFG))
    assert got.shape == want.shape == (2, 32, 64)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_encoder_masked_forward_parity():
    model = randomize(OracleViT(), seed=4)
    params, consts = port_encoder(model.state_dict(), CFG)
    x = _video(seed=5)
    keep = np.stack([np.array([0, 3, 7, 12, 25, 31]), np.array([1, 2, 9, 13, 14, 30])])
    with torch.no_grad():
        want = model(torch.from_numpy(x), keep_idx=torch.from_numpy(keep)).numpy()
    got = np.asarray(
        vit_forward(
            params,
            consts,
            jnp.asarray(x.transpose(0, 2, 3, 4, 1)),
            CFG,
            masks=jnp.asarray(keep.astype(np.int32)),
        )
    )
    assert got.shape == (2, 6, 64)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_predictor_forward_parity():
    n = 32
    model = randomize(OraclePredictor(n_patches=n), seed=7)
    pcfg = PredictorCfg(
        img_size=32,
        patch_size=8,
        num_frames=4,
        tubelet_size=2,
        embed_dim=64,
        predictor_embed_dim=32,
        depth=2,
        num_heads=4,
        num_mask_tokens=2,
        compute_dtype=jnp.float32,
        attn_impl="xla",
    )
    params, consts = port_predictor(model.state_dict(), pcfg)
    rng = np.random.default_rng(11)
    ctxt = rng.normal(size=(2, 6, 64)).astype(np.float32)
    idx_c = np.stack([np.arange(6), np.arange(6) + 8]).astype(np.int64)
    idx_t = np.stack([np.arange(6, 10), np.arange(20, 24)]).astype(np.int64)
    with torch.no_grad():
        want = model(
            torch.from_numpy(ctxt),
            torch.from_numpy(idx_c),
            torch.from_numpy(idx_t),
            mask_index=1,
        ).numpy()
    got = np.asarray(
        predictor_forward(
            params,
            consts,
            jnp.asarray(ctxt),
            None,
            jnp.asarray(idx_c.astype(np.int32)),
            jnp.asarray(idx_t.astype(np.int32)),
            pcfg,
            mask_index=1,
        )
    )
    assert got.shape == want.shape == (2, 4, 64)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_attentive_classifier_parity():
    model = randomize(OracleAttentiveClassifier(), seed=13)
    acfg = AttentiveCfg(
        embed_dim=64, num_heads=4, num_classes=10, depth=1, compute_dtype=jnp.float32, attn_impl="xla"
    )
    params = port_attentive_classifier(model.state_dict(), acfg)
    rng = np.random.default_rng(17)
    feats = rng.normal(size=(3, 20, 64)).astype(np.float32)
    with torch.no_grad():
        want = model(torch.from_numpy(feats)).numpy()
    got = np.asarray(classifier_forward(params, jnp.asarray(feats), acfg))
    assert got.shape == want.shape == (3, 10)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_padded_mask_equals_truncated_mask():
    """Padded tokens with kv_mask must not perturb valid-token outputs."""
    model = randomize(OracleViT(), seed=21)
    params, consts = port_encoder(model.state_dict(), CFG)
    x = jnp.asarray(_video(seed=22).transpose(0, 2, 3, 4, 1))
    keep = jnp.asarray(np.stack([[0, 3, 7, 12], [1, 2, 9, 13]]).astype(np.int32))
    # Padded variant: two junk indices appended, masked out via kv_mask.
    keep_pad = jnp.concatenate([keep, jnp.zeros((2, 2), jnp.int32)], axis=1)
    kv = jnp.asarray(np.array([[1, 1, 1, 1, 0, 0], [1, 1, 1, 1, 0, 0]], dtype=bool))
    ref = np.asarray(vit_forward(params, consts, x, CFG, masks=keep))
    pad = np.asarray(vit_forward(params, consts, x, CFG, masks=keep_pad, kv_mask=kv))
    np.testing.assert_allclose(pad[:, :4], ref, atol=1e-5, rtol=1e-5)
