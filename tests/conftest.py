"""Test-dir conftest. Backend pinning (CPU + 8 virtual devices) lives in the
repo-root conftest.py, which runs before any test import regardless of how
pytest is invoked from the repo root."""

import os

import pytest


@pytest.fixture(scope="session")
def tiny_pretrain_ckpt(tmp_path_factory):
    """A real orbax pretrain checkpoint (vit_tiny, patch16, tubelet2,
    4 frames) for eval tests — the evals now restore strictly, so tests
    must feed them an actual checkpoint rather than a random-init fallback."""
    import jax
    import jax.numpy as jnp

    from jepa_tpu.models.factory import predictor_cfg_for, vit_cfg
    from jepa_tpu.train.step import init_train_state
    from jepa_tpu.utils import checkpoint as ckpt_lib

    d = tmp_path_factory.mktemp("pretrain_ckpt")
    enc_cfg = vit_cfg(
        "vit_tiny", img_size=32, patch_size=16, num_frames=4, tubelet_size=2,
        uniform_power=True, compute_dtype=jnp.float32, attn_impl="xla",
    )
    pred_cfg = predictor_cfg_for(enc_cfg, predictor_embed_dim=48, depth=1, num_mask_tokens=2)
    state, _ = init_train_state(jax.random.PRNGKey(7), enc_cfg, pred_cfg)
    ckpt_lib.save_checkpoint(str(d), "enc", jax.device_get(state), epoch=1)
    return os.path.join(str(d), "enc-latest")
