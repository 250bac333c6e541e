"""Flash attention kernel vs XLA reference: forward, grads, masking.

Runs in Pallas interpret mode on CPU; the same kernels compile on TPU
(exercised by bench.py / TPU smoke runs).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from jepa_tpu.ops.attention import xla_attention
from jepa_tpu.ops.flash_attention import flash_attention


def _qkv(b=2, n=160, h=2, d=48, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    shape = (b, n, h, d)
    return tuple(jax.random.normal(k, shape, jnp.float32) * 0.5 for k in ks)


def test_forward_matches_xla():
    q, k, v = _qkv()
    got = flash_attention(q, k, v, interpret=True)
    want = xla_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)


def test_forward_with_kv_mask():
    q, k, v = _qkv(seed=1)
    mask = np.ones((2, 160), bool)
    mask[:, 100:] = False
    got = flash_attention(q, k, v, kv_mask=jnp.asarray(mask), interpret=True)
    want = xla_attention(q, k, v, kv_mask=jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)
    # also equals attention computed over only the valid keys
    want_trunc = xla_attention(q, k[:, :100], v[:, :100])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want_trunc), atol=2e-5, rtol=2e-5)


def test_sequence_padding_is_exact():
    # n not a multiple of the block size exercises the internal padding path
    q, k, v = _qkv(n=133, seed=2)
    got = flash_attention(q, k, v, interpret=True, block_q=128, block_k=128)
    want = xla_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)


def test_grads_match_xla():
    q, k, v = _qkv(b=1, n=128, h=2, d=32, seed=3)
    mask = np.ones((1, 128), bool)
    mask[:, 96:] = False
    mask = jnp.asarray(mask)

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, kv_mask=mask, interpret=True, block_q=64, block_k=64)
        return jnp.sum(jnp.sin(o))

    def loss_xla(q, k, v):
        return jnp.sum(jnp.sin(xla_attention(q, k, v, kv_mask=mask)))

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_flash, g_xla, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-5, rtol=3e-5,
            err_msg=f"grad d{name} mismatch",
        )
    # masked-out keys receive zero gradient
    np.testing.assert_allclose(np.asarray(g_flash[1])[:, 96:], 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g_flash[2])[:, 96:], 0.0, atol=1e-6)


def test_bf16_forward_close():
    q, k, v = _qkv(seed=4)
    q16, k16, v16 = (x.astype(jnp.bfloat16) for x in (q, k, v))
    got = flash_attention(q16, k16, v16, interpret=True).astype(jnp.float32)
    want = xla_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-2, rtol=2e-2)


def test_self_attention_flash_path_matches_xla():
    """The head-major fused-qkv flash path in transformer.self_attention
    (einsum-projected [B,H,N,Dh] operands, no relayout) must agree with the
    token-major XLA path — values AND grads."""
    from jepa_tpu.models.transformer import BlockCfg, init_block_stack, run_blocks

    depth = 2
    base = dict(dim=64, num_heads=4, mlp_hidden=128, compute_dtype=jnp.float32)
    params = init_block_stack(jax.random.PRNGKey(3), depth, BlockCfg(**base, attn_impl="xla"))
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 192, 64), jnp.float32)
    mask = jnp.arange(192)[None, :].repeat(2, 0) < 150

    for kv_mask in (None, mask):
        outs, grads = {}, {}
        for impl in ("xla", "flash"):
            cfg = BlockCfg(**base, attn_impl=impl)

            def loss(p, x):
                out, _ = run_blocks(x, p, cfg, kv_mask=kv_mask)
                return jnp.sum(out**2), out

            (l, out), g = jax.value_and_grad(loss, has_aux=True)(params, x)
            outs[impl], grads[impl] = out, g
        np.testing.assert_allclose(
            np.asarray(outs["flash"]), np.asarray(outs["xla"]), atol=3e-5, rtol=3e-5
        )
        for pa, pb in zip(jax.tree.leaves(grads["flash"]), jax.tree.leaves(grads["xla"])):
            np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), atol=5e-4, rtol=5e-4)
