"""Fused linear+GELU Pallas kernel vs the plain XLA path (interpret mode).

The kernel must match jax.nn.gelu(approximate=False) numerics exactly in
fp32 (same lax.erf primitive, same bf16 round-trip point as the unfused
transformer.mlp path) — values and all three grads.
"""

import numpy as np

import jax
import jax.numpy as jnp

from jepa_tpu.ops.fused_mlp import linear_gelu


def _ref(x, w, b):
    h = jnp.dot(x, w, preferred_element_type=jnp.float32) + b.astype(jnp.float32)
    return jax.nn.gelu(h.astype(x.dtype).astype(jnp.float32),
                       approximate=False).astype(x.dtype)


def _data(m, k, f, seed=0, dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    x = (jax.random.normal(ks[0], (m, k), jnp.float32) * 0.5).astype(dtype)
    w = (jax.random.normal(ks[1], (k, f), jnp.float32) * 0.05).astype(dtype)
    b = jax.random.normal(ks[2], (f,), jnp.float32) * 0.1
    return x, w, b


def test_forward_matches_reference():
    # m=333 exercises the edge row-block masking (m128=384, bm blocks)
    x, w, b = _data(333, 128, 512)
    got = linear_gelu(x, w, b, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(_ref(x, w, b)),
                               atol=1e-6, rtol=1e-6)


def test_grads_match_reference():
    x, w, b = _data(160, 128, 256, seed=1)

    def loss(f):
        return lambda x, w, b: jnp.sum(jnp.sin(f(x, w, b)))

    g_tm = jax.grad(loss(lambda x, w, b: linear_gelu(x, w, b, interpret=True)),
                    argnums=(0, 1, 2))(x, w, b)
    g_ref = jax.grad(loss(_ref), argnums=(0, 1, 2))(x, w, b)
    for a, bb, name in zip(g_tm, g_ref, ("dx", "dw", "db")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   atol=2e-5, rtol=2e-5, err_msg=name)


def test_batched_leading_dims_and_fallback():
    # 3D input goes through the kernel; odd K falls back to plain XLA
    x, w, b = _data(6 * 40, 128, 256, seed=2)
    x3 = x.reshape(6, 40, 128)
    got = linear_gelu(x3, w, b, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got.reshape(240, 256)), np.asarray(_ref(x, w, b)),
        atol=1e-6, rtol=1e-6)

    xf, wf, bf = _data(64, 96, 192, seed=3)  # 96 % 128 != 0 -> fallback
    got = linear_gelu(xf, wf, bf, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(_ref(xf, wf, bf)),
                               atol=1e-6, rtol=1e-6)


def test_mlp_uses_fused_kernel_consistently():
    """transformer.mlp on the flash path (fused kernel) equals the xla
    path — values and grads through a full block stack."""
    from jepa_tpu.models.transformer import BlockCfg, init_block_stack, run_blocks

    base = dict(dim=128, num_heads=4, mlp_hidden=512, compute_dtype=jnp.float32)
    params = init_block_stack(jax.random.PRNGKey(5), 2, BlockCfg(**base, attn_impl="xla"))
    x = jax.random.normal(jax.random.PRNGKey(6), (2, 160, 128), jnp.float32)

    outs, grads = {}, {}
    for impl in ("xla", "flash"):
        # 'force' exercises the fused kernel even on CPU (interpret mode);
        # plain True is TPU-gated by resolve_fused_mlp
        cfg = BlockCfg(**base, attn_impl=impl, fused_mlp=("force" if impl == "flash" else False))

        def loss(p, x):
            out, _ = run_blocks(x, p, cfg)
            return jnp.sum(out**2), out

        (_, out), g = jax.value_and_grad(loss, has_aux=True)(params, x)
        outs[impl], grads[impl] = out, g
    np.testing.assert_allclose(np.asarray(outs["flash"]), np.asarray(outs["xla"]),
                               atol=3e-5, rtol=3e-5)
    for pa, pb in zip(jax.tree.leaves(grads["flash"]), jax.tree.leaves(grads["xla"])):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   atol=5e-4, rtol=5e-4)
