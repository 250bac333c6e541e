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


def test_fullw_non_divisible_f_writes_every_column():
    """f=1792 fits the full-w VMEM budget but max(2, f//512)=3 does not
    divide it — the old tiling left the last column unwritten (silent
    garbage). _pick_fullw_tiles must find a covering 128-aligned tiling
    (7x256) or fall back to the blocked grid."""
    from jepa_tpu.ops.fused_mlp import _pick_fullw_tiles

    t = _pick_fullw_tiles(1792)
    assert t and 1792 % t == 0 and (1792 // t) % 128 == 0
    assert _pick_fullw_tiles(4096) == 8 and _pick_fullw_tiles(5120) == 10
    assert _pick_fullw_tiles(1000) == 0  # not lane-aligned -> blocked path

    x, w, b = _data(256, 448, 1792, seed=3)
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


def test_bf16_fast_gelu_is_bf16_exact():
    """The bf16 kernel path uses the exp2-form erf (2.2e-5 abs err): outputs
    must round to the SAME bf16 values as the exact-erf computation almost
    everywhere (and never differ by more than one ulp)."""
    import math

    from jepa_tpu.ops.fused_mlp import _gelu, _gelu_fast

    z = jnp.linspace(-8.0, 8.0, 20001, dtype=jnp.float32)
    gelu_exact = np.array(
        [0.5 * v * (1 + math.erf(v / math.sqrt(2))) for v in np.asarray(z)],
        np.float32,
    )
    got = np.asarray(_gelu_fast(z))
    # head: absolute accuracy far below bf16 quantum; tail (erfc form):
    # relative accuracy holds where 1+erf would cancel
    np.testing.assert_allclose(got, gelu_exact, atol=2e-6, rtol=3e-4)
    # bf16 rounding-boundary flips are intrinsic fp32 path noise: even a
    # 1.7e-7-accurate alternative erf flips ~23% of a dense grid by one
    # ulp. Assert every difference vs TRUE gelu is 1-ulp boundary noise
    # plus the tail's relative envelope. (The A&S _gelu is NOT the oracle
    # out in the tail: its 1.5e-7 erf error is a multi-percent relative
    # error on 1+erf there, where the erfc form stays accurate.)
    a = np.asarray(_gelu_fast(z).astype(jnp.bfloat16).astype(jnp.float32))
    b = np.asarray(jnp.asarray(gelu_exact).astype(jnp.bfloat16).astype(jnp.float32))
    ulp = np.maximum(np.abs(b) * 2**-8, 2**-14)
    np.testing.assert_array_less(np.abs(a - b), 1.5 * ulp + np.abs(b) * 1e-3 + 1e-7)


def test_linear_gelu_bf16_matches_fp32_reference():
    """bf16 kernel output (fast-erf path) vs fp32 reference computation."""
    xf, wf, bf = _data(256, 128, 256, seed=9)
    want = np.asarray(_ref(xf, wf, bf))
    got = linear_gelu(
        xf.astype(jnp.bfloat16), wf.astype(jnp.bfloat16), bf, interpret=True
    ).astype(jnp.float32)
    # bf16 operands + bf16 output: tolerance is bf16 matmul noise
    np.testing.assert_allclose(np.asarray(got), want, atol=0.06, rtol=0.06)
