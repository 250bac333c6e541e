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


def test_flash_self_attention_tm_kernel_matches_reference():
    """The token-major fused-projection path (flash_self_attention with an
    in-kernel head loop) matches a plain XLA projection+attention — values
    and grads — including at an odd N that exercises k-block edge masking
    in the merged backward (N=149, blocks of 128)."""
    from jepa_tpu.ops.flash_attention import _pick_tm_params, flash_self_attention

    b, n, h, c = 2, 149, 4, 32
    d = h * c
    # this shape must actually route to the token-major kernels
    assert _pick_tm_params(h, c, n, fwd=True) is not None
    assert _pick_tm_params(h, c, n, fwd=False) is not None

    kx, kw, kb = jax.random.split(jax.random.PRNGKey(7), 3)
    x = jax.random.normal(kx, (b, n, d), jnp.float32) * 0.5
    w = jax.random.normal(kw, (d, 3 * d), jnp.float32) * 0.1
    bias = jax.random.normal(kb, (3 * d,), jnp.float32) * 0.1
    mask = jnp.asarray(np.arange(n)[None, :].repeat(b, 0) < 120)

    def ref(x, w, bias, kv_mask):
        qkv = (jnp.dot(x, w) + bias).reshape(b, n, 3, h, c)
        return xla_attention(
            qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2], kv_mask=kv_mask
        ).reshape(b, n, d)

    for kv_mask in (None, mask):
        got = flash_self_attention(x, w, bias, h, kv_mask=kv_mask, interpret=True)
        want = ref(x, w, bias, kv_mask)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-5, rtol=3e-5)

        def loss_tm(x, w, bias):
            o = flash_self_attention(x, w, bias, h, kv_mask=kv_mask, interpret=True)
            return jnp.sum(jnp.sin(o))

        def loss_ref(x, w, bias):
            return jnp.sum(jnp.sin(ref(x, w, bias, kv_mask)))

        g_tm = jax.grad(loss_tm, argnums=(0, 1, 2))(x, w, bias)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, bias)
        for a, bb, name in zip(g_tm, g_ref, ("dx", "dw", "db")):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(bb), atol=5e-5, rtol=5e-5,
                err_msg=f"{name} mismatch (kv_mask={kv_mask is not None})",
            )


def test_tm_chunked_kv_matches_one_shot(monkeypatch):
    """The chunked-kv pipelined fwd (JEPA_TM_KV_CHUNK>0) must match the
    one-shot kernel — values, lse-consuming grads, masked and unmasked,
    ragged last chunk, and an all-masked chunk (keys >=64 invalid with
    chunk 64 leaves whole chunks masked)."""
    from jepa_tpu.ops.flash_attention import flash_self_attention

    b, n, h, c = 2, 149, 4, 32
    d = h * c
    kx, kw, kb = jax.random.split(jax.random.PRNGKey(3), 3)
    x = jax.random.normal(kx, (b, n, d), jnp.float32) * 0.5
    w = jax.random.normal(kw, (d, 3 * d), jnp.float32) * 0.1
    bias = jax.random.normal(kb, (3 * d,), jnp.float32) * 0.1
    mask = jnp.asarray(np.arange(n)[None, :].repeat(b, 0) < 64)

    def run(x, w, bias, kv_mask):
        o = flash_self_attention(x, w, bias, h, kv_mask=kv_mask, interpret=True)
        return o, jax.grad(
            lambda *a: jnp.sum(jnp.sin(flash_self_attention(
                *a, h, kv_mask=kv_mask, interpret=True))), argnums=(0, 1, 2)
        )(x, w, bias)

    for kv_mask in (None, mask):
        monkeypatch.delenv("JEPA_TM_KV_CHUNK", raising=False)
        o_ref, g_ref = run(x, w, bias, kv_mask)
        for chunk in (64, 128):  # 149 -> ragged tail; 64 -> all-masked chunks
            monkeypatch.setenv("JEPA_TM_KV_CHUNK", str(chunk))
            jax.clear_caches()  # the env knob is read at trace time
            o_c, g_c = run(x, w, bias, kv_mask)
            np.testing.assert_allclose(
                np.asarray(o_c), np.asarray(o_ref), atol=3e-6, rtol=3e-6,
                err_msg=f"o chunk={chunk} mask={kv_mask is not None}")
            for a, bb, name in zip(g_c, g_ref, ("dx", "dw", "db")):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(bb), atol=3e-5, rtol=3e-5,
                    err_msg=f"{name} chunk={chunk} mask={kv_mask is not None}")
    monkeypatch.delenv("JEPA_TM_KV_CHUNK", raising=False)
    jax.clear_caches()


def test_save_qkv_remat_matches_default(monkeypatch):
    """JEPA_REMAT_SAVE_QKV=1 moves the qkv projection OUTSIDE the flash
    custom_vjp and saves its named output across the remat boundary (the
    backward consumes saved qkv instead of recomputing LN1+projection).
    Same math, different autodiff factorization — loss and all grads must
    match the default path through remat='attn' blocks."""
    from jepa_tpu.models.transformer import BlockCfg, init_block_stack, run_blocks

    depth = 2
    cfg = BlockCfg(dim=128, num_heads=4, mlp_hidden=256,
                   compute_dtype=jnp.float32, attn_impl="flash")
    params = init_block_stack(jax.random.PRNGKey(5), depth, cfg)
    x = jax.random.normal(jax.random.PRNGKey(6), (2, 149, 128), jnp.float32)
    mask = jnp.asarray(np.arange(149)[None, :].repeat(2, 0) < 120)

    def run(kv_mask):
        def loss(p, x):
            out, _ = run_blocks(x, p, cfg, kv_mask=kv_mask, remat="attn")
            return jnp.sum(jnp.sin(out))

        return jax.value_and_grad(loss)(params, x)

    for kv_mask in (None, mask):
        # explicit '0': save-qkv is the DEFAULT, so delenv would compare
        # the save-qkv path to itself (vacuous)
        monkeypatch.setenv("JEPA_REMAT_SAVE_QKV", "0")
        jax.clear_caches()
        l_ref, g_ref = run(kv_mask)
        monkeypatch.setenv("JEPA_REMAT_SAVE_QKV", "1")
        jax.clear_caches()  # the env knob is read at trace time
        l_sq, g_sq = run(kv_mask)
        np.testing.assert_allclose(float(l_sq), float(l_ref), rtol=1e-6)
        for a, b in zip(jax.tree.leaves(g_sq), jax.tree.leaves(g_ref)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-5, rtol=5e-5,
                err_msg=f"save-qkv grad mismatch (mask={kv_mask is not None})",
            )
    monkeypatch.delenv("JEPA_REMAT_SAVE_QKV", raising=False)
    jax.clear_caches()


def test_save_fc1_attn_out_remat_match_default(monkeypatch):
    """JEPA_REMAT_SAVE_FC1 (default ON since round 4: 678.8 -> 666.5
    ms/step on chip) and JEPA_REMAT_SAVE_ATTN_OUT (opt-in) save named
    intermediates across the remat boundary — pure autodiff-factorization
    changes, so loss and every grad must match the save-nothing policy."""
    from jepa_tpu.models.transformer import BlockCfg, init_block_stack, run_blocks

    depth = 2
    cfg = BlockCfg(dim=128, num_heads=4, mlp_hidden=256,
                   compute_dtype=jnp.float32, attn_impl="flash")
    params = init_block_stack(jax.random.PRNGKey(7), depth, cfg)
    x = jax.random.normal(jax.random.PRNGKey(8), (2, 149, 128), jnp.float32)

    def run():
        def loss(p, x):
            out, _ = run_blocks(x, p, cfg, remat="attn")
            return jnp.sum(jnp.sin(out))

        return jax.value_and_grad(loss)(params, x)

    # reference: both knobs explicitly OFF (fc1 defaults to '1')
    monkeypatch.setenv("JEPA_REMAT_SAVE_FC1", "0")
    monkeypatch.setenv("JEPA_REMAT_SAVE_ATTN_OUT", "0")
    jax.clear_caches()
    l_ref, g_ref = run()
    for fc1, attn_out in (("1", "0"), ("0", "1"), ("1", "1")):
        monkeypatch.setenv("JEPA_REMAT_SAVE_FC1", fc1)
        monkeypatch.setenv("JEPA_REMAT_SAVE_ATTN_OUT", attn_out)
        jax.clear_caches()  # the env knobs are read at trace time
        l_k, g_k = run()
        np.testing.assert_allclose(float(l_k), float(l_ref), rtol=1e-6)
        for a, b in zip(jax.tree.leaves(g_k), jax.tree.leaves(g_ref)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-5, rtol=5e-5,
                err_msg=f"remat-save grad mismatch (fc1={fc1} ao={attn_out})",
            )
    for knob in ("JEPA_REMAT_SAVE_FC1", "JEPA_REMAT_SAVE_ATTN_OUT"):
        monkeypatch.delenv(knob, raising=False)
    jax.clear_caches()


def test_tm_no_max_matches_row_max(monkeypatch):
    """The static-shift softmax (JEPA_TM_NO_MAX=1) drops the per-row max
    pass; subtracting any constant is exact softmax math, so outputs, lse
    (via grads), masked and unmasked must match the row-max kernel to fp
    rounding — including logits pushed well away from zero (both signs),
    where only the fp RANGE could diverge."""
    from jepa_tpu.ops.flash_attention import flash_self_attention

    b, n, h, c = 2, 149, 4, 32
    d = h * c
    kx, kw, kb = jax.random.split(jax.random.PRNGKey(7), 3)
    x = jax.random.normal(kx, (b, n, d), jnp.float32) * 0.5
    w = jax.random.normal(kw, (d, 3 * d), jnp.float32) * 0.1
    bias = jax.random.normal(kb, (3 * d,), jnp.float32) * 0.1
    # 8x the qk block of w -> logits spread to roughly +-40 natural units
    w_hot = w.at[:, : 2 * d].multiply(8.0)
    mask = jnp.asarray(np.arange(n)[None, :].repeat(b, 0) < 64)

    def run(x, w, bias, kv_mask):
        o = flash_self_attention(x, w, bias, h, kv_mask=kv_mask, interpret=True)
        return o, jax.grad(
            lambda *a: jnp.sum(jnp.sin(flash_self_attention(
                *a, h, kv_mask=kv_mask, interpret=True))), argnums=(0, 1, 2)
        )(x, w, bias)

    # grads at +-40-unit logits see bf16-p rounding amplified by the wide
    # p dynamic range (both kernels quantize p to bf16; the shift just
    # changes WHICH ulp) — tolerance scaled accordingly for the hot case
    for wmat, gtol in ((w, 3e-5), (w_hot, 5e-4)):
        for kv_mask in (None, mask):
            # explicit '0': _tm_no_max() DEFAULTS to the static-shift
            # kernel, so delenv would compare it to itself (vacuous)
            monkeypatch.setenv("JEPA_TM_NO_MAX", "0")
            jax.clear_caches()
            o_ref, g_ref = run(x, wmat, bias, kv_mask)
            monkeypatch.setenv("JEPA_TM_NO_MAX", "1")
            jax.clear_caches()  # the env knob is read at trace time
            o_nm, g_nm = run(x, wmat, bias, kv_mask)
            np.testing.assert_allclose(
                np.asarray(o_nm), np.asarray(o_ref), atol=3e-6, rtol=3e-6,
                err_msg=f"o no_max mask={kv_mask is not None}")
            for a, bb, name in zip(g_nm, g_ref, ("dx", "dw", "db")):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(bb), atol=gtol, rtol=gtol,
                    err_msg=f"{name} no_max mask={kv_mask is not None}")
    monkeypatch.delenv("JEPA_TM_NO_MAX", raising=False)
    jax.clear_caches()


def test_tm_param_picker_production_shapes():
    """The compiler-guardrail picker must route every production shape to a
    configuration inside the validated envelope (<=8 unrolled heads,
    hg*blk and hg*blk*n128*hdim ceilings — measured v5e crash boundaries).
    Head dims are padded to a multiple of 32 by flash_self_attention before
    the picker runs, so the picker is queried at the padded dims."""
    from jepa_tpu.ops.flash_attention import (
        _TM_COMPILE_LIMIT_BWD,
        _TM_COMPILE_LIMIT_FWD,
        _TM_MAX_HGBLK_BWD,
        _TM_MAX_HGBLK_FWD,
        _TM_MAX_UNROLLED_HEADS,
        _pick_tm_params,
    )

    cases = {
        "vit_large_full": (16, 64, 1568),
        "vit_large_ctx_short": (16, 64, 376),
        "vit_large_ctx_long": (16, 64, 96),
        "predictor_a_padded": (16, 32, 1191),   # c=24 pads to 32
        "predictor_b_padded": (16, 32, 1109),
        "vit_huge_padded": (16, 96, 1568),      # c=80 pads to 96
        "vit_giant_padded": (16, 96, 1568),     # c=88 pads to 96
    }
    for name, (heads, hdim, n) in cases.items():
        for fwd, limit, hgblk in (
            (True, _TM_COMPILE_LIMIT_FWD, _TM_MAX_HGBLK_FWD),
            (False, _TM_COMPILE_LIMIT_BWD, _TM_MAX_HGBLK_BWD),
        ):
            got = _pick_tm_params(heads, hdim, n, fwd=fwd)
            assert got is not None, (name, fwd)
            s, blk = got
            hg = heads // s
            n128 = ((n + 127) // 128) * 128
            assert hg <= _TM_MAX_UNROLLED_HEADS, (name, fwd, got)
            assert hg * blk <= hgblk, (name, fwd, got)
            assert hg * blk * n128 * hdim <= limit, (name, fwd, got)
            assert (heads * hdim // s) % 128 == 0, (name, fwd, got)
    # unpadded predictor c=24 has no 128-aligned split with <=8 heads;
    # flash_self_attention pads it rather than falling back
    assert _pick_tm_params(16, 24, 1191, fwd=True) is None
    # c=96 bwd gets the halved ceiling -> the v5e-validated bk=64
    assert _pick_tm_params(16, 96, 1568, fwd=False) == (4, 64)


def test_flash_self_attention_pads_small_head_dim():
    """c=24 (the predictor head dim) routes through the token-major kernels
    by zero-padding heads to c=32 — values and grads must equal the plain
    reference, including dw/db for the ORIGINAL (unpadded) weights."""
    from jepa_tpu.ops.flash_attention import flash_self_attention

    b, n, h, c = 2, 137, 16, 24
    d = h * c
    kx, kw, kb = jax.random.split(jax.random.PRNGKey(11), 3)
    x = jax.random.normal(kx, (b, n, d), jnp.float32) * 0.5
    w = jax.random.normal(kw, (d, 3 * d), jnp.float32) * 0.05
    bias = jax.random.normal(kb, (3 * d,), jnp.float32) * 0.1

    def ref(x, w, bias):
        qkv = (jnp.dot(x, w) + bias).reshape(b, n, 3, h, c)
        return xla_attention(qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]).reshape(b, n, d)

    got = flash_self_attention(x, w, bias, h, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref(x, w, bias)),
                               atol=3e-5, rtol=3e-5)

    g_tm = jax.grad(
        lambda x, w, bias: jnp.sum(
            jnp.sin(flash_self_attention(x, w, bias, h, interpret=True))
        ), argnums=(0, 1, 2),
    )(x, w, bias)
    g_ref = jax.grad(
        lambda x, w, bias: jnp.sum(jnp.sin(ref(x, w, bias))), argnums=(0, 1, 2)
    )(x, w, bias)
    for a, bb, name in zip(g_tm, g_ref, ("dx", "dw", "db")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   atol=5e-5, rtol=5e-5, err_msg=name)


def test_flash_self_attention_shape_fuzz():
    """Randomized (heads, head_dim, n, mask) sweep through
    flash_self_attention's dispatch (token-major kernels, head-dim padding,
    packed fallback) — every combination must match the XLA reference in
    values and dx."""
    rng = np.random.default_rng(42)
    cases = []
    for _ in range(8):
        h = int(rng.choice([1, 2, 4, 8, 16]))
        c = int(rng.choice([8, 16, 24, 32, 48, 64, 80]))
        n = int(rng.integers(16, 300))
        cases.append((h, c, n, bool(rng.integers(0, 2))))
    for h, c, n, use_mask in cases:
        d = h * c
        ks = jax.random.split(jax.random.PRNGKey(n * 1000 + d), 3)
        x = jax.random.normal(ks[0], (2, n, d), jnp.float32) * 0.5
        w = jax.random.normal(ks[1], (d, 3 * d), jnp.float32) * (0.5 / d**0.5)
        bias = jax.random.normal(ks[2], (3 * d,), jnp.float32) * 0.1
        mask = None
        if use_mask:
            valid = max(1, int(n * 0.8))
            mask = jnp.asarray(np.arange(n)[None, :].repeat(2, 0) < valid)

        from jepa_tpu.ops.flash_attention import flash_self_attention

        def ref(x, w, bias):
            qkv = (jnp.dot(x, w) + bias).reshape(2, n, 3, h, c)
            return xla_attention(qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2],
                                 kv_mask=mask).reshape(2, n, d)

        got = flash_self_attention(x, w, bias, h, kv_mask=mask, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref(x, w, bias)), atol=5e-5, rtol=5e-5,
            err_msg=f"fwd h={h} c={c} n={n} mask={use_mask}")

        g_tm = jax.grad(lambda x: jnp.sum(jnp.sin(
            flash_self_attention(x, w, bias, h, kv_mask=mask, interpret=True))))(x)
        g_ref = jax.grad(lambda x: jnp.sum(jnp.sin(ref(x, w, bias))))(x)
        np.testing.assert_allclose(
            np.asarray(g_tm), np.asarray(g_ref), atol=1e-4, rtol=1e-4,
            err_msg=f"dx h={h} c={c} n={n} mask={use_mask}")


def test_tm_tiled_bwd_matches_merged_and_xla():
    """Dual-tiled token-major backward (both sequence sides blocked,
    _bwd_tm_tiled): exact vs the merged kernel and the XLA reference,
    masked and unmasked, at an edge geometry (N=320 -> 3 blocks of 128
    with a 64-row edge) so the cross-block zeroing of both contraction
    operands is exercised. This path covers geometries where the merged
    kernel's full-length q/do/dq-acc residents blow VMEM — the vith16_384
    train geometry (c=96, N=4608; reference modules.py:66-69 +
    configs/pretrain/vith16_384.yaml) Mosaic-crashed the head-major packed
    fallback and ran XLA attention at ~3% MFU before this kernel."""
    import jepa_tpu.ops.flash_attention as fa

    H, C, N, D = 4, 32, 320, 128
    x = jax.random.normal(jax.random.PRNGKey(0), (2, N, D), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (D, 3 * H * C), jnp.float32) * 0.05
    bias = jax.random.normal(jax.random.PRNGKey(2), (3 * H * C,), jnp.float32) * 0.01
    kv_mask = jax.random.bernoulli(jax.random.PRNGKey(3), 0.7, (2, N))
    kv_mask = kv_mask.at[:, 0].set(True)
    scale = C ** -0.5
    mask = jax.lax.broadcast_in_dim(
        kv_mask.astype(bool), (2, fa._SUBLANES, N), (0, 2))
    weight = 1e-4 * jnp.arange(2 * N * H * C, dtype=jnp.float32).reshape(
        2, N, H * C)

    def run(mode, masked, fwd_mode=("one", 1, 128)):
        meta = (scale, H, C, (fwd_mode, fwd_mode), mode, True)

        def loss(x, w, bias):
            if masked:
                o, _ = fa._flash_tm_masked(meta, x, w, bias, mask)
            else:
                o, _ = fa._flash_tm(meta, x, w, bias)
            return jnp.sum(o * weight)

        return jax.value_and_grad(loss, argnums=(0, 1, 2))(x, w, bias)

    def ref(masked):
        def loss(x, w, bias):
            qkv = x @ w + bias
            q, k, v = [qkv[..., i * H * C:(i + 1) * H * C].reshape(2, N, H, C)
                       for i in range(3)]
            o = xla_attention(q, k, v, kv_mask=kv_mask if masked else None,
                              scale=scale).reshape(2, N, H * C)
            return jnp.sum(o * weight)

        return jax.value_and_grad(loss, argnums=(0, 1, 2))(x, w, bias)

    for masked in (False, True):
        v_m, g_m = run(("merged", 1, 128), masked)
        v_t, g_t = run(("tiled", 1, 128, 128), masked)
        # tiled FWD (kv-blocked static-shift accumulation) over the tiled
        # bwd: the full big-N composition flash_self_attention ships
        v_tf, g_tf = run(("tiled", 1, 128, 128), masked,
                         fwd_mode=("tiled", 1, 128, 128))
        v_r, g_r = ref(masked)
        np.testing.assert_allclose(float(v_t), float(v_m), rtol=1e-6)
        np.testing.assert_allclose(float(v_t), float(v_r), rtol=1e-5)
        np.testing.assert_allclose(float(v_tf), float(v_r), rtol=1e-5)
        for a_tf, b in zip(g_tf, g_m):
            sc = float(jnp.abs(jnp.asarray(b)).max())
            np.testing.assert_allclose(
                np.asarray(a_tf) / sc, np.asarray(b) / sc, atol=2e-5,
                err_msg=f"tiled-fwd vs merged mask={masked}")
        for a, b, c_ in zip(g_t, g_m, g_r):
            # max-normalized: elementwise rtol is meaningless on the
            # near-zero entries of these fp32 accumulation-order-different
            # reductions
            sc = float(jnp.abs(jnp.asarray(b)).max())
            np.testing.assert_allclose(np.asarray(a) / sc, np.asarray(b) / sc,
                                       atol=2e-5,
                                       err_msg=f"tiled vs merged mask={masked}")
            np.testing.assert_allclose(np.asarray(a) / sc, np.asarray(c_) / sc,
                                       atol=5e-5,
                                       err_msg=f"tiled vs xla mask={masked}")


def test_tm_bwd_mode_picker():
    """_pick_tm_bwd keeps every previously-merged production shape on the
    merged kernel (no dispatch regression) and extends coverage to the
    vith16_384 train geometry via the tiled mode, inside the envelope."""
    from jepa_tpu.ops.flash_attention import (
        _TM_COMPILE_LIMIT_BWD,
        _TM_MAX_HGBLK_BWD,
        _TM_MAX_UNROLLED_HEADS,
        _pick_tm_bwd,
    )

    merged_cases = [(16, 64, 1568), (16, 64, 376), (16, 32, 1191),
                    (16, 96, 1568)]
    for heads, hdim, n in merged_cases:
        assert _pick_tm_bwd(heads, hdim, n)[0] == "merged", (heads, hdim, n)

    got = _pick_tm_bwd(16, 96, 4608)
    assert got is not None and got[0] == "tiled", got
    _, s, bq, bk = got
    hg = 16 // s
    limit = _TM_COMPILE_LIMIT_BWD // 2  # hdim > 64 halving
    assert hg <= _TM_MAX_UNROLLED_HEADS
    assert hg * max(bq, bk) <= _TM_MAX_HGBLK_BWD
    assert hg * bq * bk * 96 <= limit
    assert (16 * 96 // s) % 128 == 0


def test_tm_fwd_mode_picker():
    """_pick_tm_fwd returns a (primal, grad) pair: production ViT-L/
    predictor shapes stay one-shot in BOTH contexts (no dispatch
    regression); the vith16_384 geometry keeps the one-shot PRIMAL
    (575 ms encode, BENCH.md — the tiled fwd measured 803 ms there) but
    goes tiled under grad, where the one-shot's 18.5M double-buffered
    stack OOMs Mosaic's 16M scoped vmem (measured round 5). The pair
    must share a head split: the custom_vjp primal and fwd rules emit
    the same lse [B, hs, N, hg] shape."""
    from jepa_tpu.ops.flash_attention import _pick_tm_fwd

    for heads, hdim, n in [(16, 64, 1568), (16, 64, 376), (16, 32, 1191)]:
        pp, pg = _pick_tm_fwd(heads, hdim, n)
        assert pp[0] == "one" and pg == pp, (heads, hdim, n, pp, pg)

    pp, pg = _pick_tm_fwd(16, 96, 4608)
    assert pp[0] == "one" and pg[0] == "tiled", (pp, pg)
    assert pp[1] == pg[1], "primal and grad fwd must share the head split"
