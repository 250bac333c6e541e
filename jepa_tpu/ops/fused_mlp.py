"""Fused linear+GELU Pallas kernel for the transformer MLP's first layer.

Motivation (round-2 xplane, ViT-L target encoder): XLA's fc1 fusion
(matmul + bias + exact-erf GELU + bf16 cast) measures 3.03 ms/layer vs the
1.6 ms matmul floor — the fp32 GELU tail runs serially after the MXU work
inside the fusion. This kernel unrolls two output tiles per body so the
VPU epilogue of tile i overlaps the MXU matmul of tile i+1 (the same ILP
trick as the in-kernel head loop in ops/flash_attention).

Replaces: the hot path of reference src/models/utils/modules.py:13-36
(MLP.forward fc1+act) — numerics match jax.nn.gelu(approximate=False)
to fp32-polynomial accuracy (the erf here is the single-rational-minimax
fp32 approximation, |eps| < 3e-7, well inside the 2e-4 oracle tolerance).

The backward recomputes z = x@w+b in a second fused kernel that emits
g = dy * gelu'(z) (the VPU-heavy part); the three parameter/input grad
matmuls stay in XLA where they run at the MXU floor.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INV_SQRT2 = 0.7071067811865476
_INV_SQRT2PI = 0.3989422804014327
# unroll factor: output tiles per kernel body (ILP between MXU and VPU)
_TILES = 2


def _erf(x):
    """fp32 erf via the Abramowitz–Stegun 7.1.26 rational approximation
    (|eps| <= 1.5e-7 absolute — two fp32 ulps at erf's range, far inside
    the 2e-4 oracle tolerance). Mosaic does not lower lax.erf, and this
    formulation is mul/exp only, which the VPU overlaps with MXU work."""
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    )
    p = 0.3275911
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    y = 1.0 - poly * jnp.exp(-ax * ax)
    return jnp.sign(x) * y


def _gelu(z):
    return 0.5 * z * (1.0 + _erf(z * _INV_SQRT2))


# bf16-output gelu via erfc: erfc(x) ~= exp2(-g(|x|)) with g a degree-6
# poly (dual-constraint lsq: abs erf err 7.4e-7 AND rel erfc err 2.5e-4 on
# [0, 3.9], clamped beyond). The erfc FORM matters: gelu's negative tail is
# 0.5*z*erfc(|z|/sqrt2), and computing it as exp2(-g) directly keeps the
# tail relatively accurate where 1+erf(z) would cancel catastrophically.
# Division-free and exp2-native: ~half the VPU ops of the A&S 7.1.26 form
# (which needs a reciprocal AND an exp). Only for bf16 kernel outputs;
# fp32 outputs keep the 1.5e-7-exact _erf. Differences vs exact are 1-ulp
# bf16 rounding-boundary flips (fp32 op-reordering noise level).
_ERF_G = (1.6279511504838011, 0.9179117972647749, 0.15048427545502158,
          -0.03191463214715457, 0.004236621237891429, -0.00025575246004894803)


def _gelu_fast(z):
    ax = jnp.minimum(jnp.abs(z) * _INV_SQRT2, 3.9)
    c1, c2, c3, c4, c5, c6 = _ERF_G
    g = ax * (c1 + ax * (c2 + ax * (c3 + ax * (c4 + ax * (c5 + ax * c6)))))
    e = jnp.exp2(-g)  # erfc(|z|/sqrt2)
    return 0.5 * z * jnp.where(z >= 0, 2.0 - e, e)


def _dgelu(z):
    """gelu'(z) = Phi(z) + z * phi(z), fp32."""
    phi = jnp.exp(-0.5 * z * z) * _INV_SQRT2PI
    cdf = 0.5 * (1.0 + _erf(z * _INV_SQRT2))
    return cdf + z * phi


def _bias(b_ref, sl, rows):
    """[rows, tf] fp32 bias tile. 1-D lane-vector broadcast_in_dim from a
    2-D bias block is the form Mosaic lowers (2-D [1, tf] value broadcasts
    and 3-D-block variants crash the compiler)."""
    bv = b_ref[0, sl].astype(jnp.float32)
    return jax.lax.broadcast_in_dim(bv, (rows, bv.shape[0]), (1,))


def _fwd_kernel(x_ref, w_ref, b_ref, o_ref, *, tiles, tf):
    x = x_ref[...]
    for t in range(tiles):
        sl = slice(t * tf, (t + 1) * tf)
        z = jax.lax.dot_general(
            x, w_ref[...][:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + _bias(b_ref, sl, x.shape[0])
        # round-trip z through the compute dtype to match the unfused
        # path's pre-gelu cast. bf16 outputs use the exp2-erfc gelu
        # (bf16-level-exact up to 1-ulp rounding-boundary flips,
        # test_bf16_fast_gelu_is_bf16_exact; measured as part of the
        # 2.81->2.07 ms/layer full-w win) — unlike the unfused path's
        # JEPA_FAST_GELU opt-in, which is still pending its own step-level
        # A/B because XLA's fc1 fusion has different scheduling.
        z = z.astype(o_ref.dtype).astype(jnp.float32)
        act = _gelu_fast if o_ref.dtype == jnp.bfloat16 else _gelu
        o_ref[:, sl] = act(z).astype(o_ref.dtype)


def _fwd_kernel_z(x_ref, w_ref, b_ref, o_ref, z_ref, *, tiles, tf):
    """Forward that ALSO emits the (compute-dtype-rounded) pre-activation z
    for the backward — used only on differentiated call sites, so pure
    inference/target forwards never pay the extra HBM write."""
    x = x_ref[...]
    for t in range(tiles):
        sl = slice(t * tf, (t + 1) * tf)
        z = jax.lax.dot_general(
            x, w_ref[...][:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + _bias(b_ref, sl, x.shape[0])
        zc = z.astype(z_ref.dtype)
        z_ref[:, sl] = zc
        o_ref[:, sl] = _gelu(zc.astype(jnp.float32)).astype(o_ref.dtype)


# full-w mode: with w resident in VMEM the weight streams from HBM ONCE
# per call instead of once per m-block (the blocked grid re-fetched the
# 2MB encoder w block 74x = 592MB/call ~ 0.7 ms of pure DMA, measured the
# whole gap between the fused kernel and the bare-matmul floor)
_FULL_W_BYTES = 9 * 2**20


def _pick_blocks(m: int, k: int, f: int):
    """(bm, bf) output blocking; bf covers _TILES sub-tiles. VMEM: x block
    [bm, k] + w block [k, bf] + out [bm, bf] + fp32 z tile [bm, bf/_TILES]."""
    bf = min(f, 512 * _TILES)
    while f % bf:
        bf //= 2
    m128 = ((m + 127) // 128) * 128
    bm = 512
    while m128 % bm:
        bm //= 2
    return bm, bf


def _pick_fullw_tiles(f: int):
    """Sub-tile count for the full-w kernel: must DIVIDE f with 128-aligned
    tiles (a non-covering loop would leave output columns unwritten, and
    off-lane slices are outside the validated Mosaic envelope). Prefers
    ~512-wide fp32 z tiles; returns 0 when no legal tiling exists (caller
    falls back to the blocked grid, which guarantees divisibility)."""
    if f % 128:
        return 0
    want = max(_TILES, f // 512)
    for t in range(want, f // 128 + 1):
        if f % t == 0 and (f // t) % 128 == 0:
            return t
    return _TILES if f % _TILES == 0 and (f // _TILES) % 128 == 0 else 0


def _pick_bm_fullw(m: int, k: int, f: int, itemsize: int, n_out: int):
    """Largest bm whose x + n_out output tiles + fp32 z tile fit beside
    the resident w (Mosaic scoped-vmem limit is 16MB)."""
    m128 = ((m + 127) // 128) * 128
    budget = 14 * 2**20 - k * f * itemsize
    bm = 512
    while bm > 128 and (
        m128 % bm or bm * (k + n_out * f) * itemsize + bm * 512 * 4 > budget
    ):
        bm //= 2
    return bm


def _call(kernel, x, w, b, with_z, interpret):
    m, k = x.shape
    k2, f = w.shape
    assert k == k2
    b2 = b.reshape(1, f)
    oshape = jax.ShapeDtypeStruct((m, f), x.dtype)
    # full-w is fwd-only: the two-output (o, z) variant crashes Mosaic in
    # this configuration (HTTP-500, v5e), and differentiated call sites are
    # not the production path (BlockCfg.fused_mlp is grad-free only)
    tiles = _pick_fullw_tiles(f)
    if not with_z and tiles and k * f * x.dtype.itemsize <= _FULL_W_BYTES:
        bm = _pick_bm_fullw(m, k, f, x.dtype.itemsize, 2 if with_z else 1)
        grid = (pl.cdiv(m, bm),)
        in_specs = [
            pl.BlockSpec((bm, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]
        ospec = pl.BlockSpec((bm, f), lambda i: (i, 0), memory_space=pltpu.VMEM)
        return pl.pallas_call(
            functools.partial(kernel, tiles=tiles, tf=f // tiles),
            grid=grid,
            in_specs=in_specs,
            out_specs=[ospec, ospec] if with_z else ospec,
            out_shape=[oshape, oshape] if with_z else oshape,
            interpret=interpret,
        )(x, w, b2)
    bm, bf = _pick_blocks(m, k, f)
    tf = bf // _TILES
    grid = (pl.cdiv(m, bm), f // bf)
    in_specs = [
        pl.BlockSpec((bm, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((k, bf), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bf), lambda i, j: (0, j), memory_space=pltpu.VMEM),
    ]
    ospec = pl.BlockSpec((bm, bf), lambda i, j: (i, j), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(kernel, tiles=_TILES, tf=tf),
        grid=grid,
        in_specs=in_specs,
        out_specs=[ospec, ospec] if with_z else ospec,
        out_shape=[oshape, oshape] if with_z else oshape,
        interpret=interpret,
    )(x, w, b2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _linear_gelu(interpret, x, w, b):
    return _call(_fwd_kernel, x, w, b, False, interpret)


def _linear_gelu_fwd(interpret, x, w, b):
    y, z = _call(_fwd_kernel_z, x, w, b, True, interpret)
    return y, (z, x, w)


def _linear_gelu_bwd(interpret, res, dy):
    """z rides out of the forward kernel, so the backward is pure XLA: one
    elementwise dgelu pass + the two grad matmuls — exactly the op count of
    native autodiff (the earlier recompute-z-in-kernel design added a whole
    matmul per backward layer and regressed the fused step by 36 ms)."""
    z, x, w = res
    zf = z.astype(jnp.float32)
    # lax.erf here (not the kernel polynomial): this path is plain XLA, so
    # use the same erf native autodiff would
    phi = jnp.exp(-0.5 * zf * zf) * _INV_SQRT2PI
    cdf = 0.5 * (1.0 + jax.lax.erf(zf * _INV_SQRT2))
    g = (dy.astype(jnp.float32) * (cdf + zf * phi)).astype(x.dtype)
    dx = jax.lax.dot_general(
        g, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(x.dtype)
    dw = jax.lax.dot_general(
        x, g, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(w.dtype)
    db = jnp.sum(g.astype(jnp.float32), axis=0)
    return dx, dw, db


_linear_gelu.defvjp(_linear_gelu_fwd, _linear_gelu_bwd)


def linear_gelu(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """gelu(x @ w + b) with exact-erf GELU fused into the matmul epilogue.

    x: [..., K] (compute dtype, bf16 in production); w: [K, F]; b: [F].
    Returns [..., F] in x's dtype. Falls back to plain XLA for shapes the
    blocking does not cover (tiny K/F).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    lead = x.shape[:-1]
    k = x.shape[-1]
    f = w.shape[1]
    m = 1
    for s in lead:
        m *= s
    if k % 128 or f % (128 * _TILES) or m < 8:
        h = jnp.dot(x, w, preferred_element_type=jnp.float32) + b.astype(jnp.float32)
        return jax.nn.gelu(h, approximate=False).astype(x.dtype)
    x2 = x.reshape(m, k)
    out = _linear_gelu(bool(interpret), x2, w, b)
    return out.reshape(*lead, f)


def resolve_fused_mlp() -> bool:
    """Fused-fc1 eligibility: TPU backends only. Deliberately independent of
    the attention dispatch heuristic — linear_gelu tiles over B*N rows, so
    there is no sequence-length requirement, and interpret-mode Pallas on
    CPU is orders of magnitude slower than XLA's fc1 fusion."""
    from jepa_tpu.ops.attention import _on_tpu

    return _on_tpu()
