"""Non-learnable sin-cos position embeddings (1D / 2D / 3D) and resizing.

Numerics match the reference generator (reference: src/models/utils/pos_embs.py)
so that ported PyTorch checkpoints see identical frozen pos-embed buffers:
  * 1D: for dim D and position p, emb = [sin(p*w_0..w_{D/2-1}), cos(...)]
    with w_j = 1/10000^(j/(D/2)).
  * 3D: per-axis 1D embeddings over a (depth, height, width) token grid,
    concatenated [depth | height | width] and truncated to embed_dim. The
    per-axis widths are (D/2, D/4, D/4) by default or, under
    ``uniform_power``, ceil(D/6)*2 each (then truncated).
  * 2D: [height | width] halves.

Everything here is pure numpy executed once at model build time; the result
is stored as a constant (non-trainable) buffer.
"""

from __future__ import annotations

import math

import numpy as np


def sincos_1d(embed_dim: int, positions: np.ndarray) -> np.ndarray:
    """[M] float positions -> [M, embed_dim] sin-cos embedding."""
    assert embed_dim % 2 == 0, "sin-cos embedding dim must be even"
    omega = np.arange(embed_dim // 2, dtype=np.float64)
    omega /= embed_dim / 2.0
    omega = 1.0 / 10000**omega
    out = np.einsum("m,d->md", positions.reshape(-1).astype(np.float64), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def get_1d_sincos_pos_embed(embed_dim: int, grid_size: int) -> np.ndarray:
    """[grid_size, embed_dim]."""
    return sincos_1d(embed_dim, np.arange(grid_size, dtype=np.float64))


def get_2d_sincos_pos_embed(embed_dim: int, grid_size: int) -> np.ndarray:
    """[grid_size**2, embed_dim]; rows indexed as (h, w) row-major."""
    grid_h = np.arange(grid_size, dtype=np.float64)
    grid_w = np.arange(grid_size, dtype=np.float64)
    # Row-major (h, w): h varies slowest.
    ww, hh = np.meshgrid(grid_w, grid_h)
    emb_h = sincos_1d(embed_dim // 2, hh)
    emb_w = sincos_1d(embed_dim // 2, ww)
    return np.concatenate([emb_h, emb_w], axis=1)


def get_3d_sincos_pos_embed(
    embed_dim: int,
    grid_size: int,
    grid_depth: int,
    uniform_power: bool = False,
) -> np.ndarray:
    """[grid_depth*grid_size*grid_size, embed_dim]; rows indexed (d, h, w)."""
    d = np.arange(grid_depth, dtype=np.float64)
    h = np.arange(grid_size, dtype=np.float64)
    w = np.arange(grid_size, dtype=np.float64)
    # Row-major (d, h, w) ordering of the flattened token grid.
    dd, hh, ww = np.meshgrid(d, h, w, indexing="ij")

    if uniform_power:
        dim_each = int(math.ceil(embed_dim / 6) * 2)
        d_dim = h_dim = w_dim = dim_each
    else:
        d_dim = embed_dim // 2
        h_dim = w_dim = embed_dim // 4

    emb_d = sincos_1d(d_dim, dd)
    emb_h = sincos_1d(h_dim, hh)
    emb_w = sincos_1d(w_dim, ww)
    pos = np.concatenate([emb_d, emb_h, emb_w], axis=1)
    return pos[:, :embed_dim]


def resize_pos_embed_3d(pos, src_grid, dst_grid):
    """Trilinearly resize a 3D-grid pos-embed table for off-size inputs.

    Matches the reference's scale-factor trilinear interpolation
    (reference: src/models/vision_transformer.py:197-246) but runs in JAX so
    it can live inside jit. ``pos`` is [N_src, D]; grids are (t, h, w).

    Uses jax.image.resize (trilinear == 'linear' method over 3 axes).
    """
    import jax.image
    import jax.numpy as jnp

    t0, h0, w0 = src_grid
    t1, h1, w1 = dst_grid
    if (t0, h0, w0) == (t1, h1, w1):
        return pos
    dim = pos.shape[-1]
    grid = pos.reshape(t0, h0, w0, dim)
    out = jax.image.resize(grid, (t1, h1, w1, dim), method="trilinear")
    return out.reshape(t1 * h1 * w1, dim).astype(jnp.asarray(pos).dtype)


def resize_pos_embed_2d(pos, src_grid, dst_grid):
    """Bicubic resize of a 2D-grid pos-embed table. pos: [N_src, D]."""
    import jax.image
    import jax.numpy as jnp

    h0, w0 = src_grid
    h1, w1 = dst_grid
    if (h0, w0) == (h1, w1):
        return pos
    dim = pos.shape[-1]
    grid = pos.reshape(h0, w0, dim)
    out = jax.image.resize(grid, (h1, w1, dim), method="cubic")
    return out.reshape(h1 * w1, dim).astype(jnp.asarray(pos).dtype)
