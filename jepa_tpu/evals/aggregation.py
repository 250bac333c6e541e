"""Clip/frame aggregation for frozen-encoder evals.

The reference batches every (temporal segment x spatial view) clip through
the encoder in ONE forward by concatenating on the batch axis, regroups
into [spatial][temporal], and under ``attend_across_segments`` concatenates
the token sequences of all temporal segments (optionally + a 1D temporal
sin-cos pos-embed indexed by true clip frame indices) so the probe attends
across the whole video (reference: evals/video_classification_frozen/
utils.py:86-159). FrameAggregation is the image-encoder variant
(each frame through a 2D encoder, tokens concatenated over time, :23-83).

TPU-native shape discipline: clips arrive stacked as
[B, S, V, T, H, W, C]; everything is reshapes around ONE encoder call.
"""

from __future__ import annotations

from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from jepa_tpu.models.pos_embed import get_1d_sincos_pos_embed
from jepa_tpu.models.vit import ViTCfg, vit_forward


def temporal_pos_embed_table(embed_dim: int, max_frames: int = 10000, tubelet_size: int = 2):
    """Frozen 1D sin-cos table over temporal token slots."""
    return jnp.asarray(
        get_1d_sincos_pos_embed(embed_dim, max_frames // tubelet_size).astype(np.float32)
    )


def clip_aggregation(
    params,
    consts,
    clips: jnp.ndarray,
    cfg: ViTCfg,
    attend_across_segments: bool = False,
    pos_embed_table: Optional[jnp.ndarray] = None,
    clip_indices: Optional[jnp.ndarray] = None,
) -> List:
    """Encode all views in one forward and regroup.

    clips: [B, S, V, T, H, W, C] (S temporal segments, V spatial views).
    Returns, per reference semantics:
      attend_across_segments=True  -> list over V of [B, S*N, D]
      attend_across_segments=False -> list over V of list over S of [B, N, D]
    clip_indices: [B, S, T] true frame indices (for the optional temporal
    pos-embed; reference strides them by tubelet_size).
    """
    b, s, v, t, h, w, c = clips.shape
    flat = clips.reshape(b * s * v, t, h, w, c)
    tokens = vit_forward(params, consts, flat, cfg)  # [B*S*V, N, D]
    n, d = tokens.shape[1], tokens.shape[2]
    tokens = tokens.reshape(b, s, v, n, d)

    if not attend_across_segments:
        return [[tokens[:, si, vi] for si in range(s)] for vi in range(v)]

    t_tokens = t // cfg.tubelet_size
    n_spatial = n // t_tokens
    outs = []
    for vi in range(v):
        seq = tokens[:, :, vi].reshape(b, s * n, d)
        if pos_embed_table is not None and clip_indices is not None:
            # [B, S, T] -> temporal token slots [B, S*t_tokens]
            slots = clip_indices[:, :, :: cfg.tubelet_size].reshape(b, s * t_tokens)
            pe = jnp.take(pos_embed_table, slots, axis=0)  # [B, S*t, D]
            pe = jnp.repeat(pe, n_spatial, axis=1)  # token-major (t, spatial)
            seq = seq + pe
        outs.append(seq)
    return outs


def frame_aggregation(
    params,
    consts,
    clips: jnp.ndarray,
    cfg: ViTCfg,
    pos_embed_table: Optional[jnp.ndarray] = None,
    clip_indices: Optional[jnp.ndarray] = None,
) -> List:
    """Image-encoder variant: every frame through a 2D ViT, tokens
    concatenated over time. clips: [B, S, V, T, H, W, C] -> list over V of
    [B, S*T*N, D]."""
    b, s, v, t, h, w, c = clips.shape
    frames = clips.transpose(0, 1, 2, 3, 4, 5, 6).reshape(b * s * v * t, h, w, c)
    tokens = vit_forward(params, consts, frames, cfg)  # [B*S*V*T, N, D]
    n, d = tokens.shape[1], tokens.shape[2]
    tokens = tokens.reshape(b, s, v, t, n, d)
    outs = []
    for vi in range(v):
        seq = tokens[:, :, vi].reshape(b, s * t * n, d)
        if pos_embed_table is not None and clip_indices is not None:
            slots = clip_indices.reshape(b, s * t)
            pe = jnp.take(pos_embed_table, slots, axis=0)
            pe = jnp.repeat(pe, n, axis=1)
            seq = seq + pe
        outs.append(seq)
    return outs
