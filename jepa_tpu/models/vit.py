"""Video/image Vision Transformer encoder (V-JEPA backbone), TPU-native.

Capability parity with reference src/models/vision_transformer.py:
  * 3D tubelet tokenizer (video) or 2D patch tokenizer (image)
  * frozen sin-cos pos-embed added pre-masking, with trilinear/bicubic
    interpolation for off-size inputs (reference :197-246)
  * token-drop masking before the blocks (reference :176-180); attention
    over kept tokens is fully bidirectional
  * pre-LN blocks, final LayerNorm, optional per-layer outputs (out_layers)

TPU-first differences (not a port):
  * channels-last input [B, T, H, W, C]; the tubelet "conv" is a reshape +
    one dense matmul on the MXU instead of a strided Conv3d (identical math:
    kernel size == stride means each output token is an independent patch
    projection)
  * blocks are stacked and executed with lax.scan (flat compile time)
  * masking takes a single [B, K] index tensor (static K per mask config);
    an optional kv_mask marks padded tokens for the padded-parity mode
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from jepa_tpu.models.initializers import linear_init, layernorm_init
from jepa_tpu.models.pos_embed import (
    get_2d_sincos_pos_embed,
    get_3d_sincos_pos_embed,
    resize_pos_embed_2d,
    resize_pos_embed_3d,
)
from jepa_tpu.models.transformer import (
    BlockCfg,
    init_block_stack,
    layer_norm,
    run_blocks,
)
from jepa_tpu.ops.masking import gather_tokens


@dataclasses.dataclass(frozen=True)
class ViTCfg:
    img_size: int = 224
    patch_size: int = 16
    num_frames: int = 1
    tubelet_size: int = 2
    in_chans: int = 3
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    ln_eps: float = 1e-6
    init_std: float = 0.02
    uniform_power: bool = False
    compute_dtype: jnp.dtype = jnp.bfloat16
    attn_impl: str = "auto"
    remat: bool = False
    fused_mlp: bool = False  # grad-free forwards only; see BlockCfg.fused_mlp
    scan_unroll: int = 1  # layers per scan iteration (see run_blocks)

    @property
    def is_video(self) -> bool:
        return self.num_frames > 1

    @property
    def grid_size(self) -> int:
        return self.img_size // self.patch_size

    @property
    def grid_depth(self) -> int:
        return self.num_frames // self.tubelet_size if self.is_video else 1

    @property
    def num_patches(self) -> int:
        n = self.grid_size * self.grid_size
        return n * self.grid_depth if self.is_video else n

    @property
    def patch_dim(self) -> int:
        p = self.patch_size * self.patch_size * self.in_chans
        return p * self.tubelet_size if self.is_video else p

    @property
    def mlp_hidden(self) -> int:
        return int(self.embed_dim * self.mlp_ratio)

    def block_cfg(self) -> BlockCfg:
        return BlockCfg(
            dim=self.embed_dim,
            num_heads=self.num_heads,
            mlp_hidden=self.mlp_hidden,
            ln_eps=self.ln_eps,
            compute_dtype=self.compute_dtype,
            attn_impl=self.attn_impl,
            fused_mlp=self.fused_mlp,
        )


def init_vit(key, cfg: ViTCfg, dtype=jnp.float32):
    """Returns (params, consts). consts holds the frozen pos-embed buffer."""
    k_pe, k_blocks = jax.random.split(key)
    params = {
        "patch_embed": linear_init(
            k_pe, cfg.patch_dim, cfg.embed_dim, std=cfg.init_std, dtype=dtype
        ),
        "blocks": init_block_stack(
            k_blocks, cfg.depth, cfg.block_cfg(), init_std=cfg.init_std, dtype=dtype
        ),
        "norm": layernorm_init(cfg.embed_dim, dtype),
    }
    if cfg.is_video:
        pe = get_3d_sincos_pos_embed(
            cfg.embed_dim, cfg.grid_size, cfg.grid_depth, uniform_power=cfg.uniform_power
        )
    else:
        pe = get_2d_sincos_pos_embed(cfg.embed_dim, cfg.grid_size)
    consts = {"pos_embed": jnp.asarray(pe.astype(np.float32))}
    return params, consts


def patchify_video(x: jnp.ndarray, cfg: ViTCfg) -> jnp.ndarray:
    """[B,T,H,W,C] -> [B, N, t*p*p*C] flattened tubelets.

    Patch-vector element order is (C, t, ph, pw) row-major, matching the
    flattening of a torch Conv3d kernel [D, C, t, p, p] so the checkpoint
    porter is a plain reshape+transpose.
    """
    b, t, hpx, wpx, c = x.shape
    tt, p = cfg.tubelet_size, cfg.patch_size
    gt, gh, gw = t // tt, hpx // p, wpx // p
    x = x.reshape(b, gt, tt, gh, p, gw, p, c)
    # -> [B, gt, gh, gw, C, tt, p, p]
    x = x.transpose(0, 1, 3, 5, 7, 2, 4, 6)
    return x.reshape(b, gt * gh * gw, c * tt * p * p)


def patchify_image(x: jnp.ndarray, cfg: ViTCfg) -> jnp.ndarray:
    """[B,H,W,C] -> [B, N, p*p*C], element order (C, ph, pw)."""
    b, hpx, wpx, c = x.shape
    p = cfg.patch_size
    gh, gw = hpx // p, wpx // p
    x = x.reshape(b, gh, p, gw, p, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(b, gh * gw, c * p * p)


def _pos_embed_for_input(consts, cfg: ViTCfg, x_shape) -> jnp.ndarray:
    """Interpolate the pos-embed table when the input grid is off-size."""
    pe = consts["pos_embed"]
    if cfg.is_video:
        _, t, hpx, wpx, _ = x_shape
        dst = (t // cfg.tubelet_size, hpx // cfg.patch_size, wpx // cfg.patch_size)
        src = (cfg.grid_depth, cfg.grid_size, cfg.grid_size)
        return resize_pos_embed_3d(pe, src, dst)
    _, hpx, wpx, _ = x_shape
    dst = (hpx // cfg.patch_size, wpx // cfg.patch_size)
    return resize_pos_embed_2d(pe, (cfg.grid_size, cfg.grid_size), dst)


def vit_forward(
    params,
    consts,
    x: jnp.ndarray,
    cfg: ViTCfg,
    masks: Optional[jnp.ndarray] = None,
    kv_mask: Optional[jnp.ndarray] = None,
    out_layers: Optional[Sequence[int]] = None,
):
    """Encoder forward.

    x: video [B,T,H,W,C] or image [B,H,W,C], already normalized, any float
    dtype. masks: [B, K] int32 keep-indices (token drop), or None for the
    full sequence. kv_mask: [B, K] bool validity for padded masking mode.

    Returns [B, K, D] float32 (or a list of per-layer normed outputs when
    out_layers is given, mirroring the reference API).
    """
    from jepa_tpu.models.transformer import linear as _linear

    tokens = (
        patchify_video(x, cfg) if cfg.is_video else patchify_image(x, cfg)
    )
    tokens = _linear(tokens, params["patch_embed"], cfg.compute_dtype)
    pe = _pos_embed_for_input(consts, cfg, x.shape)
    tokens = (tokens.astype(jnp.float32) + pe[None].astype(jnp.float32)).astype(
        cfg.compute_dtype
    )

    if masks is not None:
        tokens = gather_tokens(tokens, masks)

    collect = out_layers is not None
    final, layers = run_blocks(
        tokens,
        params["blocks"],
        cfg.block_cfg(),
        kv_mask=kv_mask,
        collect_layers=collect,
        remat=cfg.remat,
        unroll=cfg.scan_unroll,
    )
    if collect:
        return [
            layer_norm(layers[i], params["norm"]["scale"], params["norm"]["bias"], cfg.ln_eps).astype(jnp.float32)
            for i in out_layers
        ]
    out = layer_norm(final, params["norm"]["scale"], params["norm"]["bias"], cfg.ln_eps)
    return out.astype(jnp.float32)


def vit_multimask_forward(params, consts, x, cfg: ViTCfg, masks_list, kv_masks=None):
    """Encoder once per mask config (reference MultiMaskWrapper semantics).

    masks_list: list of [B, K_i] index tensors. Returns list of [B, K_i, D].
    """
    if kv_masks is None:
        kv_masks = [None] * len(masks_list)
    return [
        vit_forward(params, consts, x, cfg, masks=m, kv_mask=km)
        for m, km in zip(masks_list, kv_masks)
    ]
