"""Model factories mirroring the reference's size ladder.

Name -> (embed_dim, depth, num_heads, mlp_ratio), reference:
src/models/vision_transformer.py:249-307. (The reference's vit_gigantic has
a typo'd `mpl_ratio` kwarg that is silently swallowed, leaving mlp_ratio at
the 4.0 default — so every REAL gigantic checkpoint has 4.0 MLPs.
`vit_gigantic` matches that effective 4.0 so zoo porting round-trips;
`vit_gigantic_intended` carries the intended 64/13 as an opt-in.)
"""

from __future__ import annotations

import jax.numpy as jnp

from jepa_tpu.models.predictor import PredictorCfg
from jepa_tpu.models.vit import ViTCfg

VIT_EMBED_DIMS = {
    "vit_tiny": 192,
    "vit_small": 384,
    "vit_base": 768,
    "vit_large": 1024,
    "vit_huge": 1280,
    "vit_giant": 1408,
    "vit_gigantic": 1664,
    "vit_gigantic_intended": 1664,
}

_SPECS = {
    # name: (embed_dim, depth, num_heads, mlp_ratio, default_patch)
    "vit_tiny": (192, 12, 3, 4.0, 16),
    "vit_small": (384, 12, 6, 4.0, 16),
    "vit_base": (768, 12, 12, 4.0, 16),
    "vit_large": (1024, 24, 16, 4.0, 16),
    "vit_huge": (1280, 32, 16, 4.0, 16),
    "vit_giant": (1408, 40, 16, 48 / 11, 16),
    "vit_gigantic": (1664, 48, 16, 4.0, 14),  # reference mpl_ratio typo quirk
    "vit_gigantic_intended": (1664, 48, 16, 64 / 13, 14),
}


def vit_cfg(
    model_name: str,
    *,
    img_size: int = 224,
    patch_size: int = None,
    num_frames: int = 1,
    tubelet_size: int = 2,
    uniform_power: bool = False,
    compute_dtype=jnp.bfloat16,
    attn_impl: str = "auto",
    remat: bool = False,
    fused_mlp: bool = False,
    scan_unroll: int = 1,
) -> ViTCfg:
    if model_name not in _SPECS:
        raise ValueError(f"unknown model {model_name!r}; options: {sorted(_SPECS)}")
    dim, depth, heads, ratio, default_patch = _SPECS[model_name]
    return ViTCfg(
        img_size=img_size,
        patch_size=patch_size or default_patch,
        num_frames=num_frames,
        tubelet_size=tubelet_size,
        embed_dim=dim,
        depth=depth,
        num_heads=heads,
        mlp_ratio=ratio,
        uniform_power=uniform_power,
        compute_dtype=compute_dtype,
        attn_impl=attn_impl,
        remat=remat,
        fused_mlp=fused_mlp,
        scan_unroll=scan_unroll,
    )


def predictor_cfg_for(
    enc: ViTCfg,
    *,
    predictor_embed_dim: int = 384,
    depth: int = 6,
    use_mask_tokens: bool = True,
    num_mask_tokens: int = 2,
    zero_init_mask_tokens: bool = True,
    remat=None,
    scan_unroll: int = None,
) -> PredictorCfg:
    """Predictor sized from the encoder (reference app/vjepa/utils.py:108-125)."""
    return PredictorCfg(
        img_size=enc.img_size,
        patch_size=enc.patch_size,
        num_frames=enc.num_frames,
        tubelet_size=enc.tubelet_size,
        embed_dim=enc.embed_dim,
        predictor_embed_dim=predictor_embed_dim,
        depth=depth,
        num_heads=enc.num_heads,
        uniform_power=enc.uniform_power,
        use_mask_tokens=use_mask_tokens,
        num_mask_tokens=num_mask_tokens,
        zero_init_mask_tokens=zero_init_mask_tokens,
        compute_dtype=enc.compute_dtype,
        attn_impl=enc.attn_impl,
        remat=enc.remat if remat is None else remat,
        scan_unroll=enc.scan_unroll if scan_unroll is None else scan_unroll,
    )
