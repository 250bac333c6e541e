"""V-JEPA predictor: narrow ViT that predicts target latents at masked
positions from context tokens.

Parity surface (reference src/models/predictor.py):
  * linear embed encoder-dim -> predictor-dim
  * per-mask-config learnable mask tokens (or forward-diffusion-noised
    target features when mask tokens are disabled, reference :154-172)
  * frozen sin-cos pos-embed gathered at context/target indices
  * `depth` pre-LN blocks over [context || target] tokens
  * final LN + projection back to encoder dim, returning target positions

TPU-native shape discipline: one call handles ONE (mask_enc, mask_pred)
pair with static K_ctxt/K_tgt; the multimask loop composes calls (the
reference's PredictorMultiMaskWrapper zip, src/models/utils/multimask.py:46-48).
The [ctxt || tgt] concatenation keeps a static total length so the whole
thing jits into a single fused program.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from jepa_tpu.models.initializers import linear_init, layernorm_init, trunc_normal
from jepa_tpu.models.pos_embed import get_2d_sincos_pos_embed, get_3d_sincos_pos_embed
from jepa_tpu.models.transformer import (
    BlockCfg,
    init_block_stack,
    layer_norm,
    linear,
    run_blocks,
)
from jepa_tpu.ops.masking import gather_tokens


@dataclasses.dataclass(frozen=True)
class PredictorCfg:
    img_size: int = 224
    patch_size: int = 16
    num_frames: int = 16
    tubelet_size: int = 2
    embed_dim: int = 768          # encoder dim (input/output)
    predictor_embed_dim: int = 384
    depth: int = 6
    num_heads: int = 12           # matches the encoder's head count
    mlp_ratio: float = 4.0
    ln_eps: float = 1e-6
    init_std: float = 0.02
    uniform_power: bool = False
    use_mask_tokens: bool = True
    num_mask_tokens: int = 2
    zero_init_mask_tokens: bool = True
    compute_dtype: jnp.dtype = jnp.bfloat16
    attn_impl: str = "auto"
    remat: bool = False
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

    def block_cfg(self) -> BlockCfg:
        return BlockCfg(
            dim=self.predictor_embed_dim,
            num_heads=self.num_heads,
            mlp_hidden=int(self.predictor_embed_dim * self.mlp_ratio),
            ln_eps=self.ln_eps,
            compute_dtype=self.compute_dtype,
            attn_impl=self.attn_impl,
        )


def init_predictor(key, cfg: PredictorCfg, dtype=jnp.float32):
    """Returns (params, consts)."""
    k_embed, k_blocks, k_proj, k_mt = jax.random.split(key, 4)
    dp = cfg.predictor_embed_dim
    params = {
        "predictor_embed": linear_init(k_embed, cfg.embed_dim, dp, std=cfg.init_std, dtype=dtype),
        "blocks": init_block_stack(k_blocks, cfg.depth, cfg.block_cfg(), init_std=cfg.init_std, dtype=dtype),
        "norm": layernorm_init(dp, dtype),
        "predictor_proj": linear_init(k_proj, dp, cfg.embed_dim, std=cfg.init_std, dtype=dtype),
    }
    if cfg.use_mask_tokens:
        if cfg.zero_init_mask_tokens:
            mt = jnp.zeros((cfg.num_mask_tokens, dp), dtype)
        else:
            mt = trunc_normal(k_mt, (cfg.num_mask_tokens, dp), std=cfg.init_std, dtype=dtype)
        params["mask_tokens"] = mt

    if cfg.is_video:
        pe = get_3d_sincos_pos_embed(dp, cfg.grid_size, cfg.grid_depth, uniform_power=cfg.uniform_power)
    else:
        pe = get_2d_sincos_pos_embed(dp, cfg.grid_size)
    consts = {"pos_embed": jnp.asarray(pe.astype(np.float32))}
    return params, consts


def _diffusion_noise(key, x, noise_beta=(0.5, 1.0), steps=1000):
    """Forward-diffusion target noising (reference predictor.py:154-172).

    LN-normalize features, then alpha-mix with gaussian noise where alpha is
    the cumulative product of (1 - beta_i) up to a per-sample random step.
    """
    b1, b2 = noise_beta
    betas = b1 + jnp.arange(steps, dtype=jnp.float32) * (b2 - b1) / steps
    alphas = jnp.cumprod(1.0 - betas)
    k_t, k_n = jax.random.split(key)
    t = jax.random.randint(k_t, (x.shape[0],), 0, steps)
    alpha = alphas[t][:, None, None]
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + 1e-5)
    noised = jnp.sqrt(alpha) * xf + jnp.sqrt(1.0 - alpha) * jax.random.normal(
        k_n, x.shape, dtype=jnp.float32
    )
    return noised.astype(x.dtype)


def predictor_forward(
    params,
    consts,
    ctxt: jnp.ndarray,
    tgt: Optional[jnp.ndarray],
    masks_ctxt: jnp.ndarray,
    masks_tgt: jnp.ndarray,
    cfg: PredictorCfg,
    mask_index: int = 0,
    kv_mask_ctxt: Optional[jnp.ndarray] = None,
    kv_mask_tgt: Optional[jnp.ndarray] = None,
    rng: Optional[jax.Array] = None,
):
    """Predict target latents.

    ctxt: [B, K_c, D_enc] encoder outputs at context positions.
    tgt:  [B, K_t, D_enc] target features (only used in diffusion mode).
    masks_ctxt / masks_tgt: [B, K_c] / [B, K_t] token indices into the
    full grid. Returns [B, K_t, D_enc] float32.
    """
    dtype = cfg.compute_dtype
    pe = consts["pos_embed"][None].astype(jnp.float32)  # [1, N, Dp]
    b = ctxt.shape[0]
    pe_b = jnp.broadcast_to(pe, (b,) + pe.shape[1:])

    x = linear(ctxt, params["predictor_embed"], dtype)
    x = (x.astype(jnp.float32) + gather_tokens(pe_b, masks_ctxt)).astype(dtype)
    n_ctxt = x.shape[1]

    if cfg.use_mask_tokens:
        mt = params["mask_tokens"][mask_index % cfg.num_mask_tokens]
        pred = jnp.broadcast_to(
            mt[None, None].astype(jnp.float32),
            (b, masks_tgt.shape[1], mt.shape[-1]),
        )
    else:
        assert tgt is not None and rng is not None, "diffusion mode needs targets + rng"
        pred = linear(tgt, params["predictor_embed"], dtype)
        pred = _diffusion_noise(rng, pred).astype(jnp.float32)
    pred = (pred + gather_tokens(pe_b, masks_tgt)).astype(dtype)

    seq = jnp.concatenate([x, pred], axis=1)

    kv_mask = None
    if kv_mask_ctxt is not None or kv_mask_tgt is not None:
        ones = lambda k: jnp.ones((b, k), dtype=bool)
        kv_mask = jnp.concatenate(
            [
                kv_mask_ctxt if kv_mask_ctxt is not None else ones(n_ctxt),
                kv_mask_tgt if kv_mask_tgt is not None else ones(masks_tgt.shape[1]),
            ],
            axis=1,
        )

    out, _ = run_blocks(seq, params["blocks"], cfg.block_cfg(), kv_mask=kv_mask,
                        remat=cfg.remat, unroll=cfg.scan_unroll)
    out = layer_norm(out, params["norm"]["scale"], params["norm"]["bias"], cfg.ln_eps)
    out = out[:, n_ctxt:]
    out = linear(out, params["predictor_proj"], dtype)
    return out.astype(jnp.float32)


def predictor_multimask_forward(
    params, consts, ctxts, tgts, masks_ctxt, masks_tgt, cfg: PredictorCfg, **kw
):
    """Zip over mask configs with mask_index=i (reference multimask.py:46-48)."""
    outs = []
    for i, (z, h, mc, mt) in enumerate(zip(ctxts, tgts, masks_ctxt, masks_tgt)):
        outs.append(
            predictor_forward(
                params, consts, z, h, mc, mt, cfg, mask_index=i, **kw
            )
        )
    return outs
