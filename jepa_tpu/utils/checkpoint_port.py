"""PyTorch .pth.tar checkpoint porter (model-zoo interop).

Maps reference state_dicts onto jepa_tpu pytrees, honoring the reference's
loading rules (reference: evals/video_classification_frozen/eval.py:414-439):
prefer the ``target_encoder`` key with ``encoder`` fallback, strip
``module.`` / ``backbone.`` prefixes, tolerate missing/mismatched keys with
a warning rather than failing.

Layout transforms:
  * torch Linear weight [out, in] -> [in, out]
  * torch Conv3d patch kernel [D, C, t, p, p] -> flatten to [C*t*p*p, D]
    (matches jepa_tpu.models.vit.patchify_video element order (C, t, ph, pw))
  * per-layer block weights -> stacked leaves with leading [depth] axis
  * mask_tokens.{k} [1, 1, Dp] -> [K, Dp]
"""

from __future__ import annotations

import logging
from typing import Dict, Optional, Tuple

import jax
import numpy as np

from jepa_tpu.models.predictor import PredictorCfg
from jepa_tpu.models.vit import ViTCfg

logger = logging.getLogger(__name__)


def strip_prefixes(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in sd.items():
        k = k.removeprefix("module.").removeprefix("backbone.")
        out[k] = v
    return out


def _np(sd, key):
    v = sd[key]
    if hasattr(v, "detach"):
        v = v.detach().cpu().float().numpy()
    return np.asarray(v, dtype=np.float32)


def _linear(sd, prefix):
    return {"w": _np(sd, f"{prefix}.weight").T, "b": _np(sd, f"{prefix}.bias")}


def _ln(sd, prefix):
    return {"scale": _np(sd, f"{prefix}.weight"), "bias": _np(sd, f"{prefix}.bias")}


def _block_stack(sd, depth: int, prefix: str):
    """Per-layer reference blocks -> stacked pytree."""
    layers = []
    for i in range(depth):
        p = f"{prefix}.{i}"
        layers.append(
            {
                "ln1": _ln(sd, f"{p}.norm1"),
                "attn": {
                    "qkv_w": _np(sd, f"{p}.attn.qkv.weight").T,
                    "qkv_b": _np(sd, f"{p}.attn.qkv.bias"),
                    "proj_w": _np(sd, f"{p}.attn.proj.weight").T,
                    "proj_b": _np(sd, f"{p}.attn.proj.bias"),
                },
                "ln2": _ln(sd, f"{p}.norm2"),
                "mlp": {
                    "fc1_w": _np(sd, f"{p}.mlp.fc1.weight").T,
                    "fc1_b": _np(sd, f"{p}.mlp.fc1.bias"),
                    "fc2_w": _np(sd, f"{p}.mlp.fc2.weight").T,
                    "fc2_b": _np(sd, f"{p}.mlp.fc2.bias"),
                },
            }
        )
    import jax.numpy as jnp

    return jax.tree.map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *layers)


def port_encoder(sd: Dict, cfg: ViTCfg) -> Tuple[dict, dict]:
    """Reference VisionTransformer state_dict -> (params, consts)."""
    import jax.numpy as jnp

    sd = strip_prefixes(sd)
    w = _np(sd, "patch_embed.proj.weight")  # video [D,C,t,p,p] / image [D,C,p,p]
    params = {
        "patch_embed": {
            "w": jnp.asarray(w.reshape(w.shape[0], -1).T),
            "b": jnp.asarray(_np(sd, "patch_embed.proj.bias")),
        },
        "blocks": _block_stack(sd, cfg.depth, "blocks"),
        "norm": {k: jnp.asarray(v) for k, v in _ln(sd, "norm").items()},
    }
    consts = {"pos_embed": jnp.asarray(_np(sd, "pos_embed")[0])}
    return params, consts


def port_predictor(sd: Dict, cfg: PredictorCfg) -> Tuple[dict, dict]:
    import jax.numpy as jnp

    sd = strip_prefixes(sd)
    params = {
        "predictor_embed": {k: jnp.asarray(v) for k, v in _linear(sd, "predictor_embed").items()},
        "blocks": _block_stack(sd, cfg.depth, "predictor_blocks"),
        "norm": {k: jnp.asarray(v) for k, v in _ln(sd, "predictor_norm").items()},
        "predictor_proj": {k: jnp.asarray(v) for k, v in _linear(sd, "predictor_proj").items()},
    }
    if cfg.use_mask_tokens:
        mts = []
        for i in range(cfg.num_mask_tokens):
            mts.append(_np(sd, f"mask_tokens.{i}").reshape(-1))
        params["mask_tokens"] = jnp.asarray(np.stack(mts))
    consts = {"pos_embed": jnp.asarray(_np(sd, "predictor_pos_embed")[0])}
    return params, consts


def port_attentive_classifier(sd: Dict, cfg) -> dict:
    """Reference AttentiveClassifier state_dict -> params pytree."""
    import jax.numpy as jnp

    sd = strip_prefixes(sd)
    cross_prefix = "pooler.cross_attention_block"
    cross = {
        "ln1": {k: jnp.asarray(v) for k, v in _ln(sd, f"{cross_prefix}.norm1").items()},
        "q_w": jnp.asarray(_np(sd, f"{cross_prefix}.xattn.q.weight").T),
        "q_b": jnp.asarray(_np(sd, f"{cross_prefix}.xattn.q.bias")),
        "kv_w": jnp.asarray(_np(sd, f"{cross_prefix}.xattn.kv.weight").T),
        "kv_b": jnp.asarray(_np(sd, f"{cross_prefix}.xattn.kv.bias")),
        "proj_w": jnp.asarray(_np(sd, f"{cross_prefix}.xattn.proj.weight").T),
        "proj_b": jnp.asarray(_np(sd, f"{cross_prefix}.xattn.proj.bias")),
        "ln2": {k: jnp.asarray(v) for k, v in _ln(sd, f"{cross_prefix}.norm2").items()},
        "mlp": {
            "fc1_w": jnp.asarray(_np(sd, f"{cross_prefix}.mlp.fc1.weight").T),
            "fc1_b": jnp.asarray(_np(sd, f"{cross_prefix}.mlp.fc1.bias")),
            "fc2_w": jnp.asarray(_np(sd, f"{cross_prefix}.mlp.fc2.weight").T),
            "fc2_b": jnp.asarray(_np(sd, f"{cross_prefix}.mlp.fc2.bias")),
        },
    }
    pooler = {
        "query_tokens": jnp.asarray(_np(sd, "pooler.query_tokens")[0]),
        "cross": cross,
    }
    if cfg.depth > 1:
        pooler["blocks"] = _block_stack(sd, cfg.depth - 1, "pooler.blocks")
    return {
        "pooler": pooler,
        "linear": {k: jnp.asarray(v) for k, v in _linear(sd, "linear").items()},
    }


def export_encoder(params, consts, cfg: ViTCfg) -> Dict[str, "np.ndarray"]:
    """jepa_tpu encoder pytree -> reference-named torch-style state_dict.

    Inverse of `port_encoder`: reference users can consume jepa_tpu
    pretrained weights in the original framework. Returns numpy arrays in
    torch layouts ([out, in] linears, [D, C, t, p, p] conv kernel).
    """
    out: Dict[str, np.ndarray] = {}
    w = np.asarray(params["patch_embed"]["w"], np.float32)  # [patch_dim, D]
    if cfg.is_video:
        kshape = (cfg.embed_dim, cfg.in_chans, cfg.tubelet_size, cfg.patch_size, cfg.patch_size)
    else:
        kshape = (cfg.embed_dim, cfg.in_chans, cfg.patch_size, cfg.patch_size)
    out["patch_embed.proj.weight"] = w.T.reshape(kshape)
    out["patch_embed.proj.bias"] = np.asarray(params["patch_embed"]["b"], np.float32)
    out["pos_embed"] = np.asarray(consts["pos_embed"], np.float32)[None]

    blocks = params["blocks"]
    depth = int(np.asarray(blocks["ln1"]["scale"]).shape[0])
    for i in range(depth):
        p = f"blocks.{i}"
        get = lambda tree: np.asarray(tree, np.float32)[i]
        out[f"{p}.norm1.weight"] = get(blocks["ln1"]["scale"])
        out[f"{p}.norm1.bias"] = get(blocks["ln1"]["bias"])
        out[f"{p}.attn.qkv.weight"] = get(blocks["attn"]["qkv_w"]).T
        out[f"{p}.attn.qkv.bias"] = get(blocks["attn"]["qkv_b"])
        out[f"{p}.attn.proj.weight"] = get(blocks["attn"]["proj_w"]).T
        out[f"{p}.attn.proj.bias"] = get(blocks["attn"]["proj_b"])
        out[f"{p}.norm2.weight"] = get(blocks["ln2"]["scale"])
        out[f"{p}.norm2.bias"] = get(blocks["ln2"]["bias"])
        out[f"{p}.mlp.fc1.weight"] = get(blocks["mlp"]["fc1_w"]).T
        out[f"{p}.mlp.fc1.bias"] = get(blocks["mlp"]["fc1_b"])
        out[f"{p}.mlp.fc2.weight"] = get(blocks["mlp"]["fc2_w"]).T
        out[f"{p}.mlp.fc2.bias"] = get(blocks["mlp"]["fc2_b"])
    out["norm.weight"] = np.asarray(params["norm"]["scale"], np.float32)
    out["norm.bias"] = np.asarray(params["norm"]["bias"], np.float32)
    return out


def save_torch_checkpoint(path: str, *, encoder=None, target_encoder=None,
                          predictor=None, epoch: int = 0, cfg: ViTCfg = None,
                          extra: Optional[Dict] = None):
    """Write a reference-compatible .pth.tar (torch.save dict with
    encoder/target_encoder state_dicts) from jepa_tpu pytrees.

    encoder/target_encoder: (params, consts) tuples.
    """
    import torch

    ckpt: Dict = {"epoch": epoch}
    if encoder is not None:
        ckpt["encoder"] = {
            k: torch.from_numpy(np.ascontiguousarray(v))
            for k, v in export_encoder(*encoder, cfg).items()
        }
    if target_encoder is not None:
        ckpt["target_encoder"] = {
            k: torch.from_numpy(np.ascontiguousarray(v))
            for k, v in export_encoder(*target_encoder, cfg).items()
        }
    if extra:
        ckpt.update(extra)
    torch.save(ckpt, path)


def tolerant_merge(ported, reference_init, label="encoder"):
    """Reference-style tolerant loading (eval.py:428-434): keep the ported
    leaf when shape matches, otherwise log and keep the initialized leaf."""
    import jax

    def merge(path, init_leaf, ported_leaf):
        if ported_leaf is None:
            logger.info("%s: key %s missing in checkpoint; keeping init", label, path)
            return init_leaf
        if tuple(ported_leaf.shape) != tuple(init_leaf.shape):
            logger.info(
                "%s: key %s shape %s != model %s; keeping init",
                label, path, tuple(ported_leaf.shape), tuple(init_leaf.shape),
            )
            return init_leaf
        return ported_leaf

    return jax.tree_util.tree_map_with_path(merge, reference_init, ported)


def load_pretrained_encoder(
    path: str,
    cfg: ViTCfg,
    checkpoint_key: str = "target_encoder",
    tolerant: bool = False,
):
    """Load a reference .pth.tar and port the encoder.

    Follows the reference's key scheme: try ``checkpoint_key``, fall back to
    ``encoder`` (reference eval.py:420-427). With ``tolerant=True``,
    missing/mismatched leaves keep a fresh initialization instead of
    raising (reference eval.py:428-434) — e.g. loading a 224px checkpoint
    into a different-resolution model keeps the interpolatable pos-embed.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if checkpoint_key in ckpt:
        sd = ckpt[checkpoint_key]
    elif "encoder" in ckpt:
        logger.warning("checkpoint key %r missing; falling back to 'encoder'", checkpoint_key)
        sd = ckpt["encoder"]
    else:
        sd = ckpt  # raw state_dict
    import jax

    from jepa_tpu.models.vit import init_vit

    init_params, init_consts = init_vit(jax.random.PRNGKey(0), cfg)
    if not tolerant:
        params, consts = port_encoder(sd, cfg)
        # pos-embed is the one leaf where a shape mismatch is NOT a porting
        # error: loading a 224px zoo checkpoint into another eval resolution
        # is a supported reference workflow, and the reference's tolerant
        # loader resolves it by keeping the freshly-initialized table
        # (eval.py:428-434) — which is EXACT, because the table is a
        # non-learned deterministic sincos function of the model grid
        # (reference vision_transformer.py:79-86, requires_grad=False).
        # We do the same: substitute the model's own sincos table so the
        # in-jit off-size interpolation (models/vit.py resize_pos_embed)
        # sees a table at the cfg grid it expects.
        if tuple(consts["pos_embed"].shape) != tuple(init_consts["pos_embed"].shape):
            logger.info(
                "pos_embed ckpt grid %s != model grid %s; regenerating sincos "
                "at the model grid (non-learned table — exact)",
                tuple(consts["pos_embed"].shape),
                tuple(init_consts["pos_embed"].shape),
            )
            consts = dict(consts)
            consts["pos_embed"] = init_consts["pos_embed"]
        # strict: every other ported leaf must match the model's init shape —
        # a geometry-mismatched zoo file raises here rather than serving a
        # wrong (or partially random) encoder that only fails downstream
        bad = [
            f"{'/'.join(map(str, kp))}: ckpt{tuple(got.shape)} != model{tuple(want.shape)}"
            for tree, init in ((params, init_params), (consts, init_consts))
            for (kp, got), want in zip(
                jax.tree_util.tree_leaves_with_path(tree), jax.tree.leaves(init)
            )
            if tuple(got.shape) != tuple(want.shape)
        ]
        if bad:
            raise ValueError(
                "strict checkpoint port: shape mismatches (pass tolerant=True "
                "to keep init for mismatched leaves):\n  " + "\n  ".join(bad)
            )
        return params, consts
    try:
        params, consts = port_encoder(sd, cfg)
    except KeyError as e:
        logger.warning("tolerant load: porter failed on %s; using init", e)
        return init_params, init_consts
    params = tolerant_merge(params, init_params)
    consts = tolerant_merge(consts, init_consts, label="consts")
    return params, consts
