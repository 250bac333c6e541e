"""High-level inference API: load a pretrained V-JEPA encoder and extract
features — the production serving surface (the reference exposes only
training/eval scripts; feature extraction there means writing a loop over
the internals).

    from jepa_tpu.api import load_encoder

    enc = load_encoder("out/ported-latest", model_name="vit_large",
                       num_frames=16, uniform_power=True)
    feats = enc.encode(clips)        # [B, T, H, W, C] uint8 or float
    # feats: [B, N_tokens, D] float32

Accepts either a jepa_tpu orbax checkpoint (pretraining output or the
port_cli conversion) or a reference ``.pth.tar`` zoo file (imports torch
at call time). The forward is jitted once per input shape and runs the
grad-free fast path (Pallas flash attention + fused GELU kernel on TPU).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from jepa_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD
from jepa_tpu.models.factory import vit_cfg
from jepa_tpu.models.vit import ViTCfg, init_vit, vit_forward


@dataclasses.dataclass
class Encoder:
    """A loaded, frozen encoder. ``encode`` is cached-jitted per shape."""

    params: dict
    consts: dict
    cfg: ViTCfg

    def __post_init__(self):
        cfg = dataclasses.replace(self.cfg, fused_mlp=True)  # grad-free

        @functools.partial(jax.jit, static_argnames=("normalize",))
        def _encode(params, consts, x, normalize):
            if normalize:
                mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
                std = jnp.asarray(IMAGENET_STD, jnp.float32)
                x = (x.astype(jnp.float32) / 255.0 - mean) / std
            x = x.astype(cfg.compute_dtype)
            return vit_forward(params, consts, x, cfg).astype(jnp.float32)

        self._encode = _encode

    def encode(self, clips, normalize: Optional[bool] = None) -> jax.Array:
        """clips: video [B, T, H, W, C] or image [B, H, W, C]; uint8 inputs
        are scaled and ImageNet-normalized (``normalize`` overrides the
        dtype-based default). Returns token features [B, N, D] fp32."""
        clips = jnp.asarray(clips)
        if normalize is None:
            normalize = clips.dtype == jnp.uint8
        return self._encode(self.params, self.consts, clips, bool(normalize))

    @property
    def embed_dim(self) -> int:
        return self.cfg.embed_dim


def load_encoder(
    checkpoint: str,
    model_name: str,
    img_size: int = 224,
    patch_size: Optional[int] = None,
    num_frames: int = 1,
    tubelet_size: int = 2,
    uniform_power: bool = False,
    checkpoint_key: str = "target_encoder",
    compute_dtype=jnp.bfloat16,
    tolerant: bool = False,
) -> Encoder:
    """Load a frozen encoder from a jepa_tpu orbax checkpoint (pretraining
    output / port_cli conversion) or a reference ``.pth.tar`` zoo file.

    ``checkpoint_key`` must be 'target_encoder' or 'encoder' (the two keys
    the reference zoo scheme defines, eval.py:420-427). Porting is STRICT
    by default: a key/shape mismatch raises rather than silently serving a
    partially-random encoder; pass ``tolerant=True`` to opt into the
    reference's tolerant merge (mismatched leaves keep their init).
    """
    if checkpoint_key not in ("target_encoder", "encoder"):
        raise ValueError(
            f"checkpoint_key must be 'target_encoder' or 'encoder', "
            f"got {checkpoint_key!r}"
        )
    kwargs = dict(img_size=img_size, num_frames=num_frames,
                  tubelet_size=tubelet_size, uniform_power=uniform_power,
                  compute_dtype=compute_dtype)
    if patch_size is not None:
        kwargs["patch_size"] = patch_size
    cfg = vit_cfg(model_name, **kwargs)
    if checkpoint.endswith((".pth.tar", ".pth", ".pt")):
        from jepa_tpu.utils.checkpoint_port import load_pretrained_encoder

        params, consts = load_pretrained_encoder(
            checkpoint, cfg, checkpoint_key, tolerant=tolerant
        )
    else:
        from jepa_tpu.utils import checkpoint as ckpt_lib

        params, consts = init_vit(jax.random.PRNGKey(0), cfg)
        if checkpoint_key == "target_encoder":
            params = ckpt_lib.load_subtree(checkpoint, {"target": params})["target"]
        else:
            params = ckpt_lib.load_subtree(
                checkpoint, {"params": {"encoder": params}}
            )["params"]["encoder"]
    params = jax.tree.map(np.asarray, params)
    return Encoder(params=params, consts=consts, cfg=cfg)


@dataclasses.dataclass
class VideoClassifier:
    """A frozen encoder + trained attentive probe, one jitted program.

    ``classify`` returns fp32 softmax probabilities [B, num_classes]. For
    the eval protocol's multi-view accuracy, call it per view and average
    the probabilities (what the frozen evals do over S*V views)."""

    encoder: Encoder
    clf_params: dict
    acfg: "AttentiveCfg"

    def __post_init__(self):
        from jepa_tpu.models.attentive import classifier_forward

        enc, acfg = self.encoder, self.acfg

        @functools.partial(jax.jit, static_argnames=("normalize",))
        def _classify(enc_params, enc_consts, clf, x, normalize):
            feats = enc._encode(enc_params, enc_consts, x, normalize)
            logits = classifier_forward(clf, feats, acfg)  # fp32 feats, as the evals feed it
            return jax.nn.softmax(logits, axis=-1)

        self._classify = _classify

    def classify(self, clips, normalize: Optional[bool] = None) -> jax.Array:
        clips = jnp.asarray(clips)
        if normalize is None:
            normalize = clips.dtype == jnp.uint8
        return self._classify(
            self.encoder.params, self.encoder.consts, self.clf_params,
            clips, bool(normalize),
        )

    @property
    def num_classes(self) -> int:
        return self.acfg.num_classes


def load_classifier(
    checkpoint: str,
    encoder: Encoder,
    num_classes: int,
    depth: int = 1,
    checkpoint_key: str = "classifier",
) -> VideoClassifier:
    """Load a trained attentive probe on top of a loaded encoder.

    Accepts a jepa_tpu eval probe checkpoint (orbax dir; the frozen evals
    save {'classifier': ...} per epoch) or a reference ``.pth.tar``
    classifier file (ported strictly — a shape mismatch raises). ``depth``
    must match the probe's training config (the evals use 1)."""
    from jepa_tpu.models.attentive import AttentiveCfg, init_attentive_classifier

    acfg = AttentiveCfg(
        embed_dim=encoder.cfg.embed_dim,
        num_heads=encoder.cfg.num_heads,
        depth=depth,
        num_classes=num_classes,
        compute_dtype=encoder.cfg.compute_dtype,
    )
    template = init_attentive_classifier(jax.random.PRNGKey(0), acfg)
    if checkpoint.endswith((".pth.tar", ".pth", ".pt")):
        import torch

        from jepa_tpu.utils.checkpoint_port import port_attentive_classifier

        ckpt = torch.load(checkpoint, map_location="cpu", weights_only=False)
        sd = ckpt[checkpoint_key] if checkpoint_key in ckpt else ckpt
        clf = port_attentive_classifier(sd, acfg)
        bad = [
            f"{'/'.join(map(str, kp))}: ckpt{tuple(got.shape)} != model{tuple(want.shape)}"
            for (kp, got), want in zip(
                jax.tree_util.tree_leaves_with_path(clf), jax.tree.leaves(template)
            )
            if tuple(got.shape) != tuple(want.shape)
        ]
        if bad:
            raise ValueError("classifier port: shape mismatches:\n  " + "\n  ".join(bad))
    else:
        from jepa_tpu.utils import checkpoint as ckpt_lib

        clf = ckpt_lib.load_subtree(checkpoint, {"classifier": template})["classifier"]
    clf = jax.tree.map(np.asarray, clf)
    return VideoClassifier(encoder=encoder, clf_params=clf, acfg=acfg)
