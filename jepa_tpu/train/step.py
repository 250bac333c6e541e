"""The fused V-JEPA train step: ONE jitted program per update.

Everything the reference does across train_step + schedulers + optimizer +
EMA (reference: app/vjepa/train.py:414-498) compiles into a single XLA
program: on-device mask sampling, target forward (stop-gradient), context
forwards, predictor forwards, L1(+reg) loss, backward, per-module grad
clipping, AdamW, and the EMA target update. Schedules are pure functions of
the step counter carried in the state, so resume is O(1) and deterministic.

Masking modes:
  * fixed (default): masks sampled on device each step with static
    (K_enc, K_pred) per mask config — no host->device index traffic, no
    recompilation, no attention masking needed.
  * padded (parity): host collator feeds padded [B, K_cap] indices +
    validity weights through `masks` in the batch dict; attention and the
    loss consume the weights.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from jepa_tpu.masks.multiblock3d import MaskGrid, MaskSpec, sample_masks_for_specs
from jepa_tpu.masks.random_tube import sample_tube_masks
from jepa_tpu.models.predictor import PredictorCfg, init_predictor, predictor_forward
from jepa_tpu.models.vit import ViTCfg, init_vit, vit_forward
from jepa_tpu.ops.masking import repeat_interleave_batch
from jepa_tpu.train.losses import jepa_loss, layer_norm_targets, variance_reg
from jepa_tpu.train.optimizer import (
    adamw_update,
    clip_by_global_norm,
    decay_mask,
    ema_update,
    init_adamw_state,
)
from jepa_tpu.utils.schedulers import CosineWD, LinearMomentum, WarmupCosine


@dataclasses.dataclass(frozen=True)
class TrainCfg:
    loss_exp: float = 1.0
    reg_coeff: float = 0.0
    clip_grad: Optional[float] = 10.0
    # clipping starts after the warmup epochs, like the reference's
    # `epoch > warmup` gate (train.py:468)
    clip_after_step: int = 0
    betas: Tuple[float, float] = (0.9, 0.999)
    eps: float = 1e-8
    num_clips: int = 1
    batch_size: int = 8  # per-step global batch of *samples* (pre num_clips)
    mask_mode: str = "fixed"  # 'fixed' | 'padded' | 'tube'
    seed: int = 234
    # Take grads w.r.t. per-layer block params (unrolled Python-loop
    # forward on the TRAINABLE paths; the grad-free target keeps scan).
    # Kills the scan-transpose grad-stack DUS copies (~30 ms/step at ViT-L,
    # BENCH.md) at the price of a depth-times-larger HLO. The train state
    # stays stacked: slices go in, grads are restacked with one concatenate
    # per leaf. Env override: JEPA_UNROLL_GRADS=1/0.
    unroll_grads: bool = False


def init_train_state(
    rng: jax.Array,
    enc_cfg: ViTCfg,
    pred_cfg: PredictorCfg,
    unroll_blocks: bool = False,
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Build (state, consts). Target encoder starts as a copy of the encoder
    (reference train.py:222 deepcopy).

    unroll_blocks=True keeps the TRAINABLE block structures (params and
    AdamW moments) as per-layer pytrees instead of stacked [depth, ...]
    leaves: forwards run unrolled, each dW is its own buffer (no
    scan-transpose / restack dynamic-update-slice chains), and AdamW runs
    per-layer elementwise. The grad-free TARGET stays STACKED so its
    forward keeps the lax.scan schedule (unrolling it regressed the
    target-path LN reduce fusions ~43 ms/step on v5e — BENCH.md round 4);
    the EMA update restacks the new encoder params once per step. Use
    stack_train_state/unstack_train_state to convert to/from the canonical
    stacked checkpoint layout."""
    k_enc, k_pred = jax.random.split(rng)
    enc_params, enc_consts = init_vit(k_enc, enc_cfg)
    pred_params, pred_consts = init_predictor(k_pred, pred_cfg)
    params = {"encoder": enc_params, "predictor": pred_params}
    if unroll_blocks:
        from jepa_tpu.models.transformer import unstack_blocks

        params = {
            "encoder": {
                **params["encoder"],
                "blocks": unstack_blocks(params["encoder"]["blocks"], enc_cfg.depth),
            },
            "predictor": {
                **params["predictor"],
                "blocks": unstack_blocks(params["predictor"]["blocks"], pred_cfg.depth),
            },
        }
    state = {
        "step": jnp.zeros((), jnp.int32),
        "params": params,
        "target": jax.tree.map(jnp.copy, enc_params),  # always stacked
        "opt": init_adamw_state(params),
    }
    consts = {"encoder": enc_consts, "predictor": pred_consts}
    return state, consts


def _map_block_structs(state, fn):
    """Apply ``fn(blocks, module_name) -> blocks`` to every TRAINABLE block
    container in the train state (params + opt moments; the target is
    always stacked and passes through untouched)."""
    new = {
        "step": state["step"],
        "params": {},
        "target": state["target"],
        "opt": {"mu": {}, "nu": {}},
    }
    for mod in ("encoder", "predictor"):
        new["params"][mod] = {
            **state["params"][mod],
            "blocks": fn(state["params"][mod]["blocks"], mod),
        }
        new["opt"]["mu"][mod] = {
            **state["opt"]["mu"][mod],
            "blocks": fn(state["opt"]["mu"][mod]["blocks"], mod),
        }
        new["opt"]["nu"][mod] = {
            **state["opt"]["nu"][mod],
            "blocks": fn(state["opt"]["nu"][mod]["blocks"], mod),
        }
    return new


def stack_train_state(state):
    """Per-layer train state -> canonical stacked layout (checkpoint
    format). No-op if already stacked."""
    from jepa_tpu.models.transformer import restack_blocks

    if not isinstance(state["params"]["encoder"]["blocks"], (list, tuple)):
        return state
    return _map_block_structs(state, lambda blocks, _: restack_blocks(blocks))


def unstack_train_state(state, enc_depth: int, pred_depth: int):
    """Canonical stacked train state -> per-layer layout. No-op if already
    per-layer."""
    from jepa_tpu.models.transformer import unstack_blocks

    if isinstance(state["params"]["encoder"]["blocks"], (list, tuple)):
        return state
    depths = {"encoder": enc_depth, "predictor": pred_depth}
    return _map_block_structs(
        state, lambda blocks, mod: unstack_blocks(blocks, depths[mod])
    )


def build_train_step(
    enc_cfg: ViTCfg,
    pred_cfg: PredictorCfg,
    consts: Dict[str, Any],
    train_cfg: TrainCfg,
    lr_sched: WarmupCosine,
    wd_sched: CosineWD,
    mom_sched: LinearMomentum,
    mask_specs: Sequence,
    grid: MaskGrid,
    keep_counts: Sequence[Tuple[int, int]],
):
    """Returns step_fn(state, batch) -> (state, metrics).

    batch: {'clips': [B*num_clips, T, H, W, C] float (normalized)} plus, in
    padded mode, 'masks_enc'/'masks_pred' ([B,K] int32 lists) and
    'enc_weights'/'pred_weights' validity floats.
    """
    import os

    enc_consts = consts["encoder"]
    pred_consts = consts["predictor"]
    wd_mask = None  # built lazily from params structure
    env_unroll = os.environ.get("JEPA_UNROLL_GRADS")
    unroll_grads = (
        train_cfg.unroll_grads if env_unroll is None else env_unroll == "1"
    )

    def sample_step_masks(step, batch_size):
        base = jax.random.PRNGKey(train_cfg.seed)
        if train_cfg.mask_mode == "tube":
            rng = jax.random.fold_in(jax.random.fold_in(base, 1), step)
            masks = [
                sample_tube_masks(jax.random.fold_in(rng, i), batch_size, spec, grid)
                for i, spec in enumerate(mask_specs)
            ]
            return [m[0] for m in masks], [m[1] for m in masks]
        return sample_masks_for_specs(
            jax.random.fold_in(base, 1), step, batch_size, mask_specs, grid, keep_counts
        )

    def step_fn(state, batch):
        nonlocal wd_mask
        step = state["step"]
        sched_step = (step + 1).astype(jnp.float32)
        lr = lr_sched(sched_step)
        wd = wd_sched(sched_step)
        momentum = mom_sched(step.astype(jnp.float32))

        clips = batch["clips"]
        total_b = clips.shape[0]
        sample_b = total_b // train_cfg.num_clips

        if train_cfg.mask_mode == "padded":
            masks_enc = batch["masks_enc"]
            masks_pred = batch["masks_pred"]
            enc_w = batch["enc_weights"]
            pred_w = batch["pred_weights"]
        else:
            masks_enc, masks_pred = sample_step_masks(step, sample_b)
            enc_w = [None] * len(masks_enc)
            pred_w = [None] * len(masks_pred)

        if train_cfg.num_clips > 1:
            rep = lambda m: (
                repeat_interleave_batch(m, sample_b, train_cfg.num_clips)
                if m is not None
                else None
            )
            masks_enc = [rep(m) for m in masks_enc]
            masks_pred = [rep(m) for m in masks_pred]
            enc_w = [rep(w) for w in enc_w]
            pred_w = [rep(w) for w in pred_w]

        kv_enc = [None if w is None else w > 0.5 for w in enc_w]
        kv_pred = [None if w is None else w > 0.5 for w in pred_w]

        # ---- target features (no grad): full forward + feature-LN + gather
        # grad-free -> the fused fc1 GELU kernel is a pure win here
        tgt_cfg = dataclasses.replace(enc_cfg, fused_mlp=True)
        h_full = vit_forward(state["target"], enc_consts, clips, tgt_cfg)
        h_full = layer_norm_targets(h_full)
        h_full = jax.lax.stop_gradient(h_full)
        targets = [
            jnp.take_along_axis(h_full, m[:, :, None], axis=1) for m in masks_pred
        ]

        def loss_fn(params):
            preds = []
            for i, (me, mp) in enumerate(zip(masks_enc, masks_pred)):
                z = vit_forward(
                    params["encoder"], enc_consts, clips, enc_cfg,
                    masks=me, kv_mask=kv_enc[i],
                )
                p = predictor_forward(
                    params["predictor"], pred_consts, z, targets[i], me, mp,
                    pred_cfg, mask_index=i,
                    kv_mask_ctxt=kv_enc[i], kv_mask_tgt=kv_pred[i],
                    rng=jax.random.fold_in(jax.random.PRNGKey(train_cfg.seed + 2), step),
                )
                preds.append(p)
            l_jepa = jepa_loss(preds, targets, train_cfg.loss_exp, pred_w)
            # reg_coeff == 0.0 (the shipped configs): the reg grad path is
            # mathematically zero, but leaving it live gives every pred two
            # cotangent consumers across the bwd, which at ViT-L scale costs
            # ~8GB of XLA temp buffers under selective remat. stop_gradient
            # keeps the metric and kills the dead path.
            reg_in = preds if train_cfg.reg_coeff != 0.0 else jax.lax.stop_gradient(preds)
            l_reg = variance_reg(reg_in, pred_w)
            loss = l_jepa + train_cfg.reg_coeff * l_reg
            return loss, (l_jepa, l_reg)

        # Per-layer STATE (init_train_state(unroll_blocks=True)) needs no
        # conversion at all: forwards unroll off the tuple structure, each
        # dW is its own buffer, and AdamW/EMA run per-layer. With stacked
        # state, unroll_grads slices per-layer views in and restacks the
        # grads (one concatenate per leaf) — checkpoint-compatible, but the
        # restack costs ~20 ms/step at ViT-L (BENCH.md round 4).
        per_layer_state = isinstance(
            state["params"]["encoder"]["blocks"], (list, tuple)
        )
        params_in = state["params"]
        if unroll_grads and not per_layer_state:
            from jepa_tpu.models.transformer import unstack_blocks

            params_in = {
                "encoder": {
                    **params_in["encoder"],
                    "blocks": unstack_blocks(
                        params_in["encoder"]["blocks"], enc_cfg.depth
                    ),
                },
                "predictor": {
                    **params_in["predictor"],
                    "blocks": unstack_blocks(
                        params_in["predictor"]["blocks"], pred_cfg.depth
                    ),
                },
            }
        (loss, (l_jepa, l_reg)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params_in
        )
        if unroll_grads and not per_layer_state:
            from jepa_tpu.models.transformer import restack_blocks

            grads = {
                "encoder": {
                    **grads["encoder"],
                    "blocks": restack_blocks(grads["encoder"]["blocks"]),
                },
                "predictor": {
                    **grads["predictor"],
                    "blocks": restack_blocks(grads["predictor"]["blocks"]),
                },
            }
        if per_layer_state and os.environ.get("JEPA_GRADS_BARRIER", "1") == "1":
            # Per-layer dW buffers have TWO consumers (the clip-norm pass
            # and AdamW). Without a barrier XLA output-fuses a full
            # RECOMPUTE of each dW chain (incl. the remat'd gelu tail —
            # big activation re-reads) into the norm reduction: ~420 ops,
            # ~34 ms/step at ViT-L (xplane, BENCH.md round 4). The barrier
            # forces one materialization that both consumers read.
            grads = jax.lax.optimization_barrier(grads)

        def qkv_grad_stats(g_blocks, prefix):
            """Per-layer qkv grad norms (reference grad_logger,
            src/utils/logging.py:91-105): first/last layer + min/max."""
            if isinstance(g_blocks, (list, tuple)):
                norms = jnp.stack([
                    jnp.sqrt(jnp.sum(jnp.square(
                        g["attn"]["qkv_w"].astype(jnp.float32))))
                    for g in g_blocks
                ])
            else:
                qkv = g_blocks["attn"]["qkv_w"].astype(jnp.float32)
                norms = jnp.sqrt(jnp.sum(jnp.square(qkv), axis=(1, 2)))
            return {
                f"{prefix}_qkv_first": norms[0],
                f"{prefix}_qkv_last": norms[-1],
                f"{prefix}_qkv_min": jnp.min(norms),
                f"{prefix}_qkv_max": jnp.max(norms),
            }

        grad_stats = {
            **qkv_grad_stats(grads["encoder"]["blocks"], "enc"),
            **qkv_grad_stats(grads["predictor"]["blocks"], "pred"),
        }

        clip_on = jnp.asarray(step >= train_cfg.clip_after_step)
        if train_cfg.clip_grad is not None:
            g_enc, enc_norm = clip_by_global_norm(
                grads["encoder"], train_cfg.clip_grad, clip_on
            )
            g_pred, pred_norm = clip_by_global_norm(
                grads["predictor"], train_cfg.clip_grad, clip_on
            )
            grads = {"encoder": g_enc, "predictor": g_pred}
        else:
            from jepa_tpu.train.optimizer import global_norm

            enc_norm = global_norm(grads["encoder"])
            pred_norm = global_norm(grads["predictor"])

        if wd_mask is None:
            wd_mask = decay_mask(state["params"])
        new_params, new_opt, opt_stats = adamw_update(
            state["params"],
            grads,
            state["opt"],
            lr=lr,
            wd=wd,
            mask=wd_mask,
            step=sched_step,
            b1=train_cfg.betas[0],
            b2=train_cfg.betas[1],
            eps=train_cfg.eps,
        )
        ema_src = new_params["encoder"]
        if per_layer_state:
            # target stays stacked (scan forward); restack the new encoder
            # params once — the only stacking per step in per-layer mode
            from jepa_tpu.models.transformer import restack_blocks

            ema_src = {**ema_src, "blocks": restack_blocks(ema_src["blocks"])}
        new_target = ema_update(state["target"], ema_src, momentum)

        new_state = {
            "step": step + 1,
            "params": new_params,
            "target": new_target,
            "opt": new_opt,
        }
        flat = clips.reshape(total_b, -1).astype(jnp.float32)
        input_var = jnp.var(flat, axis=1, ddof=1)
        metrics = {
            "loss": loss,
            "loss_jepa": l_jepa,
            "loss_reg": l_reg,
            "lr": lr,
            "wd": wd,
            "ema_momentum": momentum,
            "enc_grad_norm": enc_norm,
            "pred_grad_norm": pred_norm,
            "input_var": jnp.mean(input_var),
            "input_var_min": jnp.min(input_var),
            **opt_stats,
            **grad_stats,
        }
        return new_state, metrics

    return step_fn
