"""Full-composition parity: ONE V-JEPA training update computed with the
torch oracle + the reference's equations (target LN + gather, L1 loss,
variance reg, grad clip, AdamW, EMA) must match our fused jitted step on
identical weights, inputs, and masks (padded mode carries the host masks).

This is the composition tier above the per-piece golden tests: it checks
loss wiring, gradient flow through gathers/multimask, optimizer/EMA
ordering, and schedule application all at once.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from jepa_tpu.masks.multiblock3d import MaskGrid
from jepa_tpu.models.predictor import PredictorCfg
from jepa_tpu.models.vit import ViTCfg
from jepa_tpu.train.step import TrainCfg, build_train_step
from jepa_tpu.train.optimizer import init_adamw_state
from jepa_tpu.utils.checkpoint_port import port_encoder, port_predictor
from jepa_tpu.utils.schedulers import CosineWD, LinearMomentum, WarmupCosine
from tests.torch_oracle import OraclePredictor, OracleViT, randomize

B = 2
ENC = ViTCfg(
    img_size=32, patch_size=8, num_frames=4, tubelet_size=2,
    embed_dim=64, depth=3, num_heads=4, compute_dtype=jnp.float32, attn_impl="xla",
)
PRED = PredictorCfg(
    img_size=32, patch_size=8, num_frames=4, tubelet_size=2,
    embed_dim=64, predictor_embed_dim=32, depth=2, num_heads=4,
    num_mask_tokens=1, compute_dtype=jnp.float32, attn_impl="xla",
)
LR, WD, MOM = 1e-3, 0.1, 0.99


def _torch_reference_update(enc_t, pred_t, tgt_t, clips, idx_c, idx_p, loss_exp=1.0):
    """One update following the reference recipe exactly."""
    gather = lambda t, idx: torch.gather(
        t, 1, torch.from_numpy(idx.astype(np.int64)).unsqueeze(-1).expand(-1, -1, t.shape[-1])
    )
    x = torch.from_numpy(clips)
    with torch.no_grad():
        h = tgt_t(x)
        h = F.layer_norm(h, (h.shape[-1],))
        h = gather(h, idx_p)
    z = enc_t(x, keep_idx=torch.from_numpy(idx_c.astype(np.int64)))
    p = pred_t(z, torch.from_numpy(idx_c.astype(np.int64)),
               torch.from_numpy(idx_p.astype(np.int64)), mask_index=0)
    loss_jepa = torch.mean(torch.abs(p - h) ** loss_exp) / loss_exp
    pstd = torch.sqrt(p.var(dim=1) + 1e-4)
    loss_reg = torch.mean(F.relu(1.0 - pstd))
    loss = loss_jepa + 0.5 * loss_reg

    params = list(enc_t.parameters()) + list(pred_t.parameters())
    named_e = [(n, q) for n, q in enc_t.named_parameters() if q.requires_grad]
    named_p = [(n, q) for n, q in pred_t.named_parameters() if q.requires_grad]
    opt = torch.optim.AdamW(
        [
            {"params": [q for n, q in named_e + named_p
                        if "bias" not in n and q.ndim != 1], "weight_decay": WD},
            {"params": [q for n, q in named_e + named_p
                        if "bias" in n or q.ndim == 1], "weight_decay": 0.0},
        ],
        lr=LR, betas=(0.9, 0.999), eps=1e-8,
    )
    loss.backward()
    torch.nn.utils.clip_grad_norm_([q for q in enc_t.parameters() if q.requires_grad], 10.0)
    torch.nn.utils.clip_grad_norm_([q for q in pred_t.parameters() if q.requires_grad], 10.0)
    opt.step()
    with torch.no_grad():
        for q, k in zip(enc_t.parameters(), tgt_t.parameters()):
            k.mul_(MOM).add_((1 - MOM) * q)
    return float(loss), float(loss_jepa), float(loss_reg)


def test_one_update_matches_reference_composition():
    # identical weights: torch oracles -> ported jax pytrees
    enc_t = randomize(OracleViT(), seed=11)
    tgt_t = randomize(OracleViT(), seed=11)  # target starts as a copy
    pred_t = randomize(OraclePredictor(n_patches=32), seed=13)
    # freeze pos embeds like the reference (requires_grad=False buffers)
    enc_t.pos_embed.requires_grad_(False)
    tgt_t.pos_embed.requires_grad_(False)
    pred_t.predictor_pos_embed.requires_grad_(False)

    enc_params, enc_consts = port_encoder(enc_t.state_dict(), ENC)
    pred_params, pred_consts = port_predictor(pred_t.state_dict(), PRED)
    state = {
        "step": jnp.zeros((), jnp.int32),
        "params": {"encoder": enc_params, "predictor": pred_params},
        "target": jax.tree.map(jnp.copy, enc_params),
        "opt": init_adamw_state({"encoder": enc_params, "predictor": pred_params}),
    }

    rng = np.random.default_rng(3)
    clips = rng.normal(size=(B, 3, 4, 32, 32)).astype(np.float32)
    idx_c = np.stack([np.sort(rng.choice(32, 12, replace=False)) for _ in range(B)]).astype(np.int32)
    idx_p = np.stack(
        [np.sort(np.setdiff1d(np.arange(32), c)) for c in idx_c]
    ).astype(np.int32)

    # constant schedules so lr/wd/m are exactly LR/WD/MOM at step 1
    lr_s = WarmupCosine(warmup_steps=10**6, start_lr=LR, ref_lr=LR, final_lr=LR, t_max=10**7)
    wd_s = CosineWD(ref_wd=WD, final_wd=WD, t_max=10**7)
    mom_s = LinearMomentum(MOM, MOM, total=1)
    tc = TrainCfg(loss_exp=1.0, reg_coeff=0.5, clip_grad=10.0, clip_after_step=0,
                  num_clips=1, batch_size=B, mask_mode="padded", seed=0)
    grid = MaskGrid(t=2, h=4, w=4)
    consts = {"encoder": enc_consts, "predictor": pred_consts}
    step = build_train_step(ENC, PRED, consts, tc, lr_s, wd_s, mom_s, [None], grid, [(12, 20)])

    ones = np.ones_like
    batch = {
        "clips": jnp.asarray(clips.transpose(0, 2, 3, 4, 1)),
        "masks_enc": [jnp.asarray(idx_c)],
        "masks_pred": [jnp.asarray(idx_p)],
        "enc_weights": [jnp.asarray(ones(idx_c, ).astype(np.float32))],
        "pred_weights": [jnp.asarray(ones(idx_p).astype(np.float32))],
    }
    new_state, metrics = jax.jit(step)(state, batch)

    want = _torch_reference_update(enc_t, pred_t, tgt_t, clips, idx_c, idx_p)
    np.testing.assert_allclose(float(metrics["loss"]), want[0], rtol=2e-4)
    np.testing.assert_allclose(float(metrics["loss_jepa"]), want[1], rtol=2e-4)
    np.testing.assert_allclose(float(metrics["loss_reg"]), want[2], rtol=2e-3)

    # updated encoder weights match torch AdamW result
    p2, _ = port_encoder(enc_t.state_dict(), ENC)
    for a, b in zip(jax.tree.leaves(new_state["params"]["encoder"]), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)
    # EMA target matches
    t2, _ = port_encoder(tgt_t.state_dict(), ENC)
    for a, b in zip(jax.tree.leaves(new_state["target"]), jax.tree.leaves(t2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)
