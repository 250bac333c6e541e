"""Multi-step trajectory parity vs the torch recipe (VERDICT r3 item 4).

N=12 updates with REAL (varying) schedules: warmup-cosine lr, increasing
cosine wd, EMA momentum ramp, and a BINDING grad clip whose gate flips ON
mid-trajectory — all stepping the reference's conventions (iteration k uses
the iterator's (k+1)-th lr/wd and the k-th momentum value; reference
app/vjepa/train.py:364-498, src/utils/schedulers.py). Pins schedule
stepping, EMA ramp, clip gating, and AdamW moment accumulation JOINTLY over
time — the strongest local evidence for the unverifiable probe-accuracy
gates.

ISOLATION NOTE (cost hours): constructing a torch OPTIMIZER perturbs
numerics of XLA-CPU programs compiled LATER in the same process by ~7e-4
(measured; bisected to the torch.optim.AdamW constructor — tight-tolerance
jax-vs-torch tests that run after it start failing). Hence (a) this test
runs ALL jax steps first and only then the torch loop, and (b) it lives in
its own file that sorts after test_train_parity.py so its torch-optim use
cannot precede the parity file's jit compiles. The production rule from
CLAUDE.md stands: never mix torch and jax compute in one process.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from jepa_tpu.masks.multiblock3d import MaskGrid
from jepa_tpu.train.optimizer import init_adamw_state
from jepa_tpu.train.step import TrainCfg, build_train_step
from jepa_tpu.utils.checkpoint_port import port_encoder, port_predictor
from jepa_tpu.utils.schedulers import CosineWD, LinearMomentum, WarmupCosine
from tests.test_schedulers import _oracle_lr, _oracle_wd
from tests.test_train_parity import B, ENC, PRED
from tests.torch_oracle import OraclePredictor, OracleViT, randomize

N_STEPS = 12
WARMUP, T_MAX = 4, 12
START_LR, REF_LR, FINAL_LR = 5e-4, 2e-3, 1e-5
REF_WD, FINAL_WD = 0.05, 0.3
M0, M1, M_TOTAL = 0.95, 0.999, 12
CLIP, CLIP_AFTER = 0.05, 4


def test_multistep_trajectory_matches_reference():
    enc_t = randomize(OracleViT(), seed=21)
    tgt_t = randomize(OracleViT(), seed=21)
    pred_t = randomize(OraclePredictor(n_patches=32), seed=23)
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

    # pre-generate every step's data so the two phases see identical inputs
    rng = np.random.default_rng(17)
    steps_data = []
    for _ in range(N_STEPS):
        clips = rng.normal(size=(B, 3, 4, 32, 32)).astype(np.float32)
        idx_c = np.stack([np.sort(rng.choice(32, 12, replace=False))
                          for _ in range(B)]).astype(np.int32)
        idx_p = np.stack([np.sort(np.setdiff1d(np.arange(32), c))
                          for c in idx_c]).astype(np.int32)
        steps_data.append((clips, idx_c, idx_p))

    # ---- phase 1: the fused jitted step, N_STEPS times (NO torch yet)
    lr_s = WarmupCosine(warmup_steps=WARMUP, start_lr=START_LR, ref_lr=REF_LR,
                        final_lr=FINAL_LR, t_max=T_MAX)
    wd_s = CosineWD(ref_wd=REF_WD, final_wd=FINAL_WD, t_max=T_MAX)
    mom_s = LinearMomentum(M0, M1, total=M_TOTAL)
    tc = TrainCfg(loss_exp=1.0, reg_coeff=0.5, clip_grad=CLIP,
                  clip_after_step=CLIP_AFTER, num_clips=1, batch_size=B,
                  mask_mode="padded", seed=0)
    grid = MaskGrid(t=2, h=4, w=4)
    consts = {"encoder": enc_consts, "predictor": pred_consts}
    step = jax.jit(build_train_step(ENC, PRED, consts, tc, lr_s, wd_s, mom_s,
                                    [None], grid, [(12, 20)]))
    losses_jax = []
    for clips, idx_c, idx_p in steps_data:
        batch = {
            "clips": jnp.asarray(clips.transpose(0, 2, 3, 4, 1)),
            "masks_enc": [jnp.asarray(idx_c)],
            "masks_pred": [jnp.asarray(idx_p)],
            "enc_weights": [jnp.asarray(np.ones_like(idx_c, dtype=np.float32))],
            "pred_weights": [jnp.asarray(np.ones_like(idx_p, dtype=np.float32))],
        }
        state, metrics = step(state, batch)
        losses_jax.append(float(metrics["loss"]))

    # ---- phase 2: the torch reference loop over the same data
    named_e = [(n, q) for n, q in enc_t.named_parameters() if q.requires_grad]
    named_p = [(n, q) for n, q in pred_t.named_parameters() if q.requires_grad]
    decayed = [q for n, q in named_e + named_p if "bias" not in n and q.ndim != 1]
    undecayed = [q for n, q in named_e + named_p if "bias" in n or q.ndim == 1]
    opt = torch.optim.AdamW(
        [{"params": decayed, "weight_decay": 0.0},
         {"params": undecayed, "weight_decay": 0.0}],
        lr=START_LR, betas=(0.9, 0.999), eps=1e-8,
    )
    gather = lambda t, idx: torch.gather(
        t, 1, torch.from_numpy(idx.astype(np.int64)).unsqueeze(-1).expand(-1, -1, t.shape[-1])
    )
    losses_torch = []
    clip_bound = False
    for k, (clips, idx_c, idx_p) in enumerate(steps_data):
        lr_k = _oracle_lr(k + 1, WARMUP, START_LR, REF_LR, T_MAX, FINAL_LR)
        wd_k = _oracle_wd(k + 1, REF_WD, FINAL_WD, T_MAX)
        opt.param_groups[0]["lr"] = lr_k
        opt.param_groups[0]["weight_decay"] = wd_k
        opt.param_groups[1]["lr"] = lr_k
        x = torch.from_numpy(clips)
        with torch.no_grad():
            h = tgt_t(x)
            h = F.layer_norm(h, (h.shape[-1],))
            h = gather(h, idx_p)
        z = enc_t(x, keep_idx=torch.from_numpy(idx_c.astype(np.int64)))
        p = pred_t(z, torch.from_numpy(idx_c.astype(np.int64)),
                   torch.from_numpy(idx_p.astype(np.int64)), mask_index=0)
        loss_jepa = torch.mean(torch.abs(p - h))
        pstd = torch.sqrt(p.var(dim=1) + 1e-4)
        loss = loss_jepa + 0.5 * torch.mean(F.relu(1.0 - pstd))
        losses_torch.append(float(loss))
        opt.zero_grad()
        loss.backward()
        if k >= CLIP_AFTER:
            n1 = torch.nn.utils.clip_grad_norm_(
                [q for q in enc_t.parameters() if q.requires_grad], CLIP)
            n2 = torch.nn.utils.clip_grad_norm_(
                [q for q in pred_t.parameters() if q.requires_grad], CLIP)
            clip_bound = clip_bound or float(n1) > CLIP or float(n2) > CLIP
        opt.step()
        m_k = M0 + k * (M1 - M0) / M_TOTAL
        with torch.no_grad():
            for q, tk in zip(enc_t.parameters(), tgt_t.parameters()):
                tk.mul_(m_k).add_((1 - m_k) * q)

    assert clip_bound, "clip threshold never bound — the gate went untested"
    np.testing.assert_allclose(losses_jax, losses_torch, rtol=2e-3)
    # end-of-trajectory state: online params, EMA target, AdamW moments all
    # agree within accumulated fp32 drift
    p2, _ = port_encoder(enc_t.state_dict(), ENC)
    for a, b in zip(jax.tree.leaves(state["params"]["encoder"]), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)
    t2, _ = port_encoder(tgt_t.state_dict(), ENC)
    for a, b in zip(jax.tree.leaves(state["target"]), jax.tree.leaves(t2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)
    pp2, _ = port_predictor(pred_t.state_dict(), PRED)
    for a, b in zip(jax.tree.leaves(state["params"]["predictor"]), jax.tree.leaves(pp2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)
