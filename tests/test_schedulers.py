"""Schedulers: closed-form pure functions must reproduce the reference's
stateful iterator values (reference: src/utils/schedulers.py) at every step.
The iterators are re-implemented minimally in-test as the oracle.
"""

import math

import numpy as np

from jepa_tpu.utils.schedulers import (
    CosineWD,
    LinearMomentum,
    WarmupCosine,
    build_schedules,
)


def _oracle_lr(step, warmup, start_lr, ref_lr, t_max_total, final_lr):
    # step is the iterator's post-increment counter (1-indexed).
    t_max = t_max_total - warmup
    if step < warmup:
        progress = step / max(1, warmup)
        return start_lr + progress * (ref_lr - start_lr)
    progress = (step - warmup) / max(1, t_max)
    return max(
        final_lr,
        final_lr + (ref_lr - final_lr) * 0.5 * (1.0 + math.cos(math.pi * progress)),
    )


def _oracle_wd(step, ref_wd, final_wd, t_max):
    progress = step / t_max
    wd = final_wd + (ref_wd - final_wd) * 0.5 * (1.0 + math.cos(math.pi * progress))
    return max(final_wd, wd) if final_wd <= ref_wd else min(final_wd, wd)


def test_warmup_cosine_matches_reference_iterator():
    sched = WarmupCosine(
        warmup_steps=40, start_lr=2e-4, ref_lr=6.25e-4, final_lr=1e-6, t_max=500
    )
    steps = list(range(1, 45)) + list(range(45, 501, 13)) + [500]
    want = np.array([_oracle_lr(i, 40, 2e-4, 6.25e-4, 500, 1e-6) for i in steps])
    got = np.asarray(sched(np.array(steps)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_cosine_wd_increasing_matches_reference():
    # Pretrain configs use increasing wd 0.04 -> 0.4.
    sched = CosineWD(ref_wd=0.04, final_wd=0.4, t_max=300)
    steps = list(range(1, 301, 7)) + [300]
    want = np.array([_oracle_wd(i, 0.04, 0.4, 300) for i in steps])
    got = np.asarray(sched(np.array(steps)))
    np.testing.assert_allclose(got, want, rtol=1e-5)
    assert float(sched(1)) < float(sched(300))


def test_momentum_ramp_endpoints():
    m = LinearMomentum(0.998, 1.0, total=1000)
    np.testing.assert_allclose(float(m(0)), 0.998, rtol=1e-6)
    np.testing.assert_allclose(float(m(1000)), 1.0, rtol=1e-6)


def test_build_schedules_vitl16_config_values():
    # configs/pretrain/vitl16.yaml: ipe=300, epochs=300, warmup=40,
    # ipe_scale=1.25, lr 2e-4 -> 6.25e-4 -> 1e-6, wd 0.04 -> 0.4.
    lr_s, wd_s, mom_s = build_schedules(
        ipe=300,
        num_epochs=300,
        warmup_epochs=40,
        start_lr=2e-4,
        ref_lr=6.25e-4,
        final_lr=1e-6,
        wd=0.04,
        final_wd=0.4,
        ema=(0.998, 1.0),
        ipe_scale=1.25,
    )
    # After exactly warmup steps the lr hits ref_lr (cosine progress 0).
    np.testing.assert_allclose(float(lr_s(12000)), 6.25e-4, rtol=1e-5)
    # Mid-warmup is linear.
    np.testing.assert_allclose(
        float(lr_s(6000)), 2e-4 + 0.5 * (6.25e-4 - 2e-4), rtol=1e-5
    )
    # wd starts near 0.04 and ends at 0.4 at t_max.
    np.testing.assert_allclose(float(wd_s(1)), 0.04, atol=1e-5)
    np.testing.assert_allclose(float(wd_s(112500)), 0.4, rtol=1e-5)
    # 90K updates = reference's published pretrain length; momentum < 1 there.
    assert 0.998 < float(mom_s(90000)) < 1.0


def test_probe_wd_schedule_matches_reference_eval_recipe():
    """The eval init_opt consumes CosineWDSchedule(ref_wd=config wd,
    final_wd=1e-6) — final_wd is the reference's default, never overridden
    (reference evals/video_classification_frozen/eval.py:529-534, 555-558).
    Both probe apps must decay config wd -> 1e-6, not hold it constant."""
    ipe, epochs, wd = 37, 20, 0.01
    sched = CosineWD(ref_wd=wd, final_wd=1e-6, t_max=epochs * ipe)
    steps = list(range(1, epochs * ipe + 1, 11)) + [epochs * ipe]
    want = np.array([_oracle_wd(i, wd, 1e-6, epochs * ipe) for i in steps])
    np.testing.assert_allclose(
        np.asarray(sched(np.array(steps))), want, rtol=1e-4, atol=1e-9
    )
    # decays to 1e-6 at the end, like the published 80.8-K400 recipe
    np.testing.assert_allclose(float(sched(epochs * ipe)), 1e-6, rtol=1e-3)
    assert float(sched(1)) > 0.9 * wd
