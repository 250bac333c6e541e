"""Mask generators: shape invariants, statistics, determinism.

Reference invariants (src/masks/multiblock3d.py, random_tube.py): enc/pred
index sets are disjoint complements on the token grid; context is confined
to the first max_temporal_keep frames; all samples in a batch share the
per-step block size; tube masks tile one spatial pattern across time.
"""

import jax
import jax.numpy as jnp
import numpy as np

from jepa_tpu.masks.multiblock3d import (
    HostMaskGenerator,
    MaskCollator,
    MaskGrid,
    MaskSpec,
    expected_pred_coverage,
    resolve_keep_counts,
    sample_masks,
    sample_masks_for_specs,
)
from jepa_tpu.masks.padding import pad_masks, static_cap
from jepa_tpu.masks.random_tube import TubeSpec, keep_counts, sample_tube_masks

GRID = MaskGrid(t=8, h=14, w=14)  # ViT-L/16 @ 224, 16 frames
SHORT = MaskSpec(aspect_ratio=(0.75, 1.5), num_blocks=8, spatial_scale=(0.15, 0.15))
LONG = MaskSpec(aspect_ratio=(0.75, 1.5), num_blocks=2, spatial_scale=(0.7, 0.7))


def test_fixed_mode_shapes_and_validity():
    ke, kp = resolve_keep_counts(SHORT, GRID)
    me, mp = sample_masks(jax.random.PRNGKey(0), 4, SHORT, GRID, ke, kp)
    assert me.shape == (4, ke) and mp.shape == (4, kp)
    me, mp = np.asarray(me), np.asarray(mp)
    assert me.min() >= 0 and me.max() < GRID.n
    for b in range(4):
        assert len(set(me[b])) == ke, "enc indices must be unique"
        assert len(set(mp[b])) == kp, "pred indices must be unique"
        assert not (set(me[b]) & set(mp[b])), "enc/pred must be disjoint"
        assert set(me[b]) | set(mp[b]) == set(range(GRID.n)), "complement partition"


def test_fixed_mode_coverage_matches_expectation():
    # short-range config: 8 blocks x 0.15 -> ~73% predicted
    cov = expected_pred_coverage(SHORT, GRID)
    assert 0.6 < cov < 0.85
    ke, kp = resolve_keep_counts(SHORT, GRID)
    assert abs(kp / GRID.n - cov) < 0.01
    # long-range: 2 blocks x 0.7 -> ~91%
    cov_l = expected_pred_coverage(LONG, GRID)
    assert 0.85 < cov_l < 0.97


def test_fixed_mode_deterministic_per_step_and_jittable():
    ke, kp = resolve_keep_counts(LONG, GRID)
    key = jax.random.PRNGKey(7)
    f = jax.jit(
        lambda rng, step: sample_masks_for_specs(
            rng, step, 2, [SHORT, LONG], GRID,
            [resolve_keep_counts(SHORT, GRID), (ke, kp)],
        )
    )
    a = f(key, 5)
    b = f(key, 5)
    c = f(key, 6)
    np.testing.assert_array_equal(np.asarray(a[0][0]), np.asarray(b[0][0]))
    assert not np.array_equal(np.asarray(a[0][0]), np.asarray(c[0][0]))


def test_fixed_mode_max_temporal_keep():
    spec = MaskSpec(num_blocks=2, spatial_scale=(0.3, 0.3), max_temporal_keep=0.5)
    ke, kp = resolve_keep_counts(spec, GRID)
    me, mp = sample_masks(jax.random.PRNGKey(1), 2, spec, GRID, ke, kp)
    per_frame = GRID.h * GRID.w
    ctx_dur = max(1, int(GRID.t * 0.5))
    assert np.asarray(me).max() < ctx_dur * per_frame, "context confined to early frames"


def test_host_generator_reference_semantics():
    gen = HostMaskGenerator(SHORT, GRID, seed=3)
    enc, pred = gen(batch_size=6)
    assert enc.shape[0] == 6 and pred.shape[0] == 6
    assert enc.shape[1] + pred.shape[1] <= GRID.n
    for b in range(6):
        assert not (set(enc[b]) & set(pred[b]))
    # batch-min truncation -> rectangular; all K_enc equal by construction
    # determinism: same counter value -> same masks
    gen2 = HostMaskGenerator(SHORT, GRID, seed=3)
    enc2, pred2 = gen2(batch_size=6)
    np.testing.assert_array_equal(enc, enc2)
    # next step differs
    enc3, _ = gen2(batch_size=6)
    assert enc3.shape != enc.shape or not np.array_equal(enc3, enc)


def test_host_collator_resume_is_o1():
    col = MaskCollator([SHORT, LONG], GRID, seed=1)
    for _ in range(5):
        col(2)
    a_e, a_p = col(2)
    col2 = MaskCollator([SHORT, LONG], GRID, seed=1)
    col2.set_step(5)
    b_e, b_p = col2(2)
    for x, y in zip(a_e + a_p, b_e + b_p):
        np.testing.assert_array_equal(x, y)


def test_tube_masks():
    spec = TubeSpec(ratio=0.9)
    ke, kp = keep_counts(spec, GRID)
    assert ke == int(196 * 0.1) * 8
    me, mp = sample_tube_masks(jax.random.PRNGKey(2), 3, spec, GRID)
    me = np.asarray(me)
    assert me.shape == (3, ke)
    # same spatial pattern tiled across time
    per_frame = GRID.h * GRID.w
    spatial0 = me[0][me[0] < per_frame]
    for t in range(1, GRID.t):
        frame_t = me[0][(me[0] >= t * per_frame) & (me[0] < (t + 1) * per_frame)]
        np.testing.assert_array_equal(frame_t - t * per_frame, spatial0)


def test_pad_masks_and_caps():
    idx = np.arange(12, dtype=np.int32).reshape(2, 6)
    padded, w = pad_masks(idx, 8)
    assert padded.shape == (2, 8) and w.shape == (2, 8)
    np.testing.assert_array_equal(padded[:, :6], idx)
    assert w[:, 6:].sum() == 0 and w[:, :6].min() == 1
    assert static_cap(1568, 0.35) == 640
    # over-cap masks truncate like the reference's max_keep slice
    # (multiblock3d.py:196) instead of raising mid-training
    trunc, tw = pad_masks(idx, 4)
    np.testing.assert_array_equal(trunc, idx[:, :4])
    assert tw.min() == 1.0


def test_fixed_k_calibrated_at_reference_per_rank_batch():
    """Fixed-mode K must match the reference's batch-min distribution at the
    PER-RANK collator batch of 24 (reference multiblock3d.py:194-201), for
    both shipped mask specs — and differ from a per-host-batch (192)
    calibration, which would be systematically smaller."""
    import yaml

    from jepa_tpu.masks.multiblock3d import (
        HostMaskGenerator,
        calibrate_keep_counts,
    )

    cfg = yaml.safe_load(open("configs/pretrain/vitl16.yaml"))
    grid = MaskGrid.from_data_cfg(
        cfg["data"]["crop_size"], cfg["data"]["patch_size"],
        cfg["data"]["num_frames"], cfg["data"]["tubelet_size"],
    )
    for m in cfg["mask"]:
        spec = MaskSpec.from_cfg(m)
        k24 = calibrate_keep_counts(spec, grid, 24)
        # independent batch-min statistics at B=24 (different seed/iters)
        gen = HostMaskGenerator(spec, grid, seed=999)
        enc_sizes, pred_sizes = [], []
        for _ in range(40):
            e, p = gen(24)
            enc_sizes.append(e.shape[1])
            pred_sizes.append(p.shape[1])
        assert abs(k24[0] - np.mean(enc_sizes)) <= 0.12 * grid.n
        assert abs(k24[1] - np.mean(pred_sizes)) <= 0.12 * grid.n
        # per-host-batch calibration (8 devices x 24) must NOT be used:
        # min over 192 samples gives a smaller context
        k192 = calibrate_keep_counts(spec, grid, 192)
        assert k192[0] < k24[0], (spec, k24, k192)


def test_pad_tiers_bucketing():
    """Bucketed cap tiers (VERDICT r2 item 6): ascending envelopes, the last
    tier matching the worst-case calibration, and tier-0 actually selected
    on a healthy fraction of fresh collator iterations (the whole point —
    most steps must run at the cheap compiled shape)."""
    from jepa_tpu.masks.multiblock3d import (
        calibrate_pad_caps,
        calibrate_pad_tiers,
        select_pad_tier,
    )

    specs = [SHORT, LONG]
    tiers = calibrate_pad_tiers(specs, GRID, 24, iters=120, seed=7)
    assert 1 <= len(tiers) <= 3
    # ascending element-wise
    for a, b in zip(tiers, tiers[1:]):
        assert all(ca <= cb and pa <= pb for (ca, pa), (cb, pb) in zip(a, b))
        assert a != b
    # all caps are lane multiples within the grid
    for tier in tiers:
        for ce, cp in tier:
            assert ce % 128 == 0 or ce == GRID.n
            assert cp % 128 == 0 or cp == GRID.n
    # last tier == the single worst-case calibration at the same draws
    worst = [calibrate_pad_caps(s, GRID, 24, iters=120, seed=7) for s in specs]
    assert tiers[-1] == worst

    # fresh (differently-seeded) collator: tier 0 must win most iterations
    coll = MaskCollator(specs, GRID, seed=99)
    hits = np.zeros(len(tiers), np.int64)
    for _ in range(60):
        me, mp = coll(24)
        hits[select_pad_tier(tiers, me, mp)] += 1
    assert hits[0] >= 30, hits


def test_calibrate_pad_tiers_field_mode():
    """Per-field quantile tiers (mode='field', round 5): ascending
    element-wise, lane-multiple caps, SAME worst-case last tier as the
    legacy mode (truncation semantics shared), and tier-0 caps no larger
    than the legacy joint-envelope tier-0 in every field (the mode exists
    to stop near-independent fields from carrying each other's tails —
    e.g. the long-range enc cap sat at 256 with a 96-token median)."""
    from jepa_tpu.masks.multiblock3d import calibrate_pad_caps, calibrate_pad_tiers

    specs = [SHORT, LONG]
    ftiers = calibrate_pad_tiers(specs, GRID, 24, iters=120, seed=7,
                                 mode="field")
    ttiers = calibrate_pad_tiers(specs, GRID, 24, iters=120, seed=7,
                                 mode="total")
    for a, b in zip(ftiers, ftiers[1:]):
        assert all(ca <= cb and pa <= pb for (ca, pa), (cb, pb) in zip(a, b))
        assert a != b
    for tier in ftiers:
        for ce, cp in tier:
            assert (ce % 128 == 0 or ce == GRID.n) and ce >= 128
            assert (cp % 128 == 0 or cp == GRID.n) and cp >= 128
    worst = [calibrate_pad_caps(s, GRID, 24, iters=120, seed=7) for s in specs]
    assert ftiers[-1] == worst == ttiers[-1]
    assert all(
        fe <= te and fp <= tp
        for (fe, fp), (te, tp) in zip(ftiers[0], ttiers[0])
    )


def test_calibrate_pad_ladders_and_rung_select():
    """Per-spec rung ladders (pad_tier_scope: spec, round 5): ascending
    per-spec caps on the 128-lane grid, last rung == that spec's worst-case
    calibrate_pad_caps (shared truncation semantics), and select_pad_rungs
    picks per spec independently — a draw heavy in ONE spec must not evict
    the other spec from its cheap rung (the whole point vs joint tiers,
    whose cheap tier hits only on the intersection)."""
    from jepa_tpu.masks.multiblock3d import (
        calibrate_pad_caps,
        calibrate_pad_ladders,
        select_pad_rungs,
    )

    specs = [SHORT, LONG]
    ladders = calibrate_pad_ladders(specs, GRID, 24, iters=120, seed=7)
    for rungs in ladders:
        for a, b in zip(rungs, rungs[1:]):
            assert a[0] <= b[0] and a[1] <= b[1] and a != b
        for ce, cp in rungs:
            assert (ce % 128 == 0 or ce == GRID.n) and ce >= 128
            assert (cp % 128 == 0 or cp == GRID.n) and cp >= 128
    worst = [calibrate_pad_caps(s, GRID, 24, iters=120, seed=7) for s in specs]
    assert [r[-1] for r in ladders] == worst

    # independence: spec 0 drawn at its worst rung, spec 1 at its cheapest
    me = [np.zeros((4, ladders[0][-1][0]), np.int32),
          np.zeros((4, ladders[1][0][0]), np.int32)]
    mp = [np.zeros((4, ladders[0][-1][1]), np.int32),
          np.zeros((4, ladders[1][0][1]), np.int32)]
    rungs = select_pad_rungs(ladders, me, mp)
    assert rungs[0] == len(ladders[0]) - 1 and rungs[1] == 0

    # heavier than every rung -> last rung (pad_masks truncates there)
    me[0] = np.zeros((4, GRID.n), np.int32)
    mp[0] = np.zeros((4, GRID.n), np.int32)
    assert select_pad_rungs(ladders, me, mp)[0] == len(ladders[0]) - 1

    # chunked-collation entries (lists of per-device chunks) use the max K
    me[0] = [np.zeros((2, ladders[0][0][0]), np.int32),
             np.zeros((2, ladders[0][-1][0]), np.int32)]
    mp[0] = np.zeros((4, ladders[0][0][1]), np.int32)
    assert select_pad_rungs(ladders, me, mp)[0] > 0


def test_select_pad_tier_truncation_fallback():
    """Masks heavier than every tier fall to the LAST tier (pad_masks then
    truncates, the reference's max_keep ascending-slice semantics)."""
    from jepa_tpu.masks.multiblock3d import select_pad_tier

    tiers = [[(128, 256)], [(256, 512)]]
    big = [np.zeros((2, 400), np.int32)]
    small = [np.zeros((2, 100), np.int32)]
    assert select_pad_tier(tiers, small, [np.zeros((2, 200), np.int32)]) == 0
    assert select_pad_tier(tiers, big, [np.zeros((2, 600), np.int32)]) == 1
    assert select_pad_tier(tiers, small, [np.zeros((2, 300), np.int32)]) == 1


def test_collate_chunks_iid_and_topology_invariant():
    """Per-device chunked collation: chunk 0 reproduces the single-stream
    collate (historical key), chunks draw i.i.d. placements (no rank
    duplication), and the global mask batch is identical regardless of how
    chunks are grouped into processes (it only depends on (seed, step,
    chunk)) — the property the padded 2-process equality test rides on."""
    specs = [SHORT, LONG]
    a = MaskCollator(specs, GRID, seed=5)
    b = MaskCollator(specs, GRID, seed=5)

    me1, mp1 = a(4)  # single-stream collate, counter step 0
    me2, mp2 = b.collate_chunks(4, 3)  # chunked collate, counter step 0
    for s in range(len(specs)):
        # chunk 0 == the historical single stream
        np.testing.assert_array_equal(me1[s], me2[s][0])
        np.testing.assert_array_equal(mp1[s], mp2[s][0])
        # chunks are distinct draws
        k01 = min(me2[s][0].shape[1], me2[s][1].shape[1])
        assert not np.array_equal(me2[s][0][:, :k01], me2[s][1][:, :k01])

    # same step, same chunk index -> same masks (topology invariance)
    c = MaskCollator(specs, GRID, seed=5)
    c.set_step(1)  # skip to counter 1
    be, bp = b.collate_chunks(4, 3)  # counter 1
    ce_, cp_ = c.collate_chunks(4, 3)
    for s in range(len(specs)):
        for ch in range(3):
            np.testing.assert_array_equal(be[s][ch], ce_[s][ch])
            np.testing.assert_array_equal(bp[s][ch], cp_[s][ch])

    # tube collator: same protocol
    from jepa_tpu.masks.random_tube import TubeMaskCollator, TubeSpec

    t1 = TubeMaskCollator([TubeSpec(ratio=0.75)], GRID, seed=3)
    t2 = TubeMaskCollator([TubeSpec(ratio=0.75)], GRID, seed=3)
    e1, p1 = t1(2)
    e2, p2 = t2.collate_chunks(2, 2)
    np.testing.assert_array_equal(e1[0], e2[0][0])
    assert not np.array_equal(e2[0][0], e2[0][1])
    assert e2[0][0].shape == e2[0][1].shape  # exact-K: one shape

    # select_pad_tier accepts chunk lists: needs the max K covered
    from jepa_tpu.masks.multiblock3d import select_pad_tier

    tiers = [[(128, 128)], [(256, 256)]]
    chunks_small = [[np.zeros((1, 100), np.int32), np.zeros((1, 120), np.int32)]]
    chunks_big = [[np.zeros((1, 100), np.int32), np.zeros((1, 200), np.int32)]]
    assert select_pad_tier(tiers, chunks_small, chunks_small) == 0
    assert select_pad_tier(tiers, chunks_big, chunks_small) == 1
