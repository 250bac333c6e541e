"""Multiblock-3D masking, TPU-native.

The reference generates masks on the host inside a DataLoader collate_fn
with a cross-worker shared counter and truncates every sample to the batch
minimum, producing a *different* K each iteration (reference:
src/masks/multiblock3d.py). Under jit that is a recompilation storm, so this
module provides two modes:

  * **fixed mode (default, on-device)**: `sample_masks` is a pure jittable
    function of (rng, step). Block geometry is sampled once per step (shared
    across the batch, like the reference's seeded block size), per-sample
    block placements are rasterized as vectorized box comparisons on the
    (T, H, W) token grid, and exactly K_enc / K_pred tokens are selected by
    noisy top-k — static shapes forever, zero host->device index traffic.

  * **parity mode (host)**: `MaskCollator` reproduces the reference's
    distribution exactly (shared per-step block size, per-sample union of
    npred blocks, rejection of empty contexts, batch-min truncation) in
    numpy, then pads to static caps with validity weights so the jitted
    train step still sees one shape (see jepa_tpu/masks/padding.py).

Both modes emit (masks_enc, masks_pred) index tensors compatible with
jepa_tpu.ops.masking.gather_tokens.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class MaskSpec:
    """One mask config (an entry of the YAML `mask:` list)."""

    aspect_ratio: Tuple[float, float] = (0.3, 3.0)
    num_blocks: int = 1
    spatial_scale: Tuple[float, float] = (0.2, 0.8)
    temporal_scale: Tuple[float, float] = (1.0, 1.0)
    max_temporal_keep: float = 1.0
    max_keep: Optional[int] = None

    @staticmethod
    def from_cfg(m: dict) -> "MaskSpec":
        return MaskSpec(
            aspect_ratio=tuple(m.get("aspect_ratio", (0.3, 3.0))),
            num_blocks=int(m.get("num_blocks", 1)),
            spatial_scale=tuple(m.get("spatial_scale", (0.2, 0.8))),
            temporal_scale=tuple(m.get("temporal_scale", (1.0, 1.0))),
            max_temporal_keep=float(m.get("max_temporal_keep", 1.0)),
            max_keep=m.get("max_keep", None),
        )


@dataclasses.dataclass(frozen=True)
class MaskGrid:
    """Token-grid geometry: (T, H, W) in tokens."""

    t: int
    h: int
    w: int

    @property
    def n(self) -> int:
        return self.t * self.h * self.w

    @staticmethod
    def from_data_cfg(crop_size: int, patch_size: int, num_frames: int, tubelet_size: int):
        return MaskGrid(
            t=num_frames // tubelet_size,
            h=crop_size // patch_size,
            w=crop_size // patch_size,
        )


def expected_pred_coverage(spec: MaskSpec, grid: MaskGrid) -> float:
    """Expected fraction of tokens in the union of `num_blocks` blocks.

    Mid-scale block of spatial fraction s placed uniformly; union coverage
    approximately 1-(1-s)^n (independent placements). Temporal coverage uses
    the mid temporal scale. Tokens past max_temporal_keep are always
    predicted (the reference zeroes them out of the context, reference
    multiblock3d.py:148-150).
    """
    s = 0.5 * (spec.spatial_scale[0] + spec.spatial_scale[1])
    ts = 0.5 * (spec.temporal_scale[0] + spec.temporal_scale[1])
    t_blocks = max(1, int(grid.t * ts))
    spatial_cov = 1.0 - (1.0 - min(1.0, s)) ** spec.num_blocks
    ctx_dur = max(1, int(grid.t * spec.max_temporal_keep))
    # Blocks span t_blocks of grid.t frames; frames past ctx_dur are always
    # predicted; within the context window coverage is the spatial union.
    frac_ctx_dur = ctx_dur / grid.t
    cov_within = spatial_cov * (t_blocks / grid.t)
    return min(1.0, cov_within * frac_ctx_dur + (1.0 - frac_ctx_dur))


def resolve_keep_counts(spec: MaskSpec, grid: MaskGrid) -> Tuple[int, int]:
    """(K_enc, K_pred) static counts for fixed mode."""
    cov = expected_pred_coverage(spec, grid)
    k_pred = int(round(grid.n * cov))
    # Frames past max_temporal_keep are always predicted; k_pred must cover
    # them so the context stays inside the allowed window.
    ctx_dur = max(1, int(grid.t * spec.max_temporal_keep))
    n_late = (grid.t - ctx_dur) * grid.h * grid.w
    k_pred = max(k_pred, n_late + 1)
    k_pred = min(max(k_pred, 1), grid.n - 1)
    k_enc = grid.n - k_pred
    if spec.max_keep is not None:
        k_enc = min(k_enc, int(spec.max_keep))
    return k_enc, k_pred


def calibrate_keep_counts(
    spec: MaskSpec, grid: MaskGrid, batch_size: int, iters: int = 25, seed: int = 1234
) -> Tuple[int, int]:
    """(K_enc, K_pred) calibrated against the reference distribution.

    The reference truncates every sample to the BATCH-MIN context/target
    size (multiblock3d.py:194-201), so its effective K depends on the batch
    size and sits well below the analytic expected union (e.g. short-range
    at B=4: union mean 1141 but batch-min mean ~898 of 1568). This runs the
    host parity generator for a few deterministic iterations at the actual
    batch size and takes the empirical means — the fixed-K analogue of the
    reference's effective shapes.
    """
    gen = HostMaskGenerator(spec, grid, seed=seed)
    enc_sizes, pred_sizes = [], []
    for _ in range(iters):
        enc, pred = gen(batch_size)
        enc_sizes.append(enc.shape[1])
        pred_sizes.append(pred.shape[1])
    k_enc = int(round(float(np.mean(enc_sizes))))
    k_pred = int(round(float(np.mean(pred_sizes))))
    k_enc = max(1, min(k_enc, grid.n - 1))
    k_pred = max(1, min(k_pred, grid.n - 1))
    if spec.max_keep is not None:
        k_enc = min(k_enc, int(spec.max_keep))
    return k_enc, k_pred


def calibrate_pad_caps(
    spec: MaskSpec, grid: MaskGrid, batch_size: int,
    iters: int = 40, seed: int = 4321, headroom: float = 1.05, multiple: int = 128,
) -> Tuple[int, int]:
    """(enc_cap, pred_cap) for padded-parity mode, from the distribution's
    empirical max over ``iters`` draws plus headroom, rounded up to a lane
    multiple. Rare heavier masks TRUNCATE in pad_masks (the reference's
    max_keep semantics) instead of paying worst-case static shapes: the
    naive 0.6N/1.0N caps made the padded step ~3x slower than fixed mode
    for ~2.5x over-allocated sequence length."""
    gen = HostMaskGenerator(spec, grid, seed=seed)
    enc_max = pred_max = 0
    for _ in range(iters):
        enc, pred = gen(batch_size)
        enc_max = max(enc_max, enc.shape[1])
        pred_max = max(pred_max, pred.shape[1])

    def cap(k):
        c = int(np.ceil(k * headroom / multiple) * multiple)
        return min(max(c, multiple), grid.n)

    return cap(enc_max), cap(pred_max)


def calibrate_pad_tiers(
    specs: Sequence[MaskSpec], grid: MaskGrid, batch_size: int,
    iters: int = 200, fractions: Sequence[float] = (0.6, 0.9),
    seed: int = 4321, headroom: float = 1.05, multiple: int = 128,
    n_chunks: int = 1, mode: str = "total",
):
    """Bucketed static-cap tiers for padded-parity mode.

    A single worst-case cap (calibrate_pad_caps) over-allocates the typical
    step by ~1.7x/1.2x — most of padded mode's throughput gap vs fixed mode.
    This draws ``iters`` joint collator iterations and builds cap tiers from
    the empirical distribution; tier selection per step (select_pad_tier)
    then pays close to the step's actual shape instead of the tail's. The
    last tier always reproduces calibrate_pad_caps' max*headroom worst
    case; rarer-still masks truncate in pad_masks (the reference's max_keep
    ascending-slice semantics, multiblock3d.py:194-201).

    mode "field": tier t's cap for each FIELD (spec x enc/pred) is that
    field's own ``fractions[t]`` quantile — the fields are nearly
    independent, so the "total" joint envelope (element-wise max over the
    cheapest fraction sorted by total tokens) carries every field far above
    its typical draw (e.g. long-range enc cap 256 vs a 96-token median).
    Identical semantics either way (caps only set pad shapes; the final
    tier's truncation rule is shared) — the default follows the measured
    winner in BENCH.md.

    Returns tiers: list (ascending cost) of per-spec (enc_cap, pred_cap)
    lists. Adjacent duplicate tiers (after lane rounding) are merged.

    With ``n_chunks`` > 1 (per-device chunked collation, one chunk per
    global device) the per-iteration requirement is the MAX over chunks —
    the shape every chunk pads to at runtime.
    """
    gens = [HostMaskGenerator(sp, grid, seed=seed) for sp in specs]
    if n_chunks > 1:
        iters = max(40, iters // n_chunks)  # bound host calibration work
    rec = np.empty((iters, len(specs), 2), np.int64)
    for i in range(iters):
        for s, gen in enumerate(gens):
            it = gen.step()
            ke = kp = 0
            for c in range(n_chunks):
                e, p = gen(batch_size, chunk=c, _it=it)
                ke = max(ke, e.shape[1])
                kp = max(kp, p.shape[1])
            rec[i, s] = (ke, kp)
    def cap(k, hr):
        c = int(np.ceil(k * hr / multiple) * multiple)
        return min(max(c, multiple), grid.n)

    tiers = []
    if mode == "field":
        for f in sorted(fractions):
            env = np.quantile(rec, f, axis=0)  # [S, 2] per-field quantile
            tier = [(cap(env[s, 0], 1.0), cap(env[s, 1], 1.0))
                    for s in range(len(specs))]
            if not tiers or tier != tiers[-1]:
                tiers.append(tier)
        env = rec.max(axis=0)
        tier = [(cap(env[s, 0], headroom), cap(env[s, 1], headroom))
                for s in range(len(specs))]
        if not tiers or tier != tiers[-1]:
            tiers.append(tier)
        return tiers

    rec = rec[np.argsort(rec.sum(axis=(1, 2)), kind="stable")]
    cuts = [max(1, int(round(f * iters))) for f in fractions] + [iters]
    for cut in sorted(set(cuts)):
        env = rec[:cut].max(axis=0)  # [S, 2]
        hr = headroom if cut == iters else 1.0
        tier = [(cap(env[s, 0], hr), cap(env[s, 1], hr)) for s in range(len(specs))]
        if not tiers or tier != tiers[-1]:
            tiers.append(tier)
    return tiers


def calibrate_pad_ladders(
    specs: Sequence[MaskSpec], grid: MaskGrid, batch_size: int,
    iters: int = 200, fractions: Sequence[float] = (0.6, 0.9),
    seed: int = 4321, headroom: float = 1.05, multiple: int = 128,
    n_chunks: int = 1,
):
    """PER-SPEC cap ladders for padded-parity mode (round 5).

    One joint tier (calibrate_pad_tiers) makes every spec pay for the
    heaviest spec's draw: with S specs the cheap joint tier hits only on
    the intersection of all specs' good draws (measured 28.5% at the
    reference 2-spec config for per-field 0.6-quantiles — the specs are
    independent, so coverage multiplies). This instead builds, for each
    spec, an ascending ladder of (enc_cap, pred_cap) rungs from that
    spec's OWN draw distribution (total-sorted prefix envelopes, the
    within-spec enc/pred correlation kept), and select_pad_rungs picks a
    rung per spec independently — each spec lands on its cheap rung at
    ~fractions[0] rate regardless of the others. The compiled-executable
    count becomes the product of ladder lengths (vs the ladder length for
    joint tiers); real TPU VMs cache executables so only the first visit
    to a lattice cell pays a compile. Last rung = that spec's
    calibrate_pad_caps worst case (max*headroom); heavier draws truncate
    in pad_masks (the reference's max_keep ascending-slice semantics,
    reference multiblock3d.py:194-201).

    Returns ladders: per spec, a list (ascending) of (enc_cap, pred_cap).
    """
    gens = [HostMaskGenerator(sp, grid, seed=seed) for sp in specs]
    if n_chunks > 1:
        iters = max(40, iters // n_chunks)
    rec = np.empty((iters, len(specs), 2), np.int64)
    for i in range(iters):
        for s, gen in enumerate(gens):
            it = gen.step()
            ke = kp = 0
            for c in range(n_chunks):
                e, p = gen(batch_size, chunk=c, _it=it)
                ke = max(ke, e.shape[1])
                kp = max(kp, p.shape[1])
            rec[i, s] = (ke, kp)

    def cap(k, hr):
        c = int(np.ceil(k * hr / multiple) * multiple)
        return min(max(c, multiple), grid.n)

    # Per-FIELD quantiles within each spec (a prefix ENVELOPE over the
    # spec's cheapest draws rides its own tail — measured rung-0 coverage
    # 97.5%, i.e. no discrimination; quantiles give ~fractions[0] per-spec
    # coverage, which is the whole point of independent per-spec rungs).
    ladders = []
    for s in range(len(specs)):
        rs = rec[:, s]
        rungs = []
        for f in sorted(fractions):
            qe, qp = np.quantile(rs, f, axis=0)
            rung = (cap(qe, 1.0), cap(qp, 1.0))
            if not rungs or rung != rungs[-1]:
                rungs.append(rung)
        env = rs.max(axis=0)
        rung = (cap(env[0], headroom), cap(env[1], headroom))
        if not rungs or rung != rungs[-1]:
            rungs.append(rung)
        ladders.append(rungs)
    return ladders


def select_pad_rungs(ladders, me_list, mp_list) -> tuple:
    """Per-spec smallest rung covering that spec's actual K this iteration
    (else its last rung, where pad_masks truncates). Same determinism
    contract as select_pad_tier: a pure function of the counter-seeded
    collator output, so multi-host processes agree on the compiled shape."""

    def _k(x):
        return max(a.shape[1] for a in x) if isinstance(x, (list, tuple)) else x.shape[1]

    out = []
    for me, mp, rungs in zip(me_list, mp_list, ladders):
        ke, kp = _k(me), _k(mp)
        pick = len(rungs) - 1
        for r, (ce, cp) in enumerate(rungs[:-1]):
            if ke <= ce and kp <= cp:
                pick = r
                break
        out.append(pick)
    return tuple(out)


def select_pad_tier(tiers, me_list, mp_list) -> int:
    """Smallest tier whose caps cover every spec's actual K this iteration,
    else the last (where heavier-than-cap masks truncate in pad_masks).
    Per-spec entries may be [B, K] arrays or LISTS of per-device chunks
    (collate_chunks); a chunk list needs its max K covered. Deterministic in
    the counter-seeded collator output, so multi-host processes always
    agree on the compiled shape."""

    def _k(x):
        return max(a.shape[1] for a in x) if isinstance(x, (list, tuple)) else x.shape[1]

    for t, tier in enumerate(tiers[:-1]):
        if all(
            _k(me) <= ce and _k(mp) <= cp
            for me, mp, (ce, cp) in zip(me_list, mp_list, tier)
        ):
            return t
    return len(tiers) - 1


def _sample_block_size(rng, spec: MaskSpec, grid: MaskGrid):
    """Per-step block geometry (t, h, w) in tokens; traced, shared across batch.

    Mirrors the reference's scale->area->aspect-ratio derivation
    (reference multiblock3d.py:106-137) with jax.random.
    """
    r = jax.random.uniform(rng, (3,))
    min_t, max_t = spec.temporal_scale
    t_scale = min_t + r[0] * (max_t - min_t)
    t = jnp.maximum(1, (grid.t * t_scale).astype(jnp.int32))
    min_s, max_s = spec.spatial_scale
    s_scale = min_s + r[1] * (max_s - min_s)
    num_keep = grid.h * grid.w * s_scale
    min_ar, max_ar = spec.aspect_ratio
    ar = min_ar + r[2] * (max_ar - min_ar)
    h = jnp.rint(jnp.sqrt(num_keep * ar)).astype(jnp.int32)
    w = jnp.rint(jnp.sqrt(num_keep / ar)).astype(jnp.int32)
    h = jnp.clip(h, 1, grid.h)
    w = jnp.clip(w, 1, grid.w)
    return t, h, w


def _rasterize_union(rng, bt, bh, bw, spec: MaskSpec, grid: MaskGrid):
    """Union of num_blocks random blocks -> bool [T, H, W] (True = predicted)."""
    tt = jax.lax.broadcasted_iota(jnp.int32, (grid.t, grid.h, grid.w), 0)
    hh = jax.lax.broadcasted_iota(jnp.int32, (grid.t, grid.h, grid.w), 1)
    ww = jax.lax.broadcasted_iota(jnp.int32, (grid.t, grid.h, grid.w), 2)

    def one_block(key):
        k1, k2, k3 = jax.random.split(key, 3)
        top = jax.random.randint(k1, (), 0, grid.h + 1 - bh)
        left = jax.random.randint(k2, (), 0, grid.w + 1 - bw)
        start = jax.random.randint(k3, (), 0, grid.t + 1 - bt)
        return (
            (tt >= start) & (tt < start + bt)
            & (hh >= top) & (hh < top + bh)
            & (ww >= left) & (ww < left + bw)
        )

    keys = jax.random.split(rng, spec.num_blocks)
    blocks = jax.vmap(one_block)(keys)
    union = jnp.any(blocks, axis=0)
    # Context may only span the first max_temporal_keep frames; later frames
    # are always predicted (reference multiblock3d.py:148-150).
    ctx_dur = max(1, int(grid.t * spec.max_temporal_keep))
    if ctx_dur < grid.t:
        union = union | (tt >= ctx_dur)
    return union


def sample_masks(
    rng: jax.Array,
    batch_size: int,
    spec: MaskSpec,
    grid: MaskGrid,
    k_enc: int,
    k_pred: int,
):
    """Fixed-K on-device mask sampling. Returns ([B,K_enc], [B,K_pred]) int32.

    Indices are sorted ascending (matches the reference's argwhere order so
    pos-embed gathers line up the same way).
    """
    k_geom, k_place = jax.random.split(rng)
    bt, bh, bw = _sample_block_size(k_geom, spec, grid)
    ctx_dur = max(1, int(grid.t * spec.max_temporal_keep))
    late = (
        jax.lax.broadcasted_iota(jnp.int32, (grid.t, grid.h, grid.w), 0) >= ctx_dur
    ).reshape(-1)

    def per_sample(key):
        k_blocks, k_noise = jax.random.split(key)
        union = _rasterize_union(k_blocks, bt, bh, bw, spec, grid).reshape(-1)
        noise = jax.random.uniform(k_noise, (grid.n,))
        # Target selection priority: frames past max_temporal_keep (which the
        # reference always predicts) > block-union tokens > random fill; ties
        # broken uniformly. Exactly k_pred tokens — when the sampled union is
        # larger it gets subsampled (the analogue of the reference's
        # batch-min truncation), when smaller it's topped up at random.
        pred_score = 2.0 * late.astype(jnp.float32) + union.astype(jnp.float32) + noise
        _, pred_idx = jax.lax.top_k(pred_score, k_pred)
        # Context comes strictly from the complement of the *selected* target
        # set, so enc/pred never overlap and no target leaks into context.
        in_pred = jnp.zeros((grid.n,), jnp.float32).at[pred_idx].set(1.0)
        enc_score = 2.0 * (1.0 - in_pred) + noise
        _, enc_idx = jax.lax.top_k(enc_score, k_enc)
        return jnp.sort(enc_idx).astype(jnp.int32), jnp.sort(pred_idx).astype(jnp.int32)

    keys = jax.random.split(k_place, batch_size)
    return jax.vmap(per_sample)(keys)


def sample_masks_for_specs(
    rng: jax.Array,
    step,
    batch_size: int,
    specs: Sequence[MaskSpec],
    grid: MaskGrid,
    keep_counts: Sequence[Tuple[int, int]],
):
    """All mask configs for one train step (step folds into the key)."""
    base = jax.random.fold_in(rng, step) if step is not None else rng
    masks_enc, masks_pred = [], []
    for i, (spec, (ke, kp)) in enumerate(zip(specs, keep_counts)):
        me, mp = sample_masks(jax.random.fold_in(base, i), batch_size, spec, grid, ke, kp)
        masks_enc.append(me)
        masks_pred.append(mp)
    return masks_enc, masks_pred


# --------------------------------------------------------------------------
# Host parity collator (reference-distribution masks, numpy)
# --------------------------------------------------------------------------


class HostMaskGenerator:
    """Reference-distribution mask generator for one spec (host, numpy).

    Semantics mirror reference multiblock3d.py:66-203: per-step shared block
    size from a counter-seeded RNG, per-sample union of num_blocks blocks,
    empty-context rejection, batch-min truncation to rectangular [B, K].
    """

    def __init__(self, spec: MaskSpec, grid: MaskGrid, seed: int = 0):
        self.spec = spec
        self.grid = grid
        self.seed = seed
        self._counter = -1

    def step(self) -> int:
        self._counter += 1
        return self._counter

    def _block_size(self, rng: np.random.Generator):
        g, s = self.grid, self.spec
        t_scale = s.temporal_scale[0] + rng.random() * (s.temporal_scale[1] - s.temporal_scale[0])
        t = max(1, int(g.t * t_scale))
        s_scale = s.spatial_scale[0] + rng.random() * (s.spatial_scale[1] - s.spatial_scale[0])
        num_keep = int(g.h * g.w * s_scale)
        ar = s.aspect_ratio[0] + rng.random() * (s.aspect_ratio[1] - s.aspect_ratio[0])
        h = min(int(round(math.sqrt(num_keep * ar))), g.h)
        w = min(int(round(math.sqrt(num_keep / ar))), g.w)
        return t, max(1, h), max(1, w)

    def __call__(self, batch_size: int, chunk: int = 0, _it: Optional[int] = None):
        """One per-GPU-batch collate. ``chunk`` identifies the global device
        whose batch this is: the block SIZE is shared across chunks (the
        reference's counter-seeded shared rng, multiblock3d.py:96-104) while
        per-sample placements draw from a chunk-keyed stream (the reference's
        per-rank worker rng) — so samples get i.i.d. masks across devices
        instead of rank-duplicated ones, identically for any process
        topology. chunk=0 preserves the historical single-stream key."""
        g, s = self.grid, self.spec
        it = self.step() if _it is None else _it
        rng_shared = np.random.default_rng((self.seed, it))
        bt, bh, bw = self._block_size(rng_shared)
        key = (self.seed, it, 1) if chunk == 0 else (self.seed, it, 1, chunk)
        rng = np.random.default_rng(key)

        ctx_dur = max(1, int(g.t * s.max_temporal_keep))
        encs, preds = [], []
        min_enc, min_pred = g.n, g.n
        for _ in range(batch_size):
            while True:
                keep = np.ones((g.t, g.h, g.w), dtype=bool)
                for _ in range(s.num_blocks):
                    top = rng.integers(0, g.h - bh + 1)
                    left = rng.integers(0, g.w - bw + 1)
                    start = rng.integers(0, g.t - bt + 1)
                    keep[start : start + bt, top : top + bh, left : left + bw] = False
                if ctx_dur < g.t:
                    keep[ctx_dur:] = False
                flat = keep.reshape(-1)
                enc_idx = np.flatnonzero(flat)
                if enc_idx.size:
                    break
            pred_idx = np.flatnonzero(~flat)
            encs.append(enc_idx)
            preds.append(pred_idx)
            min_enc = min(min_enc, enc_idx.size)
            min_pred = min(min_pred, pred_idx.size)

        if s.max_keep is not None:
            min_enc = min(min_enc, int(s.max_keep))
        enc = np.stack([e[:min_enc] for e in encs]).astype(np.int32)
        pred = np.stack([p[:min_pred] for p in preds]).astype(np.int32)
        return enc, pred


class MaskCollator:
    """Host-side multi-spec collator (parity mode).

    __call__(batch_size) -> (masks_enc per spec, masks_pred per spec), the
    same protocol as the reference collator minus the torch batch collation
    (batching is the data pipeline's job here).
    """

    def __init__(self, specs: Sequence[MaskSpec], grid: MaskGrid, seed: int = 0):
        self.generators = [HostMaskGenerator(sp, grid, seed) for sp in specs]

    def step(self):
        for gen in self.generators:
            gen.step()

    def set_step(self, step: int):
        """O(1) resume (the reference replays its shared counter instead)."""
        for gen in self.generators:
            gen._counter = step - 1

    def __call__(self, batch_size: int):
        out_e, out_p = [], []
        for gen in self.generators:
            e, p = gen(batch_size)
            out_e.append(e)
            out_p.append(p)
        return out_e, out_p

    def collate_chunks(self, batch_size: int, n_chunks: int):
        """``n_chunks`` independent per-device collates of ``batch_size``
        samples each (the reference's per-GPU collate_fn granularity), one
        shared counter step. Returns per-spec LISTS of [batch_size, K_c]
        chunks — every chunk has its own batch-min K, exactly like the
        reference's per-rank batches. Deterministic in (seed, step, chunk),
        so any process topology sees the same global mask batch."""
        out_e, out_p = [], []
        for gen in self.generators:
            it = gen.step()
            es, ps = [], []
            for c in range(n_chunks):
                e, p = gen(batch_size, chunk=c, _it=it)
                es.append(e)
                ps.append(p)
            out_e.append(es)
            out_p.append(ps)
        return out_e, out_p
