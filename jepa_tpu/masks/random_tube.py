"""Random-tube masking (VideoMAE style): a random spatial keep-set tiled
across all time steps (reference: src/masks/random_tube.py:96-106).

Naturally fixed-K (the reference keeps exactly int(HW*(1-ratio)) spatial
positions), so the on-device generator is exact, not an approximation.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jepa_tpu.masks.multiblock3d import MaskGrid


@dataclasses.dataclass(frozen=True)
class TubeSpec:
    ratio: float = 0.9

    @staticmethod
    def from_cfg(m: dict) -> "TubeSpec":
        return TubeSpec(ratio=float(m.get("ratio", 0.9)))


def keep_counts(spec: TubeSpec, grid: MaskGrid) -> Tuple[int, int]:
    n_spatial = grid.h * grid.w
    keep_spatial = int(n_spatial * (1.0 - spec.ratio))
    k_enc = keep_spatial * grid.t
    return k_enc, grid.n - k_enc


def sample_tube_masks(rng: jax.Array, batch_size: int, spec: TubeSpec, grid: MaskGrid):
    """On-device: ([B, K_enc], [B, K_pred]) int32, sorted ascending."""
    n_spatial = grid.h * grid.w
    keep_spatial = int(n_spatial * (1.0 - spec.ratio))

    def per_sample(key):
        perm = jax.random.permutation(key, n_spatial)
        keep = jnp.sort(perm[:keep_spatial])
        drop = jnp.sort(perm[keep_spatial:])
        t_off = (jnp.arange(grid.t, dtype=jnp.int32) * n_spatial)[:, None]
        enc = (keep[None, :] + t_off).reshape(-1)
        pred = (drop[None, :] + t_off).reshape(-1)
        return enc.astype(jnp.int32), pred.astype(jnp.int32)

    keys = jax.random.split(rng, batch_size)
    return jax.vmap(per_sample)(keys)


class TubeMaskCollator:
    """Host-side parity collator (same counter-step protocol as MB3D)."""

    def __init__(self, specs: Sequence[TubeSpec], grid: MaskGrid, seed: int = 0):
        self.specs = list(specs)
        self.grid = grid
        self.seed = seed
        self._counter = -1

    def step(self):
        self._counter += 1

    def set_step(self, step: int):
        self._counter = step - 1

    def _chunk(self, batch_size: int, chunk: int):
        out_e, out_p = [], []
        g = self.grid
        n_spatial = g.h * g.w
        for i, spec in enumerate(self.specs):
            # chunk-keyed stream (chunk 0 keeps the historical key): tube
            # masks are i.i.d. per device instead of rank-duplicated
            key = ((self.seed, self._counter, i) if chunk == 0
                   else (self.seed, self._counter, i, chunk))
            rng = np.random.default_rng(key)
            keep_spatial = int(n_spatial * (1.0 - spec.ratio))
            encs, preds = [], []
            for _ in range(batch_size):
                perm = rng.permutation(n_spatial)
                keep = np.sort(perm[:keep_spatial])
                drop = np.sort(perm[keep_spatial:])
                t_off = (np.arange(g.t) * n_spatial)[:, None]
                encs.append((keep[None] + t_off).reshape(-1))
                preds.append((drop[None] + t_off).reshape(-1))
            out_e.append(np.stack(encs).astype(np.int32))
            out_p.append(np.stack(preds).astype(np.int32))
        return out_e, out_p

    def __call__(self, batch_size: int):
        self.step()
        return self._chunk(batch_size, 0)

    def collate_chunks(self, batch_size: int, n_chunks: int):
        """Per-device chunked collation (see MaskCollator.collate_chunks);
        tube masks are exact-K so every chunk shares one shape."""
        self.step()
        chunks = [self._chunk(batch_size, c) for c in range(n_chunks)]
        out_e = [[ch[0][s] for ch in chunks] for s in range(len(self.specs))]
        out_p = [[ch[1][s] for ch in chunks] for s in range(len(self.specs))]
        return out_e, out_p
