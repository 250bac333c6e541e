"""Static-shape padding for host-generated (parity-mode) masks.

The reference's batch-min truncation yields a different K per iteration;
jit needs one shape. `pad_masks` pads index tensors up to a static cap and
returns a validity weight the encoder (kv_mask) and loss (masked_mean)
consume — verified numerically equivalent to true truncation in
tests/test_model_parity.py::test_padded_mask_equals_truncated_mask.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def pad_masks(idx: np.ndarray, cap: int) -> Tuple[np.ndarray, np.ndarray]:
    """[B, K] indices -> ([B, cap] indices, [B, cap] float validity).

    Padding repeats index 0 with weight 0. K > cap TRUNCATES to the first
    cap indices — the exact semantics of the reference's max_keep truncation
    (reference multiblock3d.py:196: ascending-order `[:min_keep]` slice), so
    a heavier-than-cap mask degrades gracefully instead of killing a
    mid-training step (the caps are distribution-typical, not worst-case).
    """
    b, k = idx.shape
    if k > cap:
        idx = idx[:, :cap]
        k = cap
    out = np.zeros((b, cap), dtype=np.int32)
    out[:, :k] = idx
    w = np.zeros((b, cap), dtype=np.float32)
    w[:, :k] = 1.0
    return out, w


def static_cap(n_tokens: int, frac: float, multiple: int = 128) -> int:
    """A cap sized to a coverage fraction, rounded up to a lane multiple."""
    cap = int(np.ceil(n_tokens * frac / multiple) * multiple)
    return min(max(cap, multiple), n_tokens)
