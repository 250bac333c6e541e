"""Checkpoint save/restore (orbax) + replay-free resume.

Replaces the reference's torch.save monolith + scheduler replay
(reference: app/vjepa/train.py:328-346, app/vjepa/utils.py:28-83,
train.py:322-326). State is a pytree carrying its own step counter, and
every schedule is a pure function of that counter, so restore is O(1).

Layout: <folder>/<tag>-latest/ (orbax dir) plus optional <tag>-e{N}/
snapshots; rank 0 writes (multi-host orbax handles distributed arrays).
Loading is tolerant: a missing checkpoint returns the input state with a
warning, like the reference's try/except-epoch-0 behavior.
"""

from __future__ import annotations

import logging
import os
from typing import Any, Optional, Tuple

import jax
import numpy as np

logger = logging.getLogger(__name__)


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(folder: str, tag: str, state: Any, epoch: int,
                    save_every_freq: int = -1, keep_latest: bool = True):
    """Write <tag>-latest (+ optional epoch snapshot)."""
    import orbax.checkpoint as ocp

    ckpt = _checkpointer()
    meta = dict(state)
    meta["epoch"] = np.int32(epoch)
    if keep_latest:
        path = os.path.join(os.path.abspath(folder), f"{tag}-latest")
        ckpt.save(path, meta, force=True)
    if save_every_freq > 0 and epoch % save_every_freq == 0:
        path = os.path.join(os.path.abspath(folder), f"{tag}-e{epoch}")
        if not os.path.exists(path):
            ckpt.save(path, meta)
    logger.info("saved checkpoint at epoch %d", epoch)


def load_subtree(path: str, template: Any) -> Any:
    """STRICTLY restore the subset ``template`` from an orbax checkpoint.

    orbax's ``partial_restore`` silently returns template leaves untouched
    when the on-disk tree lacks them, and ignores template shapes — so a
    wrong template would hand back random init while looking like success
    (the round-1 eval bug). Every requested leaf is validated against the
    checkpoint metadata first; missing paths or shape mismatches raise.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    if not os.path.exists(path):
        raise FileNotFoundError(f"no checkpoint at {path}")
    ckptr = _checkpointer()
    meta_tree = ckptr.metadata(path).item_metadata.tree
    for keypath, leaf in jax.tree_util.tree_flatten_with_path(template)[0]:
        node = meta_tree
        for k in keypath:
            key = getattr(k, "key", getattr(k, "idx", None))
            if not isinstance(node, dict) or key not in node:
                raise KeyError(
                    f"checkpoint {path} has no leaf "
                    f"{jax.tree_util.keystr(keypath)} (template/checkpoint mismatch)"
                )
            node = node[key]
        want, got = tuple(np.shape(leaf)), tuple(node.shape)
        if want != got:
            raise ValueError(
                f"shape mismatch at {jax.tree_util.keystr(keypath)}: "
                f"checkpoint {got} vs template {want}"
            )
    return ckptr.restore(
        path, args=ocp.args.PyTreeRestore(item=template, partial_restore=True)
    )


def load_checkpoint(folder: str, tag: str, state: Any,
                    read_path: Optional[str] = None) -> Tuple[Any, int]:
    """Restore (state, epoch); tolerant of missing/corrupt checkpoints."""
    path = read_path or os.path.join(os.path.abspath(folder), f"{tag}-latest")
    if not os.path.exists(path):
        logger.info("no checkpoint at %s; starting fresh", path)
        return state, 0
    try:
        template = dict(state)
        template["epoch"] = np.int32(0)
        restored = _checkpointer().restore(path, item=template)
        epoch = int(restored.pop("epoch"))
        # keep the restored arrays on the same shardings as the template
        restored = jax.tree.map(lambda t, r: jax.device_put(r, getattr(t, "sharding", None))
                                if hasattr(t, "sharding") else r, state, restored)
        logger.info("restored checkpoint from %s (epoch %d)", path, epoch)
        return restored, epoch
    except Exception as e:
        logger.warning("failed to load checkpoint %s: %s", path, e)
        return state, 0
