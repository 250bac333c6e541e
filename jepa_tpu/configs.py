"""Config loading: the reference's YAML schema, verbatim-compatible.

A single YAML is the entire experiment spec (reference README.md:252-272,
app/vjepa/train.py:72-157 consumes it section-by-section with .get). This
module keeps that contract — `load_config` returns the plain nested dict —
and adds light helpers. jepa_tpu-specific extensions live under existing
sections with new keys (e.g. meta.mask_mode, data.decode_backend) so
reference configs run unchanged.
"""

from __future__ import annotations

import pprint
from typing import Any, Dict

import yaml


def load_config(fname: str) -> Dict[str, Any]:
    with open(fname) as f:
        cfg = yaml.safe_load(f)
    return cfg


def dump_config(cfg: Dict[str, Any], path: str):
    with open(path, "w") as f:
        yaml.dump(cfg, f)


def pretty(cfg: Dict[str, Any]) -> str:
    return pprint.pformat(cfg, width=100)
