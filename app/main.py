"""Local pretrain launcher: `python -m app.main --fname cfg.yaml`.

Reference-shaped CLI (reference: app/main.py) with the TPU process model:
ONE process per host drives all local chips through the sharded jit step —
there is no per-device process spawn or CUDA_VISIBLE_DEVICES pinning. The
--devices flag selects the JAX platform (e.g. `cpu` for a local smoke run,
optionally with a virtual device count for mesh debugging).
"""

from __future__ import annotations

import argparse
import os


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--fname", type=str, required=True, help="experiment yaml")
    p.add_argument(
        "--devices", type=str, default=None,
        help="JAX platform override, e.g. 'cpu' or 'cpu:8' (8 virtual host devices)",
    )
    return p.parse_args()


def apply_device_flag(devices: str):
    if devices is None:
        return
    plat, _, count = devices.partition(":")
    os.environ["JAX_PLATFORMS"] = plat
    if count:
        flags = os.environ.get("XLA_FLAGS", "")
        os.environ["XLA_FLAGS"] = f"{flags} --xla_force_host_platform_device_count={count}".strip()


def main():
    args = parse_args()
    apply_device_flag(args.devices)

    from jepa_tpu.apps.scaffold import main as app_main
    from jepa_tpu.configs import load_config
    from jepa_tpu.utils.logging import get_logger

    cfg = load_config(args.fname)
    logger = get_logger(rank=0)
    logger.info("loaded config %s", args.fname)
    app_main(cfg.get("app", "vjepa"), args=cfg)


if __name__ == "__main__":
    main()
