"""Eval launcher: `python -m evals.main --fname configs/evals/<cfg>.yaml`.

Reference-shaped CLI (reference: evals/main.py); one process per host.
"""

from __future__ import annotations

import argparse
import os


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--fname", type=str, required=True, help="eval yaml")
    p.add_argument(
        "--devices", type=str, default=None,
        help="JAX platform override, e.g. 'cpu' or 'cpu:8'",
    )
    return p.parse_args()


def main():
    args = parse_args()
    if args.devices:
        from app.main import apply_device_flag

        apply_device_flag(args.devices)

    from jepa_tpu.configs import load_config
    from jepa_tpu.evals.scaffold import main as eval_main
    from jepa_tpu.utils.logging import get_logger

    cfg = load_config(args.fname)
    get_logger(rank=0).info("loaded eval config %s", args.fname)
    eval_main(cfg.get("eval_name"), args_eval=cfg)


if __name__ == "__main__":
    main()
