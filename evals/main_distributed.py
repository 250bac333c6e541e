"""Cluster eval launcher (SLURM), mirroring app/main_distributed.py
(reference: evals/main_distributed.py). Submits one task per host; in-job
it runs the eval directly with jax.distributed from SLURM env."""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

import yaml


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--fname", type=str, required=True)
    p.add_argument("--partition", type=str, default=None)
    p.add_argument("--time", type=int, default=4300)
    p.add_argument("--account", type=str, default=None)
    return p.parse_args()


SBATCH_TEMPLATE = """#!/bin/bash
#SBATCH --job-name=jepa_tpu_eval
#SBATCH --nodes={nodes}
#SBATCH --ntasks-per-node=1
#SBATCH --cpus-per-task={cpus}
#SBATCH --time={time}
#SBATCH --requeue
{account_line}{partition_line}
export MASTER_ADDR=$(scontrol show hostnames $SLURM_JOB_NODELIST | head -n1)
export MASTER_PORT=37124
srun python -m evals.main_distributed --fname {config}
"""


def main():
    args = parse_args()
    with open(args.fname) as f:
        cfg = yaml.safe_load(f)
    configs = cfg if isinstance(cfg, list) else [args.fname]
    if args.partition:
        for c in configs:
            with open(c) as f:
                ccfg = yaml.safe_load(f)
            script = SBATCH_TEMPLATE.format(
                nodes=int(ccfg.get("nodes", 1)),
                cpus=int(ccfg.get("data", {}).get("num_workers", 12)),
                time=args.time,
                account_line=f"#SBATCH --account={args.account}\n" if args.account else "",
                partition_line=f"#SBATCH --partition={args.partition}\n",
                config=c,
            )
            path = f"/tmp/jepa_tpu_eval_{os.getpid()}.sbatch"
            with open(path, "w") as f:
                f.write(script)
            subprocess.run(["sbatch", path], check=True)
        return
    if len(configs) != 1:
        print("batch launch requires --partition", file=sys.stderr)
        sys.exit(1)
    from jepa_tpu.configs import load_config
    from jepa_tpu.evals.scaffold import main as eval_main

    ecfg = load_config(configs[0])
    resume_preempt = os.environ.get("SLURM_RESTART_COUNT", "0") != "0"
    eval_main(ecfg.get("eval_name"), args_eval=ecfg, resume_preempt=resume_preempt)


if __name__ == "__main__":
    main()
