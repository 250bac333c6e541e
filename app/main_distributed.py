"""Cluster pretrain launcher: `python -m app.main_distributed --fname cfg.yaml`.

The reference submits SLURM job arrays through submitit with one task per
GPU (reference: app/main_distributed.py). TPU-native launch is one process
per HOST; this launcher supports:

  * SLURM (`--partition ...`): writes an sbatch script with
    `nodes`/`tasks_per_node=1` from the config and submits it; each task
    calls back into this module, where jax.distributed picks up SLURM env.
  * in-cluster execution (no --partition, SLURM_PROCID set): runs the app
    directly after jax.distributed init.
  * batch-launch: --fname may name a YAML containing a list of config paths,
    submitted as a job array (reference :116-131).

Preemption/timeout resilience comes from sbatch --requeue + auto-resume:
the app always resumes from <tag>-latest when it exists (the reference's
resume_preempt path).
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

import yaml


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--fname", type=str, required=True)
    p.add_argument("--partition", type=str, default=None, help="SLURM partition to submit to")
    p.add_argument("--time", type=int, default=4300, help="time limit (minutes)")
    p.add_argument("--account", type=str, default=None)
    return p.parse_args()


def _expand_configs(fname: str):
    with open(fname) as f:
        cfg = yaml.safe_load(f)
    if isinstance(cfg, list):  # batch-launch: list of config paths
        return list(cfg)
    return [fname]


SBATCH_TEMPLATE = """#!/bin/bash
#SBATCH --job-name=jepa_tpu
#SBATCH --nodes={nodes}
#SBATCH --ntasks-per-node=1
#SBATCH --cpus-per-task={cpus}
#SBATCH --time={time}
#SBATCH --requeue
{account_line}{partition_line}
export MASTER_ADDR=$(scontrol show hostnames $SLURM_JOB_NODELIST | head -n1)
export MASTER_PORT=37123
srun python -m app.main_distributed --fname {config}
"""


def submit(config: str, args):
    with open(config) as f:
        cfg = yaml.safe_load(f)
    nodes = int(cfg.get("nodes", 1))
    script = SBATCH_TEMPLATE.format(
        nodes=nodes,
        cpus=int(cfg.get("data", {}).get("num_workers", 12)),
        time=args.time,
        account_line=f"#SBATCH --account={args.account}\n" if args.account else "",
        partition_line=f"#SBATCH --partition={args.partition}\n" if args.partition else "",
        config=config,
    )
    path = f"/tmp/jepa_tpu_submit_{os.getpid()}.sbatch"
    with open(path, "w") as f:
        f.write(script)
    print(f"submitting {config} ({nodes} nodes)")
    subprocess.run(["sbatch", path], check=True)


def run_in_cluster(config: str):
    from jepa_tpu.apps.scaffold import main as app_main
    from jepa_tpu.configs import load_config

    cfg = load_config(config)
    resume_preempt = os.environ.get("SLURM_RESTART_COUNT", "0") != "0"
    app_main(cfg.get("app", "vjepa"), args=cfg, resume_preempt=resume_preempt)


def main():
    args = parse_args()
    configs = _expand_configs(args.fname)
    if args.partition:
        for c in configs:
            submit(c, args)
        return
    if len(configs) != 1:
        print("batch launch requires --partition", file=sys.stderr)
        sys.exit(1)
    run_in_cluster(configs[0])


if __name__ == "__main__":
    main()
