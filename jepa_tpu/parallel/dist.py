"""Multi-host runtime initialization (replaces reference NCCL setup).

The reference builds a NCCL process group from SLURM env vars with a
hand-rolled rendezvous (reference: src/utils/distributed.py:18-47). On TPU
the runtime is jax.distributed: one process per host, coordinator address
from the environment, every collective compiled into the jitted program.
Single-process use needs no initialization at all — same graceful fallback
the reference has.
"""

from __future__ import annotations

import logging
import os
from typing import Optional, Tuple

import jax

logger = logging.getLogger(__name__)


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Tuple[int, int]:
    """Initialize multi-host JAX if a cluster environment is detected.

    Resolution order: explicit args > TPU/GKE auto-detection (jax handles
    MEGASCALE/TPU metadata) > SLURM env (SLURM_NTASKS/SLURM_PROCID, the
    reference's scheme) > single-process fallback.

    Returns (world_size, rank).
    """
    try:
        if coordinator_address or num_processes:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        elif os.environ.get("SLURM_NTASKS") and int(os.environ["SLURM_NTASKS"]) > 1:
            host = os.environ.get("MASTER_ADDR") or os.environ.get("HOSTNAME", "localhost")
            port = int(os.environ.get("MASTER_PORT", 37123))
            jax.distributed.initialize(
                coordinator_address=f"{host}:{port}",
                num_processes=int(os.environ["SLURM_NTASKS"]),
                process_id=int(os.environ["SLURM_PROCID"]),
            )
        elif os.environ.get("MEGASCALE_COORDINATOR_ADDRESS") or os.environ.get("TPU_WORKER_HOSTNAMES"):
            jax.distributed.initialize()  # auto-detected TPU pod env
    except Exception as e:  # single-host / already initialized
        logger.info("distributed init skipped: %s", e)
    return jax.process_count(), jax.process_index()
