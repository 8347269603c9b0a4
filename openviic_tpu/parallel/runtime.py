"""Multi-host runtime initialisation.

The reference has no distributed communication at all (SURVEY.md §2.2).
Here: ``initialize_distributed()`` brings up ``jax.distributed`` when a
multi-process environment is detected (TPU pod env vars or explicit
coordinator settings) and is a no-op in single-process runs, so the same
entry points work everywhere.  Within a slice the collectives ride ICI;
across slices XLA routes them over DCN — all expressed through the one
Mesh in parallel/mesh.py.
"""

from __future__ import annotations

import os
from typing import Optional

from openviic_tpu.utils import setup_logger

logger = setup_logger()

_initialized = False


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialise jax.distributed if configured; returns True if multi-host."""
    global _initialized
    if _initialized:
        return True

    import jax

    env_coordinator = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    on_pod = any(
        v in os.environ for v in ("TPU_WORKER_HOSTNAMES", "MEGASCALE_COORDINATOR_ADDRESS")
    )
    if not env_coordinator and not on_pod:
        return False

    kwargs = {}
    if env_coordinator:
        kwargs["coordinator_address"] = env_coordinator
    if num_processes is not None or "JAX_NUM_PROCESSES" in os.environ:
        kwargs["num_processes"] = int(
            num_processes
            if num_processes is not None
            else os.environ["JAX_NUM_PROCESSES"]
        )
    if process_id is not None or "JAX_PROCESS_ID" in os.environ:
        kwargs["process_id"] = int(
            process_id if process_id is not None else os.environ["JAX_PROCESS_ID"]
        )

    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:
        # backend already initialised (or single-process despite env hints)
        logger.warning("jax.distributed.initialize skipped: %s", e)
        return False
    _initialized = True
    logger.info(
        "jax.distributed initialised: process %d/%d, %d local / %d global devices",
        jax.process_index(),
        jax.process_count(),
        jax.local_device_count(),
        jax.device_count(),
    )
    return True
