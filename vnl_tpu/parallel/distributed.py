"""Multi-host (pod) initialization.

The reference's multi-host story is implicit (jax process topology read
inside brax's trainer, SURVEY.md §2.4).  Here it is explicit: call
initialize() once per process before building the mesh; the flat "data"
axis then spans every chip in the pod, and the trainer's psum/pmean
collectives ride ICI within a slice and DCN across slices.
"""

from __future__ import annotations

import logging
from typing import Optional

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize wrapper; no-op for single-process runs.

    On TPU pods all arguments are auto-detected from the environment;
    explicit values support CPU/GPU multi-process testing.
    """
    if num_processes is not None and num_processes <= 1:
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    except Exception as e:  # already initialized / single host
        logging.info("jax.distributed.initialize skipped: %s", e)
    logging.info("process %d/%d, local devices %d, global devices %d",
                 jax.process_index(), jax.process_count(),
                 jax.local_device_count(), jax.device_count())
