"""Multi-host / multi-slice initialization.

The reference's only distribution backend is dormant accelerate/NCCL
scaffolding (``generate_data.py:825-830,543``; never exercised by the
published scripts). The TPU-native equivalent is the XLA runtime itself:
``jax.distributed.initialize`` joins hosts, after which every mesh in this
package spans the global device set — expansion shards its batch axis over
all chips (ICI within a slice, DCN across slices; no collectives are needed
during generation, and training's gradient psum rides ICI).
"""

from __future__ import annotations

import logging
from typing import Optional

import jax

log = logging.getLogger("distdiff.distributed")


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join a multi-host run. No-ops on a single host with no coordinator
    (the common single-slice case needs nothing)."""
    if coordinator_address is None and num_processes in (None, 1):
        log.info("single-process run: %d local devices", jax.local_device_count())
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    log.info(
        "joined distributed run: process %d/%d, %d global devices",
        jax.process_index(), jax.process_count(), jax.device_count(),
    )


def is_main_process() -> bool:
    return jax.process_index() == 0
