"""Multi-host runtime initialization.

Counterpart of the reference's ``setup()`` (generate.py:41-52), which
initializes a gloo/NCCL process group and then *exits every rank but 0*
("we don't support parallel inference yet"). The TPU-native version actually
supports multi-host execution: ``jax.distributed.initialize`` joins the
JAX runtime across hosts (ICI within a slice, DCN across slices), after
which every host participates in the same SPMD programs via the mesh in
``layerskip_tpu.parallel.mesh``.
"""

from __future__ import annotations

import logging
from typing import Optional

import jax

log = logging.getLogger(__name__)


def setup(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    seed: int = 42,
) -> None:
    """Join the multi-host JAX runtime (no-op for single-process runs).

    On TPU pods the three arguments are discovered from the environment
    automatically; pass them explicitly for non-TPU multi-process setups.
    Unlike the reference, non-zero processes do NOT exit — SPMD needs them.
    """
    import random

    import numpy as np

    if num_processes is not None and num_processes > 1 or coordinator_address:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        log.info(
            "joined distributed runtime: process %d/%d, %d local / %d global devices",
            jax.process_index(), jax.process_count(),
            jax.local_device_count(), jax.device_count(),
        )
    random.seed(seed)
    np.random.seed(seed)


def is_coordinator() -> bool:
    return jax.process_index() == 0
