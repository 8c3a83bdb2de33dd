"""Multi-host (DCN) scaling helpers.

The single-slice story (ICI) lives in parallel/mesh.py: frames over "data",
rows over "space". Across hosts the economical pattern for VQA is a *batch
sweep* — whole clips are independent, so each host scores its own clip list
and only tiny score summaries cross DCN (SURVEY.md section 2.4/5.8: the
reference has no distributed backend at all; clip-level parallelism is the
TPU-native equivalent of running several app instances).

``initialize()`` wires jax.distributed for a multi-host slice when the
standard coordinator env vars are present, and is a no-op otherwise, so the
same code path runs from a laptop to a pod."""

from __future__ import annotations

import logging
import os
from typing import Dict, List, Optional, Sequence

import jax

logger = logging.getLogger(__name__)


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Initialise jax.distributed if configured; returns True when multi-host.

    Resolution order: explicit args > JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID env > single-host no-op.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if not coordinator_address:
        return False
    num_processes = num_processes or int(os.environ.get("JAX_NUM_PROCESSES", 1))
    process_id = process_id if process_id is not None else int(
        os.environ.get("JAX_PROCESS_ID", 0)
    )
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    logger.info(
        "jax.distributed up: process %d/%d, %d local / %d global devices",
        process_id, num_processes,
        jax.local_device_count(), jax.device_count(),
    )
    return True


def shard_clip_list(clips: Sequence, process_id: Optional[int] = None,
                    num_processes: Optional[int] = None) -> List:
    """Static round-robin assignment of independent clips to this host —
    the DCN-level work split for batch sweeps (no cross-host traffic until
    the final summary gather)."""
    if process_id is None:
        process_id = jax.process_index()
    if num_processes is None:
        num_processes = jax.process_count()
    return [c for i, c in enumerate(clips) if i % num_processes == process_id]


def gather_summaries(local_summaries: List[Dict]) -> List[Dict]:
    """All-gather per-clip summary dicts across hosts (tiny payloads).

    Single-host: identity. Multi-host: via
    jax.experimental.multihost_utils.process_allgather on a JSON side
    channel — summaries are small; DCN cost is negligible."""
    if jax.process_count() == 1:
        return list(local_summaries)
    import json

    import numpy as np
    from jax.experimental import multihost_utils

    payload = json.dumps(local_summaries).encode()
    n = np.int32(len(payload))
    max_n = int(multihost_utils.process_allgather(n).max())
    buf = np.zeros(max_n, dtype=np.uint8)
    buf[: len(payload)] = np.frombuffer(payload, dtype=np.uint8)
    lens = multihost_utils.process_allgather(n)
    bufs = multihost_utils.process_allgather(buf)
    out: List[Dict] = []
    for i in range(jax.process_count()):
        raw = bytes(bufs[i][: int(lens[i])])
        out.extend(json.loads(raw))
    return out
