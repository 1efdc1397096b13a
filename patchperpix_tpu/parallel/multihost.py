"""Multi-host (DCN) sample fan-out.

The reference parallelizes over samples with an mp.Pool on one machine
(run_ppp.py:1070-1081) and over GPUs with JSON offset lists
(offsets.py:33-122).  The TPU-native translation (SURVEY §2.6): data-
parallel *training* scales over ICI via the mesh in train/trainer.py;
*inference/assembly* scales over hosts by deterministically partitioning
the sample list per process - each host runs its subset against the shared
filesystem (zarr/hdf results are single-writer per sample, so no
coordination beyond the partition is needed), exactly the reference's
skip-if-exists resume contract.

Launch N processes with jax.distributed (or plain multi-process against
disjoint JAX_PROCESS_INDEX env), all pointing at the same experiment
folder; every stage then processes samples where
``owns_sample(i)`` is true.
"""

from __future__ import annotations

import os


def process_identity() -> tuple[int, int]:
    """(process_index, process_count) - from jax.distributed when
    initialized, else the PPP_PROCESS_INDEX/PPP_PROCESS_COUNT env vars,
    else (0, 1)."""
    try:
        import jax

        if jax.process_count() > 1:
            return jax.process_index(), jax.process_count()
    except Exception:
        pass
    return (int(os.environ.get("PPP_PROCESS_INDEX", 0)),
            int(os.environ.get("PPP_PROCESS_COUNT", 1)))


def owns_sample(i: int, index: int | None = None,
                count: int | None = None) -> bool:
    """Round-robin ownership of sample ``i`` for this process."""
    if index is None or count is None:
        index, count = process_identity()
    return count <= 1 or i % count == index


def shard_samples(samples, index: int | None = None,
                  count: int | None = None) -> list:
    """The subset of ``samples`` this process owns (deterministic
    round-robin; stable across restarts for resume)."""
    return [s for i, s in enumerate(samples) if owns_sample(i, index, count)]
