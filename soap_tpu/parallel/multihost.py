"""Multi-host orchestration: static chunk assignment + scratch combine.

The reference dispatches chunks to MPI compute nodes dynamically from a
master thread (``SOAP/core/task_queue.py:63-216``).  The TPU-native
replacement is deterministic: every host computes the same Peano chunk
decomposition, takes the chunk subset ``chunk_nr % host_count ==
host_index`` (round-robin over the Hilbert order balances both halo
counts and spatial locality), writes per-chunk scratch files, and any
host (or a follow-up job) runs the combine step over the shared scratch
directory — the same restart-from-scratch machinery doubles as the
inter-host hand-off, so no inter-host communication is needed during the
compute phase at all.

Under ``jax.distributed`` the host index/count default to
``jax.process_index()/process_count()``; standalone they come from
arguments or the SLURM environment.
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np


def detect_host_rank() -> Tuple[int, int]:
    """(host_index, host_count) from jax.distributed or SLURM, else (0, 1)."""
    try:
        import jax

        if jax.process_count() > 1:
            return jax.process_index(), jax.process_count()
    except Exception:
        pass
    if "SLURM_PROCID" in os.environ and "SLURM_NTASKS" in os.environ:
        return int(os.environ["SLURM_PROCID"]), int(os.environ["SLURM_NTASKS"])
    return 0, 1


def chunks_for_host(
    nr_chunks: int, host_index: int, host_count: int
) -> List[int]:
    """Round-robin chunk subset for one host."""
    return [c for c in range(nr_chunks) if c % host_count == host_index]


def combine_scratch(
    scratch_dir: str,
    specs,
    n_halos: int,
) -> dict:
    """Merge all finished chunk scratch files into full result arrays.

    Raises if any chunk is missing or incomplete — the combine phase runs
    only after every host finished its share (reference analogue:
    ``combine_chunks.py`` requires all chunk files present).
    """
    import h5py

    merged: dict = {}
    chunk_files = sorted(
        f for f in os.listdir(scratch_dir)
        if f.startswith("chunk_") and f.endswith(".hdf5")
    )
    if not chunk_files:
        raise FileNotFoundError(f"no chunk scratch files in {scratch_dir}")
    covered = np.zeros(n_halos, dtype=bool)
    for fname in chunk_files:
        with h5py.File(os.path.join(scratch_dir, fname), "r") as f:
            if not f.attrs.get("Write complete", False):
                raise RuntimeError(f"incomplete scratch file {fname}")
            rows = f["rows"][...]
            covered[rows] = True
            for spec in specs:
                grp = merged.setdefault(spec.group, {})
                for key in spec.keys:
                    arr = f[f"{spec.group}/{key}"][...]
                    if key not in grp:
                        grp[key] = np.zeros((n_halos,) + arr.shape[1:], arr.dtype)
                    grp[key][rows] = arr
    if not covered.all():
        missing = int((~covered).sum())
        raise RuntimeError(
            f"{missing} halos not covered by scratch files — "
            "some hosts have not finished"
        )
    return merged
