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
import socket
from collections.abc import MutableMapping
from typing import Dict, List, Optional, Tuple

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


class LazyScratchColumns(MutableMapping):
    """One output group's columns, assembled from chunk scratch files
    column-by-column ON ACCESS and never retained.

    The eager combine materializes the whole catalogue — ~10^7 halos x
    ~600 columns is tens of GB.  The reference instead combines in
    <= 100-property batches (``combine_chunks.py:376-404``); this is the
    TPU-native sharpening of that idea: the writer iterates columns one
    at a time, so peak memory is ONE full column plus the per-chunk
    pieces.  Category masks are registered via ``set_mask`` and applied
    at load time instead of forcing materialization.
    """

    def __init__(self, scratch_dir, chunk_rows, group, keys, n_halos):
        self._dir = scratch_dir
        self._chunk_rows = chunk_rows  # {filename: halo rows}
        self._group = group
        self._base_keys = list(keys)
        self._n = n_halos
        self._overlay: Dict[str, np.ndarray] = {}
        self._deleted: set = set()
        self._masks: Dict[str, np.ndarray] = {}

    def set_mask(self, key: str, mask: np.ndarray) -> None:
        """Zero halos failing ``mask`` for this column (applied lazily)."""
        if key in self._masks:
            self._masks[key] = self._masks[key] & mask
        else:
            self._masks[key] = mask

    def _load(self, key: str) -> np.ndarray:
        import h5py

        out = None
        for fname, rows in self._chunk_rows.items():
            with h5py.File(os.path.join(self._dir, fname), "r") as f:
                arr = f[f"{self._group}/{key}"][...]
            if out is None:
                out = np.zeros((self._n,) + arr.shape[1:], arr.dtype)
            out[rows] = arr
        return out

    def __getitem__(self, key: str) -> np.ndarray:
        if key in self._overlay:
            arr = self._overlay[key]
        elif key in self._deleted or key not in self._base_keys:
            raise KeyError(key)
        else:
            arr = self._load(key)
        mask = self._masks.get(key)
        if mask is not None and not mask.all():
            keep = mask.reshape((-1,) + (1,) * (arr.ndim - 1))
            arr = np.where(keep, arr, 0)
        return arr

    def __setitem__(self, key: str, value) -> None:
        self._deleted.discard(key)
        self._overlay[key] = value

    def __delitem__(self, key: str) -> None:
        existed = key in self._overlay or (
            key in self._base_keys and key not in self._deleted
        )
        self._overlay.pop(key, None)
        if not existed:
            raise KeyError(key)
        if key in self._base_keys:
            self._deleted.add(key)

    def __iter__(self):
        for key in self._base_keys:
            if key not in self._deleted and key not in self._overlay:
                yield key
        yield from self._overlay

    def __len__(self) -> int:
        return sum(1 for _ in self)


def check_scratch_complete(scratch_dir: str, specs, n_halos: int) -> None:
    """Raise unless every chunk scratch file is present, complete and
    together covers every halo (the pre-condition for combining)."""
    import h5py

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
            covered[f["rows"][...]] = True
    if not covered.all():
        missing = int((~covered).sum())
        raise RuntimeError(
            f"{missing} halos not covered by scratch files — "
            "some hosts have not finished"
        )


def _lock_holder_alive(path: str) -> bool:
    """True if the ``combine.lock`` at ``path`` belongs to a live
    process ON THIS HOST.  A lock written by another host is always
    treated as live (no cross-host liveness probe exists — the
    conservative choice; the reference has no takeover at all)."""
    try:
        with open(path) as f:
            content = f.read().strip()
        host, _, pidpart = content.partition(" pid=")
        pid = int(pidpart)
    except (OSError, ValueError):
        return True  # unreadable/foreign lock: do not steal
    if host != socket.gethostname():
        return True
    if pid == os.getpid():
        return True
    try:
        os.kill(pid, 0)
        return True
    except ProcessLookupError:
        return False
    except PermissionError:
        return True


def claim_combine(scratch_dir: str) -> bool:
    """Atomically claim the combine+write phase for this process.

    O_CREAT|O_EXCL on ``combine.lock`` — exactly one host of a
    multi-host run wins and writes the output catalogue (the reference
    serializes this on rank 0, ``combine_chunks.py:206-369``).  The
    lock records host/pid; a lock left by a CRASHED combiner on the
    same host (pid no longer alive) is taken over automatically, so a
    retry never wedges on a stale lock.
    """
    path = os.path.join(scratch_dir, "combine.lock")
    for attempt in range(2):
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            if attempt == 0 and not _lock_holder_alive(path):
                # stale local lock: remove and retry the atomic claim
                # (another waiter may win the race — that is fine)
                try:
                    os.unlink(path)
                except FileNotFoundError:
                    pass
                continue
            return False
        with os.fdopen(fd, "w") as f:
            f.write(f"{socket.gethostname()} pid={os.getpid()}\n")
        return True
    return False


def release_combine(scratch_dir: str) -> None:
    """Release a previously claimed combine (failed attempt)."""
    try:
        os.unlink(os.path.join(scratch_dir, "combine.lock"))
    except FileNotFoundError:
        pass


def combine_scratch(
    scratch_dir: str,
    specs,
    n_halos: int,
    lazy: bool = False,
) -> dict:
    """Merge all finished chunk scratch files into full result arrays.

    Raises if any chunk is missing or incomplete — the combine phase runs
    only after every host finished its share (reference analogue:
    ``combine_chunks.py`` requires all chunk files present).

    ``lazy=True`` returns ``{group: LazyScratchColumns}``: validation
    (completeness + halo coverage) happens up front, but column data is
    read per access — the memory-bounded path for production-scale
    catalogues.
    """
    import h5py

    chunk_files = sorted(
        f for f in os.listdir(scratch_dir)
        if f.startswith("chunk_") and f.endswith(".hdf5")
    )
    if not chunk_files:
        raise FileNotFoundError(f"no chunk scratch files in {scratch_dir}")
    covered = np.zeros(n_halos, dtype=bool)
    chunk_rows: Dict[str, np.ndarray] = {}
    # cross-chunk metadata consistency (reference
    # ``core/result_set.py:275-418`` asserts units/dtype/shape agreement
    # across ranks/chunks/nodes): every column must have the same dtype
    # and trailing shape in every scratch file, and every file must come
    # from the same soap_tpu version — scratch produced by different
    # hosts running different code versions must not silently merge
    col_meta: Dict[str, tuple] = {}
    version_seen: Dict[str, str] = {}
    for fname in chunk_files:
        with h5py.File(os.path.join(scratch_dir, fname), "r") as f:
            if not f.attrs.get("Write complete", False):
                raise RuntimeError(f"incomplete scratch file {fname}")
            rows = f["rows"][...]
            ver = f.attrs.get("soap_tpu_version", b"").decode()
            version_seen[fname] = ver
            for spec in specs:
                for key in spec.keys:
                    name = f"{spec.group}/{key}"
                    ds = f[name]
                    meta = (ds.dtype.str, ds.shape[1:])
                    prev = col_meta.setdefault(name, meta)
                    if prev != meta:
                        raise RuntimeError(
                            f"scratch metadata mismatch for {name}: "
                            f"{fname} has dtype/shape {meta}, earlier "
                            f"chunks have {prev}"
                        )
        chunk_rows[fname] = rows
        covered[rows] = True
    if len(set(version_seen.values())) > 1:
        raise RuntimeError(
            "scratch files written by different soap_tpu versions: "
            + ", ".join(f"{k}={v or '?'}" for k, v in version_seen.items())
        )
    if not covered.all():
        missing = int((~covered).sum())
        raise RuntimeError(
            f"{missing} halos not covered by scratch files — "
            "some hosts have not finished"
        )

    if lazy:
        return {
            spec.group: LazyScratchColumns(
                scratch_dir, chunk_rows, spec.group, spec.keys, n_halos
            )
            for spec in specs
        }

    merged: dict = {}
    for fname, rows in chunk_rows.items():
        with h5py.File(os.path.join(scratch_dir, fname), "r") as f:
            for spec in specs:
                grp = merged.setdefault(spec.group, {})
                for key in spec.keys:
                    arr = f[f"{spec.group}/{key}"][...]
                    if key not in grp:
                        grp[key] = np.zeros((n_halos,) + arr.shape[1:], arr.dtype)
                    grp[key][rows] = arr
    return merged
