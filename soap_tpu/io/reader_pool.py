"""Parallel snapshot reading: multi-process segment reads + chunk
prefetch.

The reference reads cells with a pool of MPI ranks into shared memory,
throttled by ``--max-ranks-reading``, and overlaps reading with compute
through its task queue (``SOAP/core/swift_cells.py:548-734``,
``soap_args.py:93-98``).  CPython cannot get parallel HDF5 reads from
threads (h5py serializes every HDF5 call on a global lock), so the
TPU-native equivalents are:

* ``read_masked_cells_parallel`` — fan the merged ``ReadSegment`` work
  units out over worker *processes* that write straight into POSIX
  shared memory (``multiprocessing.shared_memory``), the direct
  analogue of the reference's shared-memory arrays; and
* ``ChunkPrefetcher`` — a depth-1 host-side pipeline that reads chunk
  N+1 while the device computes chunk N (the engine's dispatch thread
  spends its time waiting on device results, so a single reader thread
  hides the whole read behind compute).

Both are pure optimizations: results are byte-identical to the serial
``read_masked_cells`` path.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Dict, List, Mapping, Optional, Sequence, Tuple

import numpy as np

from soap_tpu.io import swift_snapshot


def _default_io_processes() -> int:
    env = os.environ.get("SOAP_TPU_IO_PROCESSES", "")
    if env:
        return max(0, int(env))
    return 0  # opt-in: forking is wasteful on small nodes


def _read_worker(args) -> None:
    """One worker: read its (file -> [(dataset, segment)]) share into the
    shared-memory buffers.  Runs in a separate process; opens its own
    HDF5 handles (independent processes are HDF5-safe, threads are not).
    """
    import h5py
    from multiprocessing import shared_memory

    work_by_file, buffers = args
    shms = {}
    views = {}
    try:
        for key, (shm_name, dtype_str, shape) in buffers.items():
            shm = shared_memory.SharedMemory(name=shm_name)
            shms[key] = shm
            views[key] = np.ndarray(
                shape, dtype=np.dtype(dtype_str), buffer=shm.buf
            )
        for (filename, ptype), items in work_by_file.items():
            with h5py.File(filename, "r") as f:
                group = f[ptype]
                for name, file_offset, mem_offset, count in items:
                    group[name].read_direct(
                        views[(ptype, name)],
                        np.s_[file_offset : file_offset + count],
                        np.s_[mem_offset : mem_offset + count],
                    )
    finally:
        for shm in shms.values():
            shm.close()


def read_masked_cells_parallel(
    meta: swift_snapshot.SnapshotMetadata,
    mask: np.ndarray,
    properties: Mapping[str, Sequence[str]],
    n_processes: Optional[int] = None,
) -> Dict[str, Dict[str, np.ndarray]]:
    """Drop-in parallel replacement for ``read_masked_cells``.

    Plans reads exactly like the serial path, allocates the output
    arrays in shared memory, splits the per-(file, ptype) work units
    round-robin over ``n_processes`` workers and copies the results into
    regular arrays.  ``n_processes in (None, 0, 1)`` falls back to the
    serial reader.
    """
    if n_processes is None:
        n_processes = _default_io_processes()
    if n_processes <= 1:
        return swift_snapshot.read_masked_cells(meta, mask, properties)

    from multiprocessing import get_context, shared_memory

    out: Dict[str, Dict[str, np.ndarray]] = {}
    buffers: Dict[Tuple[str, str], Tuple[str, str, tuple]] = {}
    shms: List = []
    # (filename, ptype) -> [(name, file_offset, mem_offset, count)]
    work_by_file: Dict[Tuple[str, str], List[tuple]] = {}
    try:
        for ptype, names in properties.items():
            if ptype not in meta.datasets:
                continue
            plans: Dict = {}
            arrays: Dict[str, np.ndarray] = {}
            cell_idx = None
            for name in names:
                info = meta.datasets[ptype].get(name)
                if info is None:
                    raise KeyError(
                        f"dataset {ptype}/{name} not present in inputs"
                    )
                template = info.file_template
                if template is None:
                    plans.setdefault(None, (np.zeros(0, np.int64), [], 0))
                elif template not in plans:
                    layout = meta.template_layouts.get(template, {}).get(
                        ptype
                    )
                    plans[template] = swift_snapshot.plan_masked_read(
                        meta, ptype, mask, layout=layout
                    )
                t_cells, segments, total = plans[template]
                if cell_idx is None:
                    cell_idx = t_cells
                shape = (total,) + info.row_shape
                nbytes = max(1, int(np.prod(shape)) * info.dtype.itemsize)
                shm = shared_memory.SharedMemory(create=True, size=nbytes)
                shms.append(shm)
                arr = np.ndarray(shape, dtype=info.dtype, buffer=shm.buf)
                arrays[name] = arr
                buffers[(ptype, name)] = (shm.name, info.dtype.str, shape)
                for seg in segments:
                    work_by_file.setdefault(
                        (template.format(file_nr=seg.file_nr), ptype), []
                    ).append(
                        (name, seg.file_offset, seg.mem_offset, seg.count)
                    )
            out[ptype] = arrays
            out[ptype]["__cells__"] = cell_idx

        # round-robin the file work units over the workers, largest first
        units = sorted(
            work_by_file.items(),
            key=lambda kv: -sum(w[3] for w in kv[1]),
        )
        shares: List[Dict] = [dict() for _ in range(n_processes)]
        for i, (key, items) in enumerate(units):
            shares[i % n_processes][key] = items
        shares = [s for s in shares if s]
        # SPAWN, never fork: the parent holds a live (multithreaded) jax
        # runtime and fork-after-jax can deadlock.  Workers set
        # SOAP_TPU_READER_WORKER so the package init skips jax entirely
        # (they only need h5py + numpy + shared_memory).
        ctx = get_context("spawn")
        os.environ["SOAP_TPU_READER_WORKER"] = "1"
        try:
            procs = []
            for share in shares:
                needed = {
                    (pt, name): buffers[(pt, name)]
                    for (fn, pt), items in share.items()
                    for (name, *_rest) in items
                }
                p = ctx.Process(target=_read_worker, args=((share, needed),))
                p.start()
                procs.append(p)
        finally:
            os.environ.pop("SOAP_TPU_READER_WORKER", None)
        for p in procs:
            p.join()
        bad = [p.exitcode for p in procs if p.exitcode != 0]
        if bad:
            raise RuntimeError(f"reader workers failed: exit codes {bad}")

        # detach from shared memory: copy into regular arrays
        for ptype in out:
            for name, arr in out[ptype].items():
                if name != "__cells__":
                    out[ptype][name] = np.array(arr)
        return out
    finally:
        for shm in shms:
            shm.close()
            try:
                shm.unlink()
            except FileNotFoundError:
                pass


class ChunkPrefetcher:
    """Depth-1 read-ahead: one background thread reading the next chunk.

    ``submit(chunk_nr, fn)`` schedules ``fn()`` (a read closure) on the
    reader thread; ``take(chunk_nr)`` blocks until it is done and
    returns the data.  Submitting is a no-op if the chunk was already
    submitted.  Exceptions propagate out of ``take``.
    """

    def __init__(self, enabled: bool = True):
        self._pool = ThreadPoolExecutor(max_workers=1) if enabled else None
        self._futures: Dict[int, object] = {}

    def submit(self, chunk_nr: int, fn: Callable[[], object]) -> None:
        if self._pool is not None and chunk_nr not in self._futures:
            self._futures[chunk_nr] = self._pool.submit(fn)

    def take(self, chunk_nr: int, fn: Callable[[], object]):
        """Prefetched data if available, else read synchronously."""
        fut = self._futures.pop(chunk_nr, None)
        if fut is not None:
            return fut.result()
        return fn()

    def close(self) -> None:
        if self._pool is not None:
            self._pool.shutdown(wait=True)
            self._pool = None
