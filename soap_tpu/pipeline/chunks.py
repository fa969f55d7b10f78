"""Chunked processing with scratch checkpoints and restart.

Functional equivalent of the reference's chunk task machinery
(``SOAP/core/chunk_tasks.py``, ``SOAP/core/task_queue.py``): the volume
is split into Peano–Hilbert chunks of halos
(``soap_tpu/parallel/domain.py``), each chunk's particle cells are read
and staged to the device, the halo engine processes the chunk's halos,
and the per-chunk results are written to a scratch HDF5 file with a
``Write complete`` marker.  A rerun validates existing scratch files
(calc names + halo rows must match) and skips finished chunks — the same
chunk-granularity restart story as the reference
(``chunk_tasks.py:122-162,389-398``).

No dynamic task queue: chunks run in a deterministic order on this host
(multi-host runs assign chunk ranges per host).
"""

from __future__ import annotations

import os
import sys
import time
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from soap_tpu.io import swift_snapshot
from soap_tpu.io.halo_catalogue import HaloCatalogue
from soap_tpu.models.context import HaloContext
from soap_tpu.parallel.domain import peano_decomposition
from soap_tpu.pipeline.chunk_data import ChunkData, stage_ptype
from soap_tpu.pipeline.engine import (
    EngineStats,
    HaloEngine,
    HaloTypeSpec,
    StagedStore,
)

#: fields needed per ptype for the DMO tier (hydro tiers extend this)
BASE_FIELDS = ["Coordinates", "Masses", "Velocities", "GroupNr_bound", "FOFGroupIDs"]


def _progress(msg: str) -> None:
    """Progress/verbose lines go to stderr: stdout stays reserved for
    results (bench.py's one-JSON-line contract, CLI outputs)."""
    print(msg, file=sys.stderr, flush=True)


def required_datasets(
    specs: Sequence[HaloTypeSpec], meta: swift_snapshot.SnapshotMetadata
) -> Dict[str, List[str]]:
    """Union of the particle datasets the enabled properties need.

    Resolved from the property table's per-key ``particle_properties``
    lists (the reference's mechanism: ``chunk_tasks.py:220-251`` unions
    ``halo_prop.particle_properties``); restricted to datasets actually
    present in the snapshot + extra inputs.
    """
    from soap_tpu.core.registry import full_property_table

    table = full_property_table()
    out: Dict[str, List[str]] = {}
    for spec in specs:
        for key in spec.keys:
            if key not in table:
                continue
            for ds in table[key].particle_properties:
                ptype, name = ds.split("/", 1)
                if ptype in meta.datasets and name in meta.datasets[ptype]:
                    out.setdefault(ptype, [])
                    if name not in out[ptype]:
                        out[ptype].append(name)
    return out

#: factor applied to search radii when masking cells to read: leaves head
#: room for the engine's x1.5 retry ladder without re-reading
READ_MARGIN = 4.0


def _local_mesh():
    """The production device mesh for this host: one chunk at a time,
    its halo batches sharded across ALL local devices with the chunk
    store replicated per device (the TPU analogue of the reference's
    one-shared-memory-copy-per-node + per-core halo claiming,
    ``SOAP/core/chunk_tasks.py:164-170`` + ``halo_tasks.py:319-357``).
    Returns None on a single device (the mesh-free fast path);
    SOAP_TPU_MULTICHIP=0 forces single-device."""
    import os as _os

    if _os.environ.get("SOAP_TPU_MULTICHIP", "1") == "0":
        return None
    import jax

    n = len(jax.local_devices())
    if n <= 1:
        return None
    from soap_tpu.parallel.sharded import make_mesh

    return make_mesh(n, n_chunks=1)


def _scratch_path(scratch_dir: str, chunk_nr: int) -> str:
    return os.path.join(scratch_dir, f"chunk_{chunk_nr}.hdf5")


def _try_load_scratch(
    path: str, specs: Sequence[HaloTypeSpec], rows: np.ndarray
) -> Optional[Dict[str, Dict[str, np.ndarray]]]:
    """Load a finished chunk's results if the scratch file is valid."""
    import h5py

    if not os.path.exists(path):
        return None
    try:
        with h5py.File(path, "r") as f:
            if not f.attrs.get("Write complete", False):
                return None
            calc_names = [n.decode() for n in f.attrs["calc_names"]]
            want = [f"{s.group}/{k}" for s in specs for k in s.keys]
            if calc_names != want:
                return None
            if not np.array_equal(f["rows"][...], rows):
                return None
            out: Dict[str, Dict[str, np.ndarray]] = {}
            for spec in specs:
                out[spec.group] = {}
                for key in spec.keys:
                    out[spec.group][key] = f[f"{spec.group}/{key}"][...]
            return out
    except Exception:
        return None


def _write_scratch(
    path: str,
    specs: Sequence[HaloTypeSpec],
    rows: np.ndarray,
    results: Dict[str, Dict[str, np.ndarray]],
) -> None:
    import h5py

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp"
    with h5py.File(tmp, "w") as f:
        f.create_dataset("rows", data=rows)
        for spec in specs:
            for key in spec.keys:
                f.create_dataset(f"{spec.group}/{key}", data=results[spec.group][key])
        f.attrs["calc_names"] = [
            np.bytes_(f"{s.group}/{k}") for s in specs for k in s.keys
        ]
        # version stamp: combine refuses to merge scratch written by a
        # different soap_tpu version (the analogue of the reference's
        # cross-rank/chunk/node metadata consistency asserts,
        # ``core/result_set.py:275-418`` — units here are static table
        # lookups, so only dtype/shape/version skew can disagree)
        import soap_tpu

        f.attrs["soap_tpu_version"] = np.bytes_(soap_tpu.__version__)
        f.attrs["Write complete"] = True
    os.replace(tmp, path)


def process_chunks(
    meta: swift_snapshot.SnapshotMetadata,
    cat: HaloCatalogue,
    ctx: HaloContext,
    specs: Sequence[HaloTypeSpec],
    ptypes: Sequence[str],
    search_radius_phys: np.ndarray,
    nr_chunks: int = 1,
    scratch_dir: Optional[str] = None,
    extra_fields: Optional[Dict[str, List[str]]] = None,
    aux: Optional[Dict[str, object]] = None,
    chunk_subset: Optional[Sequence[int]] = None,
    t0: Optional[float] = None,
    verbose: bool = True,
    record_halo_timings: bool = False,
    record_property_timings: bool = False,
) -> Tuple[Dict[str, Dict[str, np.ndarray]], EngineStats]:
    """Process all halos chunk by chunk; returns merged {group: {key: (H,...)}}."""
    if t0 is None:
        t0 = time.time()
    H = cat.nr_halos
    chunk_of = (
        peano_decomposition(np.mod(cat.cofp, meta.boxsize), meta.boxsize, nr_chunks)
        if nr_chunks > 1
        else np.zeros(H, dtype=np.int32)
    )
    total_stats = EngineStats()
    merged: Dict[str, Dict[str, np.ndarray]] = {}

    fields_per_type = {
        pt: [f for f in BASE_FIELDS if f in meta.datasets[pt]] for pt in ptypes
    }
    if extra_fields:
        for pt, names in extra_fields.items():
            for n in names:
                if n not in fields_per_type.get(pt, []):
                    fields_per_type.setdefault(pt, []).append(n)

    all_chunks = range(int(chunk_of.max()) + 1 if H else 0)
    if chunk_subset is not None:
        all_chunks = [c for c in all_chunks if c in set(chunk_subset)]
    chunk_list = [
        (c, rows)
        for c in all_chunks
        for rows in [np.flatnonzero(chunk_of == c)]
        if len(rows)
    ]

    # depth-1 read-ahead: a background reader stages chunk N+1 while the
    # device computes chunk N (reference overlap: parallel reader ranks +
    # task queue, ``swift_cells.py:548-734``); SOAP_TPU_PREFETCH=0 disables
    from soap_tpu.io.reader_pool import (
        ChunkPrefetcher,
        read_masked_cells_parallel,
    )

    prefetch_on = (
        os.environ.get("SOAP_TPU_PREFETCH", "1") != "0" and len(chunk_list) > 1
    )
    prefetcher = ChunkPrefetcher(enabled=prefetch_on)
    scratch_cache: Dict[int, Optional[Dict]] = {}

    def _scratch_for(chunk_nr: int, rows: np.ndarray):
        if not scratch_dir:
            return None
        if chunk_nr not in scratch_cache:
            scratch_cache[chunk_nr] = _try_load_scratch(
                _scratch_path(scratch_dir, chunk_nr), specs, rows
            )
        return scratch_cache[chunk_nr]

    # fixed-physical-radius specs (e.g. 3 Mpc inclusive spheres) bound
    # the gather radius from below; cover them in the read mask with a
    # two-ladder-step margin instead of the full READ_MARGIN (which
    # exists for retry growth from SMALL initial radii)
    from soap_tpu.pipeline.engine import (
        READ_RADIUS_FACTOR,
        min_physical_radius,
    )

    floor_com = min_physical_radius(specs) / ctx.a

    def _make_read_fn(rows: np.ndarray):
        def _read():
            centres = np.mod(cat.cofp[rows], meta.boxsize)
            mask = meta.mask_cells_for_spheres(
                centres,
                np.maximum(
                    cat.search_radius[rows] * READ_MARGIN,
                    floor_com * READ_RADIUS_FACTOR**2,
                )
                + 0.5 * float(np.max(meta.cell_size)),
            )
            data = read_masked_cells_parallel(meta, mask, fields_per_type)
            # host-side packing (cell sort + SATs + packed column block)
            # happens IN the reader thread so it overlaps the previous
            # chunk's device compute, like the read itself
            n_read = sum(len(d["Coordinates"]) for d in data.values())
            chunk_ptypes = {}
            for pt in ptypes:
                fields = {
                    name: arr
                    for name, arr in data[pt].items()
                    if name not in ("Coordinates", "__cells__")
                }
                if (
                    pt == "PartType4"
                    and aux is not None
                    and "age_table" in aux
                    and "BirthScaleFactors" in fields
                ):
                    # derived per-particle stellar age, computed ONCE on
                    # the host: the device DAG otherwise re-interpolates
                    # the age table per spec instance (reference does it
                    # once per snapshot too, ``stellar_age_calculator.py``)
                    age_a, age_t = aux["age_table"]
                    t_now = np.interp(float(ctx.a), age_a, age_t)
                    fields["StellarAges"] = np.maximum(
                        t_now
                        - np.interp(
                            fields["BirthScaleFactors"], age_a, age_t
                        ),
                        0.0,
                    ).astype(np.float32)
                chunk_ptypes[pt] = stage_ptype(
                    np.mod(data[pt]["Coordinates"], meta.boxsize),
                    fields,
                    meta.boxsize,
                )
            chunk = ChunkData(boxsize=meta.boxsize, ptypes=chunk_ptypes)
            if os.environ.get("SOAP_TPU_PRESTAGE", "1") != "0":
                # upload from the reader thread: the host->device
                # transfer of chunk N+1 overlaps chunk N's compute
                # (peak HBM = two chunk stores during the window);
                # SOAP_TPU_PRESTAGE=0 restores serial staging
                chunk = HaloEngine.stage(chunk, mesh=_local_mesh())
            return mask, n_read, chunk

        return _read

    for i, (chunk_nr, rows) in enumerate(chunk_list):
        chunk_results = _scratch_for(chunk_nr, rows)
        scratch_cache.pop(chunk_nr, None)
        if chunk_results is not None and verbose:
            _progress(
                f"[{time.time()-t0:6.1f}s] chunk {chunk_nr}: restart — "
                f"reusing scratch for {len(rows)} halos"
            )

        # queue this chunk's read (no-op if already prefetched) and the
        # next unfinished chunk's read before blocking on this one
        if chunk_results is None:
            prefetcher.submit(chunk_nr, _make_read_fn(rows))
        for nxt_nr, nxt_rows in chunk_list[i + 1 : i + 2]:
            if _scratch_for(nxt_nr, nxt_rows) is None:
                prefetcher.submit(nxt_nr, _make_read_fn(nxt_rows))

        if chunk_results is None:
            mask, n_read, chunk = prefetcher.take(chunk_nr, _make_read_fn(rows))
            if verbose:
                ptypes_view = (
                    chunk.stacked if isinstance(chunk, StagedStore) else chunk
                ).ptypes
                n_bytes = sum(
                    p.packed_lines.nbytes
                    for p in ptypes_view.values()
                )
                _progress(
                    f"[{time.time()-t0:6.1f}s] chunk {chunk_nr}: read "
                    f"{n_read} particles ({int(mask.sum())}/{len(mask)} "
                    f"cells), packed {n_bytes/1e6:.0f} MB, {len(rows)} halos"
                )

            # engine construction performs the ONE host->device transfer
            # of the stacked store; drain it so the first bucket's
            # timing is compute, not a queue of uploads
            import jax

            t_put = time.time()
            engine = HaloEngine(
                ctx, chunk, specs, aux=aux, mesh=_local_mesh(),
                record_halo_timings=record_halo_timings,
                record_spec_timings=record_property_timings,
            )
            jax.block_until_ready(
                [p.packed_lines for p in engine.stacked.ptypes.values()]
            )
            if verbose:
                _progress(
                    f"[{time.time()-t0:6.1f}s] chunk {chunk_nr}: staged "
                    f"to device in {time.time()-t_put:.1f}s"
                )
            t_proc = time.time()
            chunk_results = engine.process(
                centres=cat.cofp[rows],
                search_radius_phys=search_radius_phys[rows],
                index=cat.index[rows],
                is_central=cat.is_central.astype(bool)[rows],
                fof_id=cat.fof_id[rows],
                # upper bound on EncloseRadius for the aperture-copy
                # optimization (HBT search radius = 1.01 x REnclose)
                enclose_radius_phys=cat.search_radius[rows] * meta.a,
            )
            total_stats.process_seconds += time.time() - t_proc
            s = engine.stats
            total_stats.n_bucket_calls += s.n_bucket_calls
            total_stats.n_retries += s.n_retries
            total_stats.n_overflow += s.n_overflow
            total_stats.n_copied_specs += s.n_copied_specs
            total_stats.halos_done += s.halos_done
            total_stats.bucket_records.extend(s.bucket_records)
            total_stats.halo_timing_chunks.extend(s.halo_timing_chunks)
            total_stats.spec_halo_chunks.extend(s.spec_halo_chunks)
            total_stats.compile_seconds += s.compile_seconds
            for g, sec in s.spec_seconds.items():
                total_stats.spec_seconds[g] = (
                    total_stats.spec_seconds.get(g, 0.0) + sec
                )
            if verbose:
                _progress(
                    f"[{time.time()-t0:6.1f}s] chunk {chunk_nr}: processed "
                    f"{s.halos_done} halos in {s.n_bucket_calls} bucket calls "
                    f"({s.n_retries} retries, {s.n_overflow} overflows)"
                )
            if scratch_dir:
                _write_scratch(
                    _scratch_path(scratch_dir, chunk_nr), specs, rows, chunk_results
                )
            # free the chunk's HBM before the next chunk stages (GC of
            # pytree cycles otherwise delays it — back-to-back runs OOM)
            engine.free()
            del engine, chunk

        for group, props in chunk_results.items():
            buf = merged.setdefault(group, {})
            for key, arr in props.items():
                if key not in buf:
                    buf[key] = np.zeros((H,) + arr.shape[1:], arr.dtype)
                buf[key][rows] = arr
    prefetcher.close()
    return merged, total_stats
