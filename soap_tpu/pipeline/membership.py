"""Group-membership program: snapshot particle IDs -> bound-halo labels.

Functional equivalent of the reference's first entry program
(``SOAP/group_membership.py:25-159,162-374``): match every particle ID in
the snapshot against the halo finder's bound-particle lists and write a
"membership" file with the same per-cell particle layout as the snapshot,
containing ``GroupNr_bound`` (bound subhalo index, -1 unbound) and
``Rank_bound`` (position in the bound list, -1).

TPU-native difference: the distributed MPI join
(``psort.parallel_match``, ``group_membership.py:67-94``) becomes a
single device sort-based join (``soap_tpu/ops/join.py``); snapshots that
exceed device memory are processed in fixed-size ID batches.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import h5py
import jax.numpy as jnp
import numpy as np

from soap_tpu.io.halo_catalogue import GROUPNR_READERS
from soap_tpu.ops.join import match_index

#: particles matched per device batch (IDs + payloads are tiny; this is
#: generous while bounding peak HBM)
BATCH = 64 * 1024 * 1024


def compute_membership(
    snap_ids: np.ndarray,
    ids_bound: np.ndarray,
    grnr_bound: np.ndarray,
    rank_bound: np.ndarray,
):
    """(GroupNr_bound, Rank_bound) for every snapshot particle."""
    n = len(snap_ids)
    grnr = np.full(n, -1, dtype=np.int64)
    rank = np.full(n, -1, dtype=np.int32)
    if len(ids_bound) == 0:
        return grnr, rank
    hay = jnp.asarray(ids_bound)
    g = jnp.asarray(grnr_bound)
    r = jnp.asarray(rank_bound)
    for start in range(0, n, BATCH):
        stop = min(start + BATCH, n)
        idx = match_index(jnp.asarray(snap_ids[start:stop]), hay)
        idx_np = np.asarray(idx)
        hit = idx_np >= 0
        safe = np.maximum(idx_np, 0)
        grnr[start:stop] = np.where(hit, np.asarray(g)[safe], -1)
        rank[start:stop] = np.where(hit, np.asarray(r)[safe], -1)
    return grnr, rank


def _snapshot_files(snap_filename: str):
    """All files of a (possibly multi-file) snapshot template."""
    first = snap_filename.format(file_nr=0)
    with h5py.File(first, "r") as f:
        n_files = int(np.asarray(f["Header"].attrs["NumFilesPerSnapshot"]).reshape(-1)[0])
    if "{file_nr}" not in snap_filename:
        return [snap_filename]
    return [snap_filename.format(file_nr=i) for i in range(n_files)]


def write_membership_file(
    snap_filename: str,
    output_filename: str,
    grnr_by_type: Dict[str, np.ndarray],
    rank_by_type: Dict[str, np.ndarray],
) -> None:
    """Write membership datasets as ONE file whose rows follow the
    snapshot's global cell order, carrying the global cell metadata so
    the pipeline can use it as extra input regardless of how the
    snapshot itself is split over files (reference
    ``group_membership.py:137-159`` mirrors the snapshot's layout
    instead)."""
    os.makedirs(os.path.dirname(os.path.abspath(output_filename)), exist_ok=True)
    with h5py.File(snap_filename.format(file_nr=0), "r") as snap, h5py.File(
        output_filename, "w"
    ) as out:
        if "Header" in snap:
            snap.copy("Header", out)
            out["Header"].attrs["NumFilesPerSnapshot"] = np.array(
                [1], dtype=np.int32
            )
        # single-file cell metadata in CANONICAL (ascending cell) order:
        # the membership rows follow it regardless of how the snapshot
        # splits cells across files
        if "Cells" in snap:
            cells = out.create_group("Cells")
            snap.copy("Cells/Meta-data", cells, "Meta-data")
            snap.copy("Cells/Centres", cells, "Centres")
            for sub in ("Counts", "OffsetsInFile", "Files"):
                cells.create_group(sub)
            for pt in snap["Cells/Counts"]:
                counts = snap["Cells/Counts"][pt][...].astype(np.int64)
                cells["Counts"].create_dataset(pt, data=counts)
                cells["OffsetsInFile"].create_dataset(
                    pt,
                    data=np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(
                        np.int64
                    ),
                )
                cells["Files"].create_dataset(
                    pt, data=np.zeros(len(counts), np.int32)
                )
        for ptype, grnr in grnr_by_type.items():
            g = out.create_group(ptype)
            ds = g.create_dataset("GroupNr_bound", data=grnr)
            ds.attrs["Description"] = np.bytes_(
                "Index of halo in which this particle is a bound member, "
                "or -1 if none"
            )
            ds = g.create_dataset("Rank_bound", data=rank_by_type[ptype])
            ds.attrs["Description"] = np.bytes_(
                "Ranking by binding energy of the bound particles (first "
                "in mass order = most bound), or -1 if not bound"
            )


def run_group_membership(
    snap_filename: str,
    halo_basename: str,
    output_filename: str,
    halo_format: str = "HBTplus",
    ptypes=("PartType0", "PartType1", "PartType4", "PartType5", "PartType6"),
) -> Dict[str, np.ndarray]:
    """Full membership pipeline for a single-file snapshot.

    Returns {ptype: GroupNr_bound} for convenience/testing.
    """
    from soap_tpu.io.swift_snapshot import SnapshotMetadata, read_masked_cells

    nr_halos, ids_bound, grnr_bound, rank_bound = GROUPNR_READERS[halo_format](
        halo_basename
    )
    meta = SnapshotMetadata(snap_filename)
    grnr_by_type, rank_by_type = {}, {}
    for ptype in ptypes:
        if ptype not in meta.datasets or "ParticleIDs" not in meta.datasets[ptype]:
            continue
        # canonical (ascending cell) order, any number of snapshot files
        mask = np.ones(meta.nr_cells, bool)
        snap_ids = read_masked_cells(meta, mask, {ptype: ["ParticleIDs"]})[
            ptype
        ]["ParticleIDs"]
        grnr, rank = compute_membership(
            snap_ids, ids_bound, grnr_bound, rank_bound
        )
        grnr_by_type[ptype] = grnr
        rank_by_type[ptype] = rank
    write_membership_file(
        snap_filename, output_filename, grnr_by_type, rank_by_type
    )
    return grnr_by_type
