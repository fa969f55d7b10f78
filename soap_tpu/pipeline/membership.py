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
    rank_bound: Optional[np.ndarray] = None,
    pot_bound: Optional[np.ndarray] = None,
):
    """(GroupNr_bound, Rank_bound[, PotentialEnergies]) per particle.

    ``rank_bound``/``pot_bound`` are optional per-bound-particle payloads
    (some finders provide no rank; potentials only with
    ``read_potential_energies``, reference ``group_membership.py:67-94``).
    """
    n = len(snap_ids)
    grnr = np.full(n, -1, dtype=np.int64)
    rank = np.full(n, -1, dtype=np.int32)
    pot = np.zeros(n, dtype=np.float64) if pot_bound is not None else None
    if len(ids_bound) == 0:
        return (grnr, rank) if pot is None else (grnr, rank, pot)
    hay = jnp.asarray(ids_bound)
    g = jnp.asarray(grnr_bound)
    r = jnp.asarray(rank_bound) if rank_bound is not None else None
    for start in range(0, n, BATCH):
        stop = min(start + BATCH, n)
        idx = match_index(jnp.asarray(snap_ids[start:stop]), hay)
        idx_np = np.asarray(idx)
        hit = idx_np >= 0
        safe = np.maximum(idx_np, 0)
        grnr[start:stop] = np.where(hit, np.asarray(g)[safe], -1)
        if r is not None:
            rank[start:stop] = np.where(hit, np.asarray(r)[safe], -1)
        if pot is not None:
            pot[start:stop] = np.where(hit, pot_bound[safe], 0.0)
    return (grnr, rank) if pot is None else (grnr, rank, pot)


#: SWIFT's "not in any FOF group" null id (the FOF snapshot writes this
#: for ungrouped particles; unmatched snapshot particles get it too)
FOF_NULL_ID = 2147483647


def compute_fof_groups(
    snap_ids: np.ndarray,
    fof_particle_ids: np.ndarray,
    fof_group_ids: np.ndarray,
) -> np.ndarray:
    """Per-snapshot-particle FOFGroupIDs from a separate FOF snapshot.

    The reference matches ParticleIDs against the FOF snapshot and
    carries its FOFGroupIDs into the membership files
    (``group_membership.py:54-63,150-151``); a snapshot/snipshot without
    an in-file FOFGroupIDs dataset would otherwise lose
    ``Mfrac_satellites``/``Mfrac_external`` and the FOF join
    (``SO_properties.py:459-466``).
    """
    n = len(snap_ids)
    out = np.full(n, FOF_NULL_ID, dtype=np.asarray(fof_group_ids).dtype)
    if len(fof_particle_ids) == 0:
        return out
    hay = jnp.asarray(fof_particle_ids)
    gids = np.asarray(fof_group_ids)
    for start in range(0, n, BATCH):
        stop = min(start + BATCH, n)
        idx = np.asarray(
            match_index(jnp.asarray(snap_ids[start:stop]), hay)
        )
        hit = idx >= 0
        out[start:stop] = np.where(
            hit, gids[np.maximum(idx, 0)], FOF_NULL_ID
        )
    return out


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
    pot_by_type: Optional[Dict[str, np.ndarray]] = None,
    fof_by_type: Optional[Dict[str, np.ndarray]] = None,
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
            if pot_by_type and ptype in pot_by_type:
                ds = g.create_dataset(
                    "PotentialEnergies", data=pot_by_type[ptype]
                )
                ds.attrs["Description"] = np.bytes_(
                    "Binding potential energy from the halo finder, "
                    "(km/s)^2; 0 for unbound particles"
                )
            if fof_by_type and ptype in fof_by_type:
                ds = g.create_dataset(
                    "FOFGroupIDs", data=fof_by_type[ptype]
                )
                ds.attrs["Description"] = np.bytes_(
                    "Friends-Of-Friends ID of the group the particles "
                    "belong to, matched from the FOF snapshot; "
                    f"{FOF_NULL_ID} if none"
                )


def run_group_membership(
    snap_filename: str,
    halo_basename: str,
    output_filename: str,
    halo_format: str = "HBTplus",
    ptypes=("PartType0", "PartType1", "PartType4", "PartType5", "PartType6"),
    with_potentials: bool = False,
    fof_filename: Optional[str] = None,
) -> Dict[str, np.ndarray]:
    """Full membership pipeline for a single-file snapshot.

    ``with_potentials`` passes per-particle binding potential energies
    through from the halo finder when available (HBTplus; reference
    ``group_membership.py:98-134``, units (km/s)^2).

    ``fof_filename`` names a separate FOF snapshot
    (``Snapshots/fof_filename`` in the reference's parameter file,
    ``group_membership.py:181,325-343``): its FOFGroupIDs are matched
    onto the snapshot by ParticleIDs and written into the membership
    file, so snapshots without an in-file FOFGroupIDs dataset still get
    the FOF-dependent properties (the pipeline reads membership files
    as extra input).

    Returns {ptype: GroupNr_bound} for convenience/testing.
    """
    from soap_tpu.io.swift_snapshot import SnapshotMetadata, read_masked_cells

    pot_bound = None
    if with_potentials and halo_format == "HBTplus":
        res = GROUPNR_READERS[halo_format](
            halo_basename, read_potential_energies=True
        )
        nr_halos, ids_bound, grnr_bound, rank_bound, pot_bound = res
    else:
        res = GROUPNR_READERS[halo_format](halo_basename)
        nr_halos, ids_bound, grnr_bound = res[:3]
        rank_bound = res[3] if len(res) > 3 else None
    meta = SnapshotMetadata(snap_filename)
    fof_meta = fof_ptypes = None
    if fof_filename:
        fof_meta = SnapshotMetadata(fof_filename)
        fof_ptypes = [
            pt
            for pt, names in fof_meta.datasets.items()
            if "ParticleIDs" in names and "FOFGroupIDs" in names
        ]
    grnr_by_type, rank_by_type, pot_by_type, fof_by_type = {}, {}, {}, {}
    for ptype in ptypes:
        if ptype not in meta.datasets or "ParticleIDs" not in meta.datasets[ptype]:
            continue
        # canonical (ascending cell) order, any number of snapshot files
        mask = np.ones(meta.nr_cells, bool)
        snap_ids = read_masked_cells(meta, mask, {ptype: ["ParticleIDs"]})[
            ptype
        ]["ParticleIDs"]
        out = compute_membership(
            snap_ids, ids_bound, grnr_bound, rank_bound, pot_bound
        )
        grnr_by_type[ptype] = out[0]
        rank_by_type[ptype] = out[1]
        if pot_bound is not None:
            pot_by_type[ptype] = out[2]
        if fof_meta is not None and ptype in fof_ptypes:
            fof_mask = np.ones(fof_meta.nr_cells, bool)
            fof_data = read_masked_cells(
                fof_meta, fof_mask, {ptype: ["ParticleIDs", "FOFGroupIDs"]}
            )[ptype]
            fof_by_type[ptype] = compute_fof_groups(
                snap_ids, fof_data["ParticleIDs"], fof_data["FOFGroupIDs"]
            )
    write_membership_file(
        snap_filename,
        output_filename,
        grnr_by_type,
        rank_by_type,
        pot_by_type if pot_bound is not None else None,
        fof_by_type if fof_by_type else None,
    )
    return grnr_by_type
