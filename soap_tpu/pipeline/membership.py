"""Group-membership program: snapshot particle IDs -> bound-halo labels.

Functional equivalent of the reference's first entry program
(``SOAP/group_membership.py:25-159,162-374``): match every particle ID in
the snapshot against the halo finder's bound-particle lists and write
"membership" files containing ``GroupNr_bound`` (bound subhalo index, -1
unbound), ``Rank_bound`` (position in the bound list, -1), and optionally
``SpecificPotentialEnergies`` and ``FOFGroupIDs``.

Output layouts:

 - ``{file_nr}`` in ``output_filename`` -> one membership file per
   snapshot file, each mirroring that file's per-ptype row layout — the
   reference's convention (``group_membership.py:137-159,199-205``),
   required at production scale where a monolithic file would be
   multi-TB and would break the per-file virtual-snapshot linkage.
 - otherwise -> one monolithic file whose rows follow the snapshot's
   canonical (ascending cell) order, carrying single-file cell metadata;
   also supported for multi-file snapshots (a convenience the reference
   forbids) because the pipeline reads membership through per-template
   cell layouts.

Memory: the snapshot side is STREAMED in bounded row batches
(``SOAP_TPU_MEMBERSHIP_BATCH`` rows, default 16Mi) against a
sorted-once bound-ID index, so peak RSS is O(halo catalogue + batch),
independent of snapshot size — the single-host analogue of the
reference's per-rank distribution (``group_membership.py:42-94``).  The
optional FOF join holds the FOF snapshot's ID/GroupID columns in core,
like each reference rank holds its share.

TPU-native note: the distributed MPI join (``psort.parallel_match``)
becomes a host-side sorted merge join (numpy searchsorted over the
pre-sorted haystack).  This program is pure IO + integer joins with no
dense arithmetic — the device adds only transfer cost here, so the
membership path deliberately never touches the accelerator.
"""

from __future__ import annotations

import os
import time
from typing import Dict, Iterator, List, Optional, Tuple

import h5py
import numpy as np

from soap_tpu.io.halo_catalogue import GROUPNR_READERS

#: snapshot rows matched per batch (IDs + payloads are tiny; this is
#: generous while bounding peak RSS)
BATCH = int(os.environ.get("SOAP_TPU_MEMBERSHIP_BATCH", 16 * 1024 * 1024))

#: SWIFT's "not in any FOF group" null id (the FOF snapshot writes this
#: for ungrouped particles; unmatched snapshot particles get it too)
FOF_NULL_ID = 2147483647


class SortedIdJoin:
    """Sort-once / probe-many ID join.

    The haystack (bound-particle IDs) is argsorted ONCE; every probe is
    a vectorized binary search returning the row of each needle in the
    ORIGINAL haystack order, or -1 when absent.  Replaces the
    reference's ``psort.parallel_match`` (``group_membership.py:67-94``)
    for single-host streaming.
    """

    def __init__(self, ids: np.ndarray):
        self.n = len(ids)
        if self.n:
            self.order = np.argsort(ids, kind="stable")
            self.sorted_ids = np.asarray(ids)[self.order]

    def probe(self, needles: np.ndarray) -> np.ndarray:
        if self.n == 0 or len(needles) == 0:
            return np.full(len(needles), -1, dtype=np.int64)
        pos = np.searchsorted(self.sorted_ids, needles)
        pos = np.minimum(pos, self.n - 1)
        hit = self.sorted_ids[pos] == needles
        return np.where(hit, self.order[pos], -1)


class _Labeller:
    """Bound-membership labels for one snapshot-ID batch."""

    def __init__(self, ids_bound, grnr_bound, rank_bound, pot_bound):
        self.join = SortedIdJoin(np.asarray(ids_bound))
        self.grnr = np.asarray(grnr_bound)
        self.rank = None if rank_bound is None else np.asarray(rank_bound)
        self.pot = None if pot_bound is None else np.asarray(pot_bound)

    def __call__(self, snap_ids: np.ndarray):
        rows = self.join.probe(snap_ids)
        hit = rows >= 0
        safe = np.maximum(rows, 0)
        grnr_dtype = self.grnr.dtype if self.grnr.size else np.int64
        grnr = np.where(hit, self.grnr[safe] if self.grnr.size else 0, -1).astype(
            grnr_dtype, copy=False
        )
        rank = np.where(
            hit, self.rank[safe] if self.rank is not None and self.rank.size else 0, -1
        ).astype(np.int32, copy=False)
        pot = None
        if self.pot is not None:
            pot = np.where(hit, self.pot[safe] if self.pot.size else 0.0, 0.0).astype(
                np.float64, copy=False
            )
        return grnr, rank, pot


class _FofLabeller:
    """FOFGroupIDs for one snapshot-ID batch, matched from a separate
    FOF snapshot (reference ``group_membership.py:54-63,150-151``)."""

    def __init__(self, fof_particle_ids, fof_group_ids):
        self.join = SortedIdJoin(np.asarray(fof_particle_ids))
        self.gids = np.asarray(fof_group_ids)

    def __call__(self, snap_ids: np.ndarray) -> np.ndarray:
        rows = self.join.probe(snap_ids)
        hit = rows >= 0
        safe = np.maximum(rows, 0)
        return np.where(
            hit, self.gids[safe] if self.gids.size else 0, FOF_NULL_ID
        ).astype(self.gids.dtype if self.gids.size else np.int64, copy=False)


def compute_membership(
    snap_ids: np.ndarray,
    ids_bound: np.ndarray,
    grnr_bound: np.ndarray,
    rank_bound: Optional[np.ndarray] = None,
    pot_bound: Optional[np.ndarray] = None,
):
    """(GroupNr_bound, Rank_bound[, SpecificPotentialEnergies]) per
    particle — in-core convenience wrapper over the streaming join."""
    lab = _Labeller(ids_bound, grnr_bound, rank_bound, pot_bound)
    grnr = np.empty(len(snap_ids), np.int64)
    rank = np.empty(len(snap_ids), np.int32)
    pot = np.empty(len(snap_ids), np.float64) if pot_bound is not None else None
    for a in range(0, len(snap_ids), BATCH):
        b = min(a + BATCH, len(snap_ids))
        g, r, p = lab(snap_ids[a:b])
        grnr[a:b] = g
        rank[a:b] = r
        if pot is not None:
            pot[a:b] = p
    return (grnr, rank) if pot is None else (grnr, rank, pot)


def compute_fof_groups(
    snap_ids: np.ndarray,
    fof_particle_ids: np.ndarray,
    fof_group_ids: np.ndarray,
) -> np.ndarray:
    """Per-snapshot-particle FOFGroupIDs from a separate FOF snapshot."""
    lab = _FofLabeller(fof_particle_ids, fof_group_ids)
    out = np.empty(
        len(snap_ids),
        np.asarray(fof_group_ids).dtype if len(fof_group_ids) else np.int64,
    )
    for a in range(0, len(snap_ids), BATCH):
        b = min(a + BATCH, len(snap_ids))
        out[a:b] = lab(snap_ids[a:b])
    return out


def _snapshot_files(snap_filename: str) -> List[str]:
    """All files of a (possibly multi-file) snapshot template."""
    first = snap_filename.format(file_nr=0)
    with h5py.File(first, "r") as f:
        n_files = int(
            np.asarray(f["Header"].attrs["NumFilesPerSnapshot"]).reshape(-1)[0]
        )
    if "{file_nr}" not in snap_filename:
        return [snap_filename]
    return [snap_filename.format(file_nr=i) for i in range(n_files)]


# dataset attributes, mirroring the reference's membership outputs
# (``group_membership.py:106-136``): dimensionless unit metadata plus a
# description per dataset
_UNIT_ATTRS_DIMLESS = {
    "Conversion factor to CGS (not including cosmological corrections)": [1.0],
    "Conversion factor to physical CGS (including cosmological corrections)": [
        1.0
    ],
    "U_I exponent": [0.0],
    "U_L exponent": [0.0],
    "U_M exponent": [0.0],
    "U_t exponent": [0.0],
    "U_T exponent": [0.0],
    "a-scale exponent": [0.0],
    "h-scale exponent": [0.0],
    "Property can be converted to comoving": [0],
    "Value stored as physical": [1],
}
# (km/s)^2 specific potential energies (halo-finder units; reference
# ``group_membership.py:121-123,144-148``)
_UNIT_ATTRS_POT = dict(
    _UNIT_ATTRS_DIMLESS,
    **{
        "Conversion factor to CGS (not including cosmological corrections)": [
            1.0e10
        ],
        "Conversion factor to physical CGS (including cosmological corrections)": [
            1.0e10
        ],
        "U_L exponent": [2.0],
        "U_t exponent": [-2.0],
    },
)

_DESCRIPTIONS = {
    "GroupNr_bound": "Index of halo in which this particle is a bound "
    "member, or -1 if none",
    "Rank_bound": "Ranking by binding energy of the bound particles "
    "(first in halo=0), or -1 if not bound",
    "SpecificPotentialEnergies": "Specific potential energy of the bound "
    "particles, (km/s)^2; 0 for unbound particles",
    "FOFGroupIDs": "Friends-Of-Friends ID of the group the particles "
    f"belong to, matched from the FOF snapshot; {FOF_NULL_ID} if none",
}


def _create_labelled_dataset(group, name, n, dtype):
    ds = group.create_dataset(name, shape=(n,), dtype=dtype)
    ds.attrs["Description"] = np.bytes_(_DESCRIPTIONS[name])
    attrs = (
        _UNIT_ATTRS_POT if name == "SpecificPotentialEnergies" else _UNIT_ATTRS_DIMLESS
    )
    for k, v in attrs.items():
        ds.attrs[k] = np.array(v, dtype=np.float64 if isinstance(v[0], float) else np.int32)
    return ds


def _membership_header(snap0: h5py.File, provenance: Dict[str, object]):
    """Header attr dict for membership files (reference
    ``group_membership.py:275-308``)."""
    header = {}
    for attr in (
        "BoxSize",
        "Dimension",
        "NumFilesPerSnapshot",
        "NumPartTypes",
        "NumPart_Total",
        "NumPart_Total_HighWord",
        "Redshift",
        "RunName",
        "Scale-factor",
    ):
        if attr in snap0["Header"].attrs:
            header[attr] = snap0["Header"].attrs[attr]
    header["Code"] = "SOAP"
    header["OutputType"] = "Membership"
    header["SnapshotDate"] = time.strftime(
        "%H:%M:%S %Y-%m-%d GMT", time.gmtime()
    )
    header.update(provenance)
    return header


def _write_snapshot_layout(
    snap_filename: str,
    output_filename: str,
    ptypes,
    labeller: _Labeller,
    fof_labellers: Dict[str, _FofLabeller],
    with_potentials: bool,
    provenance: Dict[str, object],
    batch_rows: int,
    collect: bool,
) -> Dict[str, List[np.ndarray]]:
    """Per-file membership outputs mirroring the snapshot's file layout,
    streamed in bounded row batches (never holds a full column)."""
    files = _snapshot_files(snap_filename)
    multi_out = "{file_nr}" in output_filename
    assert multi_out or len(files) == 1, (
        "membership output for a multi-file snapshot needs {file_nr} in "
        "the output filename (reference group_membership.py:199-205)"
    )
    grnr_parts: Dict[str, List[np.ndarray]] = {}
    with h5py.File(files[0], "r") as snap0:
        header = _membership_header(snap0, provenance)
    for file_nr, fname in enumerate(files):
        out_name = (
            output_filename.format(file_nr=file_nr) if multi_out else output_filename
        )
        os.makedirs(os.path.dirname(os.path.abspath(out_name)), exist_ok=True)
        with h5py.File(fname, "r") as snap, h5py.File(out_name, "w") as out:
            hdr = out.create_group("Header")
            for k, v in header.items():
                hdr.attrs[k] = v
            if "NumPart_ThisFile" in snap["Header"].attrs:
                hdr.attrs["NumPart_ThisFile"] = snap["Header"].attrs[
                    "NumPart_ThisFile"
                ]
            for ptype in ptypes:
                if ptype not in snap or "ParticleIDs" not in snap[ptype]:
                    continue
                src = snap[ptype]["ParticleIDs"]
                n = src.shape[0]
                g = out.create_group(ptype)
                ds_grnr = _create_labelled_dataset(
                    g, "GroupNr_bound", n, labeller.grnr.dtype
                )
                ds_rank = _create_labelled_dataset(g, "Rank_bound", n, np.int32)
                ds_pot = (
                    _create_labelled_dataset(
                        g, "SpecificPotentialEnergies", n, np.float64
                    )
                    if with_potentials
                    else None
                )
                fof_lab = fof_labellers.get(ptype)
                ds_fof = (
                    _create_labelled_dataset(
                        g,
                        "FOFGroupIDs",
                        n,
                        fof_lab.gids.dtype if fof_lab.gids.size else np.int64,
                    )
                    if fof_lab is not None
                    else None
                )
                for a in range(0, n, batch_rows):
                    b = min(a + batch_rows, n)
                    ids = src[a:b]
                    grnr, rank, pot = labeller(ids)
                    ds_grnr[a:b] = grnr
                    ds_rank[a:b] = rank
                    if ds_pot is not None:
                        ds_pot[a:b] = pot
                    if ds_fof is not None:
                        ds_fof[a:b] = fof_lab(ids)
                    if collect:
                        grnr_parts.setdefault(ptype, []).append(grnr)
    return grnr_parts


def _cell_slabs(counts: np.ndarray, batch_rows: int) -> Iterator[Tuple[int, int]]:
    """Contiguous canonical-cell ranges whose row totals stay bounded."""
    n_cells = len(counts)
    i = 0
    while i < n_cells:
        j = i
        rows = 0
        while j < n_cells and (j == i or rows + counts[j] <= batch_rows):
            rows += counts[j]
            j += 1
        yield i, j
        i = j


def _write_monolithic(
    snap_filename: str,
    output_filename: str,
    ptypes,
    labeller: _Labeller,
    fof_labellers: Dict[str, _FofLabeller],
    with_potentials: bool,
    provenance: Dict[str, object],
    batch_rows: int,
    collect: bool,
) -> Dict[str, List[np.ndarray]]:
    """One membership file in CANONICAL (ascending cell) order carrying
    single-file cell metadata, streamed cell-slab by cell-slab."""
    from soap_tpu.io.swift_snapshot import SnapshotMetadata, read_masked_cells

    meta = SnapshotMetadata(snap_filename)
    os.makedirs(
        os.path.dirname(os.path.abspath(output_filename)), exist_ok=True
    )
    grnr_parts: Dict[str, List[np.ndarray]] = {}
    with h5py.File(snap_filename.format(file_nr=0), "r") as snap, h5py.File(
        output_filename, "w"
    ) as out:
        if "Header" in snap:
            snap.copy("Header", out)
            out["Header"].attrs["NumFilesPerSnapshot"] = np.array(
                [1], dtype=np.int32
            )
            for k, v in _membership_header(snap, provenance).items():
                if k not in out["Header"].attrs:
                    out["Header"].attrs[k] = v
            out["Header"].attrs["Code"] = "SOAP"
            out["Header"].attrs["OutputType"] = "Membership"
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
        for ptype in ptypes:
            if (
                ptype not in meta.datasets
                or "ParticleIDs" not in meta.datasets[ptype]
            ):
                continue
            counts = meta.cell_counts[ptype]
            n = int(counts.sum())
            row_offsets = np.concatenate([[0], np.cumsum(counts)])
            g = out.create_group(ptype)
            ds_grnr = _create_labelled_dataset(
                g, "GroupNr_bound", n, labeller.grnr.dtype
            )
            ds_rank = _create_labelled_dataset(g, "Rank_bound", n, np.int32)
            ds_pot = (
                _create_labelled_dataset(
                    g, "SpecificPotentialEnergies", n, np.float64
                )
                if with_potentials
                else None
            )
            fof_lab = fof_labellers.get(ptype)
            ds_fof = (
                _create_labelled_dataset(
                    g,
                    "FOFGroupIDs",
                    n,
                    fof_lab.gids.dtype if fof_lab.gids.size else np.int64,
                )
                if fof_lab is not None
                else None
            )
            for c0, c1 in _cell_slabs(counts, batch_rows):
                mask = np.zeros(meta.nr_cells, bool)
                mask[c0:c1] = True
                ids = read_masked_cells(meta, mask, {ptype: ["ParticleIDs"]})[
                    ptype
                ]["ParticleIDs"]
                a, b = int(row_offsets[c0]), int(row_offsets[c1])
                assert len(ids) == b - a
                grnr, rank, pot = labeller(ids)
                ds_grnr[a:b] = grnr
                ds_rank[a:b] = rank
                if ds_pot is not None:
                    ds_pot[a:b] = pot
                if ds_fof is not None:
                    ds_fof[a:b] = fof_lab(ids)
                if collect:
                    grnr_parts.setdefault(ptype, []).append(grnr)
    return grnr_parts


def _read_fof_columns(fof_filename: str, ptype: str):
    """ParticleIDs + FOFGroupIDs of one ptype across all FOF files."""
    ids, gids = [], []
    for fname in _snapshot_files(fof_filename):
        with h5py.File(fname, "r") as f:
            if ptype in f and "ParticleIDs" in f[ptype]:
                ids.append(f[ptype]["ParticleIDs"][...])
                gids.append(f[ptype]["FOFGroupIDs"][...])
    if not ids:
        return np.zeros(0, np.uint64), np.zeros(0, np.int64)
    return np.concatenate(ids), np.concatenate(gids)


def run_group_membership(
    snap_filename: str,
    halo_basename: str,
    output_filename: str,
    halo_format: str = "HBTplus",
    ptypes=("PartType0", "PartType1", "PartType4", "PartType5", "PartType6"),
    with_potentials: bool = False,
    fof_filename: Optional[str] = None,
    batch_rows: Optional[int] = None,
    return_labels: bool = True,
) -> Dict[str, np.ndarray]:
    """Full membership pipeline.

    ``with_potentials`` passes per-particle binding potential energies
    through from the halo finder when available (HBTplus; reference
    ``group_membership.py:98-134``, units (km/s)^2), written as
    ``SpecificPotentialEnergies`` — the dataset name the property engine
    consumes for ``PotentialEnergyTotal``.

    ``fof_filename`` names a separate FOF snapshot
    (``Snapshots/fof_filename`` in the reference's parameter file,
    ``group_membership.py:181,325-343``): its FOFGroupIDs are matched
    onto the snapshot by ParticleIDs and written into the membership
    file, so snapshots without an in-file FOFGroupIDs dataset still get
    the FOF-dependent properties (the pipeline reads membership files
    as extra input).

    Returns {ptype: GroupNr_bound} for convenience/testing (in output
    row order); pass ``return_labels=False`` (the CLI does) to keep the
    run memory-bounded — the labels then live only in the output files.
    """
    batch = batch_rows or BATCH
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
    labeller = _Labeller(ids_bound, grnr_bound, rank_bound, pot_bound)

    fof_labellers: Dict[str, _FofLabeller] = {}
    if fof_filename:
        for ptype in ptypes:
            fof_ids, fof_gids = _read_fof_columns(fof_filename, ptype)
            if len(fof_ids):
                fof_labellers[ptype] = _FofLabeller(fof_ids, fof_gids)

    provenance = {
        "halo_basename": halo_basename,
        "halo_format": halo_format,
        "swift_filename": snap_filename,
        "fof_filename": fof_filename or "",
    }
    writer = (
        _write_snapshot_layout
        if "{file_nr}" in output_filename
        else _write_monolithic
    )
    grnr_parts = writer(
        snap_filename,
        output_filename,
        ptypes,
        labeller,
        fof_labellers,
        with_potentials and pot_bound is not None,
        provenance,
        batch,
        return_labels,
    )
    return {
        pt: np.concatenate(parts) if len(parts) > 1 else parts[0]
        for pt, parts in grnr_parts.items()
    }
