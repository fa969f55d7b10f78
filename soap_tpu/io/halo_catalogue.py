"""Halo-finder catalogue readers.

Same two-function contract per finder as the reference
(``SOAP/catalogue_readers/read_hbtplus.py:196-209``):

 - ``read_<finder>_groupnr(basename)`` -> (nr_halos, particle IDs, group
   numbers[, rank]) for the membership program;
 - ``read_<finder>_catalogue(basename, registry, boxsize, a)`` -> dict of
   per-halo arrays with the required keys ``index, cofp, search_radius,
   is_central, nr_bound_part`` plus finder-specific passthrough columns.

No MPI: a single host process reads all files (halo catalogues are tiny
compared to snapshots — ~10^7 rows of scalars); arrays are plain numpy
with separate unit metadata.

HBTplus specifics mirrored from the reference reader
(``read_hbtplus.py:32-148,240-403``): unsorted multi-file ``SubSnap``
layout, lengths in Mpc/h comoving, masses in Msun/h, orphan (0-bound)
subhalos dropped, search radius = 1.01 x REncloseComoving, TrackId /
HostHaloId / Depth / peak-mass passthrough columns.
"""

from __future__ import annotations

import glob
import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import h5py
import numpy as np


@dataclass
class HaloCatalogue:
    """Host-side halo catalogue ready for the engine."""

    nr_halos: int
    index: np.ndarray  # i64 catalogue row of each halo (pre-filter)
    cofp: np.ndarray  # (H, 3) f64 comoving centre of potential
    search_radius: np.ndarray  # (H,) f64 comoving
    is_central: np.ndarray  # (H,) bool
    nr_bound_part: np.ndarray  # (H,) i64
    fof_id: np.ndarray  # (H,) i64 host FOF group id (HostHaloId+1 style)
    passthrough: Dict[str, np.ndarray] = field(default_factory=dict)

    def select(self, mask: np.ndarray) -> "HaloCatalogue":
        return HaloCatalogue(
            nr_halos=int(mask.sum()),
            index=self.index[mask],
            cofp=self.cofp[mask],
            search_radius=self.search_radius[mask],
            is_central=self.is_central[mask],
            nr_bound_part=self.nr_bound_part[mask],
            fof_id=self.fof_id[mask],
            passthrough={k: v[mask] for k, v in self.passthrough.items()},
        )


def _hbt_filenames(basename: str) -> List[str]:
    """All SubSnap files for a basename (multi-file unsorted layout)."""
    first = f"{basename}.0.hdf5"
    if os.path.exists(first):
        with h5py.File(first, "r") as f:
            nr_files = int(np.asarray(f["NumberOfFiles"])[0])
        return [f"{basename}.{i}.hdf5" for i in range(nr_files)]
    single = f"{basename}.hdf5"
    if os.path.exists(single):
        return [single]
    raise FileNotFoundError(f"No HBTplus catalogue at {basename}")


def _hbt_units(f: h5py.File) -> Tuple[float, float]:
    """(length in Mpc/h, mass in Msun/h) conversion factors."""
    if "Units" in f:
        length = float(np.asarray(f["Units/LengthInMpch"])[0])
        mass = float(np.asarray(f["Units/MassInMsunh"])[0])
        return length, mass
    return 1.0, 1.0


def read_hbtplus_groupnr(basename: str):
    """(nr_halos, ids_bound, grnr_bound, rank_bound) for membership.

    Group numbers follow the reference convention: the subhalo's global
    row index across all files; rank is the position within the bound
    list (0 = most bound).  Reference: ``read_hbtplus.py:70-148``.
    """
    filenames = _hbt_filenames(basename)
    ids, grnr, rank = [], [], []
    halo_offset = 0
    for fname in filenames:
        with h5py.File(fname, "r") as f:
            subs = f["Subhalos"]
            nbound = np.asarray(subs["Nbound"], dtype=np.int64)
            parts = f["SubhaloParticles"]
            for local_i in range(len(nbound)):
                pids = np.asarray(parts[local_i], dtype=np.uint64)
                n = len(pids)
                ids.append(pids)
                grnr.append(np.full(n, halo_offset + local_i, dtype=np.int64))
                rank.append(np.arange(n, dtype=np.int32))
            halo_offset += len(nbound)
    if not ids:
        return 0, np.zeros(0, np.uint64), np.zeros(0, np.int64), np.zeros(0, np.int32)
    return (
        halo_offset,
        np.concatenate(ids),
        np.concatenate(grnr),
        np.concatenate(rank),
    )


def read_hbtplus_catalogue(
    basename: str,
    h: float,
    keep_orphans: bool = False,
) -> HaloCatalogue:
    """Read an HBTplus SubSnap into a `HaloCatalogue`.

    Length/mass columns are converted from HBT's Mpc/h & Msun/h to the
    snapshot system (Mpc, 1e10 Msun) using the Hubble parameter ``h``;
    search radius is 1.01 x REncloseComoving (``read_hbtplus.py:317-321``);
    orphans (Nbound == 0) are dropped by default (``:296-298``).
    """
    filenames = _hbt_filenames(basename)
    rows = []
    for fname in filenames:
        with h5py.File(fname, "r") as f:
            length_unit, mass_unit = _hbt_units(f)
            rows.append(np.asarray(f["Subhalos"]))
    subs = np.concatenate(rows)
    H = len(subs)
    index = np.arange(H, dtype=np.int64)

    nbound = subs["Nbound"].astype(np.int64)
    keep = np.ones(H, bool) if keep_orphans else nbound > 0

    to_mpc = length_unit / h  # Mpc/h -> Mpc comoving
    cofp = subs["ComovingMostBoundPosition"].astype(np.float64) * to_mpc
    renclose = subs["REncloseComoving"].astype(np.float64) * to_mpc
    search_radius = 1.01 * renclose
    is_central = subs["Rank"].astype(np.int64) == 0
    track = subs["TrackId"].astype(np.int64)
    host = subs["HostHaloId"].astype(np.int64)
    depth = subs["Depth"].astype(np.int64) if "Depth" in subs.dtype.names else np.zeros(H, np.int64)

    to_1e10msun = mass_unit / h / 1.0e10
    passthrough = {
        "HBTplus/TrackId": track,
        "HBTplus/HostHaloId": host,
        "HBTplus/Depth": depth,
    }
    for src, dst, conv in (
        ("NestedParentTrackId", "HBTplus/NestedParentTrackId", None),
        ("DescendantTrackId", "HBTplus/DescendantTrackId", None),
        ("LastMaxMass", "HBTplus/LastMaxMass", to_1e10msun),
        ("LastMaxVmaxPhysical", "HBTplus/LastMaxVmaxPhysical", None),
        ("SnapshotOfBirth", "HBTplus/SnapshotOfBirth", None),
        ("SnapshotOfLastMaxMass", "HBTplus/SnapshotOfLastMaxMass", None),
        ("SnapshotOfLastMaxVmax", "HBTplus/SnapshotOfLastMaxVmax", None),
        ("SnapshotOfLastIsolation", "HBTplus/SnapshotOfLastIsolation", None),
    ):
        if src in subs.dtype.names:
            col = subs[src]
            passthrough[dst] = col * conv if conv else np.asarray(col)

    cat = HaloCatalogue(
        nr_halos=H,
        index=index,
        cofp=cofp,
        search_radius=search_radius,
        is_central=is_central,
        nr_bound_part=nbound,
        fof_id=host,
        passthrough=passthrough,
    )
    return cat.select(keep)


def _register_finder_readers():
    """Finder registry (reference dispatch: ``halo_centres.py:75-96``)."""
    from soap_tpu.io import finder_readers as fr

    CATALOGUE_READERS.update(
        {
            "VR": fr.read_vr_catalogue,
            "Gadget4": fr.read_gadget4_catalogue,
            "SubfindEagle": fr.read_subfind_eagle_catalogue,
            "Rockstar": fr.read_rockstar_catalogue,
        }
    )
    GROUPNR_READERS["VR"] = fr.read_vr_groupnr


CATALOGUE_READERS = {"HBTplus": read_hbtplus_catalogue}
GROUPNR_READERS = {"HBTplus": read_hbtplus_groupnr}
_register_finder_readers()
