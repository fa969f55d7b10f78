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


def _hbt_layout(basename: str) -> Tuple[str, List[str]]:
    """('unsorted', SubSnap files) or ('sorted', [single file]).

    The sorted single-file layout (subhalos ordered by TrackId, flat
    ``Particles/ParticleIDs``) is detected by the basename existing as a
    file with a ``Particles`` group (``read_hbtplus.py:32-55``).
    """
    first = f"{basename}.0.hdf5"
    if os.path.exists(first):
        with h5py.File(first, "r") as f:
            nr_files = int(np.asarray(f["NumberOfFiles"])[0])
        return "unsorted", [f"{basename}.{i}.hdf5" for i in range(nr_files)]
    for cand in (basename, f"{basename}.hdf5"):
        if os.path.exists(cand):
            with h5py.File(cand, "r") as f:
                if "Particles" in f:
                    return "sorted", [cand]
            return "unsorted", [cand]
    raise FileNotFoundError(f"No HBTplus catalogue at {basename}")


def _hbt_units(basename: str) -> Tuple[float, float, float]:
    """(length in Mpc/h, mass in Msun/h, velocity in km/s) factors.

    Falls back to the run's ``Parameters.log`` two levels up when the
    catalogue lacks a Units group (``read_hbtplus.py:240-261``).
    """
    _, filenames = _hbt_layout(basename)
    with h5py.File(filenames[0], "r") as f:
        if "Units" in f:
            return (
                float(np.asarray(f["Units/LengthInMpch"]).ravel()[0]),
                float(np.asarray(f["Units/MassInMsunh"]).ravel()[0]),
                float(np.asarray(f["Units/VelInKmS"]).ravel()[0])
                if "VelInKmS" in f["Units"]
                else 1.0,
            )
    length, mass, vel = 1.0, 1.0, 1.0
    log_path = os.path.join(
        os.path.dirname(os.path.dirname(filenames[0])), "Parameters.log"
    )
    if os.path.exists(log_path):
        with open(log_path) as f:
            for line in f:
                fields = line.split()
                if len(fields) == 2:
                    if fields[0] == "LengthInMpch":
                        length = float(fields[1])
                    elif fields[0] == "MassInMsunh":
                        mass = float(fields[1])
                    elif fields[0] == "VelInKmS":
                        vel = float(fields[1])
    return length, mass, vel


def _expand_vlen(vlen: np.ndarray, dtype) -> Tuple[np.ndarray, np.ndarray]:
    """(concatenated values, per-halo lengths) from a vlen object array."""
    lengths = np.fromiter(
        (len(v) for v in vlen), dtype=np.int64, count=len(vlen)
    )
    if len(vlen):
        flat = np.concatenate([np.asarray(v, dtype=dtype) for v in vlen]) \
            if lengths.sum() else np.zeros(0, dtype)
    else:
        flat = np.zeros(0, dtype)
    return flat, lengths


def read_hbtplus_groupnr(basename: str, read_potential_energies: bool = False):
    """(nr_halos, ids_bound, grnr_bound, rank_bound[, potentials]).

    Group numbers follow the reference convention: the subhalo's global
    row index across all files; rank is the position within the bound
    list (0 = most bound).  Both the unsorted multi-file and the sorted
    single-file layouts are supported; vlen datasets are read whole and
    expanded vectorized (``read_hbtplus.py:70-148``).  Potential energies
    are returned in (km/s)^2.
    """
    layout, filenames = _hbt_layout(basename)
    ids_list, len_list, pot_list = [], [], []
    if layout == "sorted":
        with h5py.File(filenames[0], "r") as f:
            ids = np.asarray(f["Particles/ParticleIDs"], dtype=np.uint64)
            lengths = np.asarray(f["Subhalos/Nbound"], dtype=np.int64)
            pots = (
                np.asarray(f["Particles/PotentialEnergies"], dtype=np.float64)
                if read_potential_energies and "PotentialEnergies" in f["Particles"]
                else None
            )
    else:
        for fname in filenames:
            with h5py.File(fname, "r") as f:
                flat, lengths_f = _expand_vlen(
                    f["SubhaloParticles"][...], np.uint64
                )
                ids_list.append(flat)
                len_list.append(lengths_f)
                if read_potential_energies and "PotentialEnergies" in f:
                    pot_flat, _ = _expand_vlen(
                        f["PotentialEnergies"][...], np.float64
                    )
                    pot_list.append(pot_flat)
        ids = (
            np.concatenate(ids_list) if ids_list else np.zeros(0, np.uint64)
        )
        lengths = (
            np.concatenate(len_list) if len_list else np.zeros(0, np.int64)
        )
        pots = np.concatenate(pot_list) if pot_list else None
    n = len(lengths)
    grnr = np.repeat(np.arange(n, dtype=np.int64), lengths)
    ends = np.cumsum(lengths)
    rank = (np.arange(len(ids)) - np.repeat(ends - lengths, lengths)).astype(
        np.int32
    )
    out = (n, ids, grnr, rank)
    if read_potential_energies:
        vel = _hbt_units(basename)[2]
        out = out + ((pots * vel**2) if pots is not None else None,)
    return out


def read_hbtplus_catalogue(
    basename: str,
    h: float,
    a: float = 1.0,  # unused: HBT columns are comoving already
    keep_orphans: bool = False,
) -> HaloCatalogue:
    """Read an HBTplus SubSnap into a `HaloCatalogue`.

    Length/mass columns are converted from HBT's Mpc/h & Msun/h to the
    snapshot system (Mpc, 1e10 Msun) using the Hubble parameter ``h``;
    search radius is 1.01 x REncloseComoving (``read_hbtplus.py:317-321``);
    orphans (Nbound == 0) are dropped by default (``:296-298``).
    """
    layout, filenames = _hbt_layout(basename)
    length_unit, mass_unit, _vel = _hbt_units(basename)
    if layout == "sorted":
        # sorted single-file layout: one dataset per Subhalos field
        # (``read_hbtplus.py:278-292``)
        subs: Dict[str, np.ndarray] = {}
        with h5py.File(filenames[0], "r") as f:
            for name in f["Subhalos"]:
                subs[name] = np.asarray(f["Subhalos"][name])
        fields = set(subs)
        H = len(subs["Nbound"])
    else:
        rows = []
        for fname in filenames:
            with h5py.File(fname, "r") as f:
                rows.append(np.asarray(f["Subhalos"]))
        packed = np.concatenate(rows)
        fields = set(packed.dtype.names)
        subs = {name: packed[name] for name in fields}
        H = len(packed)
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
    depth = subs["Depth"].astype(np.int64) if "Depth" in fields else np.zeros(H, np.int64)

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
        if src in fields:
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
try:
    _register_finder_readers()
except AttributeError:
    # circular import (finder_readers imported first, mid-initialization):
    # finder_readers registers itself at the end of its own module body
    pass
