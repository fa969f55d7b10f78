"""Additional halo-finder readers: VELOCIraptor, Gadget-4 SubFind,
EAGLE SubFind, Rockstar.

Same contract as the HBTplus reader (``soap_tpu/io/halo_catalogue.py``,
mirroring ``SOAP/catalogue_readers/read_hbtplus.py:196-209``): a
``read_<finder>_groupnr`` for membership and a ``read_<finder>_catalogue``
returning a `HaloCatalogue`.

File layouts follow the formats the reference consumes:
 - VELOCIraptor (``read_vr.py``): ``.properties`` (Xcminpot/Ycminpot/
   Zcminpot, R_size, ID, hostHaloID, Structuretype, numSubStruct),
   ``.catalog_groups`` (Group_Size, Offset, Offset_unbound),
   ``.catalog_particles[.unbound]`` (Particle_IDs); centrals have
   Structuretype == 10.
 - Gadget-4 SubFind (``read_subfind.py``): ``fof_subhalo_tab`` files with
   Subhalo/{SubhaloPos, SubhaloLenType, SubhaloOffsetType, SubhaloLen,
   SubhaloRankInGr, SubhaloGroupNr, SubhaloHalfmassRad}; membership from
   length+offset ranges over the group-ordered snapshot IDs; search
   radius = 4 x SubhaloHalfmassRad.
 - EAGLE SubFind (``read_subfind_eagle.py``): catalogue only —
   Subhalo/{CentreOfPotential, SubLength, SubGroupNumber, GroupNumber,
   HalfMassRad}.
 - Rockstar (``read_rockstar.py``): ASCII ``out_*.list`` halo catalogues
   (header row of column names; ID, X/Y/Z in Mpc/h, R200c in kpc/h).
"""

from __future__ import annotations

import glob
import os
from typing import Dict, List, Tuple

import h5py
import numpy as np

from soap_tpu.io.halo_catalogue import HaloCatalogue


# ----------------------------------------------------------------------
# VELOCIraptor
# ----------------------------------------------------------------------

def _vr_file(basename: str, suffix: str) -> str:
    for cand in (f"{basename}.{suffix}", f"{basename}.{suffix}.0"):
        if os.path.exists(cand):
            return cand
    raise FileNotFoundError(f"no VR {suffix} file for {basename}")


def read_vr_groupnr(basename: str):
    """(nr_halos, ids_bound, grnr_bound) from catalog_groups/particles."""
    with h5py.File(_vr_file(basename, "catalog_groups"), "r") as f:
        group_size = np.asarray(f["Group_Size"], dtype=np.int64)
        offset = np.asarray(f["Offset"], dtype=np.int64)
        offset_unbound = np.asarray(f["Offset_unbound"], dtype=np.int64)
    with h5py.File(_vr_file(basename, "catalog_particles"), "r") as f:
        ids_bound = np.asarray(f["Particle_IDs"], dtype=np.uint64)
    with h5py.File(_vr_file(basename, "catalog_particles.unbound"), "r") as f:
        nr_unbound_total = f["Particle_IDs"].shape[0]
    n = len(group_size)
    # bound size of group i = group_size[i] - (unbound in group i)
    end_bound = np.concatenate([offset[1:], [len(ids_bound)]])
    end_unbound = np.concatenate([offset_unbound[1:], [nr_unbound_total]])
    nr_bound = end_bound - offset
    grnr = np.full(len(ids_bound), -1, dtype=np.int64)
    for i in range(n):
        grnr[offset[i] : offset[i] + nr_bound[i]] = i
    return n, ids_bound, grnr


def read_vr_catalogue(basename: str, h: float = 1.0) -> HaloCatalogue:
    with h5py.File(_vr_file(basename, "properties"), "r") as f:
        x = np.asarray(f["Xcminpot"], dtype=np.float64)
        y = np.asarray(f["Ycminpot"], dtype=np.float64)
        z = np.asarray(f["Zcminpot"], dtype=np.float64)
        r_size = np.asarray(f["R_size"], dtype=np.float64)
        vr_id = np.asarray(f["ID"], dtype=np.int64)
        host = np.asarray(f["hostHaloID"], dtype=np.int64)
        stype = np.asarray(f["Structuretype"], dtype=np.int32)
        nsub = np.asarray(f["numSubStruct"], dtype=np.int64)
        npart = np.asarray(f["npart"], dtype=np.int64)
    H = len(vr_id)
    cofp = np.stack([x, y, z], axis=1)
    return HaloCatalogue(
        nr_halos=H,
        index=np.arange(H, dtype=np.int64),
        cofp=cofp,
        search_radius=1.01 * r_size,
        is_central=stype == 10,
        nr_bound_part=npart,
        fof_id=np.where(host >= 0, host, vr_id),
        passthrough={
            "VR/ID": vr_id.astype(np.uint64),
            "VR/Structuretype": stype,
            "VR/hostHaloID": host,
            "VR/numSubStruct": nsub.astype(np.uint64),
        },
    )


# ----------------------------------------------------------------------
# Gadget-4 SubFind
# ----------------------------------------------------------------------

def read_gadget4_groupnr(tab_file: str, snap_file: str):
    """(nr_halos, ids, grnr) from length+offset ranges over the
    group-ordered snapshot particle IDs."""
    with h5py.File(tab_file, "r") as f:
        lens = np.asarray(f["Subhalo/SubhaloLenType"], dtype=np.int64)
        offs = np.asarray(f["Subhalo/SubhaloOffsetType"], dtype=np.int64)
    all_ids, all_grnr = [], []
    with h5py.File(snap_file, "r") as f:
        for type_nr in range(lens.shape[1]):
            name = f"PartType{type_nr}/ParticleIDs"
            if name not in f:
                continue
            ids = np.asarray(f[name], dtype=np.uint64)
            grnr = np.full(len(ids), -1, dtype=np.int64)
            for i in range(lens.shape[0]):
                o, l = offs[i, type_nr], lens[i, type_nr]
                grnr[o : o + l] = i
            all_ids.append(ids)
            all_grnr.append(grnr)
    return lens.shape[0], np.concatenate(all_ids), np.concatenate(all_grnr)


def read_gadget4_catalogue(tab_file: str, h: float = 1.0) -> HaloCatalogue:
    with h5py.File(tab_file, "r") as f:
        pos = np.asarray(f["Subhalo/SubhaloPos"], dtype=np.float64)
        rank = np.asarray(f["Subhalo/SubhaloRankInGr"], dtype=np.int64)
        length = np.asarray(f["Subhalo/SubhaloLen"], dtype=np.int64)
        group_nr = np.asarray(f["Subhalo/SubhaloGroupNr"], dtype=np.int64)
        halfmass = np.asarray(f["Subhalo/SubhaloHalfmassRad"], dtype=np.float64)
    H = len(length)
    return HaloCatalogue(
        nr_halos=H,
        index=np.arange(H, dtype=np.int64),
        cofp=pos,
        # reference: 4 x half-mass radius as initial search radius
        search_radius=4.0 * halfmass,
        is_central=rank == 0,
        nr_bound_part=length,
        fof_id=group_nr,
        passthrough={},
    )


# ----------------------------------------------------------------------
# EAGLE SubFind (catalogue only; membership via conversion scripts)
# ----------------------------------------------------------------------

def read_subfind_eagle_catalogue(tab_file: str, h: float = 1.0) -> HaloCatalogue:
    with h5py.File(tab_file, "r") as f:
        pos = np.asarray(f["Subhalo/CentreOfPotential"], dtype=np.float64)
        length = np.asarray(f["Subhalo/SubLength"], dtype=np.int64)
        subgroup = np.asarray(f["Subhalo/SubGroupNumber"], dtype=np.int64)
        group = np.asarray(f["Subhalo/GroupNumber"], dtype=np.int64)
        halfmass = np.asarray(f["Subhalo/HalfMassRad"], dtype=np.float64)
        if halfmass.ndim == 2:  # per-type; use the total/stellar max
            halfmass = halfmass.max(axis=1)
    H = len(length)
    return HaloCatalogue(
        nr_halos=H,
        index=np.arange(H, dtype=np.int64),
        cofp=pos,
        search_radius=4.0 * halfmass,
        is_central=subgroup == 0,
        nr_bound_part=length,
        fof_id=group,
        passthrough={
            "SubfindEagle/group_nr": group.astype(np.uint64),
            "SubfindEagle/sub_group_nr": subgroup.astype(np.uint64),
        },
    )


# ----------------------------------------------------------------------
# Rockstar (ASCII out_*.list)
# ----------------------------------------------------------------------

def read_rockstar_catalogue(list_file: str, h: float) -> HaloCatalogue:
    """Parse a Rockstar ASCII halo list (units: Mpc/h positions,
    kpc/h radii — converted to Mpc comoving)."""
    with open(list_file) as f:
        header = f.readline().lstrip("#").split()
    cols = {name.split("(")[0].lower(): i for i, name in enumerate(header)}
    data = np.loadtxt(list_file, comments="#", ndmin=2)
    if data.size == 0:
        data = np.zeros((0, len(header)))

    def col(*names):
        for n in names:
            if n in cols:
                return data[:, cols[n]]
        raise KeyError(f"Rockstar column {names} not found in {header}")

    x = col("x") / h
    y = col("y") / h
    z = col("z") / h
    rvir = col("rvir", "r200c", "rs") / h / 1000.0  # kpc/h -> Mpc
    hid = col("id").astype(np.int64)
    pid = col("pid", "parent_id").astype(np.int64) if ("pid" in cols or "parent_id" in cols) else np.full(len(hid), -1, np.int64)
    npart = col("np", "num_p").astype(np.int64) if ("np" in cols or "num_p" in cols) else np.zeros(len(hid), np.int64)
    H = len(hid)
    return HaloCatalogue(
        nr_halos=H,
        index=np.arange(H, dtype=np.int64),
        cofp=np.stack([x, y, z], axis=1),
        search_radius=2.0 * rvir,
        is_central=pid < 0,
        nr_bound_part=npart,
        fof_id=np.where(pid >= 0, pid, hid),
        passthrough={},
    )
