"""Additional halo-finder readers: VELOCIraptor, Gadget-4 SubFind,
EAGLE SubFind, Rockstar.

Same contract as the HBTplus reader (``soap_tpu/io/halo_catalogue.py``,
mirroring ``SOAP/catalogue_readers/read_hbtplus.py:196-209``): a
``read_<finder>_groupnr`` for membership and a ``read_<finder>_catalogue``
returning a `HaloCatalogue`.

File layouts follow the formats the reference consumes:
 - VELOCIraptor (``read_vr.py``): single- or multi-file (``Num_of_files``)
   ``.properties`` (Xcminpot/Ycminpot/Zcminpot, R_size, ID, hostHaloID,
   Structuretype, numSubStruct), ``.catalog_groups`` (Group_Size, Offset,
   Offset_unbound — per-file local offsets), ``.catalog_particles
   [.unbound]``; centrals have Structuretype == 10; unit scaling from the
   ``UnitInfo`` attrs (``read_vr.py:309-333``).
 - Gadget-4 SubFind (``read_subfind.py``): single- or multi-file
   (``Header/NumFiles``) ``fof_subhalo_tab`` files; length conversion from
   ``Parameters/UnitLength_in_cm`` / ``HubbleParam``; search radius =
   4 x SubhaloHalfmassRad in PHYSICAL units (``read_subfind.py:228-232``).
 - EAGLE SubFind (``read_subfind_eagle.py``): catalogue only.
 - Rockstar (``read_rockstar.py``): ASCII ``out_*.list`` halo lists AND
   the native binary ``halos_*.bin`` chunk format (256-byte header +
   packed halo structs + particle IDs).
"""

from __future__ import annotations

import glob
import os
from typing import Dict, List, Tuple

import h5py
import numpy as np

from soap_tpu.io.halo_catalogue import HaloCatalogue

MPC_CM = 3.08567758e24


# ----------------------------------------------------------------------
# VELOCIraptor
# ----------------------------------------------------------------------

def _vr_files(basename: str, suffix: str) -> List[str]:
    """All files of one VR output kind (single- or multi-file layout)."""
    single = f"{basename}.{suffix}"
    if os.path.exists(single):
        return [single]
    first = f"{basename}.{suffix}.0"
    if os.path.exists(first):
        with h5py.File(first, "r") as f:
            nr = int(np.asarray(f["Num_of_files"]).ravel()[0])
        return [f"{basename}.{suffix}.{i}" for i in range(nr)]
    raise FileNotFoundError(f"no VR {suffix} file for {basename}")


def _vr_read(filenames: List[str], name: str, dtype) -> np.ndarray:
    return np.concatenate(
        [np.asarray(h5py.File(fn, "r")[name], dtype=dtype) for fn in filenames]
    )


def read_vr_groupnr(basename: str):
    """(nr_halos, ids_bound, grnr_bound).

    Offsets in ``catalog_groups`` are LOCAL to each file's
    ``catalog_particles`` (``read_vr.py:25-110``), so membership is
    assembled per file with a running global halo number.
    """
    group_files = _vr_files(basename, "catalog_groups")
    part_files = _vr_files(basename, "catalog_particles")
    unbound_files = _vr_files(basename, "catalog_particles.unbound")
    all_ids, all_grnr = [], []
    halo_offset = 0
    for gf, pf, uf in zip(group_files, part_files, unbound_files):
        with h5py.File(gf, "r") as f:
            offset = np.asarray(f["Offset"], dtype=np.int64)
        with h5py.File(pf, "r") as f:
            ids_bound = np.asarray(f["Particle_IDs"], dtype=np.uint64)
        n = len(offset)
        end_bound = np.concatenate([offset[1:], [len(ids_bound)]])
        nr_bound = end_bound - offset
        grnr = np.repeat(
            np.arange(halo_offset, halo_offset + n, dtype=np.int64), nr_bound
        )
        all_ids.append(ids_bound)
        all_grnr.append(grnr)
        halo_offset += n
    return (
        halo_offset,
        np.concatenate(all_ids) if all_ids else np.zeros(0, np.uint64),
        np.concatenate(all_grnr) if all_grnr else np.zeros(0, np.int64),
    )


def _vr_length_conversion(prop_file: str, h: float, a: float) -> float:
    """File length unit -> comoving Mpc (``read_vr.py:309-333``)."""
    with h5py.File(prop_file, "r") as f:
        if "UnitInfo" in f:
            units = dict(f["UnitInfo"].attrs)
        elif "SimulationInfo" in f and "Length_unit_to_kpc" in f["SimulationInfo"].attrs:
            units = dict(f["SimulationInfo"].attrs)
        else:
            return 1.0
    comoving = int(float(units.get("Comoving_or_Physical", 1)))
    to_kpc = float(units.get("Length_unit_to_kpc", 1000.0))
    if comoving == 0:
        # physical units, no h factor -> comoving
        return (1.0 / a) * to_kpc / 1000.0
    # comoving 1/h units (reference read_vr.py:331-333)
    return h * to_kpc / 1000.0


def read_vr_catalogue(basename: str, h: float = 1.0, a: float = 1.0) -> HaloCatalogue:
    files = _vr_files(basename, "properties")
    x = _vr_read(files, "Xcminpot", np.float64)
    y = _vr_read(files, "Ycminpot", np.float64)
    z = _vr_read(files, "Zcminpot", np.float64)
    r_size = _vr_read(files, "R_size", np.float64)
    vr_id = _vr_read(files, "ID", np.int64)
    host = _vr_read(files, "hostHaloID", np.int64)
    stype = _vr_read(files, "Structuretype", np.int32)
    nsub = _vr_read(files, "numSubStruct", np.int64)
    npart = _vr_read(files, "npart", np.int64)
    conv = _vr_length_conversion(files[0], h, a)
    H = len(vr_id)
    cofp = np.stack([x, y, z], axis=1) * conv
    return HaloCatalogue(
        nr_halos=H,
        index=np.arange(H, dtype=np.int64),
        cofp=cofp,
        search_radius=1.01 * r_size * conv,
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

def _gadget4_files(path: str) -> List[str]:
    """Single tab file, or all files of a multi-file tab set."""
    if os.path.exists(path):
        with h5py.File(path, "r") as f:
            nr = (
                int(np.asarray(f["Header"].attrs.get("NumFiles", 1)).ravel()[0])
                if "Header" in f
                else 1
            )
        if nr == 1 or not path.endswith(".0.hdf5"):
            return [path]
        base = path[: -len(".0.hdf5")]
        return [f"{base}.{i}.hdf5" for i in range(nr)]
    first = f"{path}.0.hdf5"
    if os.path.exists(first):
        with h5py.File(first, "r") as f:
            nr = int(np.asarray(f["Header"].attrs["NumFiles"]).ravel()[0])
        return [f"{path}.{i}.hdf5" for i in range(nr)]
    single = f"{path}.hdf5"
    if os.path.exists(single):
        return [single]
    raise FileNotFoundError(f"no Gadget-4 tab file at {path}")


def _gadget4_read(filenames: List[str], name: str, dtype) -> np.ndarray:
    parts = []
    for fn in filenames:
        with h5py.File(fn, "r") as f:
            if name in f:
                parts.append(np.asarray(f[name], dtype=dtype))
    return np.concatenate(parts) if parts else np.zeros(0, dtype)


def read_gadget4_groupnr(tab_file: str, snap_file: str):
    """(nr_halos, ids, grnr) from GLOBAL length+offset ranges over the
    group-ordered snapshot particle IDs; both file sets may be
    multi-file."""
    tabs = _gadget4_files(tab_file)
    lens = _gadget4_read(tabs, "Subhalo/SubhaloLenType", np.int64)
    offs = _gadget4_read(tabs, "Subhalo/SubhaloOffsetType", np.int64)
    snaps = _gadget4_files(snap_file)
    all_ids, all_grnr = [], []
    for type_nr in range(lens.shape[1]):
        ids = _gadget4_read(snaps, f"PartType{type_nr}/ParticleIDs", np.uint64)
        if len(ids) == 0:
            continue
        grnr = np.full(len(ids), -1, dtype=np.int64)
        o, l = offs[:, type_nr], lens[:, type_nr]
        sub = np.flatnonzero(l > 0)
        starts = o[sub]
        counts = l[sub]
        rows = np.repeat(starts, counts) + (
            np.arange(counts.sum()) - np.repeat(np.cumsum(counts) - counts, counts)
        )
        grnr[rows] = np.repeat(sub, counts)
        all_ids.append(ids)
        all_grnr.append(grnr)
    return (
        lens.shape[0],
        np.concatenate(all_ids) if all_ids else np.zeros(0, np.uint64),
        np.concatenate(all_grnr) if all_grnr else np.zeros(0, np.int64),
    )


def read_gadget4_catalogue(
    tab_file: str, h: float = 1.0, a: float = 1.0
) -> HaloCatalogue:
    tabs = _gadget4_files(tab_file)
    with h5py.File(tabs[0], "r") as f:
        params = f["Parameters"].attrs if "Parameters" in f else {}
        length_cgs = float(np.asarray(params.get("UnitLength_in_cm", MPC_CM)).ravel()[0])
        hubble = float(np.asarray(params.get("Hubble", 100.0)).ravel()[0])
        hubbleparam = float(np.asarray(params.get("HubbleParam", h)).ravel()[0])
    if hubble != 100.0:
        # reference read_subfind.py:177-178: only 1/h unit systems
        raise ValueError("Gadget-4 runs with Hubble != 100.0 not supported")
    conv = length_cgs / hubbleparam / MPC_CM  # -> Mpc (no h)
    pos = _gadget4_read(tabs, "Subhalo/SubhaloPos", np.float64) * conv
    rank = _gadget4_read(tabs, "Subhalo/SubhaloRankInGr", np.int64)
    length = _gadget4_read(tabs, "Subhalo/SubhaloLen", np.int64)
    group_nr = _gadget4_read(tabs, "Subhalo/SubhaloGroupNr", np.int64)
    halfmass = _gadget4_read(tabs, "Subhalo/SubhaloHalfmassRad", np.float64) * conv
    H = len(length)
    return HaloCatalogue(
        nr_halos=H,
        index=np.arange(H, dtype=np.int64),
        cofp=pos,
        # reference: 4 x half-mass radius in PHYSICAL units
        # (read_subfind.py:228-232) -> comoving for our convention
        search_radius=4.0 * halfmass / a,
        is_central=rank == 0,
        nr_bound_part=length,
        fof_id=group_nr,
        passthrough={},
    )


# ----------------------------------------------------------------------
# EAGLE SubFind (catalogue only; membership via conversion scripts)
# ----------------------------------------------------------------------

def read_subfind_eagle_catalogue(
    tab_file: str, h: float = 1.0, a: float = 1.0
) -> HaloCatalogue:
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
# Rockstar (ASCII out_*.list and binary halos_*.bin)
# ----------------------------------------------------------------------

#: the Rockstar binary chunk header (io/io_internal.h): 256 bytes
_ROCKSTAR_HEADER = np.dtype(
    [
        ("magic", "u8"),
        ("snap", "i8"),
        ("chunk", "i8"),
        ("scale", "f4"),
        ("Om", "f4"),
        ("Ol", "f4"),
        ("h0", "f4"),
        ("bounds", "f4", 6),
        ("num_halos", "i8"),
        ("num_particles", "i8"),
        ("box_size", "f4"),
        ("particle_mass", "f4"),
        ("particle_type", "i8"),
        ("format_revision", "i4"),
        ("rockstar_version", "S12"),
        ("unused", "S144"),
    ]
)

#: the packed `struct halo` (halo.h, standard build, 264 bytes)
_ROCKSTAR_HALO = np.dtype(
    [
        ("id", "i8"),
        ("pos", "f4", 6),
        ("corevel", "f4", 3),
        ("bulkvel", "f4", 3),
        ("m", "f4"),
        ("r", "f4"),
        ("child_r", "f4"),
        ("vmax_r", "f4"),
        ("mgrav", "f4"),
        ("vmax", "f4"),
        ("rvmax", "f4"),
        ("rs", "f4"),
        ("klypin_rs", "f4"),
        ("vrms", "f4"),
        ("J", "f4", 3),
        ("energy", "f4"),
        ("spin", "f4"),
        ("alt_m", "f4", 4),
        ("Xoff", "f4"),
        ("Voff", "f4"),
        ("b_to_a", "f4"),
        ("c_to_a", "f4"),
        ("A", "f4", 3),
        ("b_to_a2", "f4"),
        ("c_to_a2", "f4"),
        ("A2", "f4", 3),
        ("bullock_spin", "f4"),
        ("kin_to_pot", "f4"),
        ("m_pe_b", "f4"),
        ("m_pe_d", "f4"),
        ("halfmass_radius", "f4"),
        ("num_p", "i8"),
        ("num_child_particles", "i8"),
        ("p_start", "i8"),
        ("desc", "i8"),
        ("flags", "i8"),
        ("n_core", "i8"),
        ("min_pos_err", "f4"),
        ("min_vel_err", "f4"),
        ("min_bulkvel_err", "f4"),
        ("_pad2", "f4"),
    ]
)


def read_rockstar_binary(path: str) -> Tuple[np.ndarray, Dict[str, float]]:
    """(halo struct array, header info) from one binary chunk file."""
    with open(path, "rb") as f:
        header = np.frombuffer(f.read(_ROCKSTAR_HEADER.itemsize), _ROCKSTAR_HEADER)[0]
        n = int(header["num_halos"])
        file_size = os.path.getsize(path)
        per_halo = (
            (file_size - _ROCKSTAR_HEADER.itemsize - 8 * int(header["num_particles"]))
            // n
            if n
            else _ROCKSTAR_HALO.itemsize
        )
        if per_halo != _ROCKSTAR_HALO.itemsize:
            raise ValueError(
                f"unsupported Rockstar halo struct size {per_halo} "
                f"(expected {_ROCKSTAR_HALO.itemsize}) in {path}"
            )
        halos = np.frombuffer(f.read(n * _ROCKSTAR_HALO.itemsize), _ROCKSTAR_HALO)
    info = {
        "scale": float(header["scale"]),
        "h0": float(header["h0"]),
        "box_size": float(header["box_size"]),
        "num_particles": int(header["num_particles"]),
    }
    return halos, info


def _rockstar_binary_files(path: str) -> List[str]:
    if os.path.exists(path) and path.endswith(".bin"):
        base = path.rsplit(".", 2)[0]
        chunks = sorted(
            glob.glob(f"{base}.*.bin"),
            key=lambda p: int(p.rsplit(".", 2)[1]),
        )
        return chunks if chunks else [path]
    return []


def read_rockstar_catalogue(
    list_file: str, h: float, a: float = 1.0
) -> HaloCatalogue:
    """Read a Rockstar catalogue: ASCII ``out_*.list`` or binary
    ``halos_*.bin`` chunks (positions Mpc/h comoving, radii kpc/h)."""
    if list_file.endswith(".bin"):
        chunks = _rockstar_binary_files(list_file)
        parts = [read_rockstar_binary(c) for c in chunks]
        halos = np.concatenate([p[0] for p in parts])
        h0 = parts[0][1]["h0"] or h
        hid = halos["id"].astype(np.int64)
        cofp = halos["pos"][:, :3].astype(np.float64) / h0
        rvir = halos["r"].astype(np.float64) / h0 / 1000.0  # kpc/h -> Mpc
        npart = halos["num_p"].astype(np.int64)
        pid = np.full(len(hid), -1, np.int64)  # binary chunks: no parents
        H = len(hid)
        return HaloCatalogue(
            nr_halos=H,
            index=np.arange(H, dtype=np.int64),
            cofp=cofp,
            search_radius=2.0 * rvir,
            is_central=pid < 0,
            nr_bound_part=npart,
            fof_id=hid,
            passthrough={},
        )
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


# register with the finder dispatch tables (safe against either import
# order; see halo_catalogue._register_finder_readers)
from soap_tpu.io import halo_catalogue as _hc  # noqa: E402

_hc._register_finder_readers()
