"""Membership validation + birth-halo tracking tools.

Counterparts of the reference's ``misc/check_group_membership.py``
(consistency of membership files against HBT particle lists) and
``misc/compute_BirthHaloCatalogueIndex.py`` (the subhalo each star
belonged to when it formed), both single-host vectorized numpy instead
of MPI parallel sorts.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import h5py
import numpy as np


def check_group_membership(
    snapshot_file: str,
    membership_file: str,
    halo_basename: str,
    halo_format: str = "HBTplus",
) -> Dict[str, int]:
    """Validate membership files against the halo finder's bound lists.

    For every subhalo: the particles carrying its GroupNr_bound in the
    membership files must be exactly the finder's bound-particle IDs,
    and Rank_bound must match each particle's position in the bound
    list.  Returns counters; raises on structural inconsistency.
    """
    from soap_tpu.io.halo_catalogue import GROUPNR_READERS

    res = GROUPNR_READERS[halo_format](halo_basename)
    nr_halos, bound_ids, bound_halo = res[:3]
    bound_rank = res[3] if len(res) > 3 else None

    # particle IDs + membership labels over the full snapshot
    snap_ids: List[np.ndarray] = []
    mem_halo: List[np.ndarray] = []
    mem_rank: List[np.ndarray] = []
    with h5py.File(snapshot_file, "r") as snap, h5py.File(
        membership_file, "r"
    ) as mem:
        for pt in list(snap):
            if not pt.startswith("PartType") or pt not in mem:
                continue
            if "ParticleIDs" not in snap[pt]:
                continue
            snap_ids.append(np.asarray(snap[pt]["ParticleIDs"]))
            mem_halo.append(np.asarray(mem[pt]["GroupNr_bound"]))
            mem_rank.append(np.asarray(mem[pt]["Rank_bound"]))
    ids = np.concatenate(snap_ids)
    halo = np.concatenate(mem_halo)
    rank = np.concatenate(mem_rank)
    if len(ids) != len(halo):
        raise RuntimeError("membership and snapshot row counts differ")

    # membership -> finder: every labelled particle appears in its
    # halo's bound list at the recorded rank
    order = np.argsort(bound_ids)
    sb_ids = bound_ids[order]
    lab = halo >= 0
    pos = np.searchsorted(sb_ids, ids[lab])
    pos = np.clip(pos, 0, len(sb_ids) - 1)
    found = sb_ids[pos] == ids[lab]
    if not found.all():
        raise RuntimeError(
            f"{int((~found).sum())} membership-labelled particles are not "
            "in any bound list"
        )
    rows = order[pos]
    if not (bound_halo[rows] == halo[lab]).all():
        raise RuntimeError("GroupNr_bound mismatch vs finder bound lists")
    if bound_rank is not None and not (bound_rank[rows] == rank[lab]).all():
        raise RuntimeError("Rank_bound mismatch vs finder bound lists")

    # finder -> membership: every bound particle is labelled
    order2 = np.argsort(ids)
    pos2 = np.searchsorted(ids, bound_ids, sorter=order2)
    pos2 = np.clip(pos2, 0, len(ids) - 1)
    found2 = ids[order2[pos2]] == bound_ids
    if not found2.all():
        raise RuntimeError(
            f"{int((~found2).sum())} bound particles missing from snapshot"
        )
    if not (halo[order2[pos2]] == bound_halo).all():
        raise RuntimeError("bound particles with wrong/no membership label")

    return {
        "n_particles": int(len(ids)),
        "n_labelled": int(lab.sum()),
        "n_bound": int(len(bound_ids)),
        "n_halos": int(nr_halos),
    }


def compute_birth_halo_index(
    snapshots: Sequence[Tuple[str, str]],
    final_snapshot: str,
    output_file: str,
) -> np.ndarray:
    """Subhalo catalogue index each star belonged to when it formed.

    ``snapshots`` is an ordered list of (snapshot_file, membership_file)
    covering increasing scale factor.  For every star in
    ``final_snapshot``, its birth snapshot is the FIRST snapshot with
    a >= BirthScaleFactors; the star's GroupNr_bound there (looked up by
    ParticleID) is its BirthHaloCatalogueIndex, -1 if unassigned or born
    after the last listed snapshot (reference
    ``misc/compute_BirthHaloCatalogueIndex.py``).
    """
    with h5py.File(final_snapshot, "r") as f:
        star_ids = np.asarray(f["PartType4/ParticleIDs"])
        birth_a = np.asarray(f["PartType4/BirthScaleFactors"], np.float64)

    out = np.full(len(star_ids), -1, dtype=np.int64)
    assigned = np.zeros(len(star_ids), bool)
    snap_as = []
    for snap_file, _ in snapshots:
        with h5py.File(snap_file, "r") as f:
            hdr = f["Header"].attrs
            a = float(np.ravel(hdr["Scale-factor"])[0])
        snap_as.append(a)
    order = np.argsort(snap_as)

    for i in order:
        snap_file, mem_file = snapshots[i]
        a = snap_as[i]
        todo = ~assigned & (birth_a <= a)
        if not todo.any():
            continue
        with h5py.File(snap_file, "r") as f:
            if "PartType4" not in f or "ParticleIDs" not in f["PartType4"]:
                continue
            ids_i = np.asarray(f["PartType4/ParticleIDs"])
        with h5py.File(mem_file, "r") as f:
            grnr_i = np.asarray(f["PartType4/GroupNr_bound"])
        o = np.argsort(ids_i)
        pos = np.searchsorted(ids_i, star_ids[todo], sorter=o)
        pos = np.clip(pos, 0, len(ids_i) - 1)
        hit = ids_i[o[pos]] == star_ids[todo]
        rows = np.flatnonzero(todo)[hit]
        out[rows] = grnr_i[o[pos[hit]]]
        assigned[rows] = True

    os.makedirs(os.path.dirname(os.path.abspath(output_file)), exist_ok=True)
    with h5py.File(output_file, "w") as f:
        g = f.create_group("PartType4")
        ds = g.create_dataset("BirthHaloCatalogueIndex", data=out)
        ds.attrs["Description"] = np.bytes_(
            "Catalogue index of the subhalo this star was bound to in the "
            "first snapshot at/after its birth scale factor (-1 if none)"
        )
        g.create_dataset("ParticleIDs", data=star_ids)
    return out
