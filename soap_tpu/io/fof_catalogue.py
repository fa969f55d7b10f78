"""SWIFT FOF catalogue join: FOF/{Centres, Masses, Sizes, Radii} columns.

Equivalent of the reference's FOF join in the combine step
(``SOAP/core/combine_chunks.py:406-535``): for every CENTRAL subhalo with
a host FOF group, fetch the matching row of the SWIFT FOF output
(``Groups/{GroupIDs, Centres, Masses, Sizes[, Radii]}``) and attach it as
``FOF/*`` catalogue columns; satellites and hostless halos get zeros.
"""

from __future__ import annotations

from typing import Dict, Optional

import h5py
import numpy as np

from soap_tpu.pipeline.derived import match


def read_fof_groups(fof_filename: str) -> Dict[str, np.ndarray]:
    """Load the FOF group arrays from a (single-file) SWIFT FOF output."""
    out: Dict[str, np.ndarray] = {}
    with h5py.File(fof_filename.format(file_nr=0), "r") as f:
        g = f["Groups"]
        out["GroupIDs"] = np.asarray(g["GroupIDs"], dtype=np.int64)
        out["Centres"] = np.asarray(g["Centres"], dtype=np.float64)
        out["Masses"] = np.asarray(g["Masses"], dtype=np.float64)
        if "Sizes" in g:
            out["Sizes"] = np.asarray(g["Sizes"], dtype=np.int64)
        if "Radii" in g:
            out["Radii"] = np.asarray(g["Radii"], dtype=np.float64)
    return out


def fof_join(
    fof: Dict[str, np.ndarray],
    host_fof_id: np.ndarray,  # (H,) HBT HostHaloId
    is_central: np.ndarray,  # (H,) bool
) -> Dict[str, np.ndarray]:
    """FOF columns per halo (zeros for satellites/hostless)."""
    H = len(host_fof_id)
    keep = is_central.astype(bool) & (host_fof_id >= 0)
    idx = match(host_fof_id[keep], fof["GroupIDs"])
    if (idx < 0).any():
        raise RuntimeError(
            f"{int((idx < 0).sum())} central subhalos have no FOF group "
            "in the FOF catalogue"
        )
    out: Dict[str, np.ndarray] = {}
    centres = np.zeros((H, 3), np.float64)
    centres[keep] = fof["Centres"][idx]
    out["FOF/Centres"] = centres
    masses = np.zeros(H, np.float64)
    masses[keep] = fof["Masses"][idx]
    out["FOF/Masses"] = masses
    if "Sizes" in fof:
        sizes = np.zeros(H, np.int64)
        sizes[keep] = fof["Sizes"][idx]
        out["FOF/Sizes"] = sizes
    if "Radii" in fof:
        radii = np.zeros(H, np.float64)
        radii[keep] = fof["Radii"][idx]
        out["FOF/Radii"] = radii
    return out
