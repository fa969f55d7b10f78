"""Virtual snapshot builder + empty catalogue creator.

``make_virtual_snapshot`` — equivalent of the reference's
``SOAP/compression/make_virtual_snapshot.py``: creates an HDF5 file whose
particle datasets are virtual views of the snapshot files, with the
membership files' datasets (GroupNr_bound, Rank_bound) spliced in as
additional members of each PartType group, so downstream tools see one
snapshot containing membership.

``create_empty_catalogue`` — equivalent of
``SOAP/compression/create_empty_SOAP_catalogue.py``: a structurally
complete zero-halo catalogue for snapshots without halos, so tooling that
expects a catalogue per snapshot keeps working.
"""

from __future__ import annotations

import os
from typing import List, Optional

import h5py
import numpy as np

from soap_tpu.core.halo_types import halo_type_keys, implemented_keys_for
from soap_tpu.core.registry import full_property_table


def make_virtual_snapshot(
    snapshot_file: str,
    membership_file: str,
    output_file: str,
) -> None:
    """Single-file layout: virtual datasets pointing at snapshot +
    membership files (relative paths, like the reference)."""
    os.makedirs(os.path.dirname(os.path.abspath(output_file)), exist_ok=True)
    rel_snap = os.path.relpath(snapshot_file, os.path.dirname(output_file) or ".")
    rel_mem = os.path.relpath(membership_file, os.path.dirname(output_file) or ".")
    with h5py.File(snapshot_file, "r") as snap, h5py.File(
        membership_file, "r"
    ) as mem, h5py.File(output_file, "w") as out:
        # copy global metadata groups directly
        for group in snap:
            if not group.startswith("PartType"):
                snap.copy(snap[group], out, group)
        for ptype in snap:
            if not ptype.startswith("PartType"):
                continue
            g = out.create_group(ptype)
            for name, ds in snap[ptype].items():
                layout = h5py.VirtualLayout(shape=ds.shape, dtype=ds.dtype)
                layout[...] = h5py.VirtualSource(
                    rel_snap, f"{ptype}/{name}", shape=ds.shape
                )
                v = g.create_virtual_dataset(name, layout)
                for k, val in ds.attrs.items():
                    v.attrs[k] = val
            if ptype in mem:
                for name, ds in mem[ptype].items():
                    layout = h5py.VirtualLayout(shape=ds.shape, dtype=ds.dtype)
                    layout[...] = h5py.VirtualSource(
                        rel_mem, f"{ptype}/{name}", shape=ds.shape
                    )
                    v = g.create_virtual_dataset(name, layout)
                    for k, val in ds.attrs.items():
                        v.attrs[k] = val


def create_empty_catalogue(
    snapshot_file: str,
    output_file: str,
    dmo: bool = False,
) -> int:
    """Zero-halo catalogue with the full dataset structure; returns the
    number of (empty) datasets created."""
    from soap_tpu.core.units import attributes_from_unit
    from soap_tpu.io.catalogue_writer import write_property
    from soap_tpu.io.swift_snapshot import SnapshotMetadata

    meta = SnapshotMetadata(snapshot_file)
    table = full_property_table()
    reg = meta.units
    n = 0
    os.makedirs(os.path.dirname(os.path.abspath(output_file)) or ".", exist_ok=True)
    with h5py.File(output_file, "w") as f:
        hdr = f.create_group("Header")
        for k, v in meta.header.items():
            try:
                hdr.attrs[k] = v
            except TypeError:
                pass
        hdr.attrs["OutputType"] = np.bytes_("SOAP")
        hdr.attrs["NumberOfHalos"] = np.int64(0)
        cos = f.create_group("Cosmology")
        for k, v in meta.cosmology_attrs.items():
            cos.attrs[k] = [v]
        groups = {
            "BoundSubhalo": implemented_keys_for("BoundSubhalo", dmo),
            "SO/200_crit": implemented_keys_for("SO", dmo),
            "ExclusiveSphere/100kpc": implemented_keys_for("Aperture", dmo),
            "ProjectedAperture/100kpc/projz": implemented_keys_for(
                "ProjectedAperture", dmo
            ),
        }
        for group, keys in groups.items():
            for key in keys:
                p = table[key]
                shape = (0,) if p.shape == 1 else (0, p.shape)
                data = np.zeros(shape, p.dtype)
                write_property(f, f"{group}/{p.name}", data, p, reg)
                n += 1
        for key in ("cofp", "index", "is_central", "nr_bound_part"):
            p = table[key]
            shape = (0,) if p.shape == 1 else (0, p.shape)
            name = p.name if "/" in p.name else f"InputHalos/{p.name}"
            write_property(f, name, np.zeros(shape, p.dtype), p, reg)
            n += 1
    return n
