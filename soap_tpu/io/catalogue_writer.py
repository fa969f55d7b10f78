"""SOAP-style halo catalogue writer.

Produces the reference's output file layout
(``SOAP/core/combine_chunks.py:206-404``, ``SOAP/core/result_set.py:243-273``):

 - one dataset per property under its halo-type group
   (``BoundSubhalo/TotalMass``, ``SO/200_crit/SORadius``, ...), float/int
   dtypes and unit attributes from the property table;
 - halos sorted spatially: by top-level snapshot cell of the halo centre,
   then by catalogue index (``combine_chunks.py:33-61``);
 - ``InputHalos/*`` passthrough columns (centre, index, is_central,
   number of bound particles, finder-specific extras);
 - SWIFT-style file metadata (Header / Cosmology / Units copies) plus
   SOAP provenance attributes.

Raw engine outputs are in PHYSICAL snapshot internal units; datasets
marked comoving in the table are stored as ``raw / a**a_exponent`` with
the matching ``a-scale exponent`` attribute, mirroring the reference's
unyt-based conversion on write.
"""

from __future__ import annotations

import os
import time
from typing import Dict, Mapping, Optional

import h5py
import numpy as np

from soap_tpu.core.registry import PropertyTable, full_property_table
from soap_tpu.core.units import UnitRegistry, attributes_from_unit


def spatial_sort_order(
    centres: np.ndarray,  # (H, 3) comoving
    index: np.ndarray,  # (H,) catalogue index
    boxsize: float,
    cells_per_dim: int,
) -> np.ndarray:
    """Sort halos by snapshot top-level cell, then catalogue index
    (``combine_chunks.py:33-61``)."""
    cell_size = boxsize / cells_per_dim
    ijk = np.floor(np.mod(centres, boxsize) / cell_size).astype(np.int64)
    ijk = np.clip(ijk, 0, cells_per_dim - 1)
    flat = (ijk[:, 0] * cells_per_dim + ijk[:, 1]) * cells_per_dim + ijk[:, 2]
    return np.lexsort((index, flat))


def _convert_for_output(
    raw: np.ndarray, prop, a: float, reg: UnitRegistry
) -> np.ndarray:
    """Physical internal-unit value -> stored catalogue value."""
    value = np.asarray(raw)
    if not prop.physical and prop.a_exponent is not None and prop.a_exponent != 0:
        value = value / a**prop.a_exponent
    return value.astype(prop.dtype, copy=False)


def write_property(
    f: h5py.File,
    full_name: str,
    data: np.ndarray,
    prop,
    reg: UnitRegistry,
    extra_attrs: Optional[Mapping[str, object]] = None,
):
    ds = f.create_dataset(full_name, data=data)
    unit = reg.parse(prop.unit)
    if not prop.physical and prop.a_exponent:
        unit = unit * (reg.units["a"] ** prop.a_exponent)
    attrs = attributes_from_unit(unit, prop.physical, prop.a_exponent, reg)
    for k, v in attrs.items():
        ds.attrs[k] = v
    ds.attrs["Description"] = np.bytes_(prop.description)
    ds.attrs["Lossy compression filter"] = np.bytes_(prop.compression)
    if extra_attrs:
        for k, v in extra_attrs.items():
            ds.attrs[k] = v


def write_catalogue(
    output_path: str,
    snapshot_meta,  # SnapshotMetadata
    reg: UnitRegistry,
    results: Dict[str, Dict[str, np.ndarray]],  # group -> key -> (H, ...)
    input_halos: Dict[str, np.ndarray],  # passthrough columns by table key
    order: np.ndarray,  # spatial sort permutation
    parameters_yaml: Optional[str] = None,
    git_hash: str = "unknown",
    table: Optional[PropertyTable] = None,
    dataset_extra_attrs: Optional[Mapping[str, Mapping[str, object]]] = None,
):
    """Write the final catalogue file."""
    if table is None:
        table = full_property_table()
    a = reg.a
    os.makedirs(os.path.dirname(os.path.abspath(output_path)), exist_ok=True)
    with h5py.File(output_path, "w") as f:
        # --- metadata groups (reference combine_chunks.py:206-248) ---
        hdr = f.create_group("Header")
        for k, v in snapshot_meta.header.items():
            try:
                hdr.attrs[k] = v
            except TypeError:
                pass
        hdr.attrs["Code"] = np.bytes_("SOAP-TPU")
        hdr.attrs["OutputType"] = np.bytes_("SOAP")
        hdr.attrs["SOAP git hash"] = np.bytes_(git_hash)
        hdr.attrs["SOAP date"] = np.bytes_(time.strftime("%Y-%m-%d %H:%M:%S"))
        cos = f.create_group("Cosmology")
        for k, v in snapshot_meta.cosmology_attrs.items():
            cos.attrs[k] = [v]
        units_g = f.create_group("Units")
        for k, v in snapshot_meta.snap_units_cgs.items():
            units_g.attrs[k] = [v]
        code_units = f.create_group("InternalCodeUnits")
        for k, v in snapshot_meta.code_units_cgs.items():
            code_units.attrs[k] = [v]
        if parameters_yaml is not None:
            pg = f.create_group("SOAPParameters")
            pg.attrs["used_parameters"] = np.bytes_(parameters_yaml)

        # --- InputHalos passthrough (keys present in the property table) ---
        for key, raw in input_halos.items():
            prop = table[key] if key in table else None
            data = np.asarray(raw)[order]
            if prop is not None:
                data = data.astype(prop.dtype, copy=False)
                name = prop.name
                if "/" not in name:
                    name = f"InputHalos/{name}"
                write_property(f, name, data, prop, reg)
            else:
                f.create_dataset(f"InputHalos/{key}", data=data)

        # --- computed halo-type groups ---
        extra = dataset_extra_attrs or {}
        for group, props in results.items():
            for key, raw in props.items():
                prop = table[key]
                data = _convert_for_output(np.asarray(raw)[order], prop, a, reg)
                full_name = f"{group}/{prop.name}"
                write_property(
                    f, full_name, data, prop, reg, extra_attrs=extra.get(full_name)
                )
