"""Per-halo-type property key lists (API contract) and the
implemented-subset resolver.

The reference declares which property-table entries each halo type
computes in per-class ``property_list`` dicts
(``SOAP/particle_selection/subhalo_properties.py:2361``,
``SO_properties.py:3233``, ``aperture_properties.py:3716``,
``projected_aperture_properties.py:1596``).  Those key lists were
extracted verbatim to ``halo_type_property_keys.json``.

``implemented_keys_for`` intersects a type's list with what the TPU
property DAG currently implements (introspection over the lazy methods of
the corresponding ``HaloSlice`` subclass) and, for DMO runs, with the
table's DMO subset — the framework grows towards full parity by adding
lazy methods, no bookkeeping needed here.
"""

from __future__ import annotations

import json
from functools import lru_cache
from importlib import resources
from typing import Tuple

from soap_tpu.core.registry import full_property_table


@lru_cache(maxsize=1)
def halo_type_keys() -> dict:
    path = resources.files("soap_tpu.core").joinpath(
        "halo_type_property_keys.json"
    )
    with path.open() as f:
        return json.load(f)


_SLICE_CLASSES = {}


def _slice_class(halo_type: str):
    # late import to avoid a models <-> core cycle
    if not _SLICE_CLASSES:
        from soap_tpu.models import halo_slice as hs

        _SLICE_CLASSES.update(
            {
                "BoundSubhalo": hs.BoundSubhaloSlice,
                "SO": hs.SOSlice,
                "CoreExcisedSO": hs.SOSlice,
                "Aperture": hs.ApertureSlice,
                "ProjectedAperture": hs.ProjectedApertureSlice,
            }
        )
    return _SLICE_CLASSES[halo_type]


@lru_cache(maxsize=None)
def implemented_keys_for(halo_type: str, dmo: bool) -> Tuple[str, ...]:
    """The halo type's property keys that are implemented (and DMO-legal)."""
    cls = _slice_class(halo_type)
    table = full_property_table()
    keys = []
    for key in halo_type_keys()[halo_type]:
        if key not in table:
            continue
        if dmo and not table[key].dmo:
            continue
        if not hasattr(cls, key):
            continue
        keys.append(key)
    return tuple(keys)


@lru_cache(maxsize=None)
def missing_keys_for(halo_type: str) -> Tuple[str, ...]:
    """Contract keys not yet implemented — parity gap report."""
    cls = _slice_class(halo_type)
    table = full_property_table()
    return tuple(
        k
        for k in halo_type_keys()[halo_type]
        if k in table and not hasattr(cls, k)
    )
