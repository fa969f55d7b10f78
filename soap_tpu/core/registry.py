"""Property registry: the output-catalogue API contract.

The reference framework's single source of truth is a static table of 304
property definitions (``SOAP/property_table.py:334`` — the
``full_property_list``), recording for every computable halo property its
output dataset name, per-halo shape, dtype, unit expression, description,
lossy-compression filter, DMO availability, required particle datasets and
comoving/physical convention.  The table data was extracted verbatim into
``property_table.json`` (see ``tools/extract_property_table.py``); this
module is the code that serves it.

TPU-native difference from the reference: properties here additionally
resolve to *static* output slots — (shape, dtype, unit) triples known at
trace time — so an enabled property set compiles to a fixed pytree of
device arrays and XLA dead-code-eliminates everything disabled.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from functools import lru_cache
from importlib import resources
from typing import Dict, List, Optional, Tuple

import numpy as np

_DTYPES = {
    "float32": np.float32,
    "float64": np.float64,
    "int32": np.int32,
    "int64": np.int64,
    "uint32": np.uint32,
    "uint64": np.uint64,
    "bool_": np.bool_,
}

#: Human-readable descriptions of SWIFT lossy compression filters
#: (reference: ``SOAP/property_table.py:297-307``).
COMPRESSION_DESCRIPTION = {
    "FMantissa9": "1.36693e10 -> 1.367e10",
    "FMantissa13": "1.36693e10 -> 1.3669e10",
    "DMantissa9": "1.36693e10 -> 1.367e10",
    "DScale6": "1 pc accurate",
    "DScale5": "10 pc accurate",
    "DScale1": "0.1 km/s accurate",
    "Nbit40": "Store less bits",
    "None": "no compression",
}


@dataclass(frozen=True)
class PropertyDef:
    """One entry of the catalogue API contract.

    Field semantics follow the reference table documentation
    (``SOAP/property_table.py:310-330``).
    """

    key: str  # internal name used by calculators
    name: str  # dataset name in the output file
    shape: int  # per-halo shape (1=scalar, 3=vector, 6=sym tensor, ...)
    dtype: np.dtype
    unit: str  # unit expression over snapshot base units
    description: str
    compression: str  # SWIFT lossy compression filter name
    dmo: bool  # computed in dark-matter-only runs?
    particle_properties: Tuple[str, ...]  # datasets needed to compute it
    physical: bool  # output stored physical (True) or comoving (False)
    a_exponent: Optional[float]  # a-scale exponent; None = not convertible

    @property
    def value_shape(self) -> Tuple[int, ...]:
        """Numpy shape of one halo's value (scalar -> ())."""
        if self.shape == 1:
            return ()
        return (self.shape,)


class PropertyTable:
    """Dictionary-like access to the full property list."""

    def __init__(self, data: Optional[dict] = None):
        if data is None:
            data = _load_table_json()
        self._props: Dict[str, PropertyDef] = {}
        for key, e in data["properties"].items():
            self._props[key] = PropertyDef(
                key=key,
                name=e["name"],
                shape=int(e["shape"]),
                dtype=np.dtype(_DTYPES[e["dtype"]]),
                unit=e["unit"],
                description=e["description"],
                compression=e["lossy_compression_filter"],
                dmo=bool(e["dmo_property"]),
                particle_properties=tuple(e["particle_properties"]),
                physical=bool(e["output_physical"]),
                a_exponent=(
                    None
                    if e["a_scale_exponent"] is None
                    else float(e["a_scale_exponent"])
                ),
            )

    def __getitem__(self, key: str) -> PropertyDef:
        return self._props[key]

    def __contains__(self, key: str) -> bool:
        return key in self._props

    def __iter__(self):
        return iter(self._props)

    def __len__(self) -> int:
        return len(self._props)

    def keys(self):
        return self._props.keys()

    def values(self):
        return self._props.values()

    def items(self):
        return self._props.items()

    def by_output_name(self, name: str) -> PropertyDef:
        for p in self._props.values():
            if p.name == name:
                return p
        raise KeyError(name)

    def dmo_keys(self) -> List[str]:
        return [k for k, p in self._props.items() if p.dmo]


@lru_cache(maxsize=1)
def _load_table_json() -> dict:
    path = resources.files("soap_tpu.core").joinpath("property_table.json")
    with path.open() as f:
        return json.load(f)


@lru_cache(maxsize=1)
def full_property_table() -> PropertyTable:
    """The shared immutable property table instance."""
    return PropertyTable()
