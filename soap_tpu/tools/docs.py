"""Documentation generator: property table -> RST / LaTeX.

Equivalent of the reference's table documentation generators
(``SOAP/property_table.py:5688,5797-5873``, invoked as
``python SOAP/property_table.py <params> <snap>`` per ``README.md:124-128``):
emits one row per property with name, shape, dtype, units, description,
compression filter, DMO flag, and which halo types compute it.
"""

from __future__ import annotations

from typing import Optional

from soap_tpu.core.halo_types import halo_type_keys
from soap_tpu.core.registry import full_property_table

HALO_TYPES = ("BoundSubhalo", "SO", "Aperture", "ProjectedAperture")
ABBREV = {"BoundSubhalo": "BS", "SO": "SO", "Aperture": "AP", "ProjectedAperture": "PA"}


def _types_for(key: str) -> str:
    keys = halo_type_keys()
    return ",".join(ABBREV[t] for t in HALO_TYPES if key in keys[t])


def generate_rst(output: Optional[str] = None) -> str:
    """reStructuredText list-table of every catalogue property."""
    table = full_property_table()
    lines = [
        "Halo properties",
        "===============",
        "",
        "Each row documents one dataset of the halo catalogue.  The",
        '"types" column lists the halo types computing it: BS =',
        "BoundSubhalo, SO = spherical overdensities, AP = apertures,",
        "PA = projected apertures.",
        "",
        ".. list-table::",
        "   :header-rows: 1",
        "",
        "   * - Name",
        "     - Shape",
        "     - Dtype",
        "     - Units",
        "     - Types",
        "     - Compression",
        "     - DMO",
        "     - Description",
    ]
    for key in sorted(table.keys(), key=lambda k: table[k].name):
        p = table[key]
        lines += [
            f"   * - ``{p.name}``",
            f"     - {p.shape}",
            f"     - {p.dtype}",
            f"     - ``{p.unit}``",
            f"     - {_types_for(key) or '-'}",
            f"     - {p.compression}",
            f"     - {'yes' if p.dmo else 'no'}",
            f"     - {p.description}",
        ]
    text = "\n".join(lines) + "\n"
    if output:
        with open(output, "w") as f:
            f.write(text)
    return text


def _tex_escape(s: str) -> str:
    for a, b in (
        ("\\", r"\textbackslash{}"),
        ("&", r"\&"),
        ("%", r"\%"),
        ("#", r"\#"),
        ("_", r"\_"),
        ("^", r"\^{}"),
        ("~", r"\~{}"),
        ("$", r"\$"),
    ):
        s = s.replace(a, b)
    return s


def generate_latex(output: Optional[str] = None) -> str:
    """LaTeX longtable of every catalogue property."""
    table = full_property_table()
    lines = [
        r"\begin{longtable}{p{0.28\textwidth}ccp{0.12\textwidth}cp{0.34\textwidth}}",
        r"\hline",
        r"Name & Shape & Dtype & Units & DMO & Description \\",
        r"\hline",
        r"\endhead",
    ]
    for key in sorted(table.keys(), key=lambda k: table[k].name):
        p = table[key]
        lines.append(
            " & ".join(
                [
                    r"\texttt{" + _tex_escape(p.name) + "}",
                    str(p.shape),
                    _tex_escape(str(p.dtype)),
                    r"\texttt{" + _tex_escape(p.unit) + "}",
                    "yes" if p.dmo else "no",
                    _tex_escape(p.description),
                ]
            )
            + r" \\"
        )
    lines += [r"\hline", r"\end{longtable}"]
    text = "\n".join(lines) + "\n"
    if output:
        with open(output, "w") as f:
            f.write(text)
    return text
