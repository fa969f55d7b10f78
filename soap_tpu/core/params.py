"""YAML parameter file handling.

Keeps the reference's external contract (reference:
``SOAP/core/parameter_file.py:19-340`` and
``SOAP/core/combine_args.py:8-60``): a YAML file with sections
``Parameters / Snapshots / HaloFinder / GroupMembership / ExtraInput /
HaloProperties / <halo types> / aliases / filters / defined_constants /
calculations``, ``{param}`` path templating with ``{snap_nr}`` /
``{file_nr}`` deferred, per-property filter selection, halo-type
variations, aliases and defined constants, plus a ``.used_parameters``
mirror file.
"""

from __future__ import annotations

import string
from typing import Dict, List, Optional, Tuple

import yaml


class _KeepMissingFormatter(string.Formatter):
    """Substitute known fields, keep unknown/None fields as ``{name}``.

    Stands in for the reference's virgo ``PartialFormatter`` so that
    ``{snap_nr}`` and ``{file_nr}`` survive the first substitution pass and
    can be filled in later per file.
    """

    def get_value(self, key, args, kwargs):
        if isinstance(key, str):
            val = kwargs.get(key, None)
            if val is None:
                return "{" + key + "}"
            return val
        return super().get_value(key, args, kwargs)

    def format_field(self, value, format_spec):
        if isinstance(value, str) and value.startswith("{") and value.endswith("}"):
            # a kept-back placeholder: re-attach its format spec
            if format_spec:
                return value[:-1] + ":" + format_spec + "}"
            return value
        return super().format_field(value, format_spec)


def substitute_parameters(config: Dict, overrides: Dict) -> Dict:
    """Merge CLI overrides into the Parameters section and template paths.

    Mirror of the reference argument combiner
    (``SOAP/core/combine_args.py:8-60``): command-line values take
    precedence, every string entry in the other sections is formatted with
    the Parameters values (plus ``halo_finder`` from ``HaloFinder/type``),
    and ``{snap_nr}``/``{file_nr}`` are deliberately left unexpanded.
    """
    out: Dict = {"Parameters": dict(config.get("Parameters", {}))}
    for name, value in overrides.items():
        name = name.replace("-", "_")
        if value is not None or name not in out["Parameters"]:
            out["Parameters"][name] = value

    fmt = _KeepMissingFormatter()
    values = {
        k: v
        for k, v in out["Parameters"].items()
        if k not in ("snap_nr", "file_nr")
    }
    values["snap_nr"] = None
    values["file_nr"] = None
    if "HaloFinder" in config:
        values.setdefault("halo_finder", config["HaloFinder"].get("type"))

    def subst(node):
        if isinstance(node, str):
            return fmt.vformat(node, (), values)
        if isinstance(node, dict):
            return {k: subst(v) for k, v in node.items()}
        if isinstance(node, list):
            return [subst(v) for v in node]
        return node

    for section, content in config.items():
        if section == "Parameters":
            continue
        out[section] = subst(content)
    return out


class ParameterFile:
    """Wrapper over the parameter dictionary with SOAP-compatible queries."""

    HALO_TYPE_SECTIONS = (
        "SubhaloProperties",
        "ApertureProperties",
        "ProjectedApertureProperties",
        "SOProperties",
    )

    def __init__(
        self,
        file_name: Optional[str] = None,
        parameter_dictionary: Optional[Dict] = None,
        snipshot: bool = False,
    ):
        if file_name is not None:
            with open(file_name) as f:
                self.parameters: Dict = yaml.safe_load(f)
        else:
            self.parameters = dict(parameter_dictionary or {})
        self.snipshot = snipshot
        self._aliases: Optional[Dict[str, str]] = None
        self.unregistered: set = set()
        # filters actually chosen per halo type, needed again when
        # combining chunk files into the final catalogue
        self.property_filters: Dict[str, Dict[str, object]] = {}

    # ---- top-level knobs ----
    def calculate_missing_properties(self) -> bool:
        return self.parameters.get("calculations", {}).get(
            "calculate_missing_properties", True
        )

    def strict_halo_copy(self) -> bool:
        return self.parameters.get("calculations", {}).get(
            "strict_halo_copy", False
        )

    def recently_heated_gas_params(self) -> Dict:
        return dict(
            self.parameters.get("calculations", {}).get(
                "recently_heated_gas_filter", {}
            )
        )

    def get_parameters(self) -> Dict:
        return dict(self.parameters)

    def write_parameters(self, file_name: str = "SOAP.used_parameters.yml"):
        with open(file_name, "w") as f:
            yaml.safe_dump(self.parameters, f)

    # ---- property selection ----
    def get_property_filters(
        self, base_halo_type: str, full_list: List[str]
    ) -> Dict[str, object]:
        """Filter name per property, or False when disabled.

        Semantics follow ``SOAP/core/parameter_file.py:86-155``: a listed
        value may be a filter name, ``True`` (meaning "basic"), ``False``,
        or a ``{snapshot:, snipshot:}`` dict; unlisted properties default to
        "basic" when ``calculate_missing_properties`` is on, else to False.
        """
        section = self.parameters.setdefault(base_halo_type, {})
        listed = section.setdefault("properties", {})
        if not listed and not self.calculate_missing_properties():
            pass
        filters: Dict[str, object] = {}
        for prop in full_list:
            if prop in listed:
                value = listed[prop]
                if isinstance(value, dict):
                    value = value["snipshot" if self.snipshot else "snapshot"]
                if value is True:
                    value = "basic"
                filters[prop] = value
            elif self.calculate_missing_properties():
                filters[prop] = "basic"
                listed[prop] = "basic"
                self.unregistered.add((base_halo_type, prop))
            else:
                filters[prop] = False
            chosen = filters[prop]
            if isinstance(chosen, str):
                defined = chosen in self.parameters.get("filters", {})
                if not (defined or chosen == "basic"):
                    raise ValueError(
                        f'Filter "{chosen}" is not defined in parameter file'
                    )
            elif chosen is not False:
                raise ValueError(
                    f"Invalid filter value {chosen!r} for {base_halo_type}/{prop}"
                )
        self.property_filters.setdefault(base_halo_type, {}).update(filters)
        return filters

    def get_halo_type_variations(
        self, base_halo_type: str, default_variations: Dict
    ) -> Dict:
        """Variation dicts (aperture radii, SO multiples, ...) per type.

        Reference: ``SOAP/core/parameter_file.py:215-236``.
        """
        section = self.parameters.setdefault(base_halo_type, {})
        if "variations" not in section:
            section["variations"] = {
                name: dict(cfg) for name, cfg in default_variations.items()
            }
        return dict(section["variations"])

    # ---- dataset aliasing ----
    def get_aliases(self) -> Dict[str, str]:
        if self._aliases is None:
            aliases = dict(self.parameters.get("aliases", {}) or {})
            if "snipshot" in aliases:
                snip = aliases.pop("snipshot")
                if self.snipshot:
                    aliases = dict(snip)
            self._aliases = aliases
        return self._aliases

    def get_particle_property(self, property_name: str) -> Tuple[str, str]:
        property_name = self.get_aliases().get(property_name, property_name)
        parts = property_name.split("/")
        if len(parts) != 2:
            raise RuntimeError(
                f'Unable to parse particle property name "{property_name}"!'
            )
        return parts[0], parts[1]

    # ---- category filters & constants ----
    def get_filters(self, default_filters: Dict) -> Dict:
        filters = dict(default_filters)
        section = self.parameters.setdefault("filters", {})
        for category in default_filters:
            if category in section:
                filters[category] = section[category]
            else:
                section[category] = filters[category]
        return filters

    def get_defined_constants(self) -> Dict:
        return dict(self.parameters.get("defined_constants", {}) or {})
