"""Build the halo-type calculation list from a parameter file.

Mirrors the reference's construction of ``halo_prop_list``
(``SOAP/compute_halo_properties.py:224-511``): SubhaloProperties first
(category filters depend on its particle counts), then SO variations
(plain before radius-multiples), 3D apertures sorted by radius, projected
apertures.  Default variation sets match the reference defaults
(``compute_halo_properties.py:249-262,317-337,442-450``).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

from soap_tpu.core.halo_types import halo_type_keys, implemented_keys_for
from soap_tpu.core.params import ParameterFile
from soap_tpu.pipeline.engine import HaloTypeSpec

DEFAULT_SO_VARIATIONS = {
    "200_mean": {"value": 200.0, "type": "mean"},
    "50_crit": {"value": 50.0, "type": "crit"},
    "100_crit": {"value": 100.0, "type": "crit"},
    "200_crit": {"value": 200.0, "type": "crit"},
    "500_crit": {"value": 500.0, "type": "crit"},
    "1000_crit": {"value": 1000.0, "type": "crit"},
    "2500_crit": {"value": 2500.0, "type": "crit"},
    "BN98": {"value": 0.0, "type": "BN98"},
    "5xR500_crit": {"value": 500.0, "type": "crit", "radius_multiple": 5.0},
}

DEFAULT_APERTURE_VARIATIONS = {
    f"{kind}_{r}_kpc": {"radius_in_kpc": float(r), "inclusive": kind == "inclusive"}
    for kind in ("inclusive", "exclusive")
    for r in (10, 30, 50, 100, 300, 500, 1000, 3000)
}

DEFAULT_PROJECTED_VARIATIONS = {
    f"{r}_kpc": {"radius_in_kpc": float(r)} for r in (10, 30, 50, 100)
}


def _so_group_name(name: str, cfg: Dict) -> str:
    return f"SO/{name}"


def _aperture_name(r_kpc: float) -> str:
    """Sub-kpc radii are named in parsecs (reference
    ``aperture_properties.py:3965-3971``: 300pc, 100pc, ...)."""
    if r_kpc < 1.0:
        return f"{1000.0 * r_kpc:.0f}pc"
    return f"{r_kpc:.0f}kpc"


def _enabled_keys(
    params: Optional[ParameterFile], base_halo_type: str, keys: Tuple[str, ...]
) -> Tuple[str, ...]:
    """Drop properties disabled in the parameter file.

    Reference semantics (``SOAP/core/parameter_file.py:120-154``): a
    property listed as ``false`` is not computed and not written;
    unlisted properties follow ``calculate_missing_properties``.  The
    parameter file lists properties by OUTPUT name (e.g. ``TotalMass``).
    """
    if params is None:
        return tuple(keys)
    from soap_tpu.core.registry import full_property_table

    table = full_property_table()
    names = [table[k].name for k in keys]
    filters = params.get_property_filters(base_halo_type, names)
    return tuple(k for k, n in zip(keys, names) if filters[n] is not False)


def build_specs(
    params: Optional[ParameterFile],
    dmo: bool,
    bn98_value: float,
    subhalo: bool = True,
    so: bool = True,
    apertures: bool = True,
    projected: bool = True,
) -> List[HaloTypeSpec]:
    """Assemble the ordered HaloTypeSpec list."""
    specs: List[HaloTypeSpec] = []

    if subhalo:
        sub_keys = _enabled_keys(
            params, "SubhaloProperties", implemented_keys_for("BoundSubhalo", dmo)
        )
        # the category filters derive from BoundSubhalo particle counts
        # (reference ``category_filter.py:1-106``); keep the counts
        # computed even when disabled in the parameter file — the writer
        # drops disabled keys afterwards (``run.drop_disabled_keys``)
        count_keys = tuple(
            k
            for k in ("Ngas", "Ndm", "Nstar", "Nbh")
            if k in implemented_keys_for("BoundSubhalo", dmo)
            and k not in sub_keys
        )
        specs.append(
            HaloTypeSpec(
                kind="bound",
                group="BoundSubhalo",
                keys=sub_keys + count_keys,
            )
        )

    if so:
        variations = (
            params.get_halo_type_variations("SOProperties", DEFAULT_SO_VARIATIONS)
            if params
            else dict(DEFAULT_SO_VARIATIONS)
        )
        so_keys = _enabled_keys(
            params, "SOProperties", implemented_keys_for("SO", dmo)
        )
        plain = {
            n: c for n, c in variations.items() if not c.get("radius_multiple")
        }
        multiples = {
            n: c for n, c in variations.items() if c.get("radius_multiple")
        }
        ce_keys = _enabled_keys(
            params, "SOProperties", implemented_keys_for("CoreExcisedSO", dmo)
        )
        for name, cfg in plain.items():
            so_type = cfg["type"]
            value = float(cfg.get("value", 0.0))
            if so_type == "BN98":
                value = bn98_value
            keys = so_keys
            if cfg.get("core_excision_fraction"):
                # CoreExcisedSOProperties = SO list + the excised extras
                # (reference ``SO_properties.py:3745-3770``)
                keys = tuple(so_keys) + tuple(
                    k for k in ce_keys if k not in so_keys
                )
            if "radius_in_kpc" in cfg:
                specs.append(
                    HaloTypeSpec(
                        kind="SO",
                        group=_so_group_name(name, cfg),
                        keys=keys,
                        so_type="physical",
                        so_multiple=float(cfg["radius_in_kpc"]) / 1000.0,
                        core_excision_fraction=cfg.get("core_excision_fraction"),
                        centrals_only=True,
                        halo_filter=cfg.get("filter", "basic"),
                    )
                )
            else:
                specs.append(
                    HaloTypeSpec(
                        kind="SO",
                        group=_so_group_name(name, cfg),
                        keys=keys,
                        so_type=so_type,
                        so_multiple=value,
                        core_excision_fraction=cfg.get("core_excision_fraction"),
                        centrals_only=True,
                        halo_filter=cfg.get("filter", "basic"),
                    )
                )
        for name, cfg in multiples.items():
            # e.g. 5xR500_crit: needs the parent SO's radius in the results
            mult = float(cfg["radius_multiple"])
            parent = None
            for pname, pcfg in plain.items():
                if (
                    pcfg["type"] == cfg["type"]
                    and float(pcfg.get("value", -1)) == float(cfg.get("value", -2))
                ):
                    parent = _so_group_name(pname, pcfg)
                    break
            if parent is None:
                raise ValueError(
                    f"radius-multiple SO {name} has no parent SO variation"
                )
            specs.append(
                HaloTypeSpec(
                    kind="SO",
                    group=_so_group_name(name, cfg),
                    keys=so_keys,
                    so_type=cfg["type"],
                    so_multiple=float(cfg.get("value", 0.0)),
                    radius_multiple_of=parent,
                    radius_multiple=mult,
                    centrals_only=True,
                    halo_filter=cfg.get("filter", "basic"),
                )
            )

    if apertures:
        variations = (
            params.get_halo_type_variations(
                "ApertureProperties", DEFAULT_APERTURE_VARIATIONS
            )
            if params
            else dict(DEFAULT_APERTURE_VARIATIONS)
        )
        ap_keys = _enabled_keys(
            params, "ApertureProperties", implemented_keys_for("Aperture", dmo)
        )
        strict = params.strict_halo_copy() if params else False
        rad_dep = tuple(
            k
            for k in halo_type_keys()["ApertureRadiusDependent"]
            if k in ap_keys
        )
        prev_by_kind: Dict[bool, Optional[Tuple[str, float]]] = {
            True: None,
            False: None,
        }
        # apertures sized by a previously computed property
        # (``aperture_properties.py:3977-3989``: group name N x <prop>)
        from soap_tpu.core.registry import full_property_table

        table = full_property_table()
        prop_variations = {
            n: c for n, c in variations.items() if "property" in c
        }
        fixed_variations = {
            n: c for n, c in variations.items() if "property" not in c
        }
        for name, cfg in prop_variations.items():
            src = cfg["property"]  # e.g. BoundSubhalo/HalfMassRadiusStars
            src_group, src_output = src.rsplit("/", 1)
            src_key = table.by_output_name(src_output).key
            mult = float(cfg.get("radius_multiple", 1.0))
            inclusive = bool(cfg.get("inclusive", False))
            prefix = "InclusiveSphere" if inclusive else "ExclusiveSphere"
            specs.append(
                HaloTypeSpec(
                    kind="aperture",
                    group=f"{prefix}/{int(mult)}x{src_output}",
                    keys=ap_keys,
                    inclusive=inclusive,
                    radius_property=(src_group, src_key, mult),
                    halo_filter=cfg.get("filter", "basic"),
                )
            )
        variations = fixed_variations
        # kind-major, radius-minor ordering: all exclusive radii form one
        # consecutive run, then all inclusive ones.  ``_halo_fn`` blocks
        # CONSECUTIVE same-signature specs into ONE vmapped family (one
        # shared gather/sort + lane-batched reductions); interleaving the
        # kinds would split the 16 apertures into 16 singleton programs
        # (16x the HLO and 16x the lane-independent work).
        for name, cfg in sorted(
            variations.items(),
            key=lambda kv: (
                bool(kv[1].get("inclusive", False)),
                float(kv[1]["radius_in_kpc"]),
            ),
        ):
            r_kpc = float(cfg["radius_in_kpc"])
            inclusive = bool(cfg.get("inclusive", False))
            prefix = "InclusiveSphere" if inclusive else "ExclusiveSphere"
            prev = prev_by_kind[inclusive]
            # aperture-copy: exclusive apertures can copy from the
            # next-smaller one when it enclosed every bound particle
            # (``aperture_properties.py:4082-4123``); inclusive spheres
            # only when the parameter file opts in with
            # skip_gt_enclose_radius (``compute_halo_properties.py:
            # 364-370`` passes the smaller-radii list only then)
            can_copy = prev is not None and (
                not inclusive or bool(cfg.get("skip_gt_enclose_radius"))
            )
            group = f"{prefix}/{_aperture_name(r_kpc)}"
            specs.append(
                HaloTypeSpec(
                    kind="aperture",
                    group=group,
                    keys=ap_keys,
                    aperture_radius_mpc=r_kpc / 1000.0,
                    inclusive=inclusive,
                    copy_from=prev[0] if can_copy else None,
                    copy_from_radius_mpc=prev[1] if can_copy else None,
                    strict_keys=rad_dep if strict else (),
                    halo_filter=cfg.get("filter", "basic"),
                )
            )
            prev_by_kind[inclusive] = (group, r_kpc / 1000.0)

    if projected:
        variations = (
            params.get_halo_type_variations(
                "ProjectedApertureProperties", DEFAULT_PROJECTED_VARIATIONS
            )
            if params
            else dict(DEFAULT_PROJECTED_VARIATIONS)
        )
        pr_keys = _enabled_keys(
            params,
            "ProjectedApertureProperties",
            implemented_keys_for("ProjectedAperture", dmo),
        )
        strict = params.strict_halo_copy() if params else False
        pr_rad_dep = tuple(
            k
            for k in halo_type_keys()["ProjectedApertureRadiusDependent"]
            if k in pr_keys
        )
        # projected apertures sized by a previously computed property
        # (e.g. COLIBRE's twice_stellar_half_mass)
        from soap_tpu.core.registry import full_property_table

        table = full_property_table()
        for name, cfg in {
            n: c for n, c in variations.items() if "property" in c
        }.items():
            src = cfg["property"]
            src_group, src_output = src.rsplit("/", 1)
            src_key = table.by_output_name(src_output).key
            mult = float(cfg.get("radius_multiple", 1.0))
            for axis, label in enumerate("xyz"):
                specs.append(
                    HaloTypeSpec(
                        kind="projected",
                        group=(
                            f"ProjectedAperture/{int(mult)}x{src_output}"
                            f"/proj{label}"
                        ),
                        keys=pr_keys,
                        axis=axis,
                        radius_property=(src_group, src_key, mult),
                        halo_filter=cfg.get("filter", "basic"),
                    )
                )
        variations = {
            n: c for n, c in variations.items() if "property" not in c
        }

        # axis-major, radius-minor: the 4 radii of one projection axis
        # form one consecutive vmapped family sharing that axis's
        # projected-radius sort (the sort key is radius-independent, so
        # it stays unbatched under the family vmap)
        radii_sorted = sorted(
            variations.items(), key=lambda kv: float(kv[1]["radius_in_kpc"])
        )
        for axis, label in enumerate("xyz"):
            prev_proj: Optional[Tuple[str, float]] = None
            for name, cfg in radii_sorted:
                r_kpc = float(cfg["radius_in_kpc"])
                prev = (
                    (f"ProjectedAperture/{prev_proj[0]}/proj{label}", prev_proj[1])
                    if prev_proj
                    else None
                )
                specs.append(
                    HaloTypeSpec(
                        kind="projected",
                        group=(
                            f"ProjectedAperture/{_aperture_name(r_kpc)}"
                            f"/proj{label}"
                        ),
                        keys=pr_keys,
                        aperture_radius_mpc=r_kpc / 1000.0,
                        axis=axis,
                        copy_from=prev[0] if prev else None,
                        copy_from_radius_mpc=prev[1] if prev else None,
                        strict_keys=pr_rad_dep if strict else (),
                        halo_filter=cfg.get("filter", "basic"),
                    )
                )
                prev_proj = (_aperture_name(r_kpc), r_kpc / 1000.0)

    return specs
