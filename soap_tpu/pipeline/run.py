"""End-to-end halo property computation: the ``compute_halo_properties``
equivalent (reference ``SOAP/compute_halo_properties.py:68-695``).

Single-host flow (multi-chunk/multi-host orchestration lives in
``soap_tpu/parallel``):

 1. read snapshot metadata + membership extra input;
 2. read the halo-finder catalogue, apply filters;
 3. for each chunk: mask cells, read particles, stage to device,
    run the bucketed halo engine;
 4. assemble InputHalos passthrough, spatially sort, write catalogue.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence

import numpy as np

from soap_tpu.core.category_filter import DEFAULT_FILTERS, CategoryFilter
from soap_tpu.core.params import ParameterFile
from soap_tpu.core.registry import full_property_table
from soap_tpu.io import swift_snapshot
from soap_tpu.io.catalogue_writer import spatial_sort_order, write_catalogue
from soap_tpu.io.halo_catalogue import CATALOGUE_READERS, HaloCatalogue
from soap_tpu.models.context import HaloContext
from soap_tpu.parallel import multihost
from soap_tpu.pipeline import derived
from soap_tpu.pipeline.chunks import process_chunks, required_datasets
from soap_tpu.pipeline.engine import HaloTypeSpec
from soap_tpu.pipeline.specs import build_specs

#: particle datasets every run needs per ptype (DMO tier);
#: hydro tiers extend this per-spec from the property table's
#: ``particle_properties`` lists.
BASE_FIELDS = ["Coordinates", "Masses", "Velocities", "GroupNr_bound", "FOFGroupIDs"]

#: default solar abundance ratios (overridable via the parameter file's
#: ``defined_constants`` section; values mirror the reference's example
#: parameter files)
DEFAULT_CONSTANTS = {
    "O_H_sun": 4.9e-4,
    "Fe_H_sun": 2.82e-5,
    "N_O_sun": 0.138,
    "C_O_sun": 0.549,
    "Mg_H_sun": 3.98e-5,
}


def _progress(msg: str) -> None:
    """Progress/verbose lines go to stderr: stdout stays reserved for
    results (bench.py's one-JSON-line contract, CLI outputs)."""
    print(msg, file=sys.stderr, flush=True)


def _git_hash() -> str:
    try:
        return (
            subprocess.run(
                ["git", "rev-parse", "HEAD"],
                capture_output=True,
                text=True,
                cwd=__file__.rsplit("/", 2)[0],
            ).stdout.strip()
            or "unknown"
        )
    except Exception:
        return "unknown"


def make_context(
    meta: swift_snapshot.SnapshotMetadata,
    ptypes: Sequence[str],
    dmo: bool,
    parameter_file: Optional[ParameterFile] = None,
) -> HaloContext:
    """HaloContext from snapshot metadata (physical snapshot units)."""
    # recently-heated AGN gas filter thresholds (reference
    # ``recently_heated_gas_filter.py:49-152``): a_limit such that the
    # lookback time to a_limit equals delta_time (default 15 Myr)
    agn_a_limit, agn_Tmin, agn_Tmax = 2.0, 0.0, float("inf")
    rh = parameter_file.recently_heated_gas_params() if parameter_file else {}
    H0_internal = float(meta.cosmology_attrs.get("H0 [internal units]", 0.0))
    if H0_internal > 0:
        delta_myr = float(rh.get("delta_time_in_Myr", 15.0))
        ut_s = meta.snap_units_cgs["Unit time in cgs (U_t)"]
        delta_internal = delta_myr * 3.15576e13 / ut_s
        # invert lookback(a) = delta_time with the age table
        age_a, age_h0 = meta.cosmology.age_table()
        ages_internal = age_h0 / H0_internal
        t_now = np.interp(meta.a, age_a, ages_internal)
        agn_a_limit = float(
            np.interp(t_now - delta_internal, ages_internal, age_a)
        )
        if rh.get("use_AGN_delta_T", True) and meta.AGN_delta_T > 0:
            agn_Tmin = meta.AGN_delta_T * 10.0 ** float(
                rh.get("delta_logT_min", -1.0)
            )
            agn_Tmax = meta.AGN_delta_T * 10.0 ** float(
                rh.get("delta_logT_max", 0.3)
            )
    # Newton's G in snapshot units from the CGS constant
    ul = meta.snap_units_cgs["Unit length in cgs (U_L)"]
    um = meta.snap_units_cgs["Unit mass in cgs (U_M)"]
    ut = meta.snap_units_cgs["Unit time in cgs (U_t)"]
    G_snap = meta.constants_cgs["newton_G"] * um * ut**2 / ul**3
    soft = []
    for pt in ptypes:
        if pt == "PartType1":
            soft.append(meta.dark_matter_softening)
        elif pt == "PartType6":
            soft.append(meta.nu_softening)
        else:
            soft.append(meta.baryon_softening)
    # mean neutrino background density (physical): Omega_nu_0 * rho_crit0 / a^3
    nu_density = 0.0
    omega_nu = float(meta.cosmology_attrs.get("Omega_nu_0", 0.0))
    if omega_nu:
        rho_crit0 = meta.critical_density / float(
            meta.cosmology.E(np.array(meta.a)) ** 2
        )
        nu_density = omega_nu * rho_crit0 / meta.a**3
    return HaloContext(
        a=meta.a,
        z=meta.z,
        G=G_snap,
        boxsize=meta.boxsize,
        critical_density=meta.critical_density,
        mean_density=meta.mean_density,
        nu_density=nu_density,
        H=float(meta.cosmology_attrs.get("H [internal units]", 0.0)),
        omega_m=float(meta.cosmology_attrs.get("Omega_m", 0.0)),
        omega_g=float(meta.cosmology_attrs.get("Omega_g", 0.0)),
        agn_a_limit=agn_a_limit,
        agn_Tmin=agn_Tmin,
        agn_Tmax=agn_Tmax,
        observer_position=tuple(float(v) for v in meta.observer_position),
        # cold dense filter: n_H > n_min folded into a physical mass
        # density threshold in SNAPSHOT units (f32-safe)
        # float() coercion: YAML 1.1 parses exponent literals without a
        # sign ("3.16e4") as STRINGS — production COLIBRE files use them
        cold_dense_rho_threshold=(
            float(
                parameter_file.get_parameters()
                .get("calculations", {})
                .get("cold_dense_gas_filter", {})
                .get("minimum_hydrogen_number_density_cm3", 0.1)
                if parameter_file
                else 0.1
            )
            * 1.67262192369e-24  # m_H in g
            * meta.snap_units_cgs["Unit length in cgs (U_L)"] ** 3
            / meta.snap_units_cgs["Unit mass in cgs (U_M)"]
        ),
        cold_dense_Tmax=float(
            parameter_file.get_parameters()
            .get("calculations", {})
            .get("cold_dense_gas_filter", {})
            .get("maximum_temperature_K", 10.0**4.5)
            if parameter_file
            else 10.0**4.5
        ),
        named_columns=tuple(
            # column metadata applies to every particle type carrying the
            # dataset; register under each "PartTypeN/<name>" key
            (f"{pt}/{ds}", tuple(cols))
            for ds, cols in sorted(meta.named_columns.items())
            for pt in meta.ptypes
            if ds in meta.datasets.get(pt, {})
        ),
        constants=tuple(
            sorted(
                {
                    **DEFAULT_CONSTANTS,
                    **(
                        parameter_file.get_defined_constants()
                        if parameter_file
                        else {}
                    ),
                }.items()
            )
        ),
        softening=tuple(soft),
        ptypes=tuple(ptypes),
        capacities=tuple(0 for _ in ptypes),
        dmo=dmo,
    )


#: output group prefix -> parameter-file base halo type (reference
#: ``category_filter.py:158-165``)
GROUP_TO_BASE = {
    "BoundSubhalo": "SubhaloProperties",
    "SO": "SOProperties",
    "ExclusiveSphere": "ApertureProperties",
    "InclusiveSphere": "ApertureProperties",
    "ProjectedAperture": "ProjectedApertureProperties",
}


def apply_category_filters(
    results: Dict[str, Dict[str, np.ndarray]],
    cat_filter: CategoryFilter,
    parameter_file: Optional[ParameterFile],
    n_halos: int,
    specs: Optional[Sequence[HaloTypeSpec]] = None,
) -> tuple:
    """Zero out masked halos in-place; return (dataset_attrs, group_attrs).

    Two masking levels, both from BoundSubhalo particle counts:
     - per-property category from the parameter file (listed by OUTPUT
       name, ``parameter_file.py:120-154``) — recorded in each dataset's
       ``Masked``/``Mask Datasets`` attrs
       (``combine_chunks.py:341-351``);
     - per-variation ``halo_filter`` (``compute_halo_properties.py:278-502``)
       — halos failing it are zeroed for the whole group, and the group's
       attrs record the category (``combine_chunks.py:365-368``).
    """
    sub = results.get("BoundSubhalo", {})
    masks = cat_filter.category_masks(sub, n_halos)
    attrs: Dict[str, Dict[str, object]] = {}
    group_attrs: Dict[str, Dict[str, object]] = {}
    table = full_property_table()
    halo_filters = {s.group: s.halo_filter for s in (specs or ())}
    for group, props in results.items():
        base = GROUP_TO_BASE.get(group.split("/")[0])
        categories: Dict[str, object] = {}
        if parameter_file is not None and base is not None:
            categories = parameter_file.get_property_filters(
                base, [table[k].name for k in props.keys()]
            )
        halo_filter = halo_filters.get(group, "basic")
        group_attrs[group] = cat_filter.filter_metadata(
            halo_filter if halo_filter != "basic" else None
        )
        halo_mask = masks.get(halo_filter)
        for key in list(props):
            name = table[key].name
            category = categories.get(name, "basic")
            if category is False or not isinstance(category, str):
                category = "basic"
            attrs[f"{group}/{name}"] = cat_filter.filter_metadata(category)
            mask = masks.get(category, masks["basic"])
            if halo_mask is not None:
                mask = mask & halo_mask
            if not mask.all():
                if hasattr(props, "set_mask"):
                    # lazy combined results: register the mask, applied at
                    # column load time (keeps the combine memory-bounded)
                    props.set_mask(key, mask)
                else:
                    arr = props[key]
                    keep = mask.reshape((-1,) + (1,) * (arr.ndim - 1))
                    props[key] = np.where(keep, arr, 0)
    return attrs, group_attrs


def drop_disabled_keys(
    results: Dict[str, Dict[str, np.ndarray]],
    parameter_file: Optional[ParameterFile],
) -> None:
    """Remove properties disabled in the parameter file from the output.

    ``build_specs`` keeps the BoundSubhalo particle counts computed even
    when disabled (the category filters need them); the reference never
    writes disabled properties (``parameter_file.py:120-154``).
    """
    if parameter_file is None:
        return
    table = full_property_table()
    for group, props in results.items():
        base = GROUP_TO_BASE.get(group.split("/")[0])
        chosen = parameter_file.property_filters.get(base or "", {})
        for key in [k for k in props if chosen.get(table[k].name) is False]:
            del props[key]


@dataclass
class RunResult:
    results: Dict[str, Dict[str, np.ndarray]]
    catalogue: HaloCatalogue
    order: np.ndarray
    stats: object
    output_path: Optional[str]
    #: the HaloContext the engine ran with (filter thresholds, cosmology
    #: constants) — lets tests/oracles recompute properties independently
    ctx: Optional[object] = None


def compute_halo_properties(
    snapshot_file: str,
    membership_file: str,
    halo_basename: str,
    output_file: Optional[str],
    halo_format: str = "HBTplus",
    parameter_file: Optional[ParameterFile] = None,
    dmo: bool = True,
    centrals_only: bool = False,
    max_halos: int = 0,
    halo_indices: Optional[np.ndarray] = None,
    min_read_radius_mpc: float = 5.0e-3,
    specs: Optional[List[HaloTypeSpec]] = None,
    nr_chunks: int = 1,
    scratch_dir: Optional[str] = None,
    prev_halo_basename: Optional[str] = None,
    next_halo_basename: Optional[str] = None,
    fof_filename: Optional[str] = None,
    host_index: Optional[int] = None,
    host_count: Optional[int] = None,
    reference_snapshot: Optional[str] = None,
    record_halo_timings: bool = False,
    record_property_timings: bool = False,
    verbose: bool = True,
) -> RunResult:
    """Run the full pipeline on one snapshot (single chunk).

    ``halo_indices`` / ``centrals_only`` / ``max_halos`` mirror the
    reference's debugging flags (``soap_args.py:44-106``,
    ``halo_centres.py:109-134``).
    """
    t0 = time.time()
    meta = swift_snapshot.SnapshotMetadata(
        snapshot_file,
        [membership_file] if membership_file else [],
        ref_filename=reference_snapshot,
    )

    cat = CATALOGUE_READERS[halo_format](halo_basename, h=meta.h, a=meta.a)
    if halo_indices is not None:
        keep = np.isin(cat.index, np.asarray(halo_indices))
        cat = cat.select(keep)
    if centrals_only:
        cat = cat.select(cat.is_central)
    if max_halos and cat.nr_halos > max_halos:
        keep = np.zeros(cat.nr_halos, bool)
        keep[:max_halos] = True
        cat = cat.select(keep)

    # search radius floor (reference halo_centres.py:166-227 applies
    # per-type floors; physical radius here).  The parameter file's
    # ``calculations.min_read_radius_cmpc`` (comoving Mpc,
    # ``soap_args.py:144``) overrides the keyword default.
    if parameter_file is not None:
        cmpc = (
            parameter_file.get_parameters()
            .get("calculations", {})
            .get("min_read_radius_cmpc")
        )
        if cmpc is not None:
            min_read_radius_mpc = float(cmpc) * meta.a
    search_radius_phys = np.maximum(
        cat.search_radius * meta.a, min_read_radius_mpc
    )

    ptypes = [pt for pt in meta.ptypes if pt in meta.datasets and meta.datasets[pt]]
    if dmo:
        ptypes = [pt for pt in ptypes if pt in ("PartType1", "PartType6")]
    ctx = make_context(meta, ptypes, dmo, parameter_file)

    if specs is None:
        specs = build_specs(parameter_file, dmo, bn98_value=meta.virBN98)

    # floor the search radius at the largest fixed physical radius any
    # spec needs (reference ``halo_centres.py:166-227`` clips read and
    # search radii to physical_radius_mpc); the engine applies the same
    # floor internally and the chunk read mask covers it separately
    from soap_tpu.pipeline.engine import min_physical_radius

    search_radius_phys = np.maximum(
        search_radius_phys, min_physical_radius(specs)
    )

    # shared device constants: the a -> age lookup table in internal time
    # units (replaces the reference's per-particle astropy calls,
    # ``stellar_age_calculator.py``)
    aux = {}
    H0_internal = float(meta.cosmology_attrs.get("H0 [internal units]", 0.0))
    if H0_internal > 0:
        age_a, age_h0 = meta.cosmology.age_table()
        aux["age_table"] = (
            age_a.astype(np.float32),
            (age_h0 / H0_internal).astype(np.float32),
        )

    # --- chunked processing (Peano decomposition for nr_chunks > 1);
    # multi-host runs take a round-robin chunk subset and hand off via
    # the shared scratch directory (soap_tpu/parallel/multihost.py) ---
    chunk_subset = None
    if host_index is None and host_count is None:
        host_index, host_count = multihost.detect_host_rank()
    if host_count and host_count > 1:
        assert scratch_dir, "multi-host runs require --scratch-dir"
        chunk_subset = multihost.chunks_for_host(
            nr_chunks, host_index or 0, host_count
        )
        if verbose:
            _progress(
                f"host {host_index}/{host_count}: chunks {chunk_subset}"
            )
    results, engine_stats = process_chunks(
        meta,
        cat,
        ctx,
        specs,
        ptypes,
        search_radius_phys,
        nr_chunks=nr_chunks,
        scratch_dir=scratch_dir,
        extra_fields=required_datasets(specs, meta),
        aux=aux,
        chunk_subset=chunk_subset,
        t0=t0,
        verbose=verbose,
        record_halo_timings=record_halo_timings,
        record_property_timings=record_property_timings,
    )
    if chunk_subset is not None:
        # compute phase of a multi-host run: this host only covers its
        # chunk subset.  EXACTLY ONE host performs the combine+write: the
        # first to find every scratch file complete claims the combine
        # with an O_EXCL lockfile (the atomic-claim analogue of the
        # reference's rank-0 serialization, ``combine_chunks.py:206-369``
        # — two hosts finishing near-simultaneously must not both write
        # the output catalogue / used-parameters mirror).
        if host_index != 0 or len(chunk_subset) < nr_chunks:
            try:
                multihost.check_scratch_complete(
                    scratch_dir, specs, cat.nr_halos
                )
            except (FileNotFoundError, RuntimeError) as e:
                if verbose:
                    _progress(f"skipping combine ({e}); partial results only")
                return RunResult(results, cat, np.arange(cat.nr_halos), engine_stats, None, ctx)
            if not multihost.claim_combine(scratch_dir):
                if verbose:
                    _progress(
                        "another host claimed the combine; returning "
                        "partial results (delete combine.lock to re-run)"
                    )
                return RunResult(results, cat, np.arange(cat.nr_halos), engine_stats, None, ctx)
            try:
                results = multihost.combine_scratch(
                    scratch_dir, specs, cat.nr_halos, lazy=True
                )
                if verbose:
                    _progress("combined all hosts' scratch files (combine claimed)")
            except (FileNotFoundError, RuntimeError) as e:
                multihost.release_combine(scratch_dir)
                if verbose:
                    _progress(f"skipping combine ({e}); partial results only")
                return RunResult(results, cat, np.arange(cat.nr_halos), engine_stats, None, ctx)

    # --- category filters: zero masked halos, record metadata ---
    cat_filter = CategoryFilter(
        parameter_file.get_filters(DEFAULT_FILTERS) if parameter_file else None,
        dmo=dmo,
    )
    filter_attrs, group_attrs = apply_category_filters(
        results, cat_filter, parameter_file, cat.nr_halos, specs
    )
    drop_disabled_keys(results, parameter_file)

    order = spatial_sort_order(
        cat.cofp, cat.index, meta.boxsize, int(meta.dimension[0])
    )

    # --- derived SOAP/* columns, computed in final (sorted) order and
    # mapped back to unsorted storage for the writer's [order] indexing ---
    inv_order = np.empty_like(order)
    inv_order[order] = np.arange(len(order))
    soap_cols: Dict[str, np.ndarray] = {}
    if "HBTplus/HostHaloId" in cat.passthrough:
        host_fof_sorted = cat.passthrough["HBTplus/HostHaloId"][order]
        central_sorted = cat.is_central.astype(bool)[order]
        hhi_sorted = derived.host_halo_index(host_fof_sorted, central_sorted)
        # indices refer to sorted rows already; store unsorted view
        soap_cols["SOAP/HostHaloIndex"] = hhi_sorted[inv_order]
        if "BoundSubhalo" in results and "Mtot" in results["BoundSubhalo"]:
            track_sorted = cat.passthrough["HBTplus/TrackId"][order]
            mass_sorted = results["BoundSubhalo"]["Mtot"][order]
            rank_sorted = derived.subhalo_rank_by_bound_mass(
                host_fof_sorted, track_sorted, mass_sorted
            )
            soap_cols["SOAP/SubhaloRankByBoundMass"] = rank_sorted[inv_order]

        # FOF group join for centrals (``combine_chunks.py:406-535``)
        if fof_filename:
            from soap_tpu.io.fof_catalogue import fof_join, read_fof_groups

            fof_cols = fof_join(
                read_fof_groups(fof_filename),
                cat.passthrough["HBTplus/HostHaloId"],
                cat.is_central.astype(bool),
            )
            soap_cols.update(fof_cols)

        # mass-binned reduced-snapshot sampling (``combine_chunks.py:606-674``)
        rs_params = (
            parameter_file.get_parameters()
            .get("calculations", {})
            .get("reduced_snapshots")
            if parameter_file
            else None
        )
        if rs_params and "SO/200_crit" in results:
            msun_per_unit = meta.snap_units_cgs["Unit mass in cgs (U_M)"] / 1.98841e33
            mass_msun_sorted = (
                results["SO/200_crit"]["Mtot"][order] * msun_per_unit
            )
            flag_sorted = derived.included_in_reduced_snapshot(
                mass_msun_sorted,
                halos_per_bin=int(rs_params["halos_per_bin"]),
                bin_size_dex=float(rs_params["halo_bin_size_dex"]),
                min_halo_mass_msun=float(rs_params["min_halo_mass"]),
            )
            soap_cols["SOAP/IncludedInReducedSnapshot"] = flag_sorted[inv_order]

        # progenitor/descendant indices from TrackId matching against the
        # adjacent snapshots' (spatially sorted) catalogues
        # (``combine_chunks.py:676-735``)
        track_sorted = cat.passthrough["HBTplus/TrackId"][order]
        for name, basename in (
            ("SOAP/ProgenitorIndex", prev_halo_basename),
            ("SOAP/DescendantIndex", next_halo_basename),
        ):
            other_sorted = None
            if basename:
                try:
                    other = CATALOGUE_READERS[halo_format](
                        basename, h=meta.h, a=meta.a
                    )
                    o_order = spatial_sort_order(
                        other.cofp, other.index, meta.boxsize, int(meta.dimension[0])
                    )
                    other_sorted = other.passthrough["HBTplus/TrackId"][o_order]
                except FileNotFoundError:
                    if verbose:
                        _progress(f"no adjacent catalogue for {name}: {basename}")
            idx_sorted = derived.progenitor_descendant_index(
                track_sorted, other_sorted
            )
            soap_cols[name] = idx_sorted[inv_order]

    input_halos = {
        "cofp": cat.cofp,
        "index": cat.index,
        "is_central": cat.is_central.astype(np.int64),
        "nr_bound_part": cat.nr_bound_part,
        **cat.passthrough,
        **soap_cols,
    }
    if record_halo_timings:
        # per-halo timing datasets, the analogue of the reference's
        # ``--record-halo-timings`` (``halo_centres.py:183-218``):
        # process_time [s], n_loop (retry rounds), n_process (chunk
        # passes; always 1 — each halo belongs to exactly one chunk)
        timings = engine_stats.halo_timings()
        if timings is not None:
            pos = {int(i): p for p, i in enumerate(timings["index"])}
            rows = np.array([pos.get(int(i), -1) for i in cat.index])
            ok = rows >= 0
            pt = np.zeros(cat.nr_halos, np.float32)
            nl = np.zeros(cat.nr_halos, np.int32)
            pt[ok] = timings["process_time"][rows[ok]].astype(np.float32)
            nl[ok] = timings["n_loop"][rows[ok]]
            input_halos["process_time"] = pt
            input_halos["n_loop"] = nl
            input_halos["n_process"] = ok.astype(np.int32)

    property_timings = None
    if record_property_timings and engine_stats.spec_halo_chunks:
        # per-group per-halo seconds -> the writer emits one ``_time``
        # dataset per property (reference ``--record-property-timings``,
        # ``aperture_properties.py:4226-4242``; per-spec attribution is
        # the granularity of one fused device program per calculation)
        property_timings = {}
        pos_of = {int(i): p for p, i in enumerate(cat.index)}
        for group, tmap in engine_stats.property_timings().items():
            arr = np.zeros(cat.nr_halos, np.float32)
            for i, s in tmap.items():
                p = pos_of.get(int(i))
                if p is not None:
                    arr[p] = s
            property_timings[group] = arr

    if output_file and parameter_file is not None:
        # mirror of SWIFT's .used_parameters output
        # (reference ``parameter_file.py:74-83``)
        parameter_file.write_parameters(
            os.path.join(
                os.path.dirname(os.path.abspath(output_file)),
                "SOAP.used_parameters.yml",
            )
        )
    if output_file:
        write_catalogue(
            output_file,
            meta,
            meta.units,
            results,
            input_halos,
            order,
            git_hash=_git_hash(),
            dataset_extra_attrs=filter_attrs,
            group_attrs=group_attrs,
            property_timings=property_timings,
            run_parameters={
                "swift_filename": snapshot_file,
                "membership_filename": membership_file or "",
                "halo_basename": halo_basename,
                "halo_format": halo_format,
                "centrals_only": int(centrals_only),
                "calculations": sorted(s.group for s in specs),
                "halo_indices": (
                    np.asarray(halo_indices, dtype=np.int64)
                    if halo_indices is not None
                    else np.zeros(0, dtype=np.int64)
                ),
            },
        )
        if verbose:
            _progress(f"[{time.time()-t0:6.1f}s] wrote {output_file}")

    return RunResult(results, cat, order, engine_stats, output_file, ctx)
