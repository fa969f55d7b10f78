"""End-to-end run driven by the ported COLIBRE_THERMAL.yml on the hydro
mock — exercises a second production parameter surface (different
variation sets, aliases, disabled properties) beyond FLAMINGO."""

import os

import h5py
import numpy as np
import pytest
import yaml

from soap_tpu.core.params import ParameterFile, substitute_parameters
from soap_tpu.core.registry import full_property_table
from soap_tpu.pipeline.membership import run_group_membership
from soap_tpu.pipeline.run import compute_halo_properties

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def colibre_catalogue(tmp_path_factory):
    from soap_tpu.utils.mock_data import make_mock_simulation

    workdir = str(tmp_path_factory.mktemp("colibre_e2e"))
    sim = make_mock_simulation(
        workdir, n_halos=5, n_field=3000, boxsize=18.0, seed=61, hydro=True
    )
    with open(
        os.path.join(REPO, "parameter_files", "COLIBRE_THERMAL.yml")
    ) as f:
        raw = yaml.safe_load(f)
    raw.setdefault("calculations", {})["min_read_radius_cmpc"] = 0.005
    raw = substitute_parameters(
        raw, {"sim_dir": workdir, "output_dir": workdir, "scratch_dir": workdir}
    )
    params = ParameterFile(parameter_dictionary=raw)
    membership = os.path.join(workdir, "membership.hdf5")
    run_group_membership(sim["snapshot"], sim["hbt_basename"], membership)
    output = os.path.join(workdir, "halo_properties.hdf5")
    run = compute_halo_properties(
        snapshot_file=sim["snapshot"],
        membership_file=membership,
        halo_basename=sim["hbt_basename"],
        output_file=output,
        parameter_file=params,
        dmo=False,
        verbose=False,
    )
    return output, params, run, sim


def test_colibre_run_produces_catalogue(colibre_catalogue):
    output, params, run, sim = colibre_catalogue
    with h5py.File(output, "r") as f:
        assert f["Header"].attrs["NumSubhalos_Total"][0] == 5
        assert "BoundSubhalo/TotalMass" in f
        tm = np.asarray(f["BoundSubhalo/TotalMass"])
        assert (tm > 0).all()
        # COLIBRE variation surface: SO + aperture groups exist
        assert "SO/200_crit/SORadius" in f
        assert "SO/BN98" in f
        # sub-kpc apertures use the reference's parsec naming
        assert "ExclusiveSphere/100pc" in f
        assert "ExclusiveSphere/300pc" in f
        assert "0kpc" not in f.get("ExclusiveSphere", {})
        # property-sized projected apertures (twice_stellar_half_mass)
        assert "ProjectedAperture/2xHalfMassRadiusStars/projz" in f
        # Cells metadata + provenance parity
        assert "Cells/Centres" in f
        assert "Parameters" in f and "Code" in f


def test_colibre_disabled_properties_absent(colibre_catalogue):
    output, params, run, sim = colibre_catalogue
    table = full_property_table()
    filters = params.property_filters.get("ApertureProperties", {})
    disabled = {n for n, v in filters.items() if v is False}
    assert disabled, "COLIBRE yml should disable some aperture properties"
    with h5py.File(output, "r") as f:
        aperture_groups = [
            g for g in f if g.startswith(("ExclusiveSphere", "InclusiveSphere"))
        ]
        assert aperture_groups
        for g in aperture_groups:
            present = set(f[g])
            overlap = present & disabled
            assert not overlap, f"{g}: disabled datasets present: {overlap}"


def test_colibre_aliases_resolve(colibre_catalogue):
    output, params, run, sim = colibre_catalogue
    aliases = params.get_aliases()
    assert (
        aliases.get("PartType0/LastSNIIKineticFeedbackDensities")
        == "PartType0/DensitiesAtLastSupernovaEvent"
    )


@pytest.mark.parametrize(
    "fname", ["COLIBRE_HYBRID.yml", "EAGLE.yml", "MINIMAL_FLAMINGO.yml"]
)
def test_other_parameter_files_build_specs(fname):
    """Every ported production parameter file must parse and build a
    valid spec list (all keys implemented, dependencies resolvable)."""
    from soap_tpu.pipeline.specs import build_specs

    with open(os.path.join(REPO, "parameter_files", fname)) as f:
        raw = yaml.safe_load(f)
    raw = substitute_parameters(
        raw, {"sim_dir": "/tmp", "output_dir": "/tmp", "scratch_dir": "/tmp"}
    )
    params = ParameterFile(parameter_dictionary=raw)
    specs = build_specs(params, dmo=False, bn98_value=100.0)
    assert len(specs) > 3
    table = full_property_table()
    groups = set()
    for s in specs:
        assert s.group not in groups, f"duplicate group {s.group}"
        groups.add(s.group)
        for k in s.keys:
            assert k in table, f"{s.group}: unknown key {k}"
    # dependencies (copy_from, radius_multiple_of) point at built groups
    for s in specs:
        if s.copy_from is not None:
            assert s.copy_from in groups, s.group
        if s.radius_multiple_of is not None:
            assert s.radius_multiple_of in groups, s.group


def test_inclusive_skip_gt_enclose_copy_chain():
    """Inclusive spheres join the aperture-copy chain only with
    skip_gt_enclose_radius (reference compute_halo_properties.py:364-370)."""
    from soap_tpu.pipeline.specs import build_specs

    raw = {
        "ApertureProperties": {
            "variations": {
                "inclusive_50_kpc": {"inclusive": True, "radius_in_kpc": 50.0},
                "inclusive_100_kpc": {
                    "inclusive": True, "radius_in_kpc": 100.0,
                    "skip_gt_enclose_radius": True,
                },
                "inclusive_300_kpc": {
                    "inclusive": True, "radius_in_kpc": 300.0,
                },
                "exclusive_50_kpc": {"inclusive": False, "radius_in_kpc": 50.0},
                "exclusive_100_kpc": {
                    "inclusive": False, "radius_in_kpc": 100.0,
                },
            }
        }
    }
    params = ParameterFile(parameter_dictionary=raw)
    specs = {
        s.group: s
        for s in build_specs(
            params, dmo=True, bn98_value=100.0, subhalo=False, so=False,
            projected=False,
        )
    }
    assert specs["InclusiveSphere/50kpc"].copy_from is None
    # opted in: copies from the next-smaller inclusive sphere
    assert specs["InclusiveSphere/100kpc"].copy_from == "InclusiveSphere/50kpc"
    # not opted in: never copies
    assert specs["InclusiveSphere/300kpc"].copy_from is None
    # exclusive spheres always chain
    assert specs["ExclusiveSphere/100kpc"].copy_from == "ExclusiveSphere/50kpc"


def test_hydro_golden_catalogue_regression(colibre_catalogue):
    """Frozen-value regression for the HYDRO tail (VERDICT r4 ask #8):
    the COLIBRE_THERMAL e2e catalogue — gas/star/BH species, chemistry,
    temperatures, X-ray, SFR, the full 38-calculation hydro property
    set as driven by the production parameter file — must match the
    committed golden catalogue to lossy-compression tolerance.

    Regenerate after an INTENTIONAL numeric change with:
        SOAP_TPU_REGEN_GOLDEN=1 python -m pytest \
            tests/test_colibre_params.py::test_hydro_golden_catalogue_regression
    """
    import shutil

    from soap_tpu.tools.compare import compare_catalogues

    output, _params, _run, _sim = colibre_catalogue
    golden = os.path.join(
        os.path.dirname(__file__), "golden", "e2e_colibre_seed61.hdf5"
    )
    if os.environ.get("SOAP_TPU_REGEN_GOLDEN") == "1":
        shutil.copy(output, golden)
        pytest.skip("hydro golden catalogue regenerated")
    assert os.path.exists(golden), "hydro golden catalogue missing from repo"
    # same tolerance policy as the DMO golden
    # (tests/test_end_to_end.py::test_golden_catalogue_regression)
    res = compare_catalogues(
        golden, output, use_compression_tolerance=True,
        rtol=1.0e-3, atol=1.0e-30, scale_atol=5.0e-3,
    )
    assert res.n_compared > 400, res.n_compared
    assert res.identical, res.report()
