"""Hydro-tier tests: gas/star/BH properties vs numpy oracles.

Mirrors the reference's synthetic-halo property tests but with value
checks: the mock hydro universe has known per-particle fields, so the
oracle is a direct numpy reduction over each halo's bound members.
"""

import numpy as np
import pytest

from soap_tpu.core.halo_types import implemented_keys_for
from soap_tpu.pipeline.engine import HaloTypeSpec
from soap_tpu.pipeline.membership import run_group_membership
from soap_tpu.pipeline.run import compute_halo_properties
from soap_tpu.utils import mock_data


@pytest.fixture(scope="module")
def hydro_run(tmp_path_factory):
    tmpdir = str(tmp_path_factory.mktemp("hydro"))
    sim = mock_data.make_mock_simulation(
        tmpdir, n_halos=6, n_field=4000, boxsize=22.0, seed=77, hydro=True
    )
    membership = f"{tmpdir}/membership.hdf5"
    run_group_membership(sim["snapshot"], sim["hbt_basename"], membership)
    specs = [
        HaloTypeSpec(
            kind="bound",
            group="BoundSubhalo",
            keys=implemented_keys_for("BoundSubhalo", False),
        ),
        HaloTypeSpec(
            kind="SO",
            group="SO/200_crit",
            keys=implemented_keys_for("SO", False),
            so_type="crit",
            so_multiple=200.0,
            centrals_only=True,
        ),
        HaloTypeSpec(
            kind="projected",
            group="ProjectedAperture/100kpc/projz",
            keys=implemented_keys_for("ProjectedAperture", False),
            aperture_radius_mpc=0.1,
            axis=2,
        ),
    ]
    run = compute_halo_properties(
        snapshot_file=sim["snapshot"],
        membership_file=membership,
        halo_basename=sim["hbt_basename"],
        output_file=f"{tmpdir}/cat.hdf5",
        dmo=False,
        specs=specs,
        verbose=False,
    )
    return sim, run


def _halo_members(uni, kind, hi):
    """Bound member rows of ptype `kind` for halo hi, from the mock's
    per-halo generation order."""
    ptype = {"gas": "PartType0", "star": "PartType4", "bh": "PartType5"}[kind]
    fields = uni.extra_ptypes[ptype]
    fof = fields["FOFGroupIDs"]
    return np.flatnonzero(fof == hi + 1), fields


def test_gas_masses_and_sfr(hydro_run):
    sim, run = hydro_run
    uni = sim["universe"]
    sub = run.results["BoundSubhalo"]
    for hi in range(uni.n_halos):
        rows, g = _halo_members(uni, "gas", hi)
        m = g["Masses"][rows]
        np.testing.assert_allclose(sub["Mgas"][hi], m.sum(), rtol=1e-5)
        sfr = g["StarFormationRates"][rows]
        np.testing.assert_allclose(
            sub["SFR"][hi], sfr[sfr > 0].sum(), rtol=1e-5
        )
        np.testing.assert_allclose(
            sub["Mgas_SF"][hi], m[sfr > 0].sum(), rtol=1e-5
        )
        # mass-weighted temperature
        T = g["Temperatures"][rows]
        np.testing.assert_allclose(
            sub["Tgas"][hi], (m * T).sum() / m.sum(), rtol=2e-4
        )
        hot = T >= 1e5
        np.testing.assert_allclose(
            sub["Mhotgas"][hi] if "Mhotgas" in sub else m[hot].sum(),
            m[hot].sum(),
            rtol=1e-5,
        )
        Z = g["MetalMassFractions"][rows]
        np.testing.assert_allclose(
            sub["gasmetalfrac"][hi], (m * Z).sum() / m.sum(), rtol=2e-4
        )


def test_star_properties(hydro_run):
    sim, run = hydro_run
    uni = sim["universe"]
    sub = run.results["BoundSubhalo"]
    for hi in range(uni.n_halos):
        rows, s = _halo_members(uni, "star", hi)
        m = s["Masses"][rows]
        np.testing.assert_allclose(sub["Mstar"][hi], m.sum(), rtol=1e-5)
        np.testing.assert_allclose(
            sub["Mstar_init"][hi], s["InitialMasses"][rows].sum(), rtol=1e-5
        )
        lum = s["Luminosities"][rows]
        np.testing.assert_allclose(
            sub["StellarLuminosity"][hi], lum.sum(axis=0), rtol=2e-4
        )
        assert sub["stellar_age_mw"][hi] > 0
        assert sub["stellar_age_lw"][hi] > 0
        # ages are bounded by the age of the universe in internal units
        assert sub["stellar_age_mw"][hi] < 20000.0


def test_bh_properties(hydro_run):
    sim, run = hydro_run
    uni = sim["universe"]
    sub = run.results["BoundSubhalo"]
    for hi in range(uni.n_halos):
        rows, b = _halo_members(uni, "bh", hi)
        if len(rows) == 0:
            assert sub["Mbh_subgrid"][hi] == 0
            continue
        sm = b["SubgridMasses"][rows]
        np.testing.assert_allclose(sub["Mbh_subgrid"][hi], sm.sum(), rtol=1e-5)
        imax = rows[np.argmax(sm)]
        np.testing.assert_allclose(sub["BHmaxM"][hi], sm.max(), rtol=1e-6)
        assert sub["BHmaxID"][hi] == b["ParticleIDs"][imax]
        np.testing.assert_allclose(
            sub["BHmaxAR"][hi], b["AccretionRates"][imax], rtol=1e-6
        )


def test_kappa_and_dtot_ranges(hydro_run):
    sim, run = hydro_run
    sub = run.results["BoundSubhalo"]
    for key in ("kappa_corot_gas", "kappa_corot_star", "kappa_corot_baryons"):
        v = sub[key]
        assert np.all(v >= 0) and np.all(v <= 1)
    for key in ("DtoTgas", "DtoTstar"):
        v = sub[key]
        assert np.all(v >= -1) and np.all(v <= 1)


def test_cylindrical_kinematics_finite(hydro_run):
    sim, run = hydro_run
    sub = run.results["BoundSubhalo"]
    assert np.all(np.isfinite(sub["StellarRotationalVelocity"]))
    assert np.all(sub["StellarCylindricalVelocityDispersion"] >= 0)
    assert np.all(np.isfinite(sub["StellarCylindricalVelocityDispersionVertical"]))


def test_so_hydro_masses(hydro_run):
    sim, run = hydro_run
    uni = sim["universe"]
    so = run.results["SO/200_crit"]
    assert (so["r"] > 0).all()
    assert (so["Mgas"] > 0).all()
    assert (so["Mstar"] > 0).all()
    # SO gas+star+dm masses are bounded by the SO total
    total_parts = so["Mgas"] + so["Mstar"] + so["Mdm"]
    assert np.all(total_parts <= so["Mtot"] * 1.2)


def test_projected_hydro(hydro_run):
    sim, run = hydro_run
    pr = run.results["ProjectedAperture/100kpc/projz"]
    assert np.all(pr["Mstar"] >= 0)
    assert np.all(np.isfinite(pr["proj_veldisp_star"]))
    # 9-band per-band outputs have the right shapes
    assert pr["StellarLuminosity"].shape[1] == 9
    assert pr["ProjectedStellarInertiaTensorLuminosityWeighted"].shape[1] == 27


def test_luminosity_weighted_inertia_shape(hydro_run):
    sim, run = hydro_run
    sub = run.results["BoundSubhalo"]
    assert sub["StellarInertiaTensorLuminosityWeighted"].shape[1] == 54
    assert sub["HalfLightRadiusStar"].shape[1] == 9
