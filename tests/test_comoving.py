"""Comoving/physical correctness at a != 1.

The kernels work in physical coordinates; catalogue outputs follow the
property table's comoving convention (a-scale exponents).  A mock at
a = 0.5 exercises every conversion: SO thresholds (physical densities vs
comoving positions), physical radii outputs, comoving centre outputs.
"""

import h5py
import numpy as np
import pytest

from soap_tpu.pipeline.engine import HaloTypeSpec
from soap_tpu.pipeline.membership import run_group_membership
from soap_tpu.pipeline.run import compute_halo_properties
from soap_tpu.utils import mock_data

G = mock_data.G_INTERNAL
A = 0.5


@pytest.fixture(scope="module")
def run_a05(tmp_path_factory):
    tmpdir = str(tmp_path_factory.mktemp("comoving"))
    sim = mock_data.make_mock_simulation(
        tmpdir, n_halos=6, n_field=4000, boxsize=24.0, seed=19, a=A
    )
    mem = f"{tmpdir}/mem.hdf5"
    run_group_membership(sim["snapshot"], sim["hbt_basename"], mem)
    specs = [
        HaloTypeSpec(
            kind="bound",
            group="BoundSubhalo",
            keys=("Mtot", "Ndm", "com", "EncloseRadius", "HalfMassRadiusTot"),
        ),
        HaloTypeSpec(
            kind="SO", group="SO/200_crit", keys=("r", "Mtot", "Ndm"),
            so_type="crit", so_multiple=200.0, centrals_only=True,
        ),
    ]
    cat_file = f"{tmpdir}/cat.hdf5"
    run = compute_halo_properties(
        sim["snapshot"], mem, sim["hbt_basename"], cat_file,
        dmo=True, specs=specs, verbose=False,
    )
    return sim, run, cat_file


def test_so_radius_physical_definition(run_a05):
    """The engine's SO radius is physical; it must reproduce the mock's
    construction R200c (physical) = comoving R200 * a."""
    sim, run, _ = run_a05
    uni = sim["universe"]
    rho_crit0 = 3.0 * (100.0 * uni.h) ** 2 / (8.0 * np.pi * G)
    E2 = uni.omega_m / uni.a**3 + uni.omega_lambda
    rho_crit = rho_crit0 * E2  # physical at a
    m200 = uni.halo_nbound * uni.mass[0]
    r200_phys = (3.0 * m200 / (4.0 * np.pi * 200.0 * rho_crit)) ** (1.0 / 3.0)
    so_r = run.results["SO/200_crit"]["r"]
    found = so_r > 0
    assert found.all()
    np.testing.assert_allclose(so_r, r200_phys, rtol=0.12)


def test_catalogue_stores_comoving(run_a05):
    """SORadius/CoM datasets carry a-scale exponent 1 and store the
    physical value divided by a."""
    sim, run, cat_file = run_a05
    with h5py.File(cat_file, "r") as f:
        r = f["SO/200_crit/SORadius"]
        assert r.attrs["a-scale exponent"][0] == 1.0
        assert r.attrs["Value stored as physical"][0] == 0
        stored = r[...]
        com = f["BoundSubhalo/CentreOfMass"][...]
        idx = f["InputHalos/HaloCatalogueIndex"][...]
    phys = run.results["SO/200_crit"]["r"][idx]
    np.testing.assert_allclose(stored, phys / A, rtol=1e-5)
    # CoM (comoving) should be close to the halo centres (comoving)
    centres = sim["universe"].halo_pos[idx]
    np.testing.assert_allclose(com, centres, atol=0.35)


def test_enclose_radius_physical(run_a05):
    sim, run, _ = run_a05
    uni = sim["universe"]
    # EncloseRadius (physical) ~ renclose (comoving) * a
    np.testing.assert_allclose(
        run.results["BoundSubhalo"]["EncloseRadius"],
        uni.halo_renclose * A,
        rtol=1e-3,
    )
