"""Every implemented property key, evaluated end-to-end on a hydro mock.

The reference's central unit tests run every property on ~100 random
halos and assert presence, shape, dtype and finiteness
(``tests/test_aperture_properties.py`` etc., README.md:162).  This is
the equivalent: the FULL key lists of every halo type in one run, with
per-key checks against the property table.
"""

import numpy as np
import pytest

from soap_tpu.core.halo_types import implemented_keys_for
from soap_tpu.core.registry import full_property_table
from soap_tpu.pipeline.engine import HaloTypeSpec
from soap_tpu.pipeline.membership import run_group_membership
from soap_tpu.pipeline.run import compute_halo_properties
from soap_tpu.utils import mock_data


@pytest.fixture(scope="module")
def all_keys_run(tmp_path_factory):
    tmpdir = str(tmp_path_factory.mktemp("allkeys"))
    sim = mock_data.make_mock_simulation(
        tmpdir, n_halos=5, n_field=2500, boxsize=16.0, seed=101, hydro=True
    )
    mem = f"{tmpdir}/mem.hdf5"
    run_group_membership(sim["snapshot"], sim["hbt_basename"], mem)
    specs = [
        HaloTypeSpec(
            kind="bound",
            group="BoundSubhalo",
            keys=implemented_keys_for("BoundSubhalo", False),
        ),
        HaloTypeSpec(
            kind="SO",
            group="SO/200_crit",
            keys=tuple(implemented_keys_for("SO", False))
            + tuple(
                k
                for k in implemented_keys_for("CoreExcisedSO", False)
                if k not in implemented_keys_for("SO", False)
            ),
            so_type="crit",
            so_multiple=200.0,
            centrals_only=True,
            core_excision_fraction=0.15,
        ),
        HaloTypeSpec(
            kind="aperture",
            group="ExclusiveSphere/100kpc",
            keys=implemented_keys_for("Aperture", False),
            aperture_radius_mpc=0.1,
            inclusive=False,
        ),
        HaloTypeSpec(
            kind="projected",
            group="ProjectedAperture/100kpc/projx",
            keys=implemented_keys_for("ProjectedAperture", False),
            aperture_radius_mpc=0.1,
            axis=0,
        ),
    ]
    run = compute_halo_properties(
        sim["snapshot"], mem, sim["hbt_basename"], None,
        dmo=False, specs=specs, verbose=False,
    )
    return run, specs


def test_every_key_present_shaped_and_finite(all_keys_run):
    run, specs = all_keys_run
    table = full_property_table()
    n_checked = 0
    for spec in specs:
        group_res = run.results[spec.group]
        for key in spec.keys:
            assert key in group_res, f"{spec.group}/{key} missing"
            arr = np.asarray(group_res[key])
            prop = table[key]
            expect_shape = (5,) if prop.shape == 1 else (5, prop.shape)
            assert arr.shape == expect_shape, (
                f"{spec.group}/{key}: {arr.shape} != {expect_shape}"
            )
            if arr.dtype.kind == "f":
                assert np.isfinite(arr).all(), f"{spec.group}/{key} not finite"
            n_checked += 1
    # every implemented key of every halo type was exercised
    assert n_checked >= 480


def test_key_sanity_ranges(all_keys_run):
    run, _ = all_keys_run
    sub = run.results["BoundSubhalo"]
    assert (sub["Mtot"] > 0).all()
    assert (sub["Mgas"] > 0).all()
    assert (sub["Mstar"] > 0).all()
    for key in ("kappa_corot_gas", "kappa_corot_star"):
        assert ((sub[key] >= 0) & (sub[key] <= 1)).all()
    so = run.results["SO/200_crit"]
    assert (so["r"] > 0).all()
    assert (so["Tgas_core_excision"] >= 0).all()
