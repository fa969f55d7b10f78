"""Aperture-copy optimization: big exclusive apertures must copy from the
next-smaller one when it already enclosed every bound particle, and the
copied values must equal the directly computed ones."""

import numpy as np
import pytest

from soap_tpu.pipeline.engine import HaloTypeSpec
from soap_tpu.pipeline.membership import run_group_membership
from soap_tpu.pipeline.run import compute_halo_properties
from soap_tpu.pipeline.specs import build_specs


@pytest.fixture(scope="module")
def sim(tmp_path_factory):
    from soap_tpu.utils.mock_data import make_mock_simulation

    tmpdir = str(tmp_path_factory.mktemp("apcopy"))
    s = make_mock_simulation(tmpdir, n_halos=6, n_field=3000, boxsize=18.0, seed=23)
    mem = f"{tmpdir}/mem.hdf5"
    run_group_membership(s["snapshot"], s["hbt_basename"], mem)
    return {**s, "mem": mem}


KEYS = ("Mtot", "Ndm", "com", "HalfMassRadiusTot")


def _aperture_specs(with_copy):
    specs = []
    prev = None
    for r_kpc in (500.0, 1000.0, 3000.0):
        specs.append(
            HaloTypeSpec(
                kind="aperture",
                group=f"ExclusiveSphere/{r_kpc:.0f}kpc",
                keys=KEYS,
                aperture_radius_mpc=r_kpc / 1000.0,
                inclusive=False,
                copy_from=prev[0] if (prev and with_copy) else None,
                copy_from_radius_mpc=prev[1] if (prev and with_copy) else None,
            )
        )
        prev = (f"ExclusiveSphere/{r_kpc:.0f}kpc", r_kpc / 1000.0)
    return specs


def test_copy_matches_direct(sim):
    run_copy = compute_halo_properties(
        sim["snapshot"], sim["mem"], sim["hbt_basename"], None,
        dmo=True, specs=_aperture_specs(True), verbose=False,
    )
    run_direct = compute_halo_properties(
        sim["snapshot"], sim["mem"], sim["hbt_basename"], None,
        dmo=True, specs=_aperture_specs(False), verbose=False,
    )
    assert run_copy.stats.n_copied_specs > 0
    for group in ("ExclusiveSphere/1000kpc", "ExclusiveSphere/3000kpc"):
        for key in KEYS:
            np.testing.assert_allclose(
                run_copy.results[group][key],
                run_direct.results[group][key],
                rtol=1e-6,
                err_msg=f"{group}/{key}",
            )


def test_default_specs_have_copy_annotations():
    specs = build_specs(None, True, bn98_value=100.0)
    excl = [s for s in specs if s.group.startswith("ExclusiveSphere")]
    assert excl[0].copy_from is None
    assert all(s.copy_from is not None for s in excl[1:])
    incl = [s for s in specs if s.group.startswith("InclusiveSphere")]
    assert all(s.copy_from is None for s in incl)
    # axis-major ordering: proj[0..3] = 10/30/50/100 kpc of projx
    proj = [s for s in specs if s.group.startswith("ProjectedAperture")]
    assert proj[0].copy_from is None
    assert proj[1].copy_from == "ProjectedAperture/10kpc/projx"
    assert proj[4].copy_from is None  # first radius of projy
    assert proj[5].copy_from == "ProjectedAperture/10kpc/projy"
