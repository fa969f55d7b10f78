"""Satellite/central split: satellites must skip centrals-only (SO)
specs and still produce identical results for the shared specs."""

import numpy as np
import pytest

from soap_tpu.pipeline.engine import HaloTypeSpec
from soap_tpu.pipeline.membership import run_group_membership
from soap_tpu.pipeline.run import compute_halo_properties
from soap_tpu.utils.mock_data import make_mock_simulation


def test_satellite_split(tmp_path):
    sim = make_mock_simulation(
        str(tmp_path), n_halos=8, n_field=4000, boxsize=20.0, seed=31
    )
    mem = str(tmp_path / "mem.hdf5")
    run_group_membership(sim["snapshot"], sim["hbt_basename"], mem)
    specs = [
        HaloTypeSpec(kind="bound", group="BoundSubhalo", keys=("Mtot", "Ndm")),
        HaloTypeSpec(
            kind="SO", group="SO/200_crit", keys=("r", "Mtot"),
            so_type="crit", so_multiple=200.0, centrals_only=True,
        ),
    ]
    # mark half the halos as satellites by rewriting the HBT Rank column
    import h5py

    with h5py.File(sim["hbt_basename"] + ".0.hdf5", "r+") as f:
        subs = f["Subhalos"][...]
        subs["Rank"][1::2] = 1
        f["Subhalos"][...] = subs

    run = compute_halo_properties(
        sim["snapshot"], mem, sim["hbt_basename"], None,
        dmo=True, specs=specs, verbose=False,
    )
    is_central = run.catalogue.is_central
    assert (~is_central).sum() > 0
    so_r = run.results["SO/200_crit"]["r"]
    # satellites: SO zeroed; centrals: SO found
    np.testing.assert_array_equal(so_r[~is_central], 0.0)
    assert (so_r[is_central] > 0).all()
    # shared spec computed for everyone
    assert (run.results["BoundSubhalo"]["Mtot"] > 0).all()
