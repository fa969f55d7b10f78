"""Multi-file snapshot reading: results must match the single-file run."""

import numpy as np
import pytest

from soap_tpu.pipeline.engine import HaloTypeSpec
from soap_tpu.pipeline.membership import run_group_membership
from soap_tpu.pipeline.run import compute_halo_properties
from soap_tpu.utils import mock_data

SPECS = [
    HaloTypeSpec(kind="bound", group="BoundSubhalo", keys=("Mtot", "Ndm", "com")),
    HaloTypeSpec(
        kind="SO", group="SO/200_crit", keys=("r", "Mtot"),
        so_type="crit", so_multiple=200.0, centrals_only=True,
    ),
]


def test_multifile_matches_single(tmp_path):
    sim = mock_data.make_mock_simulation(
        str(tmp_path), n_halos=6, n_field=4000, boxsize=20.0, seed=55
    )
    template = str(tmp_path / "multi" / "snap_0077.{file_nr}.hdf5")
    mock_data.split_snapshot_files(sim["snapshot"], template, n_files=3)

    # the membership program itself must handle multi-file snapshots
    mem = str(tmp_path / "mem.hdf5")
    run_group_membership(template, sim["hbt_basename"], mem)
    mem_single = str(tmp_path / "mem_single.hdf5")
    run_group_membership(sim["snapshot"], sim["hbt_basename"], mem_single)
    import h5py

    with h5py.File(mem, "r") as a, h5py.File(mem_single, "r") as b:
        np.testing.assert_array_equal(
            a["PartType1/GroupNr_bound"][...], b["PartType1/GroupNr_bound"][...]
        )

    single = compute_halo_properties(
        sim["snapshot"], mem, sim["hbt_basename"], None,
        dmo=True, specs=SPECS, verbose=False,
    )
    multi = compute_halo_properties(
        template, mem, sim["hbt_basename"], None,
        dmo=True, specs=SPECS, verbose=False,
    )
    for group in ("BoundSubhalo", "SO/200_crit"):
        for key in single.results[group]:
            np.testing.assert_allclose(
                multi.results[group][key],
                single.results[group][key],
                rtol=1e-5,
                err_msg=f"{group}/{key}",
            )
