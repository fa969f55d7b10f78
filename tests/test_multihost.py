"""Multi-host chunk assignment + scratch combine tests.

Simulates two hosts processing disjoint chunk subsets of the same run
against a shared scratch directory, then the combine phase merging them
— the TPU-native replacement for the reference's dynamic MPI chunk
dispatch (``task_queue.py:63-216``)."""

import numpy as np
import pytest

from soap_tpu.parallel import multihost
from soap_tpu.pipeline.engine import HaloTypeSpec
from soap_tpu.pipeline.membership import run_group_membership
from soap_tpu.pipeline.run import compute_halo_properties

SPECS = [
    HaloTypeSpec(kind="bound", group="BoundSubhalo", keys=("Mtot", "Ndm")),
]


def test_chunks_for_host():
    assert multihost.chunks_for_host(6, 0, 2) == [0, 2, 4]
    assert multihost.chunks_for_host(6, 1, 2) == [1, 3, 5]
    assert multihost.chunks_for_host(5, 0, 1) == [0, 1, 2, 3, 4]


def test_two_host_run(tmp_path):
    from soap_tpu.utils.mock_data import make_mock_simulation

    sim = make_mock_simulation(
        str(tmp_path), n_halos=8, n_field=4000, boxsize=20.0, seed=17
    )
    mem = str(tmp_path / "mem.hdf5")
    run_group_membership(sim["snapshot"], sim["hbt_basename"], mem)
    scratch = str(tmp_path / "scratch")

    common = dict(
        snapshot_file=sim["snapshot"],
        membership_file=mem,
        halo_basename=sim["hbt_basename"],
        output_file=None,
        dmo=True,
        specs=SPECS,
        nr_chunks=4,
        scratch_dir=scratch,
        verbose=False,
    )
    # host 1 runs first: its combine must report missing chunks
    r1 = compute_halo_properties(host_index=1, host_count=2, **common)
    assert r1.output_path is None
    # host 0 runs its half, then combine succeeds
    r0 = compute_halo_properties(host_index=0, host_count=2, **common)
    # single-host reference
    ref = compute_halo_properties(
        **{**common, "scratch_dir": None}, host_index=0, host_count=1
    )
    np.testing.assert_allclose(
        r0.results["BoundSubhalo"]["Mtot"],
        ref.results["BoundSubhalo"]["Mtot"],
        rtol=1e-6,
    )
    np.testing.assert_array_equal(
        r0.results["BoundSubhalo"]["Ndm"], ref.results["BoundSubhalo"]["Ndm"]
    )
