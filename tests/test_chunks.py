"""Multi-chunk processing + scratch/restart tests.

Mirrors the reference's chunk restart semantics
(``chunk_tasks.py:122-162``): a rerun must reuse valid scratch files and
reject stale ones; multi-chunk results must equal single-chunk results.
"""

import numpy as np
import pytest

from soap_tpu.pipeline.engine import HaloTypeSpec
from soap_tpu.pipeline.membership import run_group_membership
from soap_tpu.pipeline.run import compute_halo_properties

SPECS = [
    HaloTypeSpec(kind="bound", group="BoundSubhalo", keys=("Mtot", "Ndm", "com")),
    HaloTypeSpec(
        kind="SO",
        group="SO/200_crit",
        keys=("r", "Mtot"),
        so_type="crit",
        so_multiple=200.0,
        centrals_only=True,
    ),
]


@pytest.fixture(scope="module")
def sim(tmp_path_factory):
    tmpdir = str(tmp_path_factory.mktemp("chunks"))
    from soap_tpu.utils import mock_data

    s = mock_data.make_mock_simulation(
        tmpdir, n_halos=10, n_field=6000, boxsize=24.0, seed=21
    )
    membership = f"{tmpdir}/membership.hdf5"
    run_group_membership(s["snapshot"], s["hbt_basename"], membership)
    return {**s, "membership": membership, "tmpdir": tmpdir}


def _run(sim, **kw):
    return compute_halo_properties(
        snapshot_file=sim["snapshot"],
        membership_file=sim["membership"],
        halo_basename=sim["hbt_basename"],
        output_file=None,
        dmo=True,
        specs=SPECS,
        verbose=False,
        **kw,
    )


def test_multichunk_matches_single(sim):
    r1 = _run(sim, nr_chunks=1)
    r4 = _run(sim, nr_chunks=4)
    for group in ("BoundSubhalo", "SO/200_crit"):
        for key in r1.results[group]:
            np.testing.assert_allclose(
                r4.results[group][key],
                r1.results[group][key],
                rtol=1e-5,
                err_msg=f"{group}/{key}",
            )


def test_scratch_restart(sim, tmp_path):
    scratch = str(tmp_path / "scratch")
    r1 = _run(sim, nr_chunks=3, scratch_dir=scratch)
    assert r1.stats.halos_done == 10
    # rerun: all chunks come from scratch, engine does no work
    r2 = _run(sim, nr_chunks=3, scratch_dir=scratch)
    assert r2.stats.halos_done == 0
    for group in r1.results:
        for key in r1.results[group]:
            np.testing.assert_array_equal(
                r2.results[group][key], r1.results[group][key]
            )


def test_scratch_rejects_stale_calc_names(sim, tmp_path):
    scratch = str(tmp_path / "scratch2")
    _run(sim, nr_chunks=2, scratch_dir=scratch)
    other_specs = [
        HaloTypeSpec(kind="bound", group="BoundSubhalo", keys=("Mtot", "vcom"))
    ]
    r = compute_halo_properties(
        snapshot_file=sim["snapshot"],
        membership_file=sim["membership"],
        halo_basename=sim["hbt_basename"],
        output_file=None,
        dmo=True,
        specs=other_specs,
        nr_chunks=2,
        scratch_dir=scratch,
        verbose=False,
    )
    # scratch invalid for the new calc set -> recomputed
    assert r.stats.halos_done == 10
    assert "vcom" in r.results["BoundSubhalo"]
