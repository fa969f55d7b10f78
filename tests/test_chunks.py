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


def test_record_property_timings(tmp_path, mock_sim):
    """--record-property-timings writes a ``<name>_time`` dataset per
    property and timing-analysis can drill into them (reference
    ``aperture_properties.py:4226-4242``, README.md:203-211)."""
    import h5py

    from soap_tpu.pipeline.engine import HaloTypeSpec
    from soap_tpu.pipeline.membership import run_group_membership
    from soap_tpu.pipeline.run import compute_halo_properties
    from soap_tpu.tools.timing_analysis import analyze_properties

    mem = str(tmp_path / "mem.hdf5")
    run_group_membership(
        mock_sim["snapshot"], mock_sim["hbt_basename"], mem
    )
    out = str(tmp_path / "cat.hdf5")
    specs = [
        HaloTypeSpec(kind="bound", group="BoundSubhalo", keys=("Mtot", "Ndm")),
        HaloTypeSpec(
            kind="SO",
            group="SO/200_crit",
            keys=("Mtot",),
            so_type="crit",
            so_multiple=200.0,
            centrals_only=True,
        ),
    ]
    compute_halo_properties(
        snapshot_file=mock_sim["snapshot"],
        membership_file=mem,
        halo_basename=mock_sim["hbt_basename"],
        output_file=out,
        dmo=True,
        specs=specs,
        record_property_timings=True,
        verbose=False,
    )
    with h5py.File(out) as f:
        t_mass = np.asarray(f["BoundSubhalo/TotalMass_time"])
        t_n = np.asarray(f["BoundSubhalo/NumberOfDarkMatterParticles_time"])
        t_so = np.asarray(f["SO/200_crit/TotalMass_time"])
    assert (t_mass >= 0).all() and t_mass.sum() > 0
    np.testing.assert_array_equal(t_mass, t_n)  # per-spec granularity
    assert t_so.sum() > 0
    per_prop = analyze_properties(out)
    assert per_prop["BoundSubhalo"] > 0 and per_prop["SO/200_crit"] > 0
