"""Tests for derived SOAP/* catalogue columns (combine-step extras)."""

import numpy as np

from soap_tpu.pipeline import derived


def test_match_basic():
    hay = np.array([10, 3, 7, 5], dtype=np.int64)
    needles = np.array([5, 10, 99, 3], dtype=np.int64)
    idx = derived.match(needles, hay)
    np.testing.assert_array_equal(idx, [3, 0, -1, 1])


def test_host_halo_index():
    # halos: 0 central of fof 1, 1 sat of fof 1, 2 central of fof 2,
    # 3 hostless, 4 sat of fof 2
    host_fof = np.array([1, 1, 2, -1, 2], dtype=np.int64)
    is_central = np.array([True, False, True, False, False])
    out = derived.host_halo_index(host_fof, is_central)
    np.testing.assert_array_equal(out, [0, 0, 2, -1, 2])


def test_subhalo_rank_by_bound_mass():
    host_fof = np.array([5, 5, 5, 9, -1], dtype=np.int64)
    track = np.array([100, 101, 102, 103, 104], dtype=np.int64)
    mass = np.array([10.0, 30.0, 20.0, 5.0, 1.0])
    rank = derived.subhalo_rank_by_bound_mass(host_fof, track, mass)
    # fof 5: masses 30 > 20 > 10 -> ranks 1->0? halo1 rank0, halo2 rank1, halo0 rank2
    np.testing.assert_array_equal(rank, [2, 0, 1, 0, 0])


def test_reduced_snapshot_sampling():
    rng = np.random.default_rng(0)
    mass = 10.0 ** rng.uniform(11, 14, 1000)
    flag = derived.included_in_reduced_snapshot(
        mass, halos_per_bin=10, bin_size_dex=0.5, min_halo_mass_msun=1e11
    )
    assert flag.sum() > 0
    # no bin may keep more than halos_per_bin
    bins = 10 ** np.arange(11, np.log10(mass.max()) + 0.5, 0.5)
    for i in range(len(bins) - 1):
        sel = (mass >= bins[i]) & (mass < bins[i + 1])
        assert flag[sel].sum() <= 10
        # bins under the limit keep everything
        if sel.sum() <= 10:
            assert flag[sel].sum() == sel.sum()
    # determinism
    flag2 = derived.included_in_reduced_snapshot(
        mass, halos_per_bin=10, bin_size_dex=0.5, min_halo_mass_msun=1e11
    )
    np.testing.assert_array_equal(flag, flag2)


def test_progenitor_index():
    track = np.array([7, 8, 9], dtype=np.int64)
    prev = np.array([9, 5, 7], dtype=np.int64)
    out = derived.progenitor_descendant_index(track, prev)
    np.testing.assert_array_equal(out, [2, -1, 0])
    out = derived.progenitor_descendant_index(track, None)
    np.testing.assert_array_equal(out, [-1, -1, -1])
