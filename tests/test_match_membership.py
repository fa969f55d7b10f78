"""Halo matching across simulations (match_group_membership analogue)."""

import h5py
import numpy as np

from soap_tpu.tools.match_membership import match_group_membership


def _write_sim(tmp_path, tag, perm, id_offsets, drop_particle=None):
    """Tiny snapshot + membership + catalogue.

    3 halos x 10 particles; halo ``h`` of the BASE layout owns particle
    IDs [100h+1 .. 100h+10].  ``perm`` reorders the catalogue rows,
    ``id_offsets[h]`` gives each halo's HaloCatalogueIndex.  Halo 1 is a
    satellite of halo 0.
    """
    snap = str(tmp_path / f"snap_{tag}.hdf5")
    mem = str(tmp_path / f"mem_{tag}.hdf5")
    cat = str(tmp_path / f"cat_{tag}.hdf5")
    pids, grnr, rank = [], [], []
    for h in range(3):
        ids = np.arange(100 * h + 1, 100 * h + 11, dtype=np.uint64)
        if drop_particle is not None and h == drop_particle:
            ids = ids[:-1]
        pids.append(ids)
        grnr.append(np.full(len(ids), id_offsets[h], np.int64))
        rank.append(np.arange(len(ids), dtype=np.int32))
    # shuffle global particle order so matching exercises the sorts
    pids = np.concatenate(pids)
    grnr = np.concatenate(grnr)
    rank = np.concatenate(rank)
    rng = np.random.default_rng(hash(tag) % 2**32)
    order = rng.permutation(len(pids))
    with h5py.File(snap, "w") as f:
        f.create_dataset("PartType1/ParticleIDs", data=pids[order])
    with h5py.File(mem, "w") as f:
        f.create_dataset("PartType1/GroupNr_bound", data=grnr[order])
        f.create_dataset("PartType1/Rank_bound", data=rank[order])
    rows = np.asarray(perm)  # catalogue row -> base halo
    with h5py.File(cat, "w") as f:
        f.create_dataset(
            "InputHalos/HaloCatalogueIndex",
            data=np.array([id_offsets[h] for h in rows], np.int64),
        )
        f.create_dataset(
            "InputHalos/IsCentral",
            data=np.array([0 if h == 1 else 1 for h in rows], np.int32),
        )
        host = []
        for h in rows:
            host.append(int(np.flatnonzero(rows == 0)[0]) if h == 1 else -1)
        f.create_dataset("SOAP/HostHaloIndex", data=np.array(host, np.int64))
    return snap, mem, cat


def test_match_identity_and_permuted(tmp_path):
    s1, m1, c1 = _write_sim(tmp_path, "a", perm=[0, 1, 2], id_offsets=[5, 6, 7])
    # second sim: same particles, rows permuted, different catalogue ids
    s2, m2, c2 = _write_sim(
        tmp_path, "b", perm=[2, 0, 1], id_offsets=[40, 41, 42]
    )
    out = match_group_membership(
        s1, m1, c1, s2, m2, c2, str(tmp_path / "match.hdf5"),
        match_satellites=True,
    )
    # base halo h sits at row h in sim1; in sim2 rows are [2,0,1] so base
    # halo 0 -> row 1, 1 -> row 2, 2 -> row 0
    np.testing.assert_array_equal(out["MatchIndex1to2"], [1, 2, 0])
    np.testing.assert_array_equal(out["MatchCount1to2"], [10, 10, 10])
    np.testing.assert_array_equal(out["Consistent1to2"], [1, 1, 1])
    np.testing.assert_array_equal(out["MatchIndex2to1"], [2, 0, 1])
    np.testing.assert_array_equal(out["Consistent2to1"], [1, 1, 1])
    with h5py.File(tmp_path / "match.hdf5", "r") as f:
        assert "MatchIndex1to2" in f and "Consistent2to1" in f


def test_match_centrals_only_folds_satellites(tmp_path):
    s1, m1, c1 = _write_sim(tmp_path, "c", perm=[0, 1, 2], id_offsets=[5, 6, 7])
    s2, m2, c2 = _write_sim(tmp_path, "d", perm=[0, 1, 2], id_offsets=[5, 6, 7])
    out = match_group_membership(
        s1, m1, c1, s2, m2, c2, str(tmp_path / "match2.hdf5"),
        match_satellites=False,
    )
    # satellite (row 1) is skipped in sim1; centrals match to themselves
    assert out["MatchIndex1to2"][0] == 0
    assert out["MatchIndex1to2"][2] == 2
    assert out["MatchIndex1to2"][1] == -1
    assert out["Consistent1to2"][0] == 1 and out["Consistent1to2"][2] == 1


def test_match_limited_particles(tmp_path):
    s1, m1, c1 = _write_sim(tmp_path, "e", perm=[0, 1, 2], id_offsets=[1, 2, 3])
    s2, m2, c2 = _write_sim(tmp_path, "f", perm=[0, 1, 2], id_offsets=[1, 2, 3])
    out = match_group_membership(
        s1, m1, c1, s2, m2, c2, str(tmp_path / "match3.hdf5"),
        nr_particles=4, match_satellites=True,
    )
    np.testing.assert_array_equal(out["MatchCount1to2"], [4, 4, 4])
    np.testing.assert_array_equal(out["Consistent1to2"], [1, 1, 1])
