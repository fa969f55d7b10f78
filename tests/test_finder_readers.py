"""Round-trip tests for the VR / Gadget-4 / EAGLE / Rockstar readers:
synthetic files in each finder's layout, read back through the
registered readers."""

import h5py
import numpy as np
import pytest

from soap_tpu.io.halo_catalogue import CATALOGUE_READERS, GROUPNR_READERS


def _write_vr(tmp_path, n=5, npart=40):
    rng = np.random.default_rng(1)
    base = str(tmp_path / "vr_catalogue")
    pos = rng.uniform(0, 50, (n, 3))
    with h5py.File(base + ".properties", "w") as f:
        f["Xcminpot"] = pos[:, 0]
        f["Ycminpot"] = pos[:, 1]
        f["Zcminpot"] = pos[:, 2]
        f["R_size"] = rng.uniform(0.5, 2.0, n)
        f["ID"] = np.arange(1, n + 1)
        f["hostHaloID"] = np.array([-1, -1, 1, -1, 2])
        f["Structuretype"] = np.array([10, 10, 15, 10, 15], np.int32)
        f["numSubStruct"] = np.array([1, 1, 0, 0, 0])
        f["npart"] = np.full(n, npart)
    nb = rng.integers(20, npart, n)
    offs = np.concatenate([[0], np.cumsum(nb)[:-1]])
    ids = rng.permutation(np.arange(1, nb.sum() + 1)).astype(np.uint64)
    with h5py.File(base + ".catalog_groups", "w") as f:
        f["Group_Size"] = np.full(n, npart)
        f["Offset"] = offs
        f["Offset_unbound"] = np.zeros(n, np.int64)
    with h5py.File(base + ".catalog_particles", "w") as f:
        f["Particle_IDs"] = ids
    with h5py.File(base + ".catalog_particles.unbound", "w") as f:
        f["Particle_IDs"] = np.zeros(0, np.uint64)
    return base, pos, nb, ids, offs


def test_vr_reader(tmp_path):
    base, pos, nb, ids, offs = _write_vr(tmp_path)
    cat = CATALOGUE_READERS["VR"](base, h=0.7)
    assert cat.nr_halos == 5
    np.testing.assert_allclose(cat.cofp, pos)
    np.testing.assert_array_equal(cat.is_central, [True, True, False, True, False])
    assert "VR/Structuretype" in cat.passthrough
    n, got_ids, grnr = GROUPNR_READERS["VR"](base)
    assert n == 5
    # each halo's bound IDs come from its offset range
    for i in range(5):
        np.testing.assert_array_equal(
            got_ids[grnr == i], ids[offs[i] : offs[i] + nb[i]]
        )


def test_gadget4_reader(tmp_path):
    rng = np.random.default_rng(2)
    n = 4
    tab = str(tmp_path / "fof_subhalo_tab_000.hdf5")
    snap = str(tmp_path / "snap_000.hdf5")
    lens = rng.integers(10, 30, (n, 2)).astype(np.int64)
    offs = np.zeros_like(lens)
    offs[:, 0] = np.concatenate([[0], np.cumsum(lens[:, 0])[:-1]])
    offs[:, 1] = np.concatenate([[0], np.cumsum(lens[:, 1])[:-1]])
    with h5py.File(tab, "w") as f:
        g = f.create_group("Subhalo")
        g["SubhaloPos"] = rng.uniform(0, 30, (n, 3))
        g["SubhaloLenType"] = lens
        g["SubhaloOffsetType"] = offs
        g["SubhaloLen"] = lens.sum(axis=1)
        g["SubhaloRankInGr"] = np.array([0, 1, 0, 0])
        g["SubhaloGroupNr"] = np.array([0, 0, 1, 2])
        g["SubhaloHalfmassRad"] = rng.uniform(0.1, 0.5, n)
    with h5py.File(snap, "w") as f:
        for t in range(2):
            total = lens[:, t].sum() + 15  # 15 fuzz particles
            f[f"PartType{t}/ParticleIDs"] = np.arange(
                t * 100000, t * 100000 + total, dtype=np.uint64
            )
    cat = CATALOGUE_READERS["Gadget4"](tab, h=0.7)
    assert cat.nr_halos == n
    np.testing.assert_array_equal(cat.is_central, [True, False, True, True])
    from soap_tpu.io.finder_readers import read_gadget4_groupnr

    nh, ids, grnr = read_gadget4_groupnr(tab, snap)
    assert nh == n
    counts = np.bincount(grnr[grnr >= 0], minlength=n)
    np.testing.assert_array_equal(counts, lens.sum(axis=1))


def test_subfind_eagle_reader(tmp_path):
    tab = str(tmp_path / "eagle_sub.hdf5")
    with h5py.File(tab, "w") as f:
        g = f.create_group("Subhalo")
        g["CentreOfPotential"] = np.array([[1.0, 2, 3], [4, 5, 6]])
        g["SubLength"] = np.array([100, 50])
        g["SubGroupNumber"] = np.array([0, 1])
        g["GroupNumber"] = np.array([1, 1])
        g["HalfMassRad"] = np.array([0.2, 0.1])
    cat = CATALOGUE_READERS["SubfindEagle"](tab, h=0.7)
    assert cat.nr_halos == 2
    np.testing.assert_array_equal(cat.is_central, [True, False])
    assert "SubfindEagle/group_nr" in cat.passthrough


def test_rockstar_reader(tmp_path):
    f = tmp_path / "out_0.list"
    f.write_text(
        "#ID DescID M200c Vmax Vrms R200c Rs Np X Y Z VX VY VZ PID\n"
        "0 -1 1e12 150 120 250.0 30 500 10.0 20.0 30.0 0 0 0 -1\n"
        "1 -1 1e11 80 70 120.0 20 100 11.0 21.0 31.0 0 0 0 0\n"
    )
    cat = CATALOGUE_READERS["Rockstar"](str(f), h=0.7)
    assert cat.nr_halos == 2
    np.testing.assert_allclose(cat.cofp[0], [10.0 / 0.7, 20.0 / 0.7, 30.0 / 0.7])
    np.testing.assert_array_equal(cat.is_central, [True, False])
    # R200c kpc/h -> Mpc: 250/0.7/1000
    np.testing.assert_allclose(cat.search_radius[0], 2 * 0.25 / 0.7)
