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


def test_vr_multifile_reader(tmp_path):
    """Multi-file VR layout: Num_of_files + per-file local offsets
    (reference read_vr.py:25-110) and UnitInfo length scaling."""
    rng = np.random.default_rng(3)
    base = str(tmp_path / "vr_mf")
    n_per = [3, 2]
    all_pos, all_nb, all_ids = [], [], []
    for fi, n in enumerate(n_per):
        pos = rng.uniform(0, 50, (n, 3))
        nb = rng.integers(5, 15, n)
        ids = (rng.permutation(np.arange(nb.sum())) + 1000 * fi + 1).astype(
            np.uint64
        )
        offs = np.concatenate([[0], np.cumsum(nb)[:-1]])
        with h5py.File(f"{base}.properties.{fi}", "w") as f:
            f["Num_of_files"] = np.array([2])
            f["Xcminpot"] = pos[:, 0]
            f["Ycminpot"] = pos[:, 1]
            f["Zcminpot"] = pos[:, 2]
            f["R_size"] = rng.uniform(0.5, 2.0, n)
            f["ID"] = np.arange(1, n + 1) + 10 * fi
            f["hostHaloID"] = np.full(n, -1)
            f["Structuretype"] = np.full(n, 10, np.int32)
            f["numSubStruct"] = np.zeros(n, np.int64)
            f["npart"] = nb
            u = f.create_group("UnitInfo")
            u.attrs["Comoving_or_Physical"] = 1
            u.attrs["Length_unit_to_kpc"] = 1000.0
        with h5py.File(f"{base}.catalog_groups.{fi}", "w") as f:
            f["Num_of_files"] = np.array([2])
            f["Group_Size"] = nb
            f["Offset"] = offs
            f["Offset_unbound"] = np.zeros(n, np.int64)
        with h5py.File(f"{base}.catalog_particles.{fi}", "w") as f:
            f["Num_of_files"] = np.array([2])
            f["Particle_IDs"] = ids
        with h5py.File(f"{base}.catalog_particles.unbound.{fi}", "w") as f:
            f["Num_of_files"] = np.array([2])
            f["Particle_IDs"] = np.zeros(0, np.uint64)
        all_pos.append(pos)
        all_nb.append(nb)
        all_ids.append(ids)
    h = 0.7
    cat = CATALOGUE_READERS["VR"](base, h=h)
    assert cat.nr_halos == sum(n_per)
    # comoving 1/h units: conversion = h * kpc/1000 (read_vr.py:331-333)
    np.testing.assert_allclose(cat.cofp, np.concatenate(all_pos) * h)
    n, got_ids, grnr = GROUPNR_READERS["VR"](base)
    assert n == sum(n_per)
    nb_all = np.concatenate(all_nb)
    np.testing.assert_array_equal(
        np.bincount(grnr, minlength=n), nb_all
    )
    np.testing.assert_array_equal(got_ids, np.concatenate(all_ids))


def test_gadget4_multifile_reader(tmp_path):
    rng = np.random.default_rng(4)
    base = str(tmp_path / "fof_subhalo_tab_007")
    n_files, n_per = 2, 3
    all_pos = []
    for fi in range(n_files):
        pos = rng.uniform(0, 30, (n_per, 3))
        all_pos.append(pos)
        with h5py.File(f"{base}.{fi}.hdf5", "w") as f:
            f.create_group("Header").attrs["NumFiles"] = np.array([n_files])
            p = f.create_group("Parameters")
            p.attrs["UnitLength_in_cm"] = 3.08567758e24
            p.attrs["Hubble"] = 100.0
            p.attrs["HubbleParam"] = 0.7
            g = f.create_group("Subhalo")
            g["SubhaloPos"] = pos
            g["SubhaloLen"] = np.full(n_per, 20)
            g["SubhaloRankInGr"] = np.zeros(n_per, np.int64)
            g["SubhaloGroupNr"] = np.arange(n_per) + fi * n_per
            g["SubhaloHalfmassRad"] = np.full(n_per, 0.35)
    cat = CATALOGUE_READERS["Gadget4"](f"{base}.0.hdf5", h=0.7, a=0.5)
    assert cat.nr_halos == n_files * n_per
    np.testing.assert_allclose(cat.cofp, np.concatenate(all_pos) / 0.7)
    # physical 4x halfmass -> comoving via /a (read_subfind.py:228-232)
    np.testing.assert_allclose(
        cat.search_radius, 4 * 0.35 / 0.7 / 0.5 * np.ones(6)
    )


def test_hbt_sorted_layout(tmp_path):
    """Sorted single-file HBT layout: Subhalos/<field> datasets + flat
    Particles/ParticleIDs (+PotentialEnergies); read_hbtplus.py:126-132."""
    from soap_tpu.io.halo_catalogue import (
        read_hbtplus_catalogue,
        read_hbtplus_groupnr,
    )

    rng = np.random.default_rng(5)
    path = str(tmp_path / "SortedSubSnap_010.hdf5")
    n = 4
    nbound = np.array([6, 0, 3, 5], np.int64)  # one orphan
    ids = rng.permutation(np.arange(1, nbound.sum() + 1)).astype(np.uint64)
    pots = -rng.uniform(1, 10, nbound.sum())
    h = 0.68
    with h5py.File(path, "w") as f:
        s = f.create_group("Subhalos")
        s["Nbound"] = nbound
        s["TrackId"] = np.arange(100, 100 + n)
        s["Rank"] = np.array([0, 0, 1, 0])
        s["HostHaloId"] = np.array([0, 1, 0, 2])
        s["Depth"] = np.array([0, 0, 1, 0])
        s["ComovingMostBoundPosition"] = rng.uniform(0, 40, (n, 3))
        s["REncloseComoving"] = rng.uniform(0.1, 1.0, n)
        p = f.create_group("Particles")
        p["ParticleIDs"] = ids
        p["PotentialEnergies"] = pots
        u = f.create_group("Units")
        u["LengthInMpch"] = np.array([1.0])
        u["MassInMsunh"] = np.array([1e10])
        u["VelInKmS"] = np.array([1.0])
    nh, got_ids, grnr, rank, got_pots = read_hbtplus_groupnr(
        path, read_potential_energies=True
    )
    assert nh == n
    np.testing.assert_array_equal(got_ids, ids)
    np.testing.assert_array_equal(
        np.bincount(grnr, minlength=n), nbound
    )
    # rank restarts at 0 for every subhalo
    ends = np.cumsum(nbound)
    for i in range(n):
        np.testing.assert_array_equal(
            rank[grnr == i], np.arange(nbound[i])
        )
    np.testing.assert_allclose(got_pots, pots)
    cat = read_hbtplus_catalogue(path, h=h)
    assert cat.nr_halos == 3  # orphan dropped
    assert "HBTplus/TrackId" in cat.passthrough


def test_rockstar_binary(tmp_path):
    """Native binary chunk format: 256-byte header + 264-byte halo
    structs (+particle IDs)."""
    from soap_tpu.io.finder_readers import (
        _ROCKSTAR_HALO,
        _ROCKSTAR_HEADER,
        read_rockstar_binary,
    )

    rng = np.random.default_rng(6)
    n = 3
    halos = np.zeros(n, _ROCKSTAR_HALO)
    halos["id"] = np.arange(n)
    halos["pos"][:, :3] = rng.uniform(0, 50, (n, 3)).astype(np.float32)
    halos["r"] = np.array([250.0, 120.0, 300.0], np.float32)
    halos["m"] = np.array([1e12, 1e11, 2e12], np.float32)
    halos["num_p"] = np.array([500, 100, 900])
    header = np.zeros(1, _ROCKSTAR_HEADER)
    header["magic"] = 0xFABFABFA
    header["num_halos"] = n
    header["num_particles"] = 10
    header["h0"] = 0.7
    header["scale"] = 1.0
    header["box_size"] = 50.0
    path = str(tmp_path / "halos_0.0.bin")
    with open(path, "wb") as f:
        f.write(header.tobytes())
        f.write(halos.tobytes())
        f.write(np.arange(10, dtype=np.int64).tobytes())
    got, info = read_rockstar_binary(path)
    np.testing.assert_array_equal(got["id"], halos["id"])
    assert info["h0"] == np.float32(0.7)
    cat = CATALOGUE_READERS["Rockstar"](path, h=0.7)
    assert cat.nr_halos == n
    np.testing.assert_allclose(
        cat.cofp, halos["pos"][:, :3].astype(np.float64) / 0.7
    )
    np.testing.assert_allclose(
        cat.search_radius, 2.0 * halos["r"].astype(np.float64) / 0.7 / 1000.0
    )
    np.testing.assert_array_equal(cat.nr_bound_part, halos["num_p"])
