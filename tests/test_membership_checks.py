"""Membership-validation + birth-halo tools."""

import h5py
import numpy as np
import pytest

from soap_tpu.pipeline.membership import run_group_membership
from soap_tpu.tools.membership_checks import (
    check_group_membership,
    compute_birth_halo_index,
)


def test_check_membership_accepts_and_rejects(tmp_path):
    from soap_tpu.utils.mock_data import make_mock_simulation

    sim = make_mock_simulation(
        str(tmp_path), n_halos=5, n_field=2500, boxsize=16.0, seed=44
    )
    mem = str(tmp_path / "mem.hdf5")
    run_group_membership(sim["snapshot"], sim["hbt_basename"], mem)
    stats = check_group_membership(sim["snapshot"], mem, sim["hbt_basename"])
    assert stats["n_halos"] == 5
    assert stats["n_labelled"] == sim["universe"].halo_nbound.sum()

    # corrupt one label: the check must fail loudly
    with h5py.File(mem, "a") as f:
        g = f["PartType1/GroupNr_bound"]
        rows = np.flatnonzero(g[...] == 2)
        g[rows[0]] = 3
    with pytest.raises(RuntimeError):
        check_group_membership(sim["snapshot"], mem, sim["hbt_basename"])


def _mini_snap(path, a, star_ids, birth_a=None, grnr=None):
    with h5py.File(path, "w") as f:
        f.create_group("Header").attrs["Scale-factor"] = np.array([a])
        g = f.create_group("PartType4")
        g["ParticleIDs"] = np.asarray(star_ids, np.uint64)
        if birth_a is not None:
            g["BirthScaleFactors"] = np.asarray(birth_a, np.float32)
    if grnr is not None:
        mem = str(path).replace("snap", "mem")
        with h5py.File(mem, "w") as f:
            f.create_group("PartType4")["GroupNr_bound"] = np.asarray(
                grnr, np.int64
            )
        return str(path), mem
    return str(path)


def test_birth_halo_index(tmp_path):
    # three snapshots at a = 0.4, 0.7, 1.0; five stars with varying
    # birth times and halo membership histories
    s0, m0 = _mini_snap(tmp_path / "snap_0.hdf5", 0.4, [10, 11], grnr=[7, -1])
    s1, m1 = _mini_snap(
        tmp_path / "snap_1.hdf5", 0.7, [10, 11, 12], grnr=[8, 2, 5]
    )
    s2, m2 = _mini_snap(
        tmp_path / "snap_2.hdf5",
        1.0,
        [10, 11, 12, 13, 14],
        grnr=[8, 2, 5, 3, 9],
    )
    final = _mini_snap(
        tmp_path / "final_snap.hdf5",
        1.0,
        [10, 11, 12, 13, 14],
        birth_a=[0.3, 0.6, 0.65, 0.9, 1.2],
    )
    out = compute_birth_halo_index(
        [(s0, m0), (s1, m1), (s2, m2)], final, str(tmp_path / "birth.hdf5")
    )
    # star 10 born before snap0 -> halo 7 at a=0.4
    # star 11 born at 0.6 -> first snapshot at/after is a=0.7 -> halo 2
    # star 12 born 0.65 -> a=0.7 -> halo 5
    # star 13 born 0.9 -> a=1.0 -> halo 3
    # star 14 born 1.2 -> after the last snapshot -> -1
    np.testing.assert_array_equal(out, [7, 2, 5, 3, -1])
    with h5py.File(tmp_path / "birth.hdf5", "r") as f:
        np.testing.assert_array_equal(
            f["PartType4/BirthHaloCatalogueIndex"][...], out
        )


def test_track_evolution(tmp_path):
    """Track-evolution extraction across synthetic catalogues."""
    from soap_tpu.tools.track_evolution import get_track_evolution

    paths = []
    # tracks: 5 appears at z=1 and survives; 9 only at z=0; 3 never
    layouts = [
        (1.0, [5, 7], [10.0, 70.0]),
        (0.5, [7, 5, 6], [71.0, 11.0, 60.0]),
        (0.0, [5, 6, 7, 9], [12.0, 61.0, 72.0, 90.0]),
    ]
    for i, (z, tracks, masses) in enumerate(layouts):
        p = str(tmp_path / f"cat_{i}.hdf5")
        with h5py.File(p, "w") as f:
            f.create_group("Header").attrs["Redshift"] = np.array([z])
            f["InputHalos/HBTplus/TrackId"] = np.array(tracks, np.int64)
            f["BoundSubhalo/TotalMass"] = np.array(masses)
        paths.append(p)
    out = str(tmp_path / "tracks.hdf5")
    ev = get_track_evolution(paths, out, [5, 9, 3], ["BoundSubhalo/TotalMass"])
    m = ev["BoundSubhalo/TotalMass"]
    # unique-sorted track order: [3, 5, 9]
    np.testing.assert_array_equal(m[0], [-1, -1, -1])        # track 3
    np.testing.assert_array_equal(m[1], [10.0, 11.0, 12.0])  # track 5
    np.testing.assert_array_equal(m[2], [-1, -1, 90.0])      # track 9
    with h5py.File(out, "r") as f:
        np.testing.assert_allclose(f["Redshifts"][...], [1.0, 0.5, 0.0])
        np.testing.assert_array_equal(f["TrackIds"][...], [3, 5, 9])


def test_reorder_swift_fof(tmp_path):
    """FOF ids transferred between differently-ordered snapshots."""
    from soap_tpu.tools.reorder_fof import reorder_swift_fof

    rng = np.random.default_rng(6)
    ids = np.arange(1, 101, dtype=np.uint64)
    fof = rng.integers(1, 6, 100).astype(np.int64)
    order1 = rng.permutation(100)
    order2 = rng.permutation(100)
    s1, s2 = str(tmp_path / "s1.hdf5"), str(tmp_path / "s2.hdf5")
    with h5py.File(s1, "w") as f:
        g = f.create_group("PartType1")
        g["ParticleIDs"] = ids[order1]
        g["FOFGroupIDs"] = fof[order1]
    with h5py.File(s2, "w") as f:
        f.create_group("PartType1")["ParticleIDs"] = ids[order2]
    out = reorder_swift_fof(s1, s2, str(tmp_path / "out.hdf5"))
    np.testing.assert_array_equal(out["PartType1"], fof[order2])
    with h5py.File(tmp_path / "out.hdf5", "r") as f:
        np.testing.assert_array_equal(
            f["PartType1/FOFGroupIDs"][...], fof[order2]
        )
        np.testing.assert_array_equal(
            f["PartType1/ParticleIDs"][...], ids[order2]
        )
    # unmatched IDs must fail loudly
    with h5py.File(s2, "a") as f:
        f["PartType1/ParticleIDs"][0] = 99999
    with pytest.raises(RuntimeError):
        reorder_swift_fof(s1, s2, str(tmp_path / "out2.hdf5"))


def test_hydrogen_phase_fits():
    """Physical sanity of the Rahmati+13 / BR06 fitting formulas."""
    from soap_tpu.tools.hydrogen_phases import (
        molecular_fraction,
        neutral_fraction,
    )

    # dense cold gas is neutral; hot diffuse gas is ionized
    assert neutral_fraction(np.array([100.0]), np.array([1e3]), 0.0)[0] > 0.95
    assert neutral_fraction(np.array([1e-6]), np.array([1e6]), 0.0)[0] < 1e-3
    # neutral fraction rises monotonically with density at fixed T
    n = np.logspace(-6, 2, 40)
    x = neutral_fraction(n, np.full(40, 1e4), 0.0)
    assert (np.diff(x) >= -1e-12).all()
    assert x[0] < 0.01 and x[-1] > 0.9
    # molecular fraction: 0.5 at P = P0, monotone in P
    np.testing.assert_allclose(molecular_fraction(np.array([4.3e4]))[0], 0.5)
    p = np.logspace(1, 8, 30)
    f = molecular_fraction(p)
    assert (np.diff(f) > 0).all() and f[0] < 0.01 and f[-1] > 0.97


def test_compute_hydrogen_fractions(tmp_path):
    from soap_tpu.tools.hydrogen_phases import compute_hydrogen_fractions
    from soap_tpu.utils.mock_data import make_mock_simulation

    sim = make_mock_simulation(
        str(tmp_path), n_halos=3, n_field=1200, boxsize=12.0, seed=10,
        hydro=True,
    )
    out_file = str(tmp_path / "hfrac.hdf5")
    out = compute_hydrogen_fractions(sim["snapshot"], out_file)
    sp = out["SpeciesFractions"]
    assert np.isfinite(sp).all()
    assert (sp >= 0).all() and (sp <= 1).all()
    # species sum to one per hydrogen: HI + HII + 2 H2 = 1
    np.testing.assert_allclose(
        sp[:, 1] + sp[:, 2] + 2 * sp[:, 3], 1.0, atol=1e-5
    )
    with h5py.File(out_file, "r") as f:
        assert f["PartType0/SpeciesFractions"].shape == sp.shape
        assert "Cells" in f
        cols = [c.decode() for c in f["SubgridScheme/NamedColumns/SpeciesFractions"]]
        assert cols == ["elec", "HI", "HII", "H2", "H2p"]
