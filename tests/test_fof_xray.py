"""Tests for the FOF join and the X-ray calculator machinery."""

import h5py
import numpy as np
import pytest

from soap_tpu.io.fof_catalogue import fof_join, read_fof_groups
from soap_tpu.tools import xray_calculator as xc


def test_fof_join(tmp_path):
    fof_file = str(tmp_path / "fof_0077.hdf5")
    with h5py.File(fof_file, "w") as f:
        g = f.create_group("Groups")
        g["GroupIDs"] = np.array([3, 1, 7], dtype=np.int64)
        g["Centres"] = np.array([[3.0, 3, 3], [1, 1, 1], [7, 7, 7]])
        g["Masses"] = np.array([30.0, 10.0, 70.0])
        g["Sizes"] = np.array([300, 100, 700], dtype=np.int64)
    fof = read_fof_groups(fof_file)
    host = np.array([1, 1, 7, -1], dtype=np.int64)
    central = np.array([True, False, True, True])
    cols = fof_join(fof, host, central)
    np.testing.assert_allclose(cols["FOF/Centres"][0], [1, 1, 1])
    np.testing.assert_allclose(cols["FOF/Centres"][1], [0, 0, 0])  # satellite
    np.testing.assert_allclose(cols["FOF/Masses"], [10.0, 0, 70.0, 0])
    np.testing.assert_array_equal(cols["FOF/Sizes"], [100, 0, 700, 0])


def test_fof_join_missing_group_raises(tmp_path):
    fof = {
        "GroupIDs": np.array([1], dtype=np.int64),
        "Centres": np.ones((1, 3)),
        "Masses": np.ones(1),
    }
    with pytest.raises(RuntimeError):
        fof_join(fof, np.array([2], np.int64), np.array([True]))


def test_bilinear_interp_exact_on_grid():
    t = np.linspace(4, 8, 5)
    n = np.linspace(-4, 0, 5)
    tbl = t[:, None] * 2.0 + n[None, :]
    got = xc.bilinear_interp(tbl, t, n, np.array([5.0, 6.5]), np.array([-2.0, -1.5]))
    np.testing.assert_allclose(got, [5.0 * 2 - 2.0, 6.5 * 2 - 1.5], rtol=1e-6)


def _oracle_xray(table_file, z_now, rho_cgs, T, mf, m_g, band, otype):
    """Independent float64 reference implementation of the full 5D
    interpolation (literal transcription of the reference algorithm,
    per-particle Python loop — ``misc/xray_calculator.py:50-396``)."""
    with h5py.File(table_file, "r") as f:
        zb = np.asarray(f["Bins/Redshift_bins"], np.float64)
        heb = np.asarray(f["Bins/He_bins"], np.float64)
        tb = np.asarray(f["Bins/Temperature_bins"], np.float64)
        nb = np.asarray(f["Bins/Density_bins"], np.float64)
        emass = np.asarray(f["Bins/Element_masses"], np.float64)
        solar = 10.0 ** np.asarray(f["Bins/Solar_metallicities"], np.float64)
        tbl = np.asarray(f[band][otype], np.float64)

    def reg_index(bins, x):
        delta = (len(bins) - 1) / (bins[-1] - bins[0])
        if x < bins[0]:
            return 0, 0.0
        if x >= bins[-1]:
            return len(bins) - 2, 1.0
        i = int((x - bins[0]) * delta)
        i = min(i, len(bins) - 2)
        return i, (x - bins[i]) * delta

    def irr_index(bins, x):
        if x < bins[0]:
            return 0, 0.0
        if x >= bins[-1]:
            return len(bins) - 2, 1.0
        j = int(np.searchsorted(bins, x, side="right")) - 1
        j = min(max(j, 0), len(bins) - 2)
        return j, (x - bins[j]) / (bins[j + 1] - bins[j])

    iz, dz = reg_index(zb, z_now)
    mp_g = 1.67262192369e-24
    out = np.zeros(len(T))
    for p in range(len(T)):
        n_h = mf[p, 0] * rho_cgs[p] / mp_g
        dn_log = np.log10(n_h)
        dt_log = np.log10(T[p])
        if not (
            np.round(nb.min(), 1) <= dn_log <= np.round(nb.max(), 1)
            and np.round(tb.min(), 1) <= dt_log <= np.round(tb.max(), 1)
        ):
            continue
        ab = (mf[p] / mf[p, 0]) * (emass[0] / emass)
        padded = np.concatenate([ab[:-1], [ab[-2], ab[-2], ab[-1]]])
        ats = (padded / solar)[2:]
        ihe, dhe = irr_index(heb, np.log10(ab[1]))
        it, dt = reg_index(tb, dt_log)
        inn, dnn = reg_index(nb, dn_log)
        n_elem = tbl.shape[2]
        fvec = np.zeros(n_elem)
        for bz, wz in ((iz, 1 - dz), (iz + 1, dz)):
            for bh, wh in ((ihe, 1 - dhe), (ihe + 1, dhe)):
                for bt, wt in ((it, 1 - dt), (it + 1, dt)):
                    for bn, wn in ((inn, 1 - dnn), (inn + 1, dnn)):
                        fvec += wz * wh * wt * wn * tbl[bz, bh, :, bt, bn]
        total = 10.0 ** fvec[-1] + np.sum(10.0 ** fvec[:-1] * ats)
        vol = m_g[p] / rho_cgs[p]
        out[p] = total * n_h**2 * vol
    return out


def test_xray_calculator_5d_matches_oracle(tmp_path):
    table = str(tmp_path / "xray_table_5d.hdf5")
    xc.write_mock_table_5d(table)
    rng = np.random.default_rng(11)
    n = 64
    z_now = 0.35
    T = 10.0 ** rng.uniform(4.5, 10.0, n)  # some outside [5, 9.5]
    rho = 10.0 ** rng.uniform(-30.0, -20.0, n)
    m = 10.0 ** rng.uniform(38.0, 40.0, n)
    mf = np.zeros((n, 9))
    mf[:, 0] = rng.uniform(0.7, 0.76, n)
    mf[:, 1] = rng.uniform(0.23, 0.29, n)
    mf[:, 2:] = rng.uniform(1e-5, 0.01, (n, 7))
    for band, otype in [
        ("erosita-low", "energies_intrinsic"),
        ("ROSAT", "photons_observed"),
    ]:
        calc = xc.XrayCalculator(z_now, table, [band], [otype])
        got = calc.interpolate(rho, T, mf, m, [band], [otype])[:, 0]
        want = _oracle_xray(table, z_now, rho, T, mf, m, band, otype)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=0)
        assert (want == 0).any(), "oracle should mask some out-of-bounds"
        assert (want > 0).any()


def test_xray_recalculate_full_table(tmp_path):
    from soap_tpu.utils.mock_data import make_mock_simulation

    sim = make_mock_simulation(
        str(tmp_path), n_halos=3, n_field=1200, boxsize=12.0, seed=4, hydro=True
    )
    table = str(tmp_path / "xray_table_5d.hdf5")
    xc.write_mock_table_5d(table)
    out_file = str(tmp_path / "xray_extra_full.hdf5")
    out = xc.compute_xray_luminosities(sim["snapshot"], table, out_file)
    assert set(out) == {
        "XrayLuminosities",
        "XrayPhotonLuminosities",
        "XrayLuminositiesRestframe",
        "XrayPhotonLuminositiesRestframe",
    }
    for v in out.values():
        assert v.shape[1] == 3
        assert np.isfinite(v).all()
        assert (v >= 0).all()
    with h5py.File(out_file, "r") as f:
        assert f["PartType0/XrayLuminosities"].shape == out["XrayLuminosities"].shape
        assert "Cells" in f


def test_xray_calculator_end_to_end(tmp_path):
    from soap_tpu.utils.mock_data import make_mock_simulation

    sim = make_mock_simulation(
        str(tmp_path), n_halos=3, n_field=1500, boxsize=12.0, seed=3, hydro=True
    )
    table = str(tmp_path / "xray_table.hdf5")
    xc.write_mock_table(table)
    out_file = str(tmp_path / "xray_extra.hdf5")
    out = xc.compute_xray_luminosities(sim["snapshot"], table, out_file)
    lum = out["XrayLuminosities"]
    assert lum.shape[1] == 3
    assert np.isfinite(lum).all()
    assert (lum >= 0).all()
    # hotter gas emits more in this synthetic table (sqrt-T scaling at
    # fixed density): check rank correlation on a subsample
    with h5py.File(sim["snapshot"], "r") as f:
        T = f["PartType0/Temperatures"][...]
    hot = T > np.percentile(T, 90)
    cold = T < np.percentile(T, 10)
    assert np.median(lum[hot, 0]) > np.median(lum[cold, 0])
    # extra-input file is readable and cell-layout compatible
    with h5py.File(out_file, "r") as f:
        assert f["PartType0/XrayLuminosities"].shape == lum.shape
        assert "Cells" in f


def test_calculate_fof_radii(tmp_path):
    """FOF radii tool: max periodic member distance per group, checked
    against a direct numpy recomputation from the mock universe."""
    from soap_tpu.tools.fof_radii import calculate_fof_radii
    from soap_tpu.utils.mock_data import make_mock_simulation

    sim = make_mock_simulation(
        str(tmp_path), n_halos=5, n_field=2000, boxsize=16.0, seed=13
    )
    uni = sim["universe"]
    fof_in = str(tmp_path / "fof.hdf5")
    with h5py.File(fof_in, "w") as f:
        g = f.create_group("Groups")
        g["GroupIDs"] = np.arange(1, uni.n_halos + 1, dtype=np.int64)
        g["Centres"] = uni.halo_pos
        g["Masses"] = np.ones(uni.n_halos)
        g["Sizes"] = uni.halo_nbound.astype(np.int64)
    fof_out = str(tmp_path / "fof_radii.hdf5")
    radii = calculate_fof_radii(sim["snapshot"], fof_in, fof_out)

    box = uni.boxsize
    for hi in range(uni.n_halos):
        rows = uni.fof_ids == hi + 1
        d = uni.pos[rows] - uni.halo_pos[hi]
        d -= box * np.round(d / box)
        want = np.sqrt((d * d).sum(axis=1)).max()
        np.testing.assert_allclose(radii[hi], want, rtol=1e-10, err_msg=str(hi))
    with h5py.File(fof_out, "r") as f:
        assert f["Groups/Radii"].shape == (uni.n_halos,)
        assert "GroupIDs" in f["Groups"]


def test_build_matrix():
    from soap_tpu.tools.fof_radii import build_matrix

    rng = np.random.default_rng(8)
    for ndim in (2, 3):
        k = ndim * (ndim + 1) // 2
        flat = rng.random((10, k))
        m = build_matrix(flat)
        assert m.shape == (10, ndim, ndim)
        assert (m == m.swapaxes(1, 2)).all()
        np.testing.assert_array_equal(
            np.diagonal(m, axis1=1, axis2=2), flat[:, :ndim]
        )
    with pytest.raises(ValueError):
        build_matrix(np.ones((2, 5)))
