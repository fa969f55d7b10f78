"""Tests for units, registry, cosmology and snapshot metadata reading."""

import numpy as np
import pytest

from soap_tpu.core import cosmology, registry, units
from soap_tpu.io import swift_snapshot


def test_property_table_complete():
    table = registry.full_property_table()
    # The reference API contract has 304 properties
    # (SOAP/property_table.py full_property_list).
    assert len(table) == 304
    p = table["SO_R"] if "SO_R" in table else None
    # Spot-check a few well-known entries.
    assert "Mtot" in table
    mtot = table["Mtot"]
    assert mtot.name == "TotalMass"
    assert mtot.unit == "snap_mass"
    assert mtot.dmo
    com = table["com"]
    assert com.shape == 3
    assert com.dtype == np.dtype(np.float64) or com.dtype == np.dtype(np.float32)


def test_property_table_units_parse(mock_sim):
    meta = swift_snapshot.SnapshotMetadata(mock_sim["snapshot"])
    table = registry.full_property_table()
    for key, prop in table.items():
        u = meta.units.parse(prop.unit)  # must not raise
        assert isinstance(u, units.Unit)


def test_unit_algebra():
    reg = units.UnitRegistry(
        snap_units_cgs={
            "Unit length in cgs (U_L)": 3.0857e24,
            "Unit mass in cgs (U_M)": 1.98841e43,
            "Unit time in cgs (U_t)": 3.0857e19,
        },
        code_units_cgs={
            "Unit length in cgs (U_L)": 3.0857e24,
            "Unit mass in cgs (U_M)": 1.98841e43,
            "Unit time in cgs (U_t)": 3.0857e19,
        },
        a=0.5,
        h=0.7,
    )
    v = reg.parse("snap_length/snap_time")
    assert np.isclose(v.cgs, 1.0e5)  # km/s
    assert np.isclose(v.conversion_to(reg.parse("km/s")), 1.0)
    rho = reg.parse("snap_mass/snap_length**3")
    assert rho.dims == (0.0, -3.0, 1.0, 0.0, -3.0 * 0 + 0.0) or rho.dims[1] == -3.0
    # a-factor bookkeeping
    comoving_length = reg.parse("a*snap_length")
    assert comoving_length.a_exp == 1.0
    assert np.isclose(comoving_length.cgs, 0.5 * 3.0857e24)


def test_unit_attr_roundtrip():
    reg = units.UnitRegistry(
        snap_units_cgs={
            "Unit length in cgs (U_L)": 3.0857e24,
            "Unit mass in cgs (U_M)": 1.98841e43,
            "Unit time in cgs (U_t)": 3.0857e19,
        },
        code_units_cgs={
            "Unit length in cgs (U_L)": 3.0857e24,
            "Unit mass in cgs (U_M)": 1.98841e43,
            "Unit time in cgs (U_t)": 3.0857e19,
        },
        a=0.8,
        h=0.68,
    )
    u = reg.parse("a*snap_length")
    attrs = units.attributes_from_unit(u, physical=False, a_exp=1.0, reg=reg)
    back = units.unit_from_attributes(attrs, reg)
    assert back.same_dims(u)
    assert np.isclose(back.cgs, u.cgs)
    assert back.a_exp == 1.0


def test_cosmology_densities():
    cosmo = cosmology.Cosmology(
        a=1.0,
        h=0.681,
        H0_internal=68.1,
        omega_m=0.306,
        omega_lambda=0.694,
        omega_k=0.0,
    )
    G = 43.0071
    rho_c = cosmo.critical_density_z0_internal(G)
    # known: 2.775e11 h^2 Msun/Mpc^3 = 27.75 h^2 in 1e10 Msun/Mpc^3
    assert np.isclose(rho_c, 27.7536 * 0.681**2, rtol=1e-3)
    vir = cosmo.bn98_virial_multiple()
    # BN98 at z=0 for Omega_m~0.3 is ~100
    assert 90 < vir < 110


def test_cosmology_age():
    cosmo = cosmology.Cosmology(
        a=1.0,
        h=0.6774,
        H0_internal=67.74,
        omega_m=0.3089,
        omega_lambda=0.6911,
        omega_k=0.0,
    )
    t = cosmo.age_of_universe_H0(1.0)
    # age of Planck-like universe ~13.8 Gyr; 1/H0 = 14.44 Gyr for h=0.6774
    H0_per_s = 67.74 * 1.0e5 / 3.0857e24  # km/s/Mpc -> 1/s
    hubble_time_gyr = 1.0 / H0_per_s / 3.15576e16
    age_gyr = t * hubble_time_gyr
    assert np.isclose(age_gyr, 13.8, atol=0.1)
    # table is monotone
    a_grid, ages = cosmo.age_table(n=256)
    assert np.all(np.diff(ages) > 0)


def test_snapshot_metadata(mock_sim):
    meta = swift_snapshot.SnapshotMetadata(mock_sim["snapshot"])
    uni = mock_sim["universe"]
    assert meta.boxsize == uni.boxsize
    assert meta.a == uni.a
    assert "PartType1" in meta.ptypes
    assert meta.cell_counts["PartType1"].sum() == len(uni.pos)
    # critical density: mock is at a=1 with flat LCDM
    rho_c_expected = (
        3.0 * (100 * uni.h) ** 2 / (8 * np.pi * 43.0071) * (uni.omega_m + uni.omega_lambda * 0 + 0)
    )
    assert meta.critical_density > 0
    assert 90 < meta.virBN98 < 110
    info = meta.datasets["PartType1"]["Coordinates"]
    assert info.row_shape == (3,)
    assert info.a_exponent == 1.0


def test_masked_read_roundtrip(mock_sim):
    meta = swift_snapshot.SnapshotMetadata(mock_sim["snapshot"])
    uni = mock_sim["universe"]
    # read everything via an all-true mask and compare sorted IDs
    mask = np.ones(meta.nr_cells, dtype=bool)
    data = swift_snapshot.read_masked_cells(
        meta, mask, {"PartType1": ["Coordinates", "Masses", "ParticleIDs"]}
    )
    ids = data["PartType1"]["ParticleIDs"]
    assert len(ids) == len(uni.ids)
    assert np.array_equal(np.sort(ids), np.sort(uni.ids))
    # masses aligned with ids
    assert np.allclose(data["PartType1"]["Masses"], uni.mass[0])

    # partial mask: only cells containing the first halo
    centre = uni.halo_pos[0]
    r = uni.halo_renclose[0]
    mask2 = meta.mask_cells_for_spheres(centre[None, :], np.array([r]))
    assert mask2.sum() >= 1
    data2 = swift_snapshot.read_masked_cells(
        meta, mask2, {"PartType1": ["Coordinates", "ParticleIDs"]}
    )
    got_ids = set(data2["PartType1"]["ParticleIDs"].tolist())
    # every bound particle of halo 0 must be inside the masked region
    for pid in uni.bound_ids[0]:
        assert int(pid) in got_ids


def test_parameter_file_basic(tmp_path):
    from soap_tpu.core.params import ParameterFile, substitute_parameters

    cfg = {
        "Parameters": {"sim_name": None},
        "Snapshots": {"filename": "/data/{sim_name}/snap_{snap_nr:04d}.hdf5"},
        "HaloFinder": {"type": "HBTplus"},
        "calculations": {"calculate_missing_properties": False},
        "filters": {"general": {"limit": 100}},
        "SOProperties": {"properties": {"TotalMass": "general", "SORadius": True}},
    }
    merged = substitute_parameters(cfg, {"sim_name": "L0040"})
    assert merged["Snapshots"]["filename"] == "/data/L0040/snap_{snap_nr:04d}.hdf5"
    # deferred placeholders survive and can be filled per file
    assert merged["Snapshots"]["filename"].format(snap_nr=7).endswith(
        "snap_0007.hdf5"
    )
    pf = ParameterFile(parameter_dictionary=merged)
    filt = pf.get_property_filters("SOProperties", ["TotalMass", "SORadius", "Mgas"])
    assert filt["TotalMass"] == "general"
    assert filt["SORadius"] == "basic"
    assert filt["Mgas"] is False
