"""EAGLE GADGET -> SWIFT snapshot conversion + end-to-end pipeline run."""

import h5py
import numpy as np
import pytest

from soap_tpu.tools.convert_eagle import U_L, U_M, convert_eagle

H = 0.6777
BOX_HFREE = 16.0  # cMpc


def _write_eagle_mock(tmp_path, uni):
    """Re-express a mock universe as EAGLE particledata + subfind_tab:
    positions/box in h^-1 cMpc, DM mass via the GADGET mass table."""
    pd = str(tmp_path / "particledata_027.hdf5")
    tab = str(tmp_path / "subfind_tab_027.hdf5")
    grp = np.where(uni.fof_ids > 0, uni.fof_ids, -1).astype(np.int64)
    sub = np.zeros(len(uni.pos), np.int64)
    sub[grp < 0] = 1 << 31  # unbound fuzz marker
    with h5py.File(pd, "w") as f:
        hdr = f.create_group("Header")
        hdr.attrs["HubbleParam"] = H
        hdr.attrs["ExpansionFactor"] = 1.0
        hdr.attrs["BoxSize"] = BOX_HFREE * H  # h^-1 cMpc
        hdr.attrs["Omega0"] = 0.307
        hdr.attrs["OmegaLambda"] = 0.693
        hdr.attrs["OmegaBaryon"] = 0.0482
        # DM particle mass in 1e10 Msun/h
        hdr.attrs["MassTable"] = np.array(
            [0.0, uni.mass[0] * H, 0, 0, 0, 0]
        )
        g = f.create_group("PartType1")

        def ds(name, data, h_exp, cgs):
            d = g.create_dataset(name, data=data)
            d.attrs["h-scale-exponent"] = np.float64(h_exp)
            d.attrs["aexp-scale-exponent"] = np.float64(1.0)
            d.attrs["CGSConversionFactor"] = np.float64(cgs)

        ds("Coordinates", (uni.pos * H).astype(np.float64), -1.0, U_L)
        ds("Velocity", uni.vel.astype(np.float32), 0.0, 1.0e5)
        ds("ParticleIDs", uni.ids, 0.0, 1.0)
        ds("GroupNumber", grp, 0.0, 1.0)
        ds("SubGroupNumber", sub, 0.0, 1.0)
    with h5py.File(tab, "w") as f:
        s = f.create_group("Subhalo")
        # one central per FOF group; rows deliberately NOT in group order
        order = np.argsort(-uni.halo_nbound)
        s["GroupNumber"] = (order + 1).astype(np.int64)
        s["SubGroupNumber"] = np.zeros(uni.n_halos, np.int64)
        s["CentreOfPotential"] = uni.halo_pos[order]
        s["SubLength"] = uni.halo_nbound[order].astype(np.int64)
        s["HalfMassRad"] = (uni.halo_renclose[order] / 2.0)
    return pd, tab


def test_convert_and_run(tmp_path):
    from soap_tpu.io.swift_snapshot import SnapshotMetadata
    from soap_tpu.pipeline.engine import HaloTypeSpec
    from soap_tpu.pipeline.run import compute_halo_properties
    from soap_tpu.utils.mock_data import build_mock_universe

    uni = build_mock_universe(
        n_halos=4, n_field=2500, boxsize=BOX_HFREE, seed=77,
        mass_range=(40.0, 200.0),
    )
    pd, tab = _write_eagle_mock(tmp_path, uni)
    snap = str(tmp_path / "swift" / "snap_0027.hdf5")
    mem = str(tmp_path / "swift" / "membership_0027.hdf5")
    counts = convert_eagle(pd, snap, mem, subfind_basename=tab)
    assert counts["PartType1"] == len(uni.pos)

    meta = SnapshotMetadata(snap)
    np.testing.assert_allclose(meta.boxsize, BOX_HFREE, rtol=1e-6)
    with h5py.File(snap, "r") as f:
        # h-factors removed: coordinates back in h-free cMpc
        pos = np.asarray(f["PartType1/Coordinates"])
        assert pos.max() <= BOX_HFREE + 1e-6
        m = np.asarray(f["PartType1/Masses"])
        np.testing.assert_allclose(m, uni.mass[0], rtol=1e-5)
        assert "Cells/Counts/PartType1" in f
    with h5py.File(mem, "r") as f:
        grnr = np.asarray(f["PartType1/GroupNr_bound"])
        assert (grnr >= -1).all()
        # every FOF group's bound count survives the row remapping
        assert (grnr >= 0).sum() == uni.halo_nbound.sum()

    specs = [
        HaloTypeSpec(kind="bound", group="BoundSubhalo", keys=("Mtot", "Ndm")),
        HaloTypeSpec(
            kind="SO", group="SO/200_crit", keys=("r", "Mtot"),
            so_type="crit", so_multiple=200.0, centrals_only=True,
        ),
    ]
    run = compute_halo_properties(
        snapshot_file=snap, membership_file=mem,
        halo_basename=tab, output_file=str(tmp_path / "cat.hdf5"),
        halo_format="SubfindEagle", dmo=True, specs=specs, verbose=False,
    )
    sub = run.results["BoundSubhalo"]
    # catalogue rows were sorted by -nbound in the tab file
    order = np.argsort(-uni.halo_nbound)
    np.testing.assert_array_equal(sub["Ndm"], uni.halo_nbound[order])
    np.testing.assert_allclose(
        sub["Mtot"], uni.halo_nbound[order] * uni.mass[0], rtol=1e-5
    )
    assert (run.results["SO/200_crit"]["r"] > 0).all()
