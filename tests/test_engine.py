"""End-to-end engine test: bucketed batch processing vs numpy oracle.

Mirrors the reference's synthetic-halo unit tests
(``tests/test_subhalo_properties.py``, ``tests/test_SO_properties.py`` in
the reference): generate randomized NFW halos, run the full engine
(counting -> bucketing -> gather -> property DAG), and check values
against brute-force numpy on the same particles.
"""

import numpy as np
import pytest

from soap_tpu.models.context import HaloContext
from soap_tpu.pipeline.chunk_data import stage_ptype, ChunkData
from soap_tpu.pipeline.engine import HaloEngine, HaloTypeSpec
from soap_tpu.utils import mock_data

G = mock_data.G_INTERNAL

SUBHALO_KEYS = (
    "Mtot",
    "Mdm",
    "Ndm",
    "com",
    "vcom",
    "EncloseRadius",
    "HalfMassRadiusTot",
    "HalfMassRadiusDM",
    "Ldm",
    "veldisp_matrix_dm",
    "Vmax_unsoft",
    "R_vmax_unsoft",
    "spin_parameter",
    "TotalInertiaTensorNoniterative",
)
SO_KEYS = (
    "r",
    "Mtot",
    "Ndm",
    "com",
    "vcom",
    "concentration_unsoft",
    "Mfrac_satellites",
    "Mfrac_external",
    "spin_parameter",
)


@pytest.fixture(scope="module")
def engine_setup():
    uni = mock_data.build_mock_universe(
        n_halos=10, n_field=6000, boxsize=25.0, seed=3
    )
    # per-particle bound membership from the mock's bound ID lists
    groupnr = np.full(len(uni.ids), -1, dtype=np.int64)
    id_to_row = {pid: i for i, pid in enumerate(uni.ids)}
    for hi, ids in enumerate(uni.bound_ids):
        for pid in ids:
            groupnr[id_to_row[pid]] = hi

    rho_crit0 = 3.0 * (100.0 * uni.h) ** 2 / (8.0 * np.pi * G)
    E2 = uni.omega_m / uni.a**3 + uni.omega_lambda
    rho_crit = rho_crit0 * E2
    rho_mean = rho_crit0 * uni.omega_m / uni.a**3

    chunk = ChunkData(
        boxsize=uni.boxsize,
        ptypes={
            "PartType1": stage_ptype(
                uni.pos,
                {
                    "Masses": uni.mass.astype(np.float32),
                    "Velocities": uni.vel.astype(np.float32),
                    "GroupNr_bound": groupnr,
                    "FOFGroupIDs": uni.fof_ids,
                },
                uni.boxsize,
            )
        },
    )
    ctx = HaloContext(
        a=uni.a,
        z=1.0 / uni.a - 1.0,
        G=G,
        boxsize=uni.boxsize,
        critical_density=rho_crit,
        mean_density=rho_mean,
        softening=(0.01,),
        ptypes=("PartType1",),
        capacities=(0,),
        dmo=True,
    )
    specs = [
        HaloTypeSpec(kind="bound", group="BoundSubhalo", keys=SUBHALO_KEYS),
        HaloTypeSpec(
            kind="SO",
            group="SO/200_crit",
            keys=SO_KEYS,
            so_type="crit",
            so_multiple=200.0,
            centrals_only=True,
        ),
    ]
    eng = HaloEngine(ctx, chunk, specs)
    results = eng.process(
        centres=uni.halo_pos,
        search_radius_phys=uni.halo_renclose * uni.a * 1.01,
        index=np.arange(uni.n_halos, dtype=np.int64),
        is_central=np.ones(uni.n_halos, dtype=bool),
        fof_id=np.arange(1, uni.n_halos + 1, dtype=np.int64),
    )
    return uni, groupnr, results, rho_crit


def _rel_pos(uni, hi):
    d = uni.pos - uni.halo_pos[hi][None, :]
    d -= np.round(d / uni.boxsize) * uni.boxsize
    return d


def test_bound_masses_and_com(engine_setup):
    uni, groupnr, results, _ = engine_setup
    sub = results["BoundSubhalo"]
    for hi in range(uni.n_halos):
        sel = groupnr == hi
        np.testing.assert_allclose(
            sub["Mtot"][hi], uni.mass[sel].sum(), rtol=1e-5
        )
        assert sub["Ndm"][hi] == sel.sum()
        d = _rel_pos(uni, hi)[sel]
        m = uni.mass[sel]
        com = uni.halo_pos[hi] + (m[:, None] * d).sum(axis=0) / m.sum()
        np.testing.assert_allclose(sub["com"][hi], com, atol=2e-5)
        vcom = (m[:, None] * uni.vel[sel]).sum(axis=0) / m.sum()
        np.testing.assert_allclose(sub["vcom"][hi], vcom, rtol=2e-4, atol=1e-3)


def test_bound_radii_and_vmax(engine_setup):
    uni, groupnr, results, _ = engine_setup
    sub = results["BoundSubhalo"]
    for hi in range(uni.n_halos):
        sel = groupnr == hi
        r = np.linalg.norm(_rel_pos(uni, hi)[sel], axis=1)
        m = uni.mass[sel]
        np.testing.assert_allclose(
            sub["EncloseRadius"][hi], r.max(), rtol=1e-5
        )
        # half-mass radius oracle
        o = np.argsort(r)
        cum = np.cumsum(m[o])
        target = 0.5 * m.sum()
        i = np.searchsorted(cum, target)
        rs = r[o]
        prev_r = rs[i - 1] if i > 0 else 0.0
        prev_c = cum[i - 1] if i > 0 else 0.0
        hmr = prev_r + (target - prev_c) / (cum[i] - prev_c) * (rs[i] - prev_r)
        np.testing.assert_allclose(sub["HalfMassRadiusTot"][hi], hmr, rtol=1e-4)
        # vmax oracle (skip r==0 central particle)
        usable = rs > 1e-8
        ratio = cum[usable] / rs[usable]
        vmax = np.sqrt(G * ratio.max())
        np.testing.assert_allclose(sub["Vmax_unsoft"][hi], vmax, rtol=1e-4)


def test_bound_kinematics(engine_setup):
    uni, groupnr, results, _ = engine_setup
    sub = results["BoundSubhalo"]
    for hi in range(0, uni.n_halos, 3):
        sel = groupnr == hi
        d = _rel_pos(uni, hi)[sel]
        m = uni.mass[sel]
        v = uni.vel[sel]
        vcom = (m[:, None] * v).sum(axis=0) / m.sum()
        L = (m[:, None] * np.cross(d, v - vcom[None, :])).sum(axis=0)
        np.testing.assert_allclose(
            sub["Ldm"][hi], L, rtol=2e-3, atol=2e-3 * np.abs(L).max()
        )
        dv = v - vcom[None, :]
        frac = m / m.sum()
        expect = np.array(
            [
                (frac * dv[:, 0] * dv[:, 0]).sum(),
                (frac * dv[:, 1] * dv[:, 1]).sum(),
                (frac * dv[:, 2] * dv[:, 2]).sum(),
                (frac * dv[:, 0] * dv[:, 1]).sum(),
                (frac * dv[:, 0] * dv[:, 2]).sum(),
                (frac * dv[:, 1] * dv[:, 2]).sum(),
            ]
        )
        np.testing.assert_allclose(
            sub["veldisp_matrix_dm"][hi],
            expect,
            rtol=2e-3,
            atol=1e-3 * np.abs(expect).max(),
        )


def test_so_radius_and_mass(engine_setup):
    uni, groupnr, results, rho_crit = engine_setup
    so = results["SO/200_crit"]
    target = 200.0 * rho_crit
    for hi in range(uni.n_halos):
        # oracle: sorted density profile crossing
        d = _rel_pos(uni, hi)
        r = np.linalg.norm(d, axis=1)
        keep = r < 0.45 * uni.boxsize  # everything within the min-image region
        r = np.sort(r[keep])
        m_cum = np.cumsum(np.full(len(r), uni.mass[0]))
        nskip = max(1, int((r <= 0).sum()))
        rr = r[nskip:]
        cc = m_cum[nskip:]
        dens = cc / (4.0 / 3.0 * np.pi * rr**3)
        below = dens < target
        assert below.any()
        i = np.argmax(below)
        if i == 0:
            continue  # profile starts below; rare
        r1, r2 = rr[i - 1], rr[i]
        M1, M2 = cc[i - 1], cc[i]
        # engine radius must lie in the crossing interval and reproduce
        # the density condition 4pi/3 rho r^3 = M1 + slope (r - r1)
        r_so = so["r"][hi]
        assert r1 <= r_so <= r2 * 1.0001, (hi, r1, r_so, r2)
        m_so = so["Mtot"][hi]
        np.testing.assert_allclose(
            m_so, 4.0 / 3.0 * np.pi * target * r_so**3, rtol=1e-3
        )
        m_interp = M1 + (M2 - M1) / (r2 - r1) * (r_so - r1)
        np.testing.assert_allclose(m_so, m_interp, rtol=2e-3)
        assert so["Ndm"][hi] > 0


def test_so_satellite_fractions_zero(engine_setup):
    # mock halos are isolated: no satellites, no external bound mass
    uni, groupnr, results, _ = engine_setup
    so = results["SO/200_crit"]
    assert np.all(so["Mfrac_satellites"] >= 0)
    assert np.all(so["Mfrac_satellites"] <= 1e-6)


def test_concentration_reasonable(engine_setup):
    uni, groupnr, results, _ = engine_setup
    so = results["SO/200_crit"]
    c = so["concentration_unsoft"]
    found = so["r"] > 0
    assert found.any()
    assert np.all(c[found] >= 1.0)
    assert np.all(c[found] <= 1000.0)


def test_wide_narrow_split_matches_single_pass(mock_sim):
    """The wide/narrow spec split must not change any value."""
    import soap_tpu.pipeline.engine as eng_mod
    from soap_tpu.pipeline.membership import run_group_membership
    from soap_tpu.pipeline.run import compute_halo_properties
    import os, tempfile

    with tempfile.TemporaryDirectory() as td:
        mem = f"{td}/mem.hdf5"
        run_group_membership(
            mock_sim["snapshot"], mock_sim["hbt_basename"], mem
        )
        specs = [
            HaloTypeSpec(kind="bound", group="BoundSubhalo",
                         keys=("Mtot", "Ndm", "com", "EncloseRadius")),
            HaloTypeSpec(kind="SO", group="SO/200_crit", keys=("r", "Mtot"),
                         so_type="crit", so_multiple=200.0, centrals_only=True),
            HaloTypeSpec(kind="aperture", group="ExclusiveSphere/100kpc",
                         keys=("Mtot", "Ndm"), aperture_radius_mpc=0.1),
            HaloTypeSpec(kind="aperture", group="InclusiveSphere/2000kpc",
                         keys=("Mtot", "Ndm"), aperture_radius_mpc=2.0,
                         inclusive=True),
            HaloTypeSpec(kind="projected", group="ProjectedAperture/1000kpc/projz",
                         keys=("Mtot",), aperture_radius_mpc=1.0, axis=2),
        ]
        common = dict(
            snapshot_file=mock_sim["snapshot"], membership_file=mem,
            halo_basename=mock_sim["hbt_basename"], output_file=None,
            dmo=True, specs=specs, verbose=False,
        )
        run_split = compute_halo_properties(**common)
        old = eng_mod.WIDE_RADIUS_MPC
        eng_mod.WIDE_RADIUS_MPC = 0.0
        try:
            run_single = compute_halo_properties(**common)
        finally:
            eng_mod.WIDE_RADIUS_MPC = old
        for group in run_single.results:
            for key in run_single.results[group]:
                np.testing.assert_allclose(
                    run_split.results[group][key],
                    run_single.results[group][key],
                    rtol=2e-5, atol=1e-7, err_msg=f"{group}/{key}",
                )


def test_record_spec_timings_mode(mock_sim):
    """Profiling mode: one program per spec, per-group seconds recorded,
    results identical to the fused path."""
    from soap_tpu.pipeline.membership import run_group_membership
    from soap_tpu.pipeline.run import compute_halo_properties
    from soap_tpu.io.halo_catalogue import CATALOGUE_READERS
    from soap_tpu.io import swift_snapshot
    from soap_tpu.pipeline.chunk_data import ChunkData, stage_ptype
    from soap_tpu.pipeline.run import make_context
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        mem = f"{td}/mem.hdf5"
        run_group_membership(mock_sim["snapshot"], mock_sim["hbt_basename"], mem)
        meta = swift_snapshot.SnapshotMetadata(
            mock_sim["snapshot"], extra_filenames=[mem]
        )
        cat = CATALOGUE_READERS["HBTplus"](
            mock_sim["hbt_basename"], h=meta.h, a=meta.a
        )
        ctx = make_context(meta, ["PartType1"], dmo=True)
        mask = np.ones(meta.nr_cells, bool)
        data = swift_snapshot.read_masked_cells(
            meta, mask,
            {"PartType1": ["Coordinates", "Masses", "Velocities",
                           "GroupNr_bound", "FOFGroupIDs"]},
        )
        fields = {k: v for k, v in data["PartType1"].items()
                  if k not in ("Coordinates", "__cells__")}
        chunk = ChunkData(
            boxsize=meta.boxsize,
            ptypes={"PartType1": stage_ptype(
                np.mod(data["PartType1"]["Coordinates"], meta.boxsize),
                fields, meta.boxsize)},
        )
        specs = [
            HaloTypeSpec(kind="bound", group="BoundSubhalo", keys=("Mtot", "Ndm")),
            HaloTypeSpec(kind="SO", group="SO/200_crit", keys=("r", "Mtot"),
                         so_type="crit", so_multiple=200.0, centrals_only=True),
            HaloTypeSpec(kind="SO", group="SO/5xR200_crit", keys=("r", "Mtot"),
                         so_type="crit", so_multiple=200.0,
                         radius_multiple_of="SO/200_crit", radius_multiple=5.0,
                         centrals_only=True),
        ]
        args = dict(
            centres=cat.cofp, search_radius_phys=cat.search_radius * meta.a,
            index=cat.index, is_central=cat.is_central.astype(bool),
            fof_id=cat.fof_id,
        )
        timed = HaloEngine(ctx, chunk, specs, record_spec_timings=True)
        res_t = timed.process(**args)
        assert set(timed.stats.spec_seconds) == {
            "BoundSubhalo", "SO/200_crit", "SO/5xR200_crit"
        }
        assert all(v > 0 for v in timed.stats.spec_seconds.values())
        fused = HaloEngine(ctx, chunk, specs)
        res_f = fused.process(**args)
        for group in res_f:
            for key in res_f[group]:
                np.testing.assert_allclose(
                    res_t[group][key], res_f[group][key], rtol=2e-5,
                    err_msg=f"{group}/{key}",
                )


def test_int_fields_bitcast_roundtrip():
    """Int columns ride packed_f as bitcast f32 bit-halves: arbitrary
    bit patterns (incl. float-NaN payloads, extremes, uint64 high bit)
    must survive staging + unpack exactly."""
    rng = np.random.default_rng(7)
    n = 257
    pos = rng.uniform(0, 10.0, (n, 3))
    group = rng.integers(-(2**62), 2**62, n, dtype=np.int64)
    # values whose f32 bit-halves are NaNs/infs
    group[:8] = [0, -1, 2**63 - 1, -(2**63), 0x7FC00000_7FC00000,
                 0x7F800000, -0x7F800000, 42]
    ids = rng.integers(0, 2**63, n).astype(np.uint64)
    ids[0] = np.uint64(2**64 - 1)
    ids[1] = np.uint64(0)
    from soap_tpu.pipeline.chunk_data import stage_ptype

    pt = stage_ptype(
        pos,
        {
            "Masses": rng.uniform(1, 2, n).astype(np.float32),
            "GroupNr_bound": group,
            "ParticleIDs": ids,
        },
        10.0,
    )
    assert pt.packed_i is None
    got_g = np.asarray(pt.field("GroupNr_bound"))[: pt.n]
    got_i = np.asarray(pt.field("ParticleIDs"))[: pt.n]
    # staging sorts rows by grid cell: compare as multisets, and check
    # the int columns stay row-paired with each other
    assert got_g.dtype == np.int64 and got_i.dtype == np.uint64
    assert np.array_equal(np.sort(got_g), np.sort(group))
    assert np.array_equal(np.sort(got_i), np.sort(ids))
    pair_in = sorted(zip(group.tolist(), ids.tolist()))
    pair_out = sorted(zip(got_g.tolist(), got_i.tolist()))
    assert pair_in == pair_out


def test_merged_pass_when_radii_cover_wide(engine_setup):
    """When every halo's input search radius covers the widest aperture,
    the wide/narrow split is skipped (one pass, half the programs) and
    values match the forced-split path."""
    uni, groupnr, _, rho_crit = engine_setup
    import soap_tpu.pipeline.engine as eng_mod
    from soap_tpu.pipeline.chunk_data import ChunkData, stage_ptype

    chunk = ChunkData(
        boxsize=uni.boxsize,
        ptypes={
            "PartType1": stage_ptype(
                uni.pos,
                {
                    "Masses": uni.mass.astype(np.float32),
                    "Velocities": uni.vel.astype(np.float32),
                    "GroupNr_bound": groupnr,
                    "FOFGroupIDs": uni.fof_ids,
                },
                uni.boxsize,
            )
        },
    )
    ctx = HaloContext(
        a=uni.a, z=1.0 / uni.a - 1.0, G=G, boxsize=uni.boxsize,
        critical_density=rho_crit,
        mean_density=rho_crit * 0.3,
        softening=(0.01,), ptypes=("PartType1",), capacities=(0,),
        dmo=True,
    )
    specs = [
        HaloTypeSpec(kind="bound", group="BoundSubhalo",
                     keys=("Mtot", "Ndm")),
        HaloTypeSpec(kind="aperture", group="ExclusiveSphere/100kpc",
                     keys=("Mtot", "Ndm"), aperture_radius_mpc=0.1),
        HaloTypeSpec(kind="aperture", group="InclusiveSphere/1000kpc",
                     keys=("Mtot", "Ndm"), aperture_radius_mpc=1.0,
                     inclusive=True),
    ]
    # all radii cover the 1 Mpc wide aperture -> the split must merge
    big_radius = np.full(uni.n_halos, 1.5, np.float64) * uni.a
    args = dict(
        centres=uni.halo_pos,
        search_radius_phys=big_radius,
        index=np.arange(uni.n_halos, dtype=np.int64),
        is_central=np.ones(uni.n_halos, dtype=bool),
        fof_id=np.arange(1, uni.n_halos + 1, dtype=np.int64),
    )
    merged_eng = HaloEngine(ctx, chunk, specs)
    merged = merged_eng.process(**args)

    # forcing the split: shrink the merge window so it cannot trigger
    old = eng_mod.WIDE_RADIUS_MPC
    eng_mod.WIDE_RADIUS_MPC = 0.0  # single-pass reference
    try:
        ref_eng = HaloEngine(ctx, chunk, specs)
        ref = ref_eng.process(**args)
    finally:
        eng_mod.WIDE_RADIUS_MPC = old

    # merged run does ONE pass: same bucket-call count as the no-split
    # reference, not double
    assert merged_eng.stats.n_bucket_calls == ref_eng.stats.n_bucket_calls
    for group in ref:
        for key in ref[group]:
            np.testing.assert_allclose(
                merged[group][key], ref[group][key], rtol=2e-5, atol=1e-7,
                err_msg=f"{group}/{key}",
            )
