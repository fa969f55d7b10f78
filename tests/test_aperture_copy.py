"""Aperture-copy optimization: big exclusive apertures must copy from the
next-smaller one when it already enclosed every bound particle, and the
copied values must equal the directly computed ones."""

import numpy as np
import pytest

from soap_tpu.pipeline.engine import HaloTypeSpec
from soap_tpu.pipeline.membership import run_group_membership
from soap_tpu.pipeline.run import compute_halo_properties
from soap_tpu.pipeline.specs import build_specs


@pytest.fixture(scope="module")
def sim(tmp_path_factory):
    from soap_tpu.utils.mock_data import make_mock_simulation

    tmpdir = str(tmp_path_factory.mktemp("apcopy"))
    s = make_mock_simulation(tmpdir, n_halos=6, n_field=3000, boxsize=18.0, seed=23)
    mem = f"{tmpdir}/mem.hdf5"
    run_group_membership(s["snapshot"], s["hbt_basename"], mem)
    return {**s, "mem": mem}


KEYS = ("Mtot", "Ndm", "com", "HalfMassRadiusTot")


def _aperture_specs(with_copy):
    specs = []
    prev = None
    for r_kpc in (500.0, 1000.0, 3000.0):
        specs.append(
            HaloTypeSpec(
                kind="aperture",
                group=f"ExclusiveSphere/{r_kpc:.0f}kpc",
                keys=KEYS,
                aperture_radius_mpc=r_kpc / 1000.0,
                inclusive=False,
                copy_from=prev[0] if (prev and with_copy) else None,
                copy_from_radius_mpc=prev[1] if (prev and with_copy) else None,
            )
        )
        prev = (f"ExclusiveSphere/{r_kpc:.0f}kpc", r_kpc / 1000.0)
    return specs


def test_copy_matches_direct(sim):
    run_copy = compute_halo_properties(
        sim["snapshot"], sim["mem"], sim["hbt_basename"], None,
        dmo=True, specs=_aperture_specs(True), verbose=False,
    )
    run_direct = compute_halo_properties(
        sim["snapshot"], sim["mem"], sim["hbt_basename"], None,
        dmo=True, specs=_aperture_specs(False), verbose=False,
    )
    assert run_copy.stats.n_copied_specs > 0
    for group in ("ExclusiveSphere/1000kpc", "ExclusiveSphere/3000kpc"):
        for key in KEYS:
            np.testing.assert_allclose(
                run_copy.results[group][key],
                run_direct.results[group][key],
                rtol=1e-6,
                err_msg=f"{group}/{key}",
            )


def test_default_specs_have_copy_annotations():
    specs = build_specs(None, True, bn98_value=100.0)
    excl = [s for s in specs if s.group.startswith("ExclusiveSphere")]
    assert excl[0].copy_from is None
    assert all(s.copy_from is not None for s in excl[1:])
    incl = [s for s in specs if s.group.startswith("InclusiveSphere")]
    assert all(s.copy_from is None for s in incl)
    # axis-major ordering: proj[0..3] = 10/30/50/100 kpc of projx
    proj = [s for s in specs if s.group.startswith("ProjectedAperture")]
    assert proj[0].copy_from is None
    assert proj[1].copy_from == "ProjectedAperture/10kpc/projx"
    assert proj[4].copy_from is None  # first radius of projy
    assert proj[5].copy_from == "ProjectedAperture/10kpc/projy"


def _cross_pass_specs(with_copy):
    """One narrow (0.3 Mpc) + one wide (0.5 Mpc) aperture: the wide/
    narrow gather-pass split puts them in separate engine sub-calls, so
    the 500 kpc copy must be served across the pass boundary from the
    narrow results (reference computes all radii in one ordered chain,
    ``aperture_properties.py:4082-4123``)."""
    return [
        HaloTypeSpec(
            kind="aperture",
            group="ExclusiveSphere/300kpc",
            keys=KEYS,
            aperture_radius_mpc=0.3,
            inclusive=False,
        ),
        HaloTypeSpec(
            kind="aperture",
            group="ExclusiveSphere/500kpc",
            keys=KEYS,
            aperture_radius_mpc=0.5,
            inclusive=False,
            copy_from="ExclusiveSphere/300kpc" if with_copy else None,
            copy_from_radius_mpc=0.3 if with_copy else None,
        ),
    ]


def test_cross_pass_copy_matches_direct():
    """Engine-level: small search radii force the wide/narrow pass
    split; small enclose radii make the wide aperture copyable."""
    from soap_tpu.models.context import HaloContext
    from soap_tpu.pipeline.chunk_data import ChunkData, stage_ptype
    from soap_tpu.pipeline.engine import HaloEngine
    from soap_tpu.utils import mock_data

    G = mock_data.G_INTERNAL
    uni = mock_data.build_mock_universe(
        n_halos=8, n_field=5000, boxsize=25.0, seed=11,
        mass_range=(5.0, 60.0),
    )
    groupnr = np.full(len(uni.ids), -1, dtype=np.int64)
    id_to_row = {pid: i for i, pid in enumerate(uni.ids)}
    for hi, ids in enumerate(uni.bound_ids):
        for pid in ids:
            groupnr[id_to_row[pid]] = hi
    rho_crit0 = 3.0 * (100.0 * uni.h) ** 2 / (8.0 * np.pi * G)
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
        critical_density=rho_crit0 * (uni.omega_m / uni.a**3 + uni.omega_lambda),
        mean_density=rho_crit0 * uni.omega_m / uni.a**3,
        softening=(0.01,), ptypes=("PartType1",), capacities=(0,), dmo=True,
    )
    enclose_phys = uni.halo_renclose * uni.a
    assert (enclose_phys < 0.3).any(), "mock halos too big for the test"
    search_phys = np.maximum(enclose_phys * 1.01, 0.05)
    assert float(search_phys.min()) < 0.5, "split condition not exercised"
    args = dict(
        centres=uni.halo_pos,
        search_radius_phys=search_phys,
        index=np.arange(uni.n_halos, dtype=np.int64),
        is_central=np.ones(uni.n_halos, dtype=bool),
        fof_id=np.arange(1, uni.n_halos + 1, dtype=np.int64),
        enclose_radius_phys=enclose_phys,
    )
    eng_copy = HaloEngine(ctx, chunk, _cross_pass_specs(True))
    res_copy = eng_copy.process(**args)
    eng_dir = HaloEngine(ctx, chunk, _cross_pass_specs(False))
    res_dir = eng_dir.process(**args)
    assert eng_copy.stats.n_copied_specs > 0
    for key in KEYS:
        np.testing.assert_allclose(
            res_copy["ExclusiveSphere/500kpc"][key],
            res_dir["ExclusiveSphere/500kpc"][key],
            rtol=1e-5,
            atol=1e-6,
            err_msg=f"ExclusiveSphere/500kpc/{key}",
        )
