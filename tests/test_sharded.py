"""Multi-chip sharded engine vs the single-device engine.

Validates that the production sharded path (``parallel/sharded.py``:
stacked chunk stores sharded over a (chunks, halos) mesh, real
presize -> count -> gather -> property DAG -> retry ladder) computes the
same catalogue values as ``HaloEngine`` run chunk-by-chunk on one device.
Bucket shapes may differ between the two schedules (the sharded path
tiles against max-over-chunks candidate counts), so float comparisons
allow reduction-reassociation noise; integer outputs must match exactly.
"""

import numpy as np
import pytest

import jax

from soap_tpu.core.halo_types import implemented_keys_for
from soap_tpu.models.context import HaloContext
from soap_tpu.pipeline.chunk_data import ChunkData, stage_ptype
from soap_tpu.pipeline.engine import HaloEngine, HaloTypeSpec
from soap_tpu.parallel.sharded import ShardedHaloEngine, make_mesh, stack_chunks
from soap_tpu.utils import mock_data

G = mock_data.G_INTERNAL


def _universe_and_chunk(n_halos=10, seed=3):
    uni = mock_data.build_mock_universe(
        n_halos=n_halos,
        n_field=6000,
        boxsize=40.0,
        seed=seed,
        mass_range=(3.2, 60.0),
    )
    groupnr = np.full(len(uni.ids), -1, dtype=np.int64)
    id_to_row = np.empty(uni.ids.max() + 1, dtype=np.int64)
    id_to_row[uni.ids] = np.arange(len(uni.ids))
    for hi, ids in enumerate(uni.bound_ids):
        groupnr[id_to_row[ids]] = hi
    fields = {
        "Masses": uni.mass.astype(np.float32),
        "Velocities": uni.vel.astype(np.float32),
        "GroupNr_bound": groupnr,
        "FOFGroupIDs": uni.fof_ids,
    }
    chunk = ChunkData(
        boxsize=uni.boxsize,
        ptypes={
            "PartType1": stage_ptype(uni.pos, fields, uni.boxsize, resolution=8)
        },
    )
    rho_crit0 = 3.0 * (100.0 * uni.h) ** 2 / (8.0 * np.pi * G)
    E2 = uni.omega_m / uni.a**3 + uni.omega_lambda
    ctx = HaloContext(
        a=uni.a,
        z=0.0,
        G=G,
        boxsize=uni.boxsize,
        critical_density=rho_crit0 * E2,
        mean_density=rho_crit0 * uni.omega_m / uni.a**3,
        softening=(0.01,),
        ptypes=("PartType1",),
        capacities=(0,),
        dmo=True,
    )
    return uni, chunk, ctx


def _specs():
    return (
        HaloTypeSpec(
            kind="bound",
            group="BoundSubhalo",
            keys=implemented_keys_for("BoundSubhalo", True),
        ),
        HaloTypeSpec(
            kind="SO",
            group="SO/200_crit",
            keys=implemented_keys_for("SO", True),
            so_type="crit",
            so_multiple=200.0,
            centrals_only=True,
        ),
    )


@pytest.fixture(scope="module")
def setup():
    return _universe_and_chunk()


def test_stack_chunks_pads_and_stacks(setup):
    _, chunk, _ = setup
    stacked = stack_chunks([chunk, chunk])
    pt = stacked.ptypes["PartType1"]
    base = chunk.ptypes["PartType1"]
    assert pt.pos_hi.shape == (2,) + base.pos_hi.shape
    assert pt.sat.shape == (2,) + base.sat.shape
    np.testing.assert_array_equal(pt.offsets[0], base.offsets)
    np.testing.assert_array_equal(
        pt.fields["Masses"][1], base.fields["Masses"]
    )


def test_sharded_engine_matches_single_device(setup):
    uni, chunk, ctx = setup
    specs = _specs()
    n_devices = len(jax.devices())
    assert n_devices >= 4, "conftest must provide the virtual CPU mesh"
    mesh = make_mesh(n_devices, 2)

    order = np.arange(uni.n_halos)
    parts = [order[: uni.n_halos // 2], order[uni.n_halos // 2 :]]

    def halo_args(p):
        return dict(
            centres=uni.halo_pos[p],
            search_radius_phys=uni.halo_renclose[p] * uni.a * 1.01,
            index=p.astype(np.int64),
            is_central=np.ones(len(p), bool),
            fof_id=p.astype(np.int64) + 1,
        )

    sharded = ShardedHaloEngine(ctx, [chunk, chunk], specs, mesh)
    res_sharded = sharded.process(
        centres=[uni.halo_pos[p] for p in parts],
        search_radius_phys=[uni.halo_renclose[p] * uni.a * 1.01 for p in parts],
        index=[p.astype(np.int64) for p in parts],
        is_central=[np.ones(len(p), bool) for p in parts],
        fof_id=[p.astype(np.int64) + 1 for p in parts],
    )

    for c, p in enumerate(parts):
        single = HaloEngine(ctx, chunk, specs)
        res_single = single.process(**halo_args(p))
        for spec in specs:
            for key in spec.keys:
                a = res_single[spec.group][key]
                b = res_sharded[c][spec.group][key]
                assert a.shape == b.shape, (spec.group, key)
                if np.issubdtype(a.dtype, np.floating):
                    np.testing.assert_allclose(
                        b,
                        a,
                        rtol=2e-5,
                        atol=1e-30,
                        err_msg=f"{spec.group}/{key} (chunk {c})",
                    )
                else:
                    np.testing.assert_array_equal(
                        b, a, err_msg=f"{spec.group}/{key} (chunk {c})"
                    )


def test_sharded_engine_centrals_only_masks_satellites(setup):
    uni, chunk, ctx = setup
    specs = _specs()
    mesh = make_mesh(len(jax.devices()), 2)
    order = np.arange(uni.n_halos)
    parts = [order[: uni.n_halos // 2], order[uni.n_halos // 2 :]]
    is_central = [np.ones(len(p), bool) for p in parts]
    is_central[0][0] = False  # one satellite in chunk 0

    sharded = ShardedHaloEngine(ctx, [chunk, chunk], specs, mesh)
    res = sharded.process(
        centres=[uni.halo_pos[p] for p in parts],
        search_radius_phys=[uni.halo_renclose[p] * uni.a * 1.01 for p in parts],
        index=[p.astype(np.int64) for p in parts],
        is_central=is_central,
        fof_id=[p.astype(np.int64) + 1 for p in parts],
    )
    assert float(np.asarray(res[0]["SO/200_crit"]["Mtot"][0])) == 0.0
    assert float(np.asarray(res[0]["BoundSubhalo"]["Mtot"][0])) > 0.0
