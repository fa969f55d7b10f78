"""DMA-gather layout vs XLA row-gather: bit-identical engine results.

The run-length DMA gather (ops/dma_gather.py) changes WHERE candidate
rows land in the (B, K) padded buffer (alignment heads / sub-block tails
are invalid gaps) but must not change any property value: every consumer
masks on ``valid``.  This pins the full engine pipeline — SO solve,
sorts, kinematics, retry ladder, packed outputs — on both layouts.  On
CPU the DMA path exercises the identical layout through the XLA
fallback (``use_dma=False`` routing in ``_process_bucket_impl``).
"""

import numpy as np
import pytest

from soap_tpu.models.context import HaloContext
from soap_tpu.pipeline.chunk_data import ChunkData, stage_ptype
from soap_tpu.pipeline.engine import HaloEngine, HaloTypeSpec
from soap_tpu.core.halo_types import implemented_keys_for
from soap_tpu.utils import mock_data

G = mock_data.G_INTERNAL


def _setup():
    uni = mock_data.build_mock_universe(
        n_halos=12, n_field=8000, boxsize=25.0, seed=11
    )
    groupnr = np.full(len(uni.ids), -1, dtype=np.int64)
    id_to_row = {pid: i for i, pid in enumerate(uni.ids)}
    for hi, ids in enumerate(uni.bound_ids):
        for pid in ids:
            groupnr[id_to_row[pid]] = hi
    rho_crit0 = 3.0 * (100.0 * uni.h) ** 2 / (8.0 * np.pi * G)
    E2 = uni.omega_m / uni.a**3 + uni.omega_lambda
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
        critical_density=rho_crit0 * E2,
        mean_density=rho_crit0 * uni.omega_m / uni.a**3,
        softening=(0.01,),
        ptypes=("PartType1",),
        capacities=(0,),
        dmo=True,
    )
    specs = (
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
        HaloTypeSpec(
            kind="aperture",
            group="ExclusiveSphere/50kpc",
            keys=implemented_keys_for("Aperture", True),
            aperture_radius_mpc=0.05,
            inclusive=False,
        ),
    )
    args = dict(
        centres=uni.halo_pos,
        search_radius_phys=uni.halo_renclose * uni.a * 1.01,
        index=np.arange(uni.n_halos, dtype=np.int64),
        is_central=np.ones(uni.n_halos, dtype=bool),
        fof_id=np.arange(1, uni.n_halos + 1, dtype=np.int64),
    )
    return ctx, chunk, specs, args


def test_dma_layout_matches_xla_gather(monkeypatch):
    ctx, chunk, specs, args = _setup()

    monkeypatch.setenv("SOAP_TPU_DMA_GATHER", "0")
    res_xla = HaloEngine(ctx, chunk, specs).process(**args)

    monkeypatch.setenv("SOAP_TPU_DMA_GATHER", "1")
    eng = HaloEngine(ctx, chunk, specs)
    assert eng._dma_s is not None
    res_dma = eng.process(**args)

    assert set(res_xla) == set(res_dma)
    for group in res_xla:
        assert set(res_xla[group]) == set(res_dma[group])
        for key in res_xla[group]:
            a = np.asarray(res_xla[group][key], np.float64)
            b = np.asarray(res_dma[group][key], np.float64)
            # the layouts sum identical particle sets in different
            # orders: allow f32 reduction-reordering noise, scaled per
            # key (cancellation-dominated components like vcom/inertia
            # off-diagonals carry absolute, not relative, error)
            scale = np.abs(a).max() if a.size else 1.0
            np.testing.assert_allclose(
                a,
                b,
                rtol=1e-3,
                atol=1e-4 * max(scale, 1e-30),
                err_msg=f"{group}/{key}",
            )
