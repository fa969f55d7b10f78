"""Concentration value test against an analytic NFW halo.

The reference's only real value test (``tests/test_SO_properties.py:434``)
checks the R1-statistic concentration against the input concentration of
a generated NFW halo; same idea here with the mock generator's NFW
sampler.
"""

import numpy as np
import pytest

from soap_tpu.models.context import HaloContext
from soap_tpu.pipeline.chunk_data import ChunkData, stage_ptype
from soap_tpu.pipeline.engine import HaloEngine, HaloTypeSpec
from soap_tpu.utils import mock_data

G = mock_data.G_INTERNAL


@pytest.mark.parametrize("c_true", [5.0, 8.0, 12.0])
def test_concentration_recovers_nfw(c_true):
    rng = np.random.default_rng(int(c_true * 10))
    boxsize = 30.0
    m200 = 1000.0  # 1e13 Msun
    rho_crit = 3.0 * (100.0 * 0.681) ** 2 / (8.0 * np.pi * G)
    r200 = (3.0 * m200 / (4.0 * np.pi * 200.0 * rho_crit)) ** (1.0 / 3.0)
    n = 20000
    r = mock_data._sample_nfw_radii(rng, n, c_true, r200)
    u = rng.normal(size=(n, 3))
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    centre = np.full(3, boxsize / 2)
    pos = centre[None, :] + r[:, None] * u
    pos[0] = centre
    # low-density uniform background so the density profile crosses below
    # the threshold outside R200 (as in any real volume)
    n_bg = 4000
    pos = np.concatenate([pos, rng.uniform(0, boxsize, (n_bg, 3))])
    mass = np.full(n + n_bg, m200 / n, np.float32)
    vel = rng.normal(0, 100, (n + n_bg, 3)).astype(np.float32)
    n_tot = n + n_bg

    chunk = ChunkData(
        boxsize=boxsize,
        ptypes={
            "PartType1": stage_ptype(
                np.mod(pos, boxsize),
                {
                    "Masses": mass,
                    "Velocities": vel,
                    "GroupNr_bound": np.concatenate(
                        [np.zeros(n, np.int64), np.full(n_bg, -1, np.int64)]
                    ),
                    "FOFGroupIDs": np.concatenate(
                        [np.ones(n, np.int64), np.full(n_bg, -1, np.int64)]
                    ),
                },
                boxsize,
            )
        },
    )
    ctx = HaloContext(
        a=1.0, z=0.0, G=G, boxsize=boxsize,
        critical_density=rho_crit, mean_density=rho_crit * 0.3,
        softening=(0.005,), ptypes=("PartType1",), capacities=(0,), dmo=True,
    )
    spec = HaloTypeSpec(
        kind="SO", group="SO/200_crit",
        keys=("r", "Mtot", "concentration_unsoft", "concentration_dmo_unsoft"),
        so_type="crit", so_multiple=200.0, centrals_only=True,
    )
    eng = HaloEngine(ctx, chunk, [spec])
    res = eng.process(
        centres=centre[None, :],
        search_radius_phys=np.array([1.2 * r200]),
        index=np.zeros(1, np.int64),
        is_central=np.ones(1, bool),
        fof_id=np.ones(1, np.int64),
    )
    so = res["SO/200_crit"]
    # SO radius should be close to the construction R200
    np.testing.assert_allclose(so["r"][0], r200, rtol=0.05)
    # concentration within ~25% of the true value (matches the loose
    # tolerance of the polynomial R1 fit + sampling noise)
    for key in ("concentration_unsoft", "concentration_dmo_unsoft"):
        assert so[key][0] == pytest.approx(c_true, rel=0.25), (key, so[key][0])
