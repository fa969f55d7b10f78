"""Fused masked-moments Pallas kernel vs the jnp reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from soap_tpu.ops import pallas_stats as ps


@pytest.fixture
def data(rng):
    K = 1024
    mass = rng.uniform(0.1, 1.0, K).astype(np.float32)
    pos = rng.normal(0, 2, (K, 3)).astype(np.float32)
    vel = rng.normal(0, 100, (K, 3)).astype(np.float32)
    sel = rng.uniform(size=K) < 0.6
    segments = ((0, 1024), (0, 256), (256, 768), (768, 1024))
    return mass, pos, vel, sel, segments


def _oracle(mass, pos, vel, sel, segments):
    out = []
    m = np.where(sel, mass, 0.0)
    for lo, hi in segments:
        mm = m[lo:hi]
        p, v = pos[lo:hi], vel[lo:hi]
        out.append(
            [
                sel[lo:hi].sum(),
                mm.sum(),
                (mm * p[:, 0]).sum(),
                (mm * p[:, 1]).sum(),
                (mm * p[:, 2]).sum(),
                (mm * v[:, 0]).sum(),
                (mm * v[:, 1]).sum(),
                (mm * v[:, 2]).sum(),
                (mm * (v**2).sum(axis=1)).sum(),
            ]
        )
    return np.array(out)


def test_interpret_matches_oracle(data):
    mass, pos, vel, sel, segments = data
    got = np.asarray(
        ps.masked_moments(
            jnp.asarray(mass), jnp.asarray(pos), jnp.asarray(vel),
            jnp.asarray(sel), segments, interpret=True,
        )
    )
    want = _oracle(mass, pos, vel, sel, segments)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-2)


def test_jnp_fallback_matches_oracle(data):
    mass, pos, vel, sel, segments = data
    got = np.asarray(
        ps._moments_ref(
            jnp.asarray(mass),
            jnp.asarray(pos[:, 0]), jnp.asarray(pos[:, 1]), jnp.asarray(pos[:, 2]),
            jnp.asarray(vel[:, 0]), jnp.asarray(vel[:, 1]), jnp.asarray(vel[:, 2]),
            jnp.asarray(sel.astype(np.float32)), segments,
        )
    )
    want = _oracle(mass, pos, vel, sel, segments)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-2)


def test_batched_over_halos(data):
    mass, pos, vel, sel, segments = data
    B = 8
    masses = jnp.asarray(np.stack([mass * (i + 1) for i in range(B)]))
    poss = jnp.asarray(np.stack([pos] * B))
    vels = jnp.asarray(np.stack([vel] * B))
    sels = jnp.asarray(np.stack([sel] * B))
    got = np.asarray(
        ps.masked_moments_batch(masses, poss, vels, sels, segments, interpret=True)
    )
    for i in range(B):
        want = _oracle(mass * (i + 1), pos, vel, sel, segments)
        np.testing.assert_allclose(got[i], want, rtol=2e-5, atol=1e-2)
