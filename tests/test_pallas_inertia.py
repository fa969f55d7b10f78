"""Pallas inertia-loop kernel vs the XLA while-loop reference.

Runs the kernel in Pallas interpret mode (CPU) against the jnp path of
``inertia_tensor_multi`` on randomized triaxial particle clouds —
mixed reduced/plain and iterative/non-iterative configs, empty and
sub-MIN_PARTICLES selections, zero radii, and r=0 central particles.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from soap_tpu.ops import inertia as I


def _run_both(w, pos, masks, R, red, it, search=None, check=None):
    args = dict(
        search_radius=None if search is None else jnp.float32(search),
        check_search=None if check is None else jnp.asarray(check),
    )
    os.environ["SOAP_TPU_PALLAS_INERTIA"] = "0"
    ref = I.inertia_tensor_multi(
        jnp.asarray(w),
        jnp.asarray(pos),
        jnp.asarray(masks),
        jnp.asarray(R),
        jnp.asarray(red),
        jnp.asarray(it),
        **args,
    )
    os.environ["SOAP_TPU_PALLAS_INERTIA"] = "interpret"
    try:
        ker = I.inertia_tensor_multi(
            jnp.asarray(w),
            jnp.asarray(pos),
            jnp.asarray(masks),
            jnp.asarray(R),
            jnp.asarray(red),
            jnp.asarray(it),
            **args,
        )
    finally:
        os.environ["SOAP_TPU_PALLAS_INERTIA"] = "0"
    return ref, ker


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_kernel_matches_xla_loop(seed):
    rng = np.random.default_rng(seed)
    K = 700  # deliberately NOT a multiple of 128 (padding path)
    ax = np.sort(np.exp(rng.normal(0, 1.0, 3)))[::-1]
    if seed == 1:
        ax[2] = ax[0] * 3e-2  # strongly flattened
    Q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    pos = ((rng.normal(size=(K, 3)) * ax) @ Q.T).astype(np.float32)
    pos[0] = 0.0  # centre-of-potential particle at r == 0
    w = rng.lognormal(0.0, 0.3, K).astype(np.float32)
    masks = rng.random((4, K)) < [[0.9], [0.7], [0.5], [0.02]]
    masks[3, :10] = True  # config 3: tiny selection (< MIN_PARTICLES)
    rmed = float(np.median(np.linalg.norm(pos, axis=1)))
    R = np.array([2.0 * rmed, 1.2 * rmed, 0.6 * rmed, 1.0 * rmed], np.float32)
    red = np.array([False, True, False, True])
    it = np.array([True, True, False, True])

    ref, ker = _run_both(w, pos, masks, R, red, it)
    np.testing.assert_array_equal(
        np.asarray(ref.found), np.asarray(ker.found)
    )
    np.testing.assert_allclose(
        np.asarray(ker.tensor),
        np.asarray(ref.tensor),
        rtol=2e-5,
        atol=1e-7 * float(np.abs(np.asarray(ref.tensor)).max() + 1e-30),
    )


def test_kernel_edge_cases():
    rng = np.random.default_rng(7)
    K = 256
    pos = rng.normal(size=(K, 3)).astype(np.float32)
    w = np.ones(K, np.float32)
    masks = np.ones((3, K), bool)
    masks[1] = False  # empty selection
    R = np.array([1.5, 1.5, 0.0], np.float32)  # config 2: zero radius
    red = np.array([True, False, False])
    it = np.array([True, True, True])
    ref, ker = _run_both(
        w, pos, masks, R, red, it, search=1.0, check=[True, True, False]
    )
    np.testing.assert_array_equal(
        np.asarray(ref.found), np.asarray(ker.found)
    )
    np.testing.assert_array_equal(
        np.asarray(ref.needs_bigger), np.asarray(ker.needs_bigger)
    )
    np.testing.assert_allclose(
        np.asarray(ker.tensor), np.asarray(ref.tensor), rtol=2e-5, atol=1e-6
    )
