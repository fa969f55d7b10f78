"""Analytic symmetric eigendecomposition vs numpy reference."""

import numpy as np
import jax
import jax.numpy as jnp

from soap_tpu.ops.inertia import sym_eigh_2x2, sym_eigh_3x3


def test_sym_eigh_3x3_random(rng):
    for _ in range(200):
        M = rng.normal(size=(3, 3))
        A = ((M + M.T) / 2).astype(np.float32)
        w, V = jax.jit(sym_eigh_3x3)(jnp.asarray(A))
        w, V = np.asarray(w), np.asarray(V)
        w_ref = np.linalg.eigvalsh(A.astype(np.float64))
        scale = max(np.abs(w_ref).max(), 1e-6)
        np.testing.assert_allclose(w, w_ref, atol=2e-5 * scale)
        # columns are unit eigenvectors: A v = w v
        for i in range(3):
            np.testing.assert_allclose(
                A @ V[:, i], w[i] * V[:, i], atol=5e-4 * scale
            )
        # orthonormal
        np.testing.assert_allclose(V.T @ V, np.eye(3), atol=2e-4)


def test_sym_eigh_3x3_degenerate():
    A = jnp.eye(3) * 2.5
    w, V = sym_eigh_3x3(A)
    np.testing.assert_allclose(np.asarray(w), [2.5] * 3, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(V), np.eye(3))
    # two equal eigenvalues
    A = jnp.asarray(np.diag([1.0, 1.0, 3.0]).astype(np.float32))
    w, V = sym_eigh_3x3(A)
    np.testing.assert_allclose(np.asarray(w), [1.0, 1.0, 3.0], atol=1e-6)
    V = np.asarray(V)
    np.testing.assert_allclose(V.T @ V, np.eye(3), atol=1e-5)


def test_sym_eigh_2x2_random(rng):
    for _ in range(200):
        M = rng.normal(size=(2, 2))
        A = ((M + M.T) / 2).astype(np.float32)
        w, V = jax.jit(sym_eigh_2x2)(jnp.asarray(A))
        w, V = np.asarray(w), np.asarray(V)
        w_ref = np.linalg.eigvalsh(A.astype(np.float64))
        scale = max(np.abs(w_ref).max(), 1e-6)
        np.testing.assert_allclose(w, w_ref, atol=2e-5 * scale)
        for i in range(2):
            np.testing.assert_allclose(
                A @ V[:, i], w[i] * V[:, i], atol=5e-4 * scale
            )
