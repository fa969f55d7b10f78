"""Iterative ellipsoidal inertia tensors — batched fixed-iteration kernels.

Reference algorithm (``SOAP/property_calculation/inertia_tensors.py:19-132``
for 3D, ``:226-343`` for projected 2D):

 - start from a sphere (circle) of the aperture radius;
 - compute the weighted tensor I_ij = sum w_i x_i x_j / sum w (optionally
   reduced: each particle divided by its |x|^2), eigendecompose, reshape
   the selection ellipsoid to the eigenvalue axis ratios at fixed volume,
   re-select particles, iterate until the axis ratio q = sqrt(l1/l2)
   changes by < 1e-4, at most 20 iterations;
 - requires >= 20 particles inside the initial sphere, else no value;
 - non-iterative variants are the same with max_iterations = 1.

TPU-native form: ``lax.while_loop`` with a convergence mask, batched 3x3
(2x2) ``eigh`` — tiny eigenproblems are cheap on the VPU.  Output
flattening matches the reference: (xx, yy, zz, xy, xz, yz) for 3D and
(xx, yy, xy) for projected.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

TOL = 1.0e-4
MIN_PARTICLES = 20


class InertiaResult(NamedTuple):
    tensor: jnp.ndarray  # (6,) or (3,) flattened tensor
    found: jnp.ndarray  # bool: enough particles
    needs_bigger: jnp.ndarray  # bool: ellipsoid needed data beyond region


def _tensor_3d(weights, pos, reduced_norm):
    """Weighted sum of outer products, (3, 3)."""
    w = weights / jnp.where(reduced_norm is None, 1.0, 1.0)
    if reduced_norm is not None:
        w = weights / reduced_norm
    return jnp.einsum("k,ki,kj->ij", w, pos, pos)


def inertia_tensor(
    weights: jnp.ndarray,  # (K,)
    pos: jnp.ndarray,  # (K, 3) halo-relative positions
    mask: jnp.ndarray,  # (K,)
    sphere_radius: jnp.ndarray,  # scalar aperture radius R
    search_radius: jnp.ndarray | None = None,
    reduced: bool = False,
    max_iterations: int = 20,
) -> InertiaResult:
    """3D iterative weighted inertia tensor for one halo (vmap over halos)."""
    r2 = jnp.sum(pos * pos, axis=1)
    if reduced:
        # exclude particles at (numerically) zero radius
        mask = mask & ~jnp.isclose(r2, 0.0)
        norm = jnp.where(mask, r2, 1.0)
    else:
        norm = jnp.ones_like(r2)
    w_base = jnp.where(mask, weights, 0.0)

    R = sphere_radius
    init_inside = mask & (r2 <= R * R)
    n_init = jnp.sum(init_inside.astype(jnp.int32))
    enough = (jnp.sum(mask.astype(jnp.int32)) >= MIN_PARTICLES) & (
        n_init >= MIN_PARTICLES
    )

    eye = jnp.eye(3, dtype=pos.dtype)

    def compute_tensor(eig_val, eig_vec):
        q = jnp.sqrt(eig_val[1] / eig_val[2])
        s = jnp.sqrt(eig_val[0] / eig_val[2])
        p = jnp.sqrt(eig_val[0] / eig_val[1])
        axis = R * jnp.stack(
            [jnp.cbrt(s * p), jnp.cbrt(q / p), 1.0 / jnp.cbrt(q * s)]
        )
        proj = (pos @ eig_vec) / axis[None, :]
        rr = jnp.sum(proj * proj, axis=1)
        inside = mask & (rr <= 1.0)
        wsum = jnp.sum(jnp.where(inside, w_base, 0.0))
        w = jnp.where(inside, w_base, 0.0) / jnp.maximum(wsum, 1e-37)
        tensor = jnp.einsum("k,ki,kj->ij", w / norm, pos, pos)
        return tensor, q, inside

    def cond(state):
        i, eig_val, eig_vec, tensor, old_q, done = state
        return (~done) & (i < max_iterations)

    def body(state):
        i, eig_val, eig_vec, tensor, old_q, done = state
        q_now = jnp.sqrt(eig_val[1] / eig_val[2])
        converged = jnp.abs((old_q - q_now) / jnp.maximum(q_now, 1e-37)) < TOL
        tensor_new, q, inside = compute_tensor(eig_val, eig_vec)
        val, vec = jnp.linalg.eigh(tensor_new)
        val = jnp.abs(val)
        # degenerate: effectively a single particle left
        degenerate = q == 0.0
        tensor_new = jnp.where(degenerate, jnp.zeros_like(tensor_new), tensor_new)
        stop = converged | degenerate
        tensor_out = jnp.where(converged, tensor, tensor_new)
        return (
            i + 1,
            jnp.where(stop, eig_val, val),
            jnp.where(stop, eig_vec, vec),
            tensor_out,
            jnp.where(stop, old_q, q_now),
            done | stop,
        )

    state = (
        jnp.int32(0),
        jnp.ones(3, pos.dtype),
        eye,
        jnp.zeros((3, 3), pos.dtype),
        jnp.float32(1000.0).astype(pos.dtype),
        ~enough,
    )
    _, _, _, tensor, _, _ = jax.lax.while_loop(cond, body, state)

    needs_bigger = (
        jnp.zeros((), bool)
        if search_radius is None
        else enough & (R > search_radius)
    )
    flat = jnp.stack(
        [
            tensor[0, 0],
            tensor[1, 1],
            tensor[2, 2],
            tensor[0, 1],
            tensor[0, 2],
            tensor[1, 2],
        ]
    )
    flat = jnp.where(enough, flat, 0.0)
    return InertiaResult(flat, enough, needs_bigger)


def projected_inertia_tensor(
    weights: jnp.ndarray,  # (K,)
    pos2d: jnp.ndarray,  # (K, 2) projected halo-relative positions
    mask: jnp.ndarray,
    circle_radius: jnp.ndarray,
    max_iterations: int = 20,
    reduced: bool = False,
) -> InertiaResult:
    """2D (projected) iterative inertia tensor; output (xx, yy, xy).

    Reference: ``inertia_tensors.py:226-343`` (area-preserving ellipse
    reshaping, q = sqrt(l1/l2), same convergence rule).
    """
    r2 = jnp.sum(pos2d * pos2d, axis=1)
    if reduced:
        mask = mask & ~jnp.isclose(r2, 0.0)
        norm = jnp.where(mask, r2, 1.0)
    else:
        norm = jnp.ones_like(r2)
    w_base = jnp.where(mask, weights, 0.0)
    R = circle_radius

    init_inside = mask & (r2 <= R * R)
    enough = jnp.sum(init_inside.astype(jnp.int32)) >= MIN_PARTICLES

    def compute_tensor(eig_val, eig_vec):
        q = jnp.sqrt(eig_val[0] / eig_val[1])
        axis = R * jnp.stack([jnp.sqrt(q), 1.0 / jnp.sqrt(q)])
        proj = (pos2d @ eig_vec) / axis[None, :]
        rr = jnp.sum(proj * proj, axis=1)
        inside = mask & (rr <= 1.0)
        wsum = jnp.sum(jnp.where(inside, w_base, 0.0))
        w = jnp.where(inside, w_base, 0.0) / jnp.maximum(wsum, 1e-37)
        tensor = jnp.einsum("k,ki,kj->ij", w / norm, pos2d, pos2d)
        return tensor, q

    def cond(state):
        i, eig_val, eig_vec, tensor, old_q, done = state
        return (~done) & (i < max_iterations)

    def body(state):
        i, eig_val, eig_vec, tensor, old_q, done = state
        q_now = jnp.sqrt(eig_val[0] / eig_val[1])
        converged = jnp.abs((old_q - q_now) / jnp.maximum(q_now, 1e-37)) < TOL
        tensor_new, q = compute_tensor(eig_val, eig_vec)
        val, vec = jnp.linalg.eigh(tensor_new)
        val = jnp.abs(val)
        degenerate = q == 0.0
        tensor_new = jnp.where(degenerate, jnp.zeros_like(tensor_new), tensor_new)
        stop = converged | degenerate
        tensor_out = jnp.where(converged, tensor, tensor_new)
        return (
            i + 1,
            jnp.where(stop, eig_val, val),
            jnp.where(stop, eig_vec, vec),
            tensor_out,
            jnp.where(stop, old_q, q_now),
            done | stop,
        )

    state = (
        jnp.int32(0),
        jnp.ones(2, pos2d.dtype),
        jnp.eye(2, dtype=pos2d.dtype),
        jnp.zeros((2, 2), pos2d.dtype),
        jnp.float32(1000.0).astype(pos2d.dtype),
        ~enough,
    )
    _, _, _, tensor, _, _ = jax.lax.while_loop(cond, body, state)
    flat = jnp.stack([tensor[0, 0], tensor[1, 1], tensor[0, 1]])
    flat = jnp.where(enough, flat, 0.0)
    return InertiaResult(flat, enough, jnp.zeros((), bool))
