"""Masked batched reductions: the basic building blocks of halo properties.

Every kernel operates on a padded (K,)-per-halo particle slice with a
validity mask and is written to be vmapped over a halo batch — the
TPU-native replacement for the reference's per-halo numpy reductions
inside the lazy-property DAG (e.g. masses/CoM/velocity dispersion in
``SOAP/particle_selection/subhalo_properties.py`` and the kernels of
``SOAP/property_calculation/kinematic_properties.py:91-127``).
"""

from __future__ import annotations

import jax.numpy as jnp


def masked_sum(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Sum of x over valid entries; x is (K,) or (K, D)."""
    if x.ndim > mask.ndim:
        mask = mask[..., None]
    return jnp.sum(jnp.where(mask, x, 0), axis=0)


def masked_count(mask: jnp.ndarray, dtype=jnp.int32) -> jnp.ndarray:
    return jnp.sum(mask.astype(dtype), axis=0)


def centre_of_mass(
    mass: jnp.ndarray, pos: jnp.ndarray, mask: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(total mass, CoM) over the masked particles.

    ``pos`` is halo-relative (the caller recentres), so the sum is
    cancellation-safe; add the halo centre back for absolute output.
    """
    m = jnp.where(mask, mass, 0.0)
    mtot = jnp.sum(m)
    com = jnp.sum(m[:, None] * pos, axis=0) / jnp.maximum(mtot, 1e-37)
    return mtot, jnp.where(mtot > 0, com, 0.0)


def centre_of_mass_velocity(
    mass: jnp.ndarray, vel: jnp.ndarray, mask: jnp.ndarray
) -> jnp.ndarray:
    m = jnp.where(mask, mass, 0.0)
    mtot = jnp.sum(m)
    v = jnp.sum(m[:, None] * vel, axis=0) / jnp.maximum(mtot, 1e-37)
    return jnp.where(mtot > 0, v, 0.0)


def velocity_dispersion_matrix(
    mass: jnp.ndarray,
    vel: jnp.ndarray,
    vcom: jnp.ndarray,
    mask: jnp.ndarray,
) -> jnp.ndarray:
    """Mass-fraction-weighted velocity dispersion matrix, 6 components.

    Component order XX, YY, ZZ, XY, XZ, YZ matches the reference
    (``kinematic_properties.py:91-127``).
    """
    m = jnp.where(mask, mass, 0.0)
    mtot = jnp.maximum(jnp.sum(m), 1e-37)
    frac = m / mtot
    dv = jnp.where(mask[:, None], vel - vcom[None, :], 0.0)
    xx = jnp.sum(frac * dv[:, 0] * dv[:, 0])
    yy = jnp.sum(frac * dv[:, 1] * dv[:, 1])
    zz = jnp.sum(frac * dv[:, 2] * dv[:, 2])
    xy = jnp.sum(frac * dv[:, 0] * dv[:, 1])
    xz = jnp.sum(frac * dv[:, 0] * dv[:, 2])
    yz = jnp.sum(frac * dv[:, 1] * dv[:, 2])
    return jnp.stack([xx, yy, zz, xy, xz, yz])


def kinetic_energy(
    mass: jnp.ndarray,
    vel: jnp.ndarray,
    vcom: jnp.ndarray,
    mask: jnp.ndarray,
) -> jnp.ndarray:
    """Total kinetic energy about vcom: 0.5 sum m |v - vcom|^2."""
    m = jnp.where(mask, mass, 0.0)
    dv = vel - vcom[None, :]
    return 0.5 * jnp.sum(m * jnp.sum(dv * dv, axis=1))
