"""Half-weight radii and related sorted-profile kernels.

Reference semantics: ``SOAP/property_calculation/half_mass_radius.py:16-99``
— sort particles by radius, build the cumulative weight profile, find the
first bin where it reaches half of the given total, and interpolate
linearly within that bin (averaging the bin edges when both edges carry
the same cumulative weight).
"""

from __future__ import annotations

import jax.numpy as jnp


def half_weight_radius(
    radius: jnp.ndarray,  # (K,) padded radii
    weight: jnp.ndarray,  # (K,) padded weights
    total_weight: jnp.ndarray,  # scalar: sum of weights (precomputed)
    mask: jnp.ndarray,
) -> jnp.ndarray:
    """Radius enclosing half the total weight (0 when total is 0)."""
    big = jnp.float32(jnp.finfo(jnp.float32).max)
    r_s = jnp.where(mask, radius, big)
    order = jnp.argsort(r_s)
    r = r_s[order]
    w = jnp.where(mask, weight, 0.0)[order]
    v = mask[order]
    cum = jnp.cumsum(w)

    target = 0.5 * total_weight
    reached = v & (cum >= target)
    ihalf = jnp.argmax(reached)
    any_reached = jnp.any(reached)

    prev_r = jnp.where(ihalf > 0, jnp.take(r, jnp.maximum(ihalf - 1, 0)), 0.0)
    prev_w = jnp.where(ihalf > 0, jnp.take(cum, jnp.maximum(ihalf - 1, 0)), 0.0)
    rmax = jnp.take(r, ihalf)
    wmax = jnp.take(cum, ihalf)

    flat_bin = wmax == prev_w
    interp = prev_r + (target - prev_w) / jnp.where(flat_bin, 1.0, wmax - prev_w) * (
        rmax - prev_r
    )
    result = jnp.where(flat_bin, 0.5 * (prev_r + rmax), interp)
    ok = (total_weight > 0) & any_reached
    return jnp.where(ok, result, 0.0)


def enclose_radius(radius: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Radius of the furthest valid particle (reference ``EncloseRadius``,
    ``subhalo_properties.py:2337``)."""
    return jnp.max(jnp.where(mask, radius, 0.0))
