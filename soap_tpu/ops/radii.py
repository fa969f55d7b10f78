"""Half-weight radii and related sorted-profile kernels.

Reference semantics: ``SOAP/property_calculation/half_mass_radius.py:16-99``
— sort particles by radius, build the cumulative weight profile, find the
first bin where it reaches half of the given total, and interpolate
linearly within that bin (averaging the bin edges when both edges carry
the same cumulative weight).

TPU-native difference: kernels operate on PRE-SORTED padded profiles.
One shared radius sort per halo serves every profile kernel (half-mass
radii, Vmax, the SO solver), replacing the reference's per-kernel
argsorts — the dominant per-halo cost at large candidate counts.
Selection masks may have gaps in the sorted order (e.g. only bound
particles), so "previous particle" means previous SELECTED particle,
recovered with a cumulative max instead of an index shift.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def half_weight_radius_sorted(
    r: jnp.ndarray,  # (K,) radii sorted ascending (invalid slots last)
    w: jnp.ndarray,  # (K,) weights in the same order
    v: jnp.ndarray,  # (K,) selection mask in the same order
    total_weight: jnp.ndarray,  # scalar: sum of selected weights
) -> jnp.ndarray:
    """Half-weight radius from a pre-sorted profile."""
    w = jnp.where(v, w, 0.0)
    cum = jnp.cumsum(w)

    target = 0.5 * total_weight
    reached = v & (cum >= target)
    ihalf = jnp.argmax(reached)
    any_reached = jnp.any(reached)

    # radius/cumweight of the previous *selected* particle
    r_sel = jnp.where(v, r, -jnp.inf)
    prev_sel_r = jax.lax.cummax(r_sel)  # inclusive running max
    prev_r_raw = jnp.take(prev_sel_r, jnp.maximum(ihalf - 1, 0))
    prev_r = jnp.where((ihalf > 0) & jnp.isfinite(prev_r_raw), prev_r_raw, 0.0)
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


def half_weight_radius(
    radius: jnp.ndarray,  # (K,) padded radii (any order)
    weight: jnp.ndarray,
    total_weight: jnp.ndarray,
    mask: jnp.ndarray,
) -> jnp.ndarray:
    """Unsorted-input convenience wrapper (sorts internally)."""
    big = jnp.float32(jnp.finfo(jnp.float32).max)
    order = jnp.argsort(jnp.where(mask, radius, big))
    return half_weight_radius_sorted(
        jnp.where(mask, radius, big)[order],
        weight[order],
        mask[order],
        total_weight,
    )


def enclose_radius(radius: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Radius of the furthest valid particle (reference ``EncloseRadius``,
    ``subhalo_properties.py:2337``)."""
    return jnp.max(jnp.where(mask, radius, 0.0))
