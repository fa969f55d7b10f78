"""Batched spherical-overdensity radius/mass solver.

Replicates — bit-carefully, but vectorized over a batch of halos — the
reference's SO radius definition (``find_SO_radius_and_mass`` and
``compute_SO_radius_and_mass``, reference
``SOAP/particle_selection/SO_properties.py:82-226,356-452``):

 - particles sorted by radius, cumulative mass profile with the particle's
   full mass assigned at its radius, plus a uniform neutrino background
   term ``rho_nu * 4/3 pi r^3``;
 - the leading entry (the centre-of-potential particle at r == 0) is
   skipped, as are any further exactly-zero radii (``nskip``,
   ``SO_properties.py:410-417``);
 - the SO radius is the first radius where the density profile crosses
   below the threshold; within the crossing interval the radius solves
   ``4 pi/3 rho r^3 = M1 + slope (r - r1)`` (a monotone cubic solved here
   by fixed-count bisection instead of scipy brentq);
 - if the first usable particle is already below the threshold, the
   profile is linearly extrapolated from zero
   (``SO_properties.py:157-177``);
 - if no crossing exists inside the searched region, the halo is flagged
   ``needs_bigger`` and the host retries with a larger read radius — the
   batched analogue of ``SearchRadiusTooSmallError``.

Everything is branch-free masked arithmetic: one fused XLA program per
(batch, capacity) bucket.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

_FOUR_PI_3 = 4.0 * jnp.pi / 3.0
_BISECT_ITERS = 48


class SOResult(NamedTuple):
    radius: jnp.ndarray  # SO radius (0 where not found)
    mass: jnp.ndarray  # SO mass (0 where not found)
    found: jnp.ndarray  # bool: radius and mass both positive
    needs_bigger: jnp.ndarray  # bool: search region must grow


def _bisect_cubic(rho_dim, slope_dim, u_hi):
    """Solve 4pi/3 rho u^3 - s u + s - 1 = 0 on [1, u_hi] by bisection.

    The bracket is guaranteed sign-changing by construction (density
    crosses the threshold inside the interval).  48 iterations give an
    interval ~(u_hi-1) * 2^-48, far below f32 resolution.
    """

    def f(u):
        return _FOUR_PI_3 * rho_dim * u**3 - slope_dim * u + slope_dim - 1.0

    lo = jnp.ones_like(u_hi)
    hi = u_hi
    f_lo = f(lo)

    # UNROLLED bisection: the iterates are tiny per-halo scalars, so a
    # ``fori_loop`` would compile to a while whose entry/exit buffer
    # copies (~1 ms of fixed overhead each on TPU) dwarf the arithmetic;
    # 48 unrolled elementwise steps fuse into the surrounding kernel.
    for _ in range(_BISECT_ITERS):
        mid = 0.5 * (lo + hi)
        f_mid = f(mid)
        same_side = (f_mid > 0) == (f_lo > 0)
        lo = jnp.where(same_side, mid, lo)
        hi = jnp.where(same_side, hi, mid)
    return 0.5 * (lo + hi)


def so_radius_sorted(
    r: jnp.ndarray,  # (K,) radii sorted ascending (invalid slots last)
    m: jnp.ndarray,  # (K,) masses in the same order
    v: jnp.ndarray,  # (K,) validity in the same order
    reference_density: jnp.ndarray,  # scalar > 0
    nu_background_density: jnp.ndarray,  # scalar (0 for DMO)
) -> SOResult:
    """SO radius/mass for one halo from a PRE-SORTED profile."""
    K = r.shape[0]
    m = jnp.where(v, m, 0.0)
    cum = jnp.cumsum(m)
    nu_term = jnp.where(v, nu_background_density * _FOUR_PI_3 * r**3, 0.0)
    cum = cum + nu_term

    n_valid = jnp.sum(v.astype(jnp.int32))
    idx = jnp.arange(K, dtype=jnp.int32)

    # nskip: index of first strictly-positive radius, floored at 1
    # (the centre-of-potential particle is always excluded).
    any_pos = jnp.any(v & (r > 0.0))
    first_pos = jnp.argmax(v & (r > 0.0))
    nskip = jnp.maximum(jnp.where(any_pos, first_pos, n_valid), 1)

    usable = v & (idx >= nskip)
    n_usable = jnp.sum(usable.astype(jnp.int32))

    dens = jnp.where(usable, cum / (_FOUR_PI_3 * r**3), 0.0)
    above = usable & (dens > reference_density)

    first_above = jnp.take(above, jnp.minimum(nskip, K - 1))

    # ---- case A: profile starts above the threshold ----
    prev_ok = jnp.concatenate([jnp.zeros(1, bool), usable[:-1]])
    prev_above = jnp.concatenate([jnp.zeros(1, bool), above[:-1]])
    prev_r = jnp.concatenate([jnp.zeros(1, r.dtype), r[:-1]])
    prev_cum = jnp.concatenate([jnp.zeros(1, cum.dtype), cum[:-1]])
    is_crossing = (
        usable & prev_ok & (prev_above != above) & (r != prev_r)
    )
    has_crossing = jnp.any(is_crossing)
    ci = jnp.argmax(is_crossing)
    r1 = jnp.take(prev_r, ci)
    r2 = jnp.take(r, ci)
    M1 = jnp.take(prev_cum, ci)
    M2 = jnp.take(cum, ci)
    rho_dim = reference_density * r1**3 / M1
    slope_dim = (M2 - M1) / (r2 - r1) * (r1 / M1)
    u = _bisect_cubic(rho_dim, slope_dim, r2 / r1)
    so_r_a = r1 * u
    so_m_a = _FOUR_PI_3 * so_r_a**3 * reference_density

    # ---- case B: entire profile below the threshold ----
    # linear mass growth from zero to the first non-negative-cum particle
    # (negative leading cum can occur with neutrino weights).
    nonneg = usable & (cum >= 0.0)
    bi = jnp.argmax(nonneg)
    rb = jnp.take(r, bi)
    Mb = jnp.take(cum, bi)
    so_r_b = jnp.sqrt(0.75 * Mb / (jnp.pi * rb * reference_density))
    so_m_b = Mb * so_r_b / rb

    case_a = (n_usable > 0) & first_above
    case_b = (n_usable > 0) & (~first_above) & jnp.any(nonneg)

    so_r = jnp.where(
        case_a & has_crossing, so_r_a, jnp.where(case_b, so_r_b, 0.0)
    )
    so_m = jnp.where(
        case_a & has_crossing, so_m_a, jnp.where(case_b, so_m_b, 0.0)
    )
    needs_bigger = case_a & (~has_crossing)
    found = (so_r > 0.0) & (so_m > 0.0)
    return SOResult(
        radius=jnp.where(found, so_r, 0.0),
        mass=jnp.where(found, so_m, 0.0),
        found=found,
        needs_bigger=needs_bigger,
    )


def so_radius_single(
    radius: jnp.ndarray,  # (K,) particle radii (any order)
    mass: jnp.ndarray,
    valid: jnp.ndarray,
    reference_density: jnp.ndarray,
    nu_background_density: jnp.ndarray,
) -> SOResult:
    """Unsorted-input convenience wrapper (sorts internally)."""
    big = jnp.float32(jnp.finfo(jnp.float32).max)
    r_sortable = jnp.where(valid, radius, big)
    order = jnp.argsort(r_sortable)
    return so_radius_sorted(
        r_sortable[order], mass[order], valid[order],
        reference_density, nu_background_density,
    )


#: Batched solver: (B, K) particle data, (B,) thresholds.
so_radius_batch = jax.jit(
    jax.vmap(so_radius_single, in_axes=(0, 0, 0, 0, None))
)


def enclosed_mass_sorted(
    r: jnp.ndarray,  # (K,) radii sorted ascending
    m: jnp.ndarray,
    v: jnp.ndarray,
    target_radius: jnp.ndarray,  # scalar: fixed physical aperture
    nu_background_density: jnp.ndarray,
) -> jnp.ndarray:
    """Interpolated cumulative mass at a fixed radius (pre-sorted input).

    Semantics of the reference's fixed-physical-radius SO branch
    (``SO_properties.py:433-452``): linear interpolation of the cumulative
    mass profile between the bracketing particles; clamps to the total
    when every particle is inside, and to the first cumulative value when
    the first particle is already outside.
    """
    K = r.shape[0]
    m = jnp.where(v, m, 0.0)
    cum = jnp.cumsum(m) + jnp.where(
        v, nu_background_density * _FOUR_PI_3 * r**3, 0.0
    )
    idx = jnp.arange(K, dtype=jnp.int32)
    any_pos = jnp.any(v & (r > 0.0))
    first_pos = jnp.argmax(v & (r > 0.0))
    n_valid = jnp.sum(v.astype(jnp.int32))
    nskip = jnp.maximum(jnp.where(any_pos, first_pos, n_valid), 1)
    usable = v & (idx >= nskip)

    outside = usable & (r > target_radius)
    has_outside = jnp.any(outside)
    i = jnp.argmax(outside)
    # last usable cumulative mass (total within the searched region)
    last_usable = jnp.where(
        jnp.any(usable), K - 1 - jnp.argmax(usable[::-1]), 0
    )
    total = jnp.take(cum, last_usable)

    prev_r = jnp.take(r, jnp.maximum(i - 1, 0))
    prev_cum = jnp.take(cum, jnp.maximum(i - 1, 0))
    at_first = i <= nskip  # cannot interpolate below the first usable point
    r1 = prev_r
    r2 = jnp.take(r, i)
    M1 = prev_cum
    M2 = jnp.take(cum, i)
    interp = M1 + (target_radius - r1) / (r2 - r1) * (M2 - M1)
    mass_out = jnp.where(
        ~has_outside, total, jnp.where(at_first, jnp.take(cum, i), interp)
    )
    return jnp.where(jnp.any(usable), mass_out, 0.0)


def enclosed_mass_at_radius(
    radius: jnp.ndarray,  # (K,) padded radii (any order)
    mass: jnp.ndarray,
    valid: jnp.ndarray,
    target_radius: jnp.ndarray,
    nu_background_density: jnp.ndarray,
) -> jnp.ndarray:
    """Unsorted-input convenience wrapper (sorts internally)."""
    big = jnp.float32(jnp.finfo(jnp.float32).max)
    r_sortable = jnp.where(valid, radius, big)
    order = jnp.argsort(r_sortable)
    return enclosed_mass_sorted(
        r_sortable[order], mass[order], valid[order],
        target_radius, nu_background_density,
    )


enclosed_mass_batch = jax.jit(
    jax.vmap(enclosed_mass_at_radius, in_axes=(0, 0, 0, 0, None))
)
