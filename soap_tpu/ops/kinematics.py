"""Angular momentum, kappa_corot, Vmax — masked batched kernels.

Formula-exact reimplementations of the reference kernels
(``SOAP/property_calculation/kinematic_properties.py:266-425`` for the
angular momentum / kappa_corot family, ``:555-593`` for Vmax), expressed
as branch-free masked reductions over padded per-halo particle slices.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax.numpy as jnp


class AngularMomentumResult(NamedTuple):
    L: jnp.ndarray  # (3,) angular momentum about (pos_ref, vel_ref)
    kappa_corot: jnp.ndarray  # scalar
    m_counterrot: jnp.ndarray  # scalar counter-rotating mass


def angular_momentum_and_kappa(
    mass: jnp.ndarray,  # (K,)
    pos: jnp.ndarray,  # (K, 3) relative to reference position
    vel: jnp.ndarray,  # (K, 3) relative to reference velocity
    mask: jnp.ndarray,  # (K,)
) -> AngularMomentumResult:
    """Mass-weighted L, kappa_corot (Correa+2017) and counter-rotating mass.

    Matches ``get_angular_momentum_and_kappa_corot_mass_weighted``:
    kappa_corot = sum over co-rotating particles of L_i^2/(2 m_i R_i^2),
    divided by the total kinetic energy; particles exactly on the rotation
    axis are excluded.
    """
    m = jnp.where(mask, mass, 0.0)
    Lpart = m[:, None] * jnp.cross(pos, vel)
    Ltot = jnp.sum(jnp.where(mask[:, None], Lpart, 0.0), axis=0)
    Lnrm = jnp.sqrt(jnp.sum(Ltot * Ltot))

    # elementwise row dots/norms: (K, 3) axis-1 reduces materialize
    # trailing-singleton temps the TPU layout pads 128x at giant K
    vx, vy, vz = vel[:, 0], vel[:, 1], vel[:, 2]
    K = 0.5 * jnp.sum(m * (vx * vx + vy * vy + vz * vz))
    Ldir = Ltot / jnp.maximum(Lnrm, 1e-37)
    Li = Lpart[:, 0] * Ldir[0] + Lpart[:, 1] * Ldir[1] + Lpart[:, 2] * Ldir[2]

    px, py, pz = pos[:, 0], pos[:, 1], pos[:, 2]
    r2 = px * px + py * py + pz * pz
    rdotL = px * Ldir[0] + py * Ldir[1] + pz * Ldir[2]
    Ri2 = r2 - rdotL * rdotL
    on_axis = Ri2 == 0.0
    Ri2_safe = jnp.where(on_axis, 1.0, Ri2)

    Krot = 0.5 * Li * Li / (jnp.maximum(mass, 1e-37) * Ri2_safe)
    corot = mask & (~on_axis) & (Li > 0.0)
    Kcorot = jnp.sum(jnp.where(corot, Krot, 0.0))
    kappa = jnp.where((Lnrm > 0.0) & (K > 0.0), Kcorot / jnp.maximum(K, 1e-37), 0.0)

    counter = mask & (Li < 0.0)
    m_counter = jnp.where(Lnrm > 0.0, jnp.sum(jnp.where(counter, mass, 0.0)), 0.0)
    return AngularMomentumResult(Ltot, kappa, m_counter)


def angular_momentum(
    mass: jnp.ndarray, pos: jnp.ndarray, vel: jnp.ndarray, mask: jnp.ndarray
) -> jnp.ndarray:
    """Plain mass-weighted angular momentum (reference ``:228-263``)."""
    m = jnp.where(mask, mass, 0.0)
    Lpart = m[:, None] * jnp.cross(pos, vel)
    return jnp.sum(jnp.where(mask[:, None], Lpart, 0.0), axis=0)


class VmaxResult(NamedTuple):
    radius: jnp.ndarray  # radius of the circular-velocity maximum
    vmax_sq_over_G: jnp.ndarray  # Vmax^2 / G = max(M(<r)/r); caller scales


def vmax_sorted(
    m: jnp.ndarray,  # (K,) masses in radius-sorted order
    r: jnp.ndarray,  # (K,) radii sorted ascending
    v: jnp.ndarray,  # (K,) selection mask in the same order
) -> VmaxResult:
    """Vmax from a PRE-SORTED profile (shared halo-wide radius sort).

    Reference semantics (``kinematic_properties.py:555-593``): cumulative
    mass over the selected particles, skip ~zero radii (the centre
    particle), then vmax = sqrt(G * max(M(<r)/r)).  G is applied by the
    caller (a static unit factor), keeping this kernel unit-free.
    """
    cum = jnp.cumsum(jnp.where(v, m, 0.0))
    near_zero = v & (jnp.abs(r) <= 1e-8)
    usable = v & (~near_zero)
    ratio = jnp.where(usable, cum / jnp.maximum(r, 1e-37), -jnp.inf)
    imax = jnp.argmax(ratio)
    any_usable = jnp.any(usable)
    best = jnp.take(ratio, imax)
    return VmaxResult(
        radius=jnp.where(any_usable, jnp.take(r, imax), 0.0),
        vmax_sq_over_G=jnp.where(any_usable, jnp.maximum(best, 0.0), 0.0),
    )


def vmax(
    mass: jnp.ndarray,  # (K,) padded masses
    radius: jnp.ndarray,  # (K,) padded radii
    mask: jnp.ndarray,
) -> VmaxResult:
    """Unsorted-input convenience wrapper (sorts internally)."""
    big = jnp.float32(jnp.finfo(jnp.float32).max)
    r_s = jnp.where(mask, radius, big)
    order = jnp.argsort(r_s)
    return vmax_sorted(mass[order], r_s[order], mask[order])


def vmax_sorted_multi_soft(
    m_sorted: jnp.ndarray,  # (K,) masses in shared radius-sorted order
    r_sorted: jnp.ndarray,  # (K,) UNSOFTENED radii ascending (inf-padded)
    type_masks: Sequence[jnp.ndarray],  # per-softening-value selection masks
    softenings: Tuple[float, ...],  # static values, aligned with type_masks
) -> VmaxResult:
    """Softened Vmax from the SHARED radius sort with PER-TYPE softenings.

    The reference sorts by the softened radius ``max(r_i, s_t)``
    (``subhalo_properties.py:1027-1046``); re-sorting per call site costs
    an argsort plus three (B, lanes, K) permutation gathers — the single
    hottest op family of a hydro bucket.  Instead use
    ``max(r_i, s_t) <= x  <=>  r_i <= x AND s_t <= x``: the softened
    cumulative-mass step function is a sum of per-type cumsums over the
    EXISTING radius order, gated by static thresholds.  ``M(<=x)/x`` is
    maximal at a step point — one of the sorted radii or one of the T
    softening values — so evaluating at those candidates is exact.
    """
    # The reference evaluates M(<=x)/x ONLY at selected particles' own
    # softened radii (skipping near-zero ones) — NOT at every x>0: with a
    # zero softening the step function's sup is unbounded as x->0+, so
    # the evaluation set must match exactly.  Candidates are therefore
    # (a) x=r_i where particle i is selected and r_i >= its own
    # softening (then r_i IS its softened radius), and (b) x=s_t where
    # some selected type-t particle has r <= s_t.
    cums = [jnp.cumsum(jnp.where(tm, m_sorted, 0.0)) for tm in type_masks]
    finite = jnp.isfinite(r_sorted)
    M_r = cums[0] * 0.0
    own_point = None
    for s, tm, cu in zip(softenings, type_masks, cums):
        gate = jnp.float32(s) <= r_sorted
        M_r = M_r + jnp.where(gate, cu, 0.0)
        o = tm & gate
        own_point = o if own_point is None else (own_point | o)
    usable = own_point & finite & (r_sorted > 1e-8)
    ratio = jnp.where(usable, M_r / jnp.maximum(r_sorted, 1e-37), -jnp.inf)
    imax = jnp.argmax(ratio)
    any_usable = jnp.any(usable)
    best = jnp.take(ratio, imax)
    best_x = jnp.take(r_sorted, imax)
    # (b): softening-value points for particles with r below their own
    # softening (their softened radius is exactly s_t)
    for t, s in enumerate(softenings):
        if s <= 1e-8:
            continue
        sf = jnp.float32(s)
        present = jnp.any(type_masks[t] & (r_sorted <= sf))
        idx = jnp.searchsorted(r_sorted, sf, side="right")
        M_s = jnp.float32(0.0)
        for su, cu in zip(softenings, cums):
            if su <= s:
                M_s = M_s + jnp.where(
                    idx > 0, jnp.take(cu, jnp.maximum(idx - 1, 0)), 0.0
                )
        val = jnp.where(present, M_s / sf, -jnp.inf)
        better = val > jnp.where(any_usable, best, -jnp.inf)
        best = jnp.where(better, val, best)
        best_x = jnp.where(better, sf, best_x)
        any_usable = any_usable | present
    return VmaxResult(
        radius=jnp.where(any_usable, best_x, 0.0),
        vmax_sq_over_G=jnp.where(any_usable, jnp.maximum(best, 0.0), 0.0),
    )


def cylindrical_velocities(
    pos: jnp.ndarray,  # (K, 3) halo-relative positions
    vel: jnp.ndarray,  # (K, 3) velocities (already frame-shifted)
    L: jnp.ndarray,  # (3,) target z-axis (angular momentum)
) -> jnp.ndarray:
    """(v_r, v_phi, v_z) per particle after rotating z onto L.

    Reference: ``SOAP/property_calculation/cylindrical_coordinates.py:13-93``
    — orthonormal frame from a helper vector not parallel to L, then the
    standard cylindrical decomposition.
    """
    Lnorm = jnp.sqrt(jnp.maximum(jnp.sum(L * L), 1e-37))
    z = L / Lnorm
    helper_x = jnp.array([1.0, 0.0, 0.0], dtype=pos.dtype)
    helper_y = jnp.array([0.0, 1.0, 0.0], dtype=pos.dtype)
    use_y = jnp.abs(jnp.sum(z * helper_x)) > 0.9
    helper = jnp.where(use_y, helper_y, helper_x)
    x = jnp.cross(helper, z)
    x = x / jnp.sqrt(jnp.maximum(jnp.sum(x * x), 1e-37))
    y = jnp.cross(z, x)
    R = jnp.stack([x, y, z])  # rows = new axes

    pr = pos @ R.T
    vr3 = vel @ R.T
    phi = jnp.arctan2(pr[:, 1], pr[:, 0])
    c, s = jnp.cos(phi), jnp.sin(phi)
    v_r = vr3[:, 0] * c + vr3[:, 1] * s
    v_phi = -vr3[:, 0] * s + vr3[:, 1] * c
    return jnp.stack([v_r, v_phi, vr3[:, 2]], axis=1)


def weighted_cylindrical_dispersion(
    weights: jnp.ndarray,  # (K,) normalized or raw weights
    v_cyl: jnp.ndarray,  # (K, 3)
    mask: jnp.ndarray,
) -> jnp.ndarray:
    """[sigma_r, sigma_phi, sigma_z] with weight-normalized mean removal
    (``kinematic_properties.py:130-219``)."""
    w = jnp.where(mask, weights, 0.0)
    wsum = jnp.maximum(jnp.sum(w), 1e-37)
    wn = w / wsum
    mean = jnp.sum(wn[:, None] * v_cyl, axis=0)
    var = jnp.sum(wn[:, None] * (v_cyl - mean[None, :]) ** 2, axis=0)
    return jnp.sqrt(var)


def weighted_rotation_velocity(
    weights: jnp.ndarray, v_phi: jnp.ndarray, mask: jnp.ndarray
) -> jnp.ndarray:
    """Weight-averaged azimuthal velocity (``kinematic_properties.py:35-51``)."""
    w = jnp.where(mask, weights, 0.0)
    wsum = jnp.maximum(jnp.sum(w), 1e-37)
    return jnp.sum(w * v_phi) / wsum


def spin_parameter(
    L_norm: jnp.ndarray,  # |L| within radius R
    mass: jnp.ndarray,  # total mass within R
    radius: jnp.ndarray,  # R
    newton_G: float,
) -> jnp.ndarray:
    """Bullock et al. (2001) spin parameter: |L| / (sqrt(2) M V R).

    Used by the SO calculator (reference ``SO_properties.py`` SpinParameter
    lazy property): V = sqrt(G M / R).
    """
    denom = jnp.sqrt(2.0 * newton_G * mass**3 * radius)
    return jnp.where(denom > 0, L_norm / jnp.maximum(denom, 1e-37), 0.0)
