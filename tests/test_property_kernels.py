"""Property kernels vs direct numpy oracles (masked/padded semantics)."""

import jax.numpy as jnp
import numpy as np

from soap_tpu.ops import inertia, kinematics, radii, reductions


def _pad(arrs, K):
    n = len(arrs[0])
    out = []
    for a in arrs:
        shape = (K,) + a.shape[1:]
        p = np.zeros(shape, a.dtype)
        p[:n] = a
        out.append(jnp.asarray(p))
    mask = np.zeros(K, bool)
    mask[:n] = True
    return out, jnp.asarray(mask)


def test_com_and_veldisp(rng):
    n, K = 300, 512
    mass = rng.uniform(0.5, 2.0, n).astype(np.float32)
    pos = rng.normal(0, 1, (n, 3)).astype(np.float32)
    vel = rng.normal(0, 100, (n, 3)).astype(np.float32)
    (m, p, v), mask = _pad([mass, pos, vel], K)

    mtot, com = reductions.centre_of_mass(m, p, mask)
    assert np.isclose(float(mtot), mass.sum(), rtol=1e-6)
    want_com = (mass[:, None] * pos).sum(0) / mass.sum()
    assert np.allclose(np.asarray(com), want_com, rtol=1e-5, atol=1e-6)

    vcom = reductions.centre_of_mass_velocity(m, v, mask)
    want_vcom = (mass[:, None] * vel).sum(0) / mass.sum()
    assert np.allclose(np.asarray(vcom), want_vcom, rtol=1e-5, atol=1e-3)

    disp = reductions.velocity_dispersion_matrix(m, v, vcom, mask)
    frac = mass / mass.sum()
    dv = vel - want_vcom
    want = np.array(
        [
            (frac * dv[:, 0] * dv[:, 0]).sum(),
            (frac * dv[:, 1] * dv[:, 1]).sum(),
            (frac * dv[:, 2] * dv[:, 2]).sum(),
            (frac * dv[:, 0] * dv[:, 1]).sum(),
            (frac * dv[:, 0] * dv[:, 2]).sum(),
            (frac * dv[:, 1] * dv[:, 2]).sum(),
        ]
    )
    assert np.allclose(np.asarray(disp), want, rtol=1e-4, atol=1e-2)


def test_angular_momentum_kappa_disc(rng):
    """A cold thin disc must give kappa_corot ~ 1 and L along z."""
    n, K = 2000, 2048
    r = rng.uniform(0.5, 5.0, n)
    phi = rng.uniform(0, 2 * np.pi, n)
    pos = np.stack([r * np.cos(phi), r * np.sin(phi), np.zeros(n)], 1).astype(
        np.float32
    )
    vc = 200.0
    vel = np.stack([-vc * np.sin(phi), vc * np.cos(phi), np.zeros(n)], 1).astype(
        np.float32
    )
    mass = np.full(n, 1.0, np.float32)
    (m, p, v), mask = _pad([mass, pos, vel], K)
    res = kinematics.angular_momentum_and_kappa(m, p, v, mask)
    L = np.asarray(res.L)
    assert L[2] > 0 and abs(L[0]) < 1e-2 * L[2] and abs(L[1]) < 1e-2 * L[2]
    assert np.isclose(float(res.kappa_corot), 1.0, atol=1e-5)
    assert float(res.m_counterrot) == 0.0

    # flip half the disc: counterrotating mass = half the total
    vel2 = vel.copy()
    vel2[: n // 2] *= -1
    (m, p, v2), mask = _pad([mass, pos, vel2], K)
    res2 = kinematics.angular_momentum_and_kappa(m, p, v2, mask)
    assert np.isclose(float(res2.m_counterrot), n // 2, rtol=1e-6)


def test_angular_momentum_matches_numpy(rng):
    n, K = 500, 512
    mass = rng.uniform(0.5, 2.0, n).astype(np.float32)
    pos = rng.normal(0, 1, (n, 3)).astype(np.float32)
    vel = rng.normal(0, 100, (n, 3)).astype(np.float32)
    (m, p, v), mask = _pad([mass, pos, vel], K)
    L = np.asarray(kinematics.angular_momentum(m, p, v, mask))
    want = (mass[:, None] * np.cross(pos, vel)).sum(0)
    assert np.allclose(L, want, rtol=1e-4, atol=1.0)


def test_vmax_point_mass(rng):
    """Point mass + tracers: M/r maximal at the innermost tracer."""
    n, K = 100, 128
    radius = np.sort(rng.uniform(1.0, 10.0, n)).astype(np.float32)
    radius[0] = 0.0  # central particle (skipped)
    mass = np.full(n, 1.0, np.float32)
    mass[0] = 1000.0
    (m, r), mask = _pad([mass, radius], K)
    res = kinematics.vmax(m, r, mask)
    # M(<r)/r is maximal at the first non-zero radius
    assert np.isclose(float(res.radius), radius[1], rtol=1e-6)
    want = (1000.0 + 1.0) / radius[1]  # cumulative mass at the first tracer
    assert np.isclose(float(res.vmax_sq_over_G), want, rtol=1e-5)


def test_vmax_multi_soft_matches_bruteforce(rng):
    """Per-type softened Vmax on the shared (unsoftened) radius order
    equals the brute-force sort-by-softened-radius kernel."""
    for seed in range(8):
        _vmax_multi_soft_case(np.random.default_rng(seed))


def _vmax_multi_soft_case(rng):
    n, K = 700, 1024
    n_types = 3
    softs = (0.05, 0.4, 0.0)  # incl. a zero softening
    radius = rng.uniform(0.0, 5.0, n).astype(np.float32)
    radius[:5] = 0.0  # some exact-centre particles
    mass = rng.uniform(0.5, 2.0, n).astype(np.float32)
    tids = rng.integers(0, n_types, n)
    sel = rng.random(n) > 0.3

    # brute force: softened radii through the sorting wrapper
    soft_r = np.maximum(radius, np.asarray(softs, np.float32)[tids])
    (m_b, r_b), mask_b = _pad([mass, soft_r], K)
    mask_b = mask_b & np.pad(sel, (0, K - n))
    want = kinematics.vmax(m_b, r_b, mask_b)

    # shared-sort path: sort once by UNSOFTENED radius, per-type masks
    r_pad = np.pad(radius, (0, K - n), constant_values=np.inf)
    order = np.argsort(r_pad)
    r_sorted = r_pad[order].astype(np.float32)
    m_sorted = np.pad(mass, (0, K - n))[order].astype(np.float32)
    sel_pad = np.pad(sel, (0, K - n))
    tid_pad = np.pad(tids, (0, K - n), constant_values=-1)
    masks = [
        (sel_pad & (tid_pad == t))[order] for t in range(n_types)
    ]
    got = kinematics.vmax_sorted_multi_soft(
        jnp.asarray(m_sorted), jnp.asarray(r_sorted),
        [jnp.asarray(mk) for mk in masks], softs,
    )
    assert np.isclose(
        float(got.vmax_sq_over_G), float(want.vmax_sq_over_G), rtol=1e-5
    )
    assert np.isclose(float(got.radius), float(want.radius), rtol=1e-5)

    # nothing selected -> zeros
    empty = kinematics.vmax_sorted_multi_soft(
        jnp.asarray(m_sorted), jnp.asarray(r_sorted),
        [jnp.zeros(K, bool) for _ in range(n_types)], softs,
    )
    assert float(empty.vmax_sq_over_G) == 0.0
    assert float(empty.radius) == 0.0


def test_half_mass_radius_analytic(rng):
    """Uniform 1D shell masses: analytic half-mass radius.

    Mirrors the reference's analytic checks
    (tests/test_half_mass_radius.py in the reference repo).
    """
    n, K = 1000, 1024
    radius = np.sort(rng.uniform(0.0, 1.0, n)).astype(np.float32)
    mass = np.full(n, 2.0, np.float32)
    (m, r), mask = _pad([mass, radius], K)
    hmr = radii.half_weight_radius(r, m, jnp.float32(mass.sum()), mask)
    # uniform-in-radius distribution: half mass at ~median radius
    assert abs(float(hmr) - np.median(radius)) < 0.05

    # exact check vs direct computation
    cum = np.cumsum(mass)
    target = 0.5 * mass.sum()
    i = int(np.argmax(cum >= target))
    rmin, wmin = (radius[i - 1], cum[i - 1]) if i > 0 else (0.0, 0.0)
    want = rmin + (target - wmin) / (cum[i] - wmin) * (radius[i] - rmin)
    assert np.isclose(float(hmr), want, rtol=1e-5)

    # zero total weight -> 0
    hmr0 = radii.half_weight_radius(r, m, jnp.float32(0.0), jnp.zeros(K, bool))
    assert float(hmr0) == 0.0


def _oracle_inertia(weights, pos, R, reduced=False, max_iterations=20):
    """Direct numpy implementation of the documented iterative algorithm."""
    if len(weights) < 20:
        return None
    if reduced:
        norm = np.linalg.norm(pos, axis=1) ** 2
        keep = ~np.isclose(norm, 0)
        norm, weights, pos = norm[keep], weights[keep], pos[keep]
    tol, q = 1e-4, 1000.0
    eig_val = np.array([1.0, 1.0, 1.0])
    eig_vec = np.eye(3)
    tensor = None
    for it in range(max_iterations):
        old_q = q
        q = np.sqrt(eig_val[1] / eig_val[2])
        s = np.sqrt(eig_val[0] / eig_val[2])
        p = np.sqrt(eig_val[0] / eig_val[1])
        if abs((old_q - q) / q) < tol:
            break
        axis = R * np.array([np.cbrt(s * p), np.cbrt(q / p), 1 / np.cbrt(q * s)])
        proj = pos @ eig_vec / axis
        r = np.linalg.norm(proj, axis=1)
        if it == 0 and np.sum(r <= 1) < 20:
            return None
        w = weights / np.sum(weights[r <= 1])
        w = np.where(r > 1, 0.0, w)
        t = w[:, None, None] * pos[:, :, None] * pos[:, None, :]
        if reduced:
            t = t / norm[:, None, None]
        tensor = t.sum(axis=0)
        eig_val, eig_vec = np.linalg.eigh(tensor)
        eig_val = np.abs(eig_val)
        if q == 0:
            tensor[:] = 0
            break
    return np.concatenate([np.diag(tensor), tensor[np.triu_indices(3, 1)]])


def test_inertia_tensor_matches_oracle(rng):
    n, K = 800, 1024
    # anisotropic Gaussian blob
    pos = (rng.normal(0, 1, (n, 3)) * np.array([1.0, 0.6, 0.3])).astype(
        np.float32
    )
    w = rng.uniform(0.5, 1.5, n).astype(np.float32)
    R = 2.0
    (wj, pj), mask = _pad([w, pos], K)
    res = inertia.inertia_tensor(
        wj, pj, mask, jnp.float32(R), reduced=False, max_iterations=20
    )
    want = _oracle_inertia(w.astype(np.float64), pos.astype(np.float64), R)
    assert bool(res.found)
    assert np.allclose(np.asarray(res.tensor), want, rtol=2e-3, atol=1e-4)

    # reduced variant
    res_r = inertia.inertia_tensor(
        wj, pj, mask, jnp.float32(R), reduced=True, max_iterations=20
    )
    want_r = _oracle_inertia(
        w.astype(np.float64), pos.astype(np.float64), R, reduced=True
    )
    assert np.allclose(np.asarray(res_r.tensor), want_r, rtol=5e-3, atol=1e-4)

    # non-iterative variant (max_iterations=1): plain sphere tensor
    res_1 = inertia.inertia_tensor(
        wj, pj, mask, jnp.float32(R), reduced=False, max_iterations=1
    )
    want_1 = _oracle_inertia(
        w.astype(np.float64), pos.astype(np.float64), R, max_iterations=1
    )
    assert np.allclose(np.asarray(res_1.tensor), want_1, rtol=2e-3, atol=1e-4)


def test_inertia_too_few_particles(rng):
    n, K = 10, 32
    pos = rng.normal(0, 1, (n, 3)).astype(np.float32)
    w = np.ones(n, np.float32)
    (wj, pj), mask = _pad([w, pos], K)
    res = inertia.inertia_tensor(wj, pj, mask, jnp.float32(5.0))
    assert not bool(res.found)
    assert np.all(np.asarray(res.tensor) == 0.0)


def test_projected_inertia(rng):
    n, K = 500, 512
    pos2 = (rng.normal(0, 1, (n, 2)) * np.array([1.0, 0.4])).astype(np.float32)
    w = np.ones(n, np.float32)
    (wj, pj), mask = _pad([w, pos2], K)
    res = inertia.projected_inertia_tensor(wj, pj, mask, jnp.float32(3.0))
    assert bool(res.found)
    t = np.asarray(res.tensor)
    assert t[0] > t[1] > 0  # xx > yy for the elongated blob
    assert abs(t[2]) < 0.1 * t[0]
