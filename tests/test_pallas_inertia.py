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


def _sorted_cloud(rng, K, ax_scale=1.0):
    pos = (rng.normal(size=(K, 3)) * [1.5 * ax_scale, 1.0, 0.7]).astype(
        np.float32
    )
    order = np.argsort(np.linalg.norm(pos, axis=1))
    return pos[order]


@pytest.mark.parametrize("seed", [3, 4])
def test_kernel_radius_sorted_rows(seed):
    """rows_radius_sorted=True: the dynamic ellipsoid-extent bound and
    the static prefix bound must not change results on genuinely
    radius-ascending rows (dense-prefix and all-selected masks)."""
    rng = np.random.default_rng(seed)
    K = 1920  # not a block multiple
    pos = _sorted_cloud(rng, K)
    pos[0] = 0.0  # r == 0 row stays first after the sort
    w = rng.lognormal(0.0, 0.3, K).astype(np.float32)
    masks = np.zeros((3, K), bool)
    masks[0] = True  # all selected
    masks[1, : K // 3] = True  # dense prefix (radius-sorted selection)
    masks[2] = rng.random(K) < 0.5  # scattered (prefix bound = max row)
    rmed = float(np.median(np.linalg.norm(pos, axis=1)))
    R = np.array([1.5 * rmed, 0.8 * rmed, 1.1 * rmed], np.float32)
    red = np.array([False, True, False])
    it = np.array([True, True, True])

    args = dict(rows_radius_sorted=True)
    os.environ["SOAP_TPU_PALLAS_INERTIA"] = "0"
    ref = I.inertia_tensor_multi(
        jnp.asarray(w), jnp.asarray(pos), jnp.asarray(masks),
        jnp.asarray(R), jnp.asarray(red), jnp.asarray(it), **args,
    )
    os.environ["SOAP_TPU_PALLAS_INERTIA"] = "interpret"
    try:
        ker = I.inertia_tensor_multi(
            jnp.asarray(w), jnp.asarray(pos), jnp.asarray(masks),
            jnp.asarray(R), jnp.asarray(red), jnp.asarray(it), **args,
        )
    finally:
        os.environ["SOAP_TPU_PALLAS_INERTIA"] = "0"
    np.testing.assert_array_equal(
        np.asarray(ref.found), np.asarray(ker.found)
    )
    np.testing.assert_allclose(
        np.asarray(ker.tensor), np.asarray(ref.tensor), rtol=2e-5,
        atol=1e-7 * float(np.abs(np.asarray(ref.tensor)).max() + 1e-30),
    )


def test_structural_k_cap_falls_back_to_xla(monkeypatch):
    """K beyond the kernel's 256-block bound rows must NOT reach the
    Pallas path (ADVICE r3: the dynamic bound silently truncated at
    262144 rows when the VMEM cap was raised or in interpret mode)."""
    from soap_tpu.ops import pallas_inertia as _pk

    hard_cap = 256 * 128 * _pk.RB

    def _boom(*a, **k):
        raise AssertionError("Pallas kernel invoked beyond the 256-block cap")

    monkeypatch.setattr(_pk, "inertia_loop_pallas", _boom)
    rng = np.random.default_rng(11)
    K = hard_cap + 128 * _pk.RB  # one block beyond the structural bound
    pos = rng.normal(size=(K, 3)).astype(np.float32)
    w = np.ones(K, np.float32)
    masks = np.ones((1, K), bool)
    R = np.array([2.0], np.float32)
    red = np.array([False])
    it = np.array([False])
    os.environ["SOAP_TPU_PALLAS_INERTIA"] = "interpret"
    try:
        res = I.inertia_tensor_multi(
            jnp.asarray(w), jnp.asarray(pos), jnp.asarray(masks),
            jnp.asarray(R), jnp.asarray(red), jnp.asarray(it),
        )
    finally:
        os.environ["SOAP_TPU_PALLAS_INERTIA"] = "0"
    assert np.asarray(res.found).all()


def test_structural_k_cap_boundary_uses_pallas(monkeypatch):
    """K exactly at the 256-block bound still takes the Pallas path
    (the gate must be <=, not <)."""
    from soap_tpu.ops import pallas_inertia as _pk

    hard_cap = 256 * 128 * _pk.RB

    class _Sentinel(Exception):
        pass

    def _probe(*a, **k):
        raise _Sentinel

    monkeypatch.setattr(_pk, "inertia_loop_pallas", _probe)
    rng = np.random.default_rng(12)
    pos = rng.normal(size=(hard_cap, 3)).astype(np.float32)
    w = np.ones(hard_cap, np.float32)
    masks = np.ones((1, hard_cap), bool)
    os.environ["SOAP_TPU_PALLAS_INERTIA"] = "interpret"
    try:
        with pytest.raises(_Sentinel):
            I.inertia_tensor_multi(
                jnp.asarray(w), jnp.asarray(pos), jnp.asarray(masks),
                jnp.asarray(np.array([2.0], np.float32)),
                jnp.asarray(np.array([False])),
                jnp.asarray(np.array([False])),
            )
    finally:
        os.environ["SOAP_TPU_PALLAS_INERTIA"] = "0"


def test_family_lane_vmap_folds_into_config_lanes():
    """The engine evaluates spec families under a lane vmap with SHARED
    positions/weights and per-lane masks+radii; the kernel's custom
    vmap rule folds the lanes into config lanes of ONE instance.  Both
    the folded path and the per-lane XLA loop must agree — including
    nested (halo, lane) vmaps, which is the engine's exact structure."""
    import jax

    rng = np.random.default_rng(7)
    B, L, C, K = 3, 4, 5, 600
    pos_h = rng.normal(size=(B, K, 3)).astype(np.float32)
    w_h = rng.lognormal(0.0, 0.3, (B, K)).astype(np.float32)
    # radius-sorted rows (the engine's layout), dense-prefix masks
    for b in range(B):
        order = np.argsort(np.linalg.norm(pos_h[b], axis=1))
        pos_h[b] = pos_h[b][order]
    r_h = np.linalg.norm(pos_h, axis=2)
    R_lane = np.quantile(r_h, [0.3, 0.5, 0.7, 0.9], axis=1).T.astype(
        np.float32
    )  # (B, L)
    masks = np.zeros((B, L, C, K), bool)
    for b in range(B):
        for l in range(L):
            base = r_h[b] < R_lane[b, l] * 1.4
            for c in range(C):
                masks[b, l, c] = base & (rng.random(K) < 0.9)
    red = np.array([False, True, False, True, False])
    it = np.array([True, True, False, False, True])
    Rcfg = np.stack(
        [np.stack([R_lane[b]] * C, axis=1) for b in range(B)]
    )  # (B, L, C)

    def one(pos, w, m, R):
        res = I.inertia_tensor_multi(
            jnp.asarray(w), jnp.asarray(pos), m, R,
            np.asarray(red), np.asarray(it),
            rows_radius_sorted=True,
        )
        return res.tensor

    lanes = jax.vmap(one, in_axes=(None, None, 0, 0))

    os.environ["SOAP_TPU_PALLAS_INERTIA"] = "0"
    ref = jax.vmap(lanes, in_axes=(0, 0, 0, 0))(
        jnp.asarray(pos_h), jnp.asarray(w_h),
        jnp.asarray(masks), jnp.asarray(Rcfg),
    )
    os.environ["SOAP_TPU_PALLAS_INERTIA"] = "interpret"
    try:
        ker = jax.vmap(lanes, in_axes=(0, 0, 0, 0))(
            jnp.asarray(pos_h), jnp.asarray(w_h),
            jnp.asarray(masks), jnp.asarray(Rcfg),
        )
    finally:
        os.environ["SOAP_TPU_PALLAS_INERTIA"] = "0"
    np.testing.assert_allclose(
        np.asarray(ker), np.asarray(ref), rtol=2e-4, atol=2e-6
    )
