"""Batched multi-config inertia kernel vs the per-config reference kernel.

``inertia_tensor_multi`` must reproduce ``inertia_tensor`` exactly for
every (reduced, iterative) combination — it is the same iteration, only
batched over configs with per-config convergence freezing.
"""

import numpy as np
import jax.numpy as jnp

from soap_tpu.ops import inertia as inertia_ops


def _random_halo(seed, K=900):
    rng = np.random.default_rng(seed)
    pos = rng.normal(0, 0.4, (K, 3)).astype(np.float32)
    # anisotropic cloud so the ellipsoid iteration has work to do
    pos[:, 0] *= 2.1
    pos[:, 2] *= 0.55
    w = rng.uniform(0.5, 2.0, K).astype(np.float32)
    mask = rng.uniform(size=K) < 0.8
    return jnp.asarray(w), jnp.asarray(pos), jnp.asarray(mask)


def test_multi_matches_single_3d():
    w, pos, mask = _random_halo(1)
    R = 1.3
    configs = [(False, True), (True, True), (False, False), (True, False)]
    weights = jnp.stack([w] * 4)
    masks = jnp.stack([mask] * 4)
    multi = inertia_ops.inertia_tensor_multi(
        weights,
        pos,
        masks,
        jnp.full(4, R, jnp.float32),
        jnp.asarray([c[0] for c in configs]),
        jnp.asarray([c[1] for c in configs]),
        search_radius=jnp.float32(1.1),
        check_search=jnp.asarray([True, True, False, False]),
    )
    for i, (red, it) in enumerate(configs):
        single = inertia_ops.inertia_tensor(
            w,
            pos,
            mask,
            jnp.float32(R),
            search_radius=jnp.float32(1.1),
            reduced=red,
            max_iterations=20 if it else 1,
        )
        np.testing.assert_allclose(
            np.asarray(multi.tensor[i]),
            np.asarray(single.tensor),
            rtol=1e-4,
            err_msg=f"config reduced={red} iterative={it}",
        )
        assert bool(multi.found[i]) == bool(single.found)
    # search-radius check honoured only where requested
    assert bool(multi.needs_bigger[0]) == bool(
        inertia_ops.inertia_tensor(
            w, pos, mask, jnp.float32(R), search_radius=jnp.float32(1.1)
        ).needs_bigger
    )
    assert not bool(multi.needs_bigger[2])


def test_multi_matches_single_3d_distinct_radii():
    w, pos, mask = _random_halo(2)
    radii = [0.6, 1.0, 2.0]
    multi = inertia_ops.inertia_tensor_multi(
        jnp.stack([w] * 3),
        pos,
        jnp.stack([mask] * 3),
        jnp.asarray(radii, jnp.float32),
        jnp.asarray([False, True, False]),
        jnp.asarray([True, True, True]),
    )
    for i, R in enumerate(radii):
        single = inertia_ops.inertia_tensor(
            w, pos, mask, jnp.float32(R), reduced=bool(i == 1)
        )
        np.testing.assert_allclose(
            np.asarray(multi.tensor[i]), np.asarray(single.tensor), rtol=1e-4
        )


def test_multi_matches_single_2d():
    w, pos, mask = _random_halo(3)
    pos2d = pos[:, :2]
    configs = [(False, True), (True, True), (False, False), (True, False)]
    multi = inertia_ops.projected_inertia_tensor_multi(
        jnp.stack([w] * 4),
        pos2d,
        jnp.stack([mask] * 4),
        jnp.full(4, 1.1, jnp.float32),
        jnp.asarray([c[0] for c in configs]),
        jnp.asarray([c[1] for c in configs]),
    )
    for i, (red, it) in enumerate(configs):
        single = inertia_ops.projected_inertia_tensor(
            w,
            pos2d,
            mask,
            jnp.float32(1.1),
            max_iterations=20 if it else 1,
            reduced=red,
        )
        np.testing.assert_allclose(
            np.asarray(multi.tensor[i]),
            np.asarray(single.tensor),
            rtol=1e-4,
            err_msg=f"config reduced={red} iterative={it}",
        )


def test_multi_too_few_particles():
    w, pos, mask = _random_halo(4, K=30)
    few = mask & (jnp.arange(30) < 10)
    multi = inertia_ops.inertia_tensor_multi(
        jnp.stack([w]),
        pos,
        jnp.stack([few]),
        jnp.asarray([1.0], jnp.float32),
        jnp.asarray([False]),
        jnp.asarray([True]),
    )
    assert not bool(multi.found[0])
    np.testing.assert_array_equal(np.asarray(multi.tensor[0]), 0.0)
