"""Tests: device cell grid + ragged gather vs brute force (periodic)."""

import jax.numpy as jnp
import numpy as np

from soap_tpu.ops import gather, geometry, grid


def brute_force_query(pos, centre, radius, boxsize):
    d = np.abs(pos - centre[None, :])
    if boxsize is not None:
        d = np.minimum(d, boxsize - d)
    return np.flatnonzero(np.sum(d * d, axis=1) <= radius * radius)


import functools

import jax


@functools.partial(jax.jit, static_argnames=("spec", "cube", "capacity", "boxsize"))
def _query_jit(spec, cube, capacity, boxsize, sorted_hi, sorted_lo, offsets,
               counts, centre, c_hi, c_lo, radius):
    starts, cnts = grid.halo_cell_ranges(spec, offsets, counts, centre, radius, cube)
    idx, valid, total = gather.expand_ranges(starts, cnts, capacity)
    off = geometry.periodic_offset(sorted_hi[idx], sorted_lo[idx], c_hi, c_lo, boxsize)
    r2 = geometry.radius_squared(off)
    inside = valid & (r2 <= radius * radius)
    return idx, inside, total


def _run_query(pos, centre, radius, boxsize, periodic, resolution):
    """Full pipeline: grid build -> cube ranges -> expand -> distance mask.

    Mirrors production use: the whole query is one jitted program per
    static (spec, cube, capacity) bucket.
    """
    spec = grid.make_grid_spec(
        pos.min(axis=0) if not periodic else np.zeros(3),
        pos.max(axis=0) if not periodic else np.full(3, boxsize),
        len(pos),
        periodic=periodic,
        resolution=resolution,
    )
    pos_hi, pos_lo = geometry.split_hi_lo(pos)
    order, offsets, counts = grid.build_grid(spec, jnp.asarray(pos_hi))
    order = np.asarray(order)

    cube = int(np.ceil(2 * radius / min(spec.cell_size))) + 2
    cube = min(cube, max(spec.dims))
    cube = 1 << (cube - 1).bit_length()  # pow2-bucket: share compilations
    capacity = max(len(pos) // 2, 64)

    c_hi, c_lo = geometry.split_hi_lo(np.asarray(centre))
    idx, inside, total = _query_jit(
        spec, cube, capacity, boxsize,
        jnp.asarray(pos_hi[order]), jnp.asarray(pos_lo[order]),
        offsets, counts,
        jnp.asarray(centre, dtype=jnp.float32),
        jnp.asarray(c_hi), jnp.asarray(c_lo), jnp.float32(radius),
    )
    assert int(total) <= capacity
    inside = np.asarray(inside)
    return set(order[np.asarray(idx)[inside]].tolist())


def test_grid_query_matches_brute_force_periodic(rng):
    boxsize = 10.0
    pos = rng.uniform(0, boxsize, (5000, 3))
    # clustered blob near a box corner to exercise wrapping
    pos[:500] = np.mod(rng.normal(0.2, 0.4, (500, 3)), boxsize)
    for centre, radius in [
        (np.array([5.0, 5.0, 5.0]), 1.3),
        (np.array([0.1, 0.1, 9.9]), 1.0),  # wraps in all axes
        (np.array([9.5, 5.0, 0.4]), 2.2),
        (np.array([0.0, 0.0, 0.0]), 0.05),
    ]:
        got = _run_query(pos, centre, radius, boxsize, True, 8)
        want = set(brute_force_query(pos, centre, radius, boxsize).tolist())
        assert got == want, (len(got), len(want), centre, radius)


def test_grid_query_non_periodic(rng):
    pos = rng.uniform(2.0, 8.0, (3000, 3))
    centre = np.array([5.0, 5.0, 5.0])
    got = _run_query(pos, centre, 1.7, 100.0, False, 6)
    want = set(brute_force_query(pos, centre, 1.7, None).tolist())
    assert got == want


def test_grid_edge_cases(rng):
    # 1-particle and resolution-1 grids (reference exercises the same
    # edges in tests/test_shared_mesh.py:150-222).
    pos = np.array([[1.0, 2.0, 3.0]])
    got = _run_query(pos, np.array([1.0, 2.0, 3.0]), 0.5, 10.0, True, 1)
    assert got == {0}
    got = _run_query(pos, np.array([8.0, 8.0, 8.0]), 0.5, 10.0, True, 1)
    assert got == set()


def test_expand_ranges_overflow():
    starts = jnp.array([0, 100, 200], dtype=jnp.int32)
    counts = jnp.array([5, 0, 7], dtype=jnp.int32)
    idx, valid, total = gather.expand_ranges(starts, counts, 8)
    assert int(total) == 12  # exceeds capacity -> host must re-bucket
    assert int(valid.sum()) == 8
    np.testing.assert_array_equal(
        np.asarray(idx)[:8], [0, 1, 2, 3, 4, 200, 201, 202]
    )


def test_expand_ranges_batch():
    starts = jnp.array([[0, 10], [5, 0]], dtype=jnp.int32)
    counts = jnp.array([[2, 3], [1, 0]], dtype=jnp.int32)
    idx, valid, total = gather.expand_ranges_batch(starts, counts, 6)
    np.testing.assert_array_equal(np.asarray(total), [5, 1])
    np.testing.assert_array_equal(np.asarray(idx[0])[:5], [0, 1, 10, 11, 12])
    assert np.asarray(idx[1])[0] == 5
    assert int(valid[1].sum()) == 1


def test_hi_lo_precision():
    # A kpc-scale separation at a Gpc-scale coordinate survives the split.
    base = 812.3456789012345  # Mpc
    sep = 1.5e-3  # 1.5 kpc
    pos = np.array([[base, base, base], [base + sep, base, base]])
    hi, lo = geometry.split_hi_lo(pos)
    c_hi, c_lo = geometry.split_hi_lo(pos[0])
    off = geometry.periodic_offset(
        jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(c_hi), jnp.asarray(c_lo), 1000.0
    )
    d = np.asarray(geometry.radius_squared(off)) ** 0.5
    assert abs(d[1] - sep) < 1e-9  # sub-pc accurate
    assert d[0] == 0.0
