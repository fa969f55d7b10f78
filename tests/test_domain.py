"""Tests for the Peano–Hilbert domain decomposition."""

import numpy as np

from soap_tpu.parallel.domain import hilbert_key_3d, peano_decomposition


def test_hilbert_key_is_bijective_small():
    bits = 3
    n = 1 << bits
    ijk = np.array(
        [(i, j, k) for i in range(n) for j in range(n) for k in range(n)],
        dtype=np.int64,
    )
    keys = hilbert_key_3d(ijk, bits)
    assert len(np.unique(keys)) == n**3
    assert keys.min() == 0
    assert keys.max() == n**3 - 1


def test_hilbert_curve_is_continuous():
    # consecutive keys differ by one cell step (the defining property)
    bits = 3
    n = 1 << bits
    ijk = np.array(
        [(i, j, k) for i in range(n) for j in range(n) for k in range(n)],
        dtype=np.int64,
    )
    keys = hilbert_key_3d(ijk, bits)
    order = np.argsort(keys)
    path = ijk[order]
    steps = np.abs(np.diff(path, axis=0)).sum(axis=1)
    assert (steps == 1).all()


def test_peano_decomposition_balanced():
    rng = np.random.default_rng(5)
    centres = rng.uniform(0, 100.0, (10000, 3))
    chunks = peano_decomposition(centres, 100.0, 8)
    counts = np.bincount(chunks, minlength=8)
    assert counts.min() >= 1249 and counts.max() <= 1251


def test_peano_decomposition_spatial_compactness():
    rng = np.random.default_rng(6)
    centres = rng.uniform(0, 100.0, (20000, 3))
    chunks = peano_decomposition(centres, 100.0, 16)
    # a chunk's bounding box should be much smaller than the box: compare
    # the mean chunk extent against the full box diagonal
    extents = []
    for c in range(16):
        p = centres[chunks == c]
        extents.append(np.linalg.norm(p.max(axis=0) - p.min(axis=0)))
    assert np.mean(extents) < 0.75 * np.linalg.norm([100.0] * 3)


def test_separate_chunks_for_big_halos():
    rng = np.random.default_rng(7)
    centres = rng.uniform(0, 50.0, (1000, 3))
    nbound = rng.integers(10, 1000, 1000)
    nbound[5] = 10_000_000
    nbound[17] = 2_000_000
    chunks = peano_decomposition(
        centres, 50.0, 4, nr_bound_part=nbound, separate_chunks=[5_000_000, 1_000_000]
    )
    # the two big halos get dedicated chunk numbers >= 4
    assert chunks[5] == 4
    assert chunks[17] == 5
    others = np.delete(chunks, [5, 17])
    assert others.max() < 4
