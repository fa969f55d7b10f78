"""Run-length gather layout: block tables, alignment heads, validity.

The DMA kernel itself only runs on TPU hardware; these tests pin the
layout logic through the XLA-fallback path (``use_dma=False``), which
shares the block table and produces the IDENTICAL (rows, valid, total)
contract the kernel must satisfy.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from soap_tpu.ops import dma_gather


def test_pad_columns_and_alignment():
    assert dma_gather.pad_columns_for_dma(11) == 16
    assert dma_gather.pad_columns_for_dma(16) == 16
    assert dma_gather.pad_columns_for_dma(40) == 64
    assert dma_gather.pad_columns_for_dma(128) == 128
    assert dma_gather.pad_columns_for_dma(200) == 256
    assert dma_gather.row_alignment(16) == 8
    assert dma_gather.row_alignment(64) == 2
    assert dma_gather.row_alignment(128) == 1
    assert dma_gather.row_alignment(256) == 1


@pytest.mark.parametrize("F,S", [(16, 64), (64, 128), (128, 64)])
def test_range_gather_fallback_matches_reference(F, S):
    rng = np.random.default_rng(7)
    N, B, C = 5000, 6, 5
    packed = rng.normal(size=(N, F)).astype(np.float32)

    starts = rng.integers(0, N - 900, size=(B, C)).astype(np.int32)
    counts = rng.integers(0, 800, size=(B, C)).astype(np.int32)
    counts[0, 2] = 0  # empty range
    counts[1] = 0  # fully empty halo

    totals_ref = counts.sum(axis=1)
    capacity = dma_gather.dest_capacity(int(totals_ref.max()), C, S, F)
    capacity = -(-capacity // S) * S

    rows, valid, src_rows, total = dma_gather.range_gather_rows(
        jnp.asarray(packed),
        jnp.asarray(starts),
        jnp.asarray(counts),
        S,
        capacity,
        use_dma=False,
    )
    rows = np.asarray(rows)
    valid = np.asarray(valid)
    total = np.asarray(total)
    assert (total <= capacity).all()

    for b in range(B):
        # the valid rows, in order, must be exactly the concatenated
        # ranges — identical to the expand_ranges+gather contract
        expect = np.concatenate(
            [
                packed[starts[b, c] : starts[b, c] + counts[b, c]]
                for c in range(C)
            ]
            + [np.zeros((0, F), np.float32)]
        )
        got = rows[b][valid[b]]
        assert got.shape == expect.shape, (b, got.shape, expect.shape)
        np.testing.assert_array_equal(got, expect)
        assert int(valid[b].sum()) == int(counts[b].sum())


def test_overflow_signalling():
    packed = jnp.zeros((2048, 16), jnp.float32)
    starts = jnp.asarray([[0, 512]], jnp.int32)
    counts = jnp.asarray([[500, 700]], jnp.int32)
    S, capacity = 64, 512  # too small on purpose
    rows, valid, src_rows, total = dma_gather.range_gather_rows(
        packed, starts, counts, S, capacity, use_dma=False
    )
    assert int(total[0]) > capacity


def test_merge_adjacent_ranges():
    import jax.numpy as jnp

    # A(0,10) zero B(10,5) C(40,5) D(45,0) E(45,3) -> [A+B, C+E merged?]
    # C ends at 45, D empty, E starts at 45 -> C,E merge
    starts = jnp.asarray([0, 0, 10, 40, 45, 45], jnp.int32)
    counts = jnp.asarray([10, 0, 5, 5, 0, 3], jnp.int32)
    ms, mc = dma_gather.merge_adjacent_ranges(starts, counts)
    ms, mc = np.asarray(ms), np.asarray(mc)
    got = [(s, c) for s, c in zip(ms, mc) if c > 0]
    assert got == [(0, 15), (40, 8)]

    # non-adjacent stay separate; all-empty stays empty
    ms, mc = dma_gather.merge_adjacent_ranges(
        jnp.asarray([5, 100], jnp.int32), jnp.asarray([3, 4], jnp.int32)
    )
    assert [(s, c) for s, c in zip(np.asarray(ms), np.asarray(mc)) if c > 0] == [
        (5, 3),
        (100, 4),
    ]
    ms, mc = dma_gather.merge_adjacent_ranges(
        jnp.zeros(4, jnp.int32), jnp.zeros(4, jnp.int32)
    )
    assert int(np.asarray(mc).sum()) == 0
