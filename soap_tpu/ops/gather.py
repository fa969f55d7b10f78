"""Padded ragged gather: expanding per-halo cell ranges to candidate rows.

The core TPU-native trick replacing the reference's dynamic per-halo mesh
queries (``SOAP/core/shared_mesh.py:122-200``): a halo's candidate
particles live in a set of contiguous row ranges (one per overlapped grid
cell, particles being cell-sorted).  Expanding ``(starts, counts)`` pairs
into a flat padded index vector is a vectorized searchsorted over the
running sum of counts — O(K log C) VPU work per halo, no data-dependent
shapes, vmappable over a halo batch.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def expand_ranges(
    starts: jnp.ndarray,  # (C,) int32 row starts
    counts: jnp.ndarray,  # (C,) int32 range lengths (0 = skip)
    capacity: int,  # static padded output size K
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Concatenate ragged ranges into a padded index vector.

    Returns (indices, valid, total):
     - ``indices[j]`` = the j-th candidate row (0 where invalid);
     - ``valid[j]``   = j < sum(counts) and j fit in capacity;
     - ``total``      = sum(counts) (may exceed capacity: overflow signal).
    """
    cum = jnp.cumsum(counts)
    total = cum[-1]
    j = jnp.arange(capacity, dtype=jnp.int32)
    C = counts.shape[0]
    if C <= 128:
        # dense compare form: O(K*C) fully-vectorized VPU work with no
        # gathers — on TPU this beats searchsorted (a while loop) plus
        # three small-table gathers for the typical cube <= 5 case.
        # ``lt`` rows are prefix-true (cum is nondecreasing), so the
        # segment of row j is the first False column (clamped to C-1),
        # its one-hot being prev-true & self-false.
        lt = cum[None, :] <= j[:, None]  # (K, C)
        base = jnp.max(jnp.where(lt, cum[None, :], 0), axis=1)
        prev = jnp.concatenate(
            [jnp.ones((capacity, 1), bool), lt[:, :-1]], axis=1
        )
        onehot = prev & (~lt)
        onehot = onehot.at[:, -1].set(onehot[:, -1] | lt[:, -1])
        start_sel = jnp.sum(
            jnp.where(onehot, starts[None, :], 0), axis=1
        ).astype(jnp.int32)
        idx = start_sel + (j - base)
    else:
        seg = jnp.searchsorted(cum, j, side="right").astype(jnp.int32)
        seg_safe = jnp.minimum(seg, C - 1)
        base = jnp.where(seg_safe > 0, cum[seg_safe - 1], 0)
        idx = starts[seg_safe] + (j - base)
    valid = j < jnp.minimum(total, capacity)
    return jnp.where(valid, idx, 0), valid, total


#: Batched over halos: (B, C) starts/counts -> (B, K) indices.
expand_ranges_batch = jax.vmap(expand_ranges, in_axes=(0, 0, None))


def gather_rows(array: jnp.ndarray, indices: jnp.ndarray) -> jnp.ndarray:
    """Gather rows of a per-particle array for a batch of halos.

    ``array`` is (N, ...) cell-sorted particle data; ``indices`` is (B, K).
    Result is (B, K, ...).  Invalid slots gather row 0 — callers must mask.
    """
    return jnp.take(array, indices, axis=0)
