"""Run-length DMA gather: contiguous cell ranges -> padded halo rows.

A halo's candidate particles are a union of CONTIGUOUS row ranges of the
cell-sorted store (one per overlapped grid cell).  XLA's row gather
cannot exploit that structure — it issues one random access per row and
measures ~0.7 GB/s on v5e, the dominant device cost of a large bucket.
This module copies whole sub-blocks of each range with the DMA engines
instead (a Pallas kernel of HBM->HBM ``make_async_copy`` calls driven by
a scalar-prefetched block table), approaching memcpy bandwidth.

Layout contract (vs ``ops.gather.expand_ranges``):
 - each range is start-aligned DOWN to ``a = max(1, 128 // F)`` rows
   (Mosaic slices must be 128-lane aligned; the packed row block is
   viewed as (N*F/128, 128) lines) — up to ``a-1`` leading rows of a
   range are garbage, marked invalid;
 - each aligned range occupies ``ceil(count'/S)*S`` destination rows
   (``S`` = DMA sub-block rows), the tail marked invalid;
 - destination capacity must cover ``sum(count) + C*(S + a)`` rows.

The block table and validity interval per destination row are computed
with the same dense prefix-compare forms as ``expand_ranges`` (cell
count C is small).  ``range_gather_rows`` is the drop-in device-side
replacement for ``expand_ranges`` + ``gather_rows`` on the packed f32
block; int blocks ride the same tables after an i64 -> 2 x i32 bitcast.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pad_columns_for_dma(F: int) -> int:
    """Columns padded so whole rows tile 128-lane lines: the next
    divisor of 128 (F <= 128) or multiple of 128 (F > 128)."""
    if F <= 0:
        return 1
    if F <= 128:
        for p in (1, 2, 4, 8, 16, 32, 64, 128):
            if p >= F:
                return p
    return -(-F // 128) * 128


def row_alignment(F: int) -> int:
    """Source row-start alignment for F padded columns."""
    return max(1, 128 // F)


def dest_capacity(total: int, n_ranges: int, S: int, F: int) -> int:
    """Upper bound on padded destination rows for ``total`` source rows
    across ``n_ranges`` ranges."""
    return int(total) + n_ranges * (S + row_alignment(F))


def build_block_table(
    starts: jnp.ndarray,  # (C,) i32 source row starts
    counts: jnp.ndarray,  # (C,) i32 range lengths (0 = skip)
    S: int,  # static sub-block rows (multiple of row alignment)
    F: int,  # static padded column count
    r_max: int,  # static table length (>= dest_capacity // S)
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Device-side (R,) i32 source-block table + per-block valid interval.

    Returns (table, head, rows_valid):
     - ``table[j]`` = source row the j-th S-row sub-block copies from;
       the destination is always the natural slot ``j*S`` (valid blocks
       tile the destination in j order: ``dst = (base_blocks+k_in)*S``
       with ``k_in = j - base_blocks`` is identically ``j*S``), which
       keeps the prefetched SMEM table at (B, R) i32 — SMEM is 1 MiB;
     - valid destination rows of block j are
       ``[j*S + head_j, j*S + head_j + rows_valid_j)``.
    """
    a = row_alignment(F)
    C = counts.shape[0]
    head = jnp.where(counts > 0, starts % a, 0)  # (C,) leading garbage
    start_al = starts - head
    count_al = jnp.where(counts > 0, counts + head, 0)
    nb = (count_al + (S - 1)) // S  # sub-blocks per range
    cum_nb = jnp.cumsum(nb)
    total_blocks = cum_nb[-1]

    j = jnp.arange(r_max, dtype=jnp.int32)
    lt = cum_nb[None, :] <= j[:, None]  # (R, C) prefix-true rows
    rng = jnp.sum(lt, axis=1).astype(jnp.int32)
    rng_safe = jnp.minimum(rng, C - 1)
    base_blocks = jnp.where(rng_safe > 0, cum_nb[rng_safe - 1], 0)
    k_in = j - base_blocks  # sub-block index within its range
    src = start_al[rng_safe] + k_in * S
    block_valid = j < total_blocks
    first_in_range = block_valid & (k_in == 0)
    head_j = jnp.where(first_in_range, head[rng_safe], 0)
    rows_left = count_al[rng_safe] - k_in * S
    rows_valid = (
        jnp.clip(rows_left, 0, S) * block_valid - head_j
    )  # valid rows AFTER the head offset
    # unused blocks copy source block 0 into their natural slot: every
    # destination row is written exactly once — no uninitialized HBM
    # (downstream masking assumes finite garbage, as with the XLA
    # row-gather's row-0 fill) and no same-slot DMA races
    src = jnp.where(block_valid, src, 0)
    return (
        src.astype(jnp.int32),
        head_j.astype(jnp.int32),
        rows_valid.astype(jnp.int32),
    )


def expand_table_rows(
    table: jnp.ndarray,  # (R,) source rows
    head: jnp.ndarray,  # (R,)
    rows_valid: jnp.ndarray,  # (R,)
    S: int,
    capacity: int,  # static: R*S
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per destination row: (source row index, valid flag).

    The source index reproduces what the DMA copies land in each slot —
    used by the CPU/testing fallback path and for validity masking.

    Broadcast form, deliberately gather-free: ``table[j // S]`` as a
    vmapped gather materializes an (B, capacity, 1) index temp whose
    trailing singleton the TPU layout pads 128x (measured 4 GB per temp
    at B=8, capacity=2^20) — the (R, S) broadcast + collapse reshape
    fuses into consumers instead.
    """
    off = jnp.arange(S, dtype=jnp.int32)[None, :]  # (1, S)
    src_row = table[:, None] + off  # (R, S)
    rel = off - head[:, None]
    valid = (rel >= 0) & (rel < rows_valid[:, None])
    return src_row.reshape(capacity), valid.reshape(capacity)


def merge_adjacent_ranges(
    starts: jnp.ndarray,  # (C,) i32
    counts: jnp.ndarray,  # (C,) i32 (0 = skip)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Coalesce ranges that are contiguous in the source into one.

    ``halo_cell_ranges`` emits the search cube's cells z-minor, and the
    cell-sorted store lays flat cell indices out contiguously — so the
    ``cube`` cells of a z-run usually form ONE contiguous row range
    (except across periodic wraps).  Merging cuts the range count from
    cube^3 toward 2*cube^2: fewer alignment heads / sub-block tails
    (less destination slack) and fewer DMAs.  Zero-count ranges never
    break a chain.  Output is (C,) padded with zero counts; merged
    order preserves concatenation order, so the gather layout contract
    is unchanged apart from smaller padding.
    """
    C = counts.shape[0]
    nz = counts > 0
    ends = starts + counts

    # end of the last non-empty range BEFORE i ("carry last valid")
    def op(a, b):
        av, af = a
        bv, bf = b
        return jnp.where(bf, bv, av), af | bf

    ends_in = (jnp.where(nz, ends, 0), nz)
    carry_val, carry_ok = jax.lax.associative_scan(op, ends_in)
    prev_val = jnp.concatenate([jnp.zeros(1, ends.dtype), carry_val[:-1]])
    prev_ok = jnp.concatenate([jnp.zeros(1, bool), carry_ok[:-1]])

    new_seg = nz & (~prev_ok | (starts != prev_val))
    seg = jnp.cumsum(new_seg) - 1  # segment id per range (-1 before 1st)
    seg = jnp.where(nz, jnp.maximum(seg, 0), C - 1)

    big = jnp.iinfo(starts.dtype).max
    m_start = (
        jnp.full(C, big, starts.dtype)
        .at[seg]
        .min(jnp.where(nz, starts, big))
    )
    m_count = jnp.zeros(C, counts.dtype).at[seg].add(
        jnp.where(nz, counts, 0)
    )
    m_start = jnp.where(m_count > 0, m_start, 0)
    return m_start.astype(starts.dtype), m_count


#: in-flight DMA depth (one semaphore slot each)
_DMA_DEPTH = 8


def _make_kernel(S_lines: int, R: int):
    D = min(_DMA_DEPTH, R)

    def kernel(table_ref, src_hbm, out_hbm, sems):
        b = pl.program_id(0)

        def get_dma(r):
            s = table_ref[0, 0, r]
            # destination is the natural slot (see build_block_table)
            return pltpu.make_async_copy(
                src_hbm.at[pl.ds(s, S_lines), :],
                out_hbm.at[b, pl.ds(r * jnp.int32(S_lines), S_lines), :],
                sems.at[jax.lax.rem(r, jnp.int32(D))],
            )

        # pipelined issue: keep D copies in flight (a blocking
        # start/wait per block would be DMA-latency-bound).  All index
        # arithmetic pinned to i32: the enclosing app enables jax x64,
        # under which bare Python ints lower as i64 and trip Mosaic's
        # mixed-width compare verification
        # explicit while_loop with an i32 carry: under jax x64 a
        # fori_loop's induction variable traces as i64, which Mosaic
        # can neither legalize in loop iter args nor convert to i32
        def cond(r):
            return r < jnp.int32(R)

        def body(r):
            @pl.when(r >= jnp.int32(D))
            def _():
                get_dma(r - jnp.int32(D)).wait()

            get_dma(r).start()
            return r + jnp.int32(1)

        jax.lax.while_loop(cond, body, jnp.int32(0))
        for k in range(D):
            get_dma(jnp.int32(R - D + k)).wait()

    return kernel, D


@functools.partial(jax.jit, static_argnames=("S", "capacity"))
def range_gather_lines(
    packed_lines: jnp.ndarray,  # (L, 128) the packed block viewed as lines
    tables_lines: jnp.ndarray,  # (B, R) i32 source lines
    S: int,  # sub-block LINES
    capacity: int,  # destination LINES per halo (R*S)
) -> jnp.ndarray:
    """(B, capacity, 128) DMA-copied lines."""
    B, R = tables_lines.shape
    kernel, D = _make_kernel(S, R)
    # the block table rides SMEM one halo row at a time (a scalar
    # prefetch of the whole (B, R) table would blow the 1 MiB SMEM at
    # production B*R); the particle store and output stay in HBM and
    # are only touched by the explicit DMAs
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (B, capacity, 128), packed_lines.dtype
        ),
        grid=(B,),
        in_specs=[
            # (B, 1, R) so the (1, 1, R) block's LAST TWO dims equal the
            # array's (Mosaic's block-shape divisibility rule)
            # index-map literals pinned to i32: under jax x64 a bare 0
            # traces as i64 and Mosaic fails to legalize the map's
            # func.return (mixed i32/i64 results)
            pl.BlockSpec(
                (1, 1, R),
                lambda b: (b, jnp.int32(0), jnp.int32(0)),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA((D,))],
    )(tables_lines[:, None, :], packed_lines)


def range_gather_rows(
    packed: jnp.ndarray,  # (N, F) f32 with F = pad_columns_for_dma width
    starts: jnp.ndarray,  # (B, C) i32
    counts: jnp.ndarray,  # (B, C) i32
    S: int,  # sub-block rows (multiple of row_alignment(F))
    capacity: int,  # static destination rows (multiple of S)
    use_dma: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Gather each halo's ranges into (B, capacity, F) padded rows.

    Returns (rows, valid, src_rows, total): ``valid`` marks real
    candidate rows (alignment heads and sub-block tails are False),
    ``src_rows`` (B, capacity) is the source row each slot holds (for
    companion XLA gathers of sibling column blocks on the same layout),
    ``total`` is the padded row demand per halo (compare against
    ``capacity`` for overflow).  ``use_dma=False`` falls back to an XLA
    row gather with the IDENTICAL layout (CPU tests,
    interpret-unfriendly backends).
    """
    N, F = packed.shape
    a = row_alignment(F)
    assert S % a == 0 and capacity % S == 0
    r_max = capacity // S

    bt = jax.vmap(lambda s, c: build_block_table(s, c, S, F, r_max))
    table, head, rows_valid = bt(starts, counts)  # (B, R, 2), (B, R), (B, R)
    # padded row demand: blocks * S of real ranges
    nb_rows = jnp.sum(
        ((jnp.where(counts > 0, counts + starts % a, 0) + S - 1) // S) * S,
        axis=1,
    )
    total = nb_rows

    if use_dma:
        lines_per_row = F // 128 if F >= 128 else None
        if lines_per_row:
            # rows ARE whole lines: work directly in line units
            S_l = S * lines_per_row
            lines = packed.reshape(N * lines_per_row, 128)
            out = range_gather_lines(
                lines, table * lines_per_row, S_l, capacity * lines_per_row
            )
            rows = out.reshape(-1, capacity, F)
        else:
            g = 128 // F  # rows per line; a == g, so src rows divide evenly
            S_l = S // g
            lines = packed.reshape(N // g, 128)
            out = range_gather_lines(lines, table // g, S_l, capacity // g)
            rows = out.reshape(-1, capacity, F)
    src_rows, valid = jax.vmap(
        lambda t, h, rv: expand_table_rows(t, h, rv, S, capacity)
    )(table, head, rows_valid)
    src_rows = jnp.clip(src_rows, 0, N - 1)
    if not use_dma:
        rows = jnp.take(packed, src_rows, axis=0)
    return rows, valid, src_rows, total
