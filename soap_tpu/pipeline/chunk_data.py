"""Device-resident chunk data: staging, spatial index, candidate counting.

TPU-native replacement for the reference's per-node shared-memory particle
store + ``SharedMesh`` (``SOAP/core/chunk_tasks.py:164-304``,
``SOAP/core/shared_mesh.py``): one copy of the chunk's particles lives in
device HBM, cell-sorted per particle type, and each halo's candidate set
is a union of contiguous row ranges.

Candidate counting uses a 3D summed-area table over per-cell counts, so
the exact number of candidate rows for every halo's search AABB is 64
gathers per halo (8 periodic sub-boxes x 8 corners) — this replaces the
reference's dynamic mesh queries for the purpose of sizing the padded
gather buckets.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from soap_tpu.ops import geometry
from soap_tpu.ops.grid import GridSpec, build_grid, choose_resolution


@jax.tree_util.register_pytree_node_class
@dataclass
class PTypeChunk:
    """One particle type's cell-sorted device arrays.

    Per-particle data is stored PACKED: all f32 fields (plus the hi/lo
    position split) as columns of one ``(N, Ff)`` matrix and all integer
    fields as one ``(N, Fi)`` i64 matrix.  A halo bucket then gathers
    candidate rows with TWO gathers total instead of one per field —
    TPU gathers are per-access-bound (~100 M rows/s), so 12+ separate
    field gathers were the dominant bucket cost after mask-payload
    unification.  Column layouts are static pytree aux data; per-field
    views are sliced out of the gathered block (free under XLA fusion).
    """

    spec: GridSpec  # static
    n: int  # real particle count (NOT part of the jit signature: row
    # counts are shape-quantized so chunks share compiled programs)
    packed_lines: jnp.ndarray  # (N*F/128, 128) f32: the packed row block
    # stored AS 128-lane lines.  The run-length DMA gather consumes this
    # layout directly; storing rows (N, F) instead made XLA auto-layout
    # pick an F-major parameter layout and insert a whole-store relayout
    # copy + reshape (~18 ms on the 10.5M-row bench store) into EVERY
    # bucket program.  Row order: line l holds rows [l*128/F, ...), i.e.
    # ``lines.reshape(N, F)`` is the row view (a free bitcast).
    packed_i: Optional[jnp.ndarray]  # retired: always None (ints ride
    # the packed block as bit-halves); kept for pytree layout stability
    row_width: int  # static F: padded row width (pad_columns_for_dma)
    cols_f: Tuple  # static ((name, start, row_shape), ...) into the rows
    cols_i: Tuple  # static ((name, start, row_shape, dtype_str), ...)
    # with start indexing the row view (2 columns per int)
    offsets: jnp.ndarray  # (C,) i32 first row of each cell
    counts: jnp.ndarray  # (C,) i32
    sat: jnp.ndarray  # (d0+1, d1+1, d2+1) i32 summed-area table
    mass_sat: jnp.ndarray  # (d0+1, d1+1, d2+1) f32 mass summed-area table

    @property
    def packed_f(self) -> jnp.ndarray:
        """Row view (..., N, F) of the line-layout store.

        Free inside jit (reshape of a 128-minor parameter).  On concrete
        DEVICE arrays outside jit this dispatches a reshape program —
        use ``packed_lines`` for byte counts / readiness waits there.
        """
        lead = self.packed_lines.shape[:-2]
        return self.packed_lines.reshape(lead + (-1, self.row_width))

    @property
    def pos_hi(self) -> jnp.ndarray:
        return self.packed_f[..., 0:3]

    @property
    def pos_lo(self) -> jnp.ndarray:
        return self.packed_f[..., 3:6]

    def has_field(self, name: str) -> bool:
        return any(c[0] == name for c in self.cols_f) or any(
            c[0] == name for c in self.cols_i
        )

    @property
    def field_names(self) -> Tuple[str, ...]:
        return tuple(c[0] for c in self.cols_f) + tuple(c[0] for c in self.cols_i)

    def field(self, name: str) -> jnp.ndarray:
        """Reconstruct one cell-sorted per-particle array (a device
        slice; use the packed matrices + column metadata on hot paths)."""
        return unpack_field(self.packed_f, self.packed_i, self.cols_f, self.cols_i, name)

    @property
    def fields(self) -> Dict[str, jnp.ndarray]:
        """Dict view of every field (reconstructing; test/debug use)."""
        return {name: self.field(name) for name in self.field_names}

    def tree_flatten(self):
        children = (
            self.packed_lines,
            self.packed_i,
            self.offsets,
            self.counts,
            self.sat,
            self.mass_sat,
        )
        return children, (self.spec, self.cols_f, self.cols_i, self.row_width)

    @classmethod
    def tree_unflatten(cls, aux, children):
        spec, cols_f, cols_i, row_width = aux
        packed_lines, packed_i, offsets, counts, sat, mass_sat = children
        n = (
            packed_lines.shape[-2] * 128 // row_width
            if hasattr(packed_lines, "shape")
            else 0
        )
        return cls(
            spec,
            n,
            packed_lines,
            packed_i,
            row_width,
            cols_f,
            cols_i,
            offsets,
            counts,
            sat,
            mass_sat,
        )


def _row_width(shape) -> int:
    w = 1
    for s in shape:
        w *= int(s)
    return w


def _quantize_rows(n: int) -> int:
    """Next quarter-pow2 step >= n (1.0/1.25/1.5/1.75 x 2^k)."""
    if n <= 64:
        return 64
    k = int(np.floor(np.log2(n)))
    base = 1 << k
    for m in (4, 5, 6, 7, 8):
        q = base * m // 4
        if q >= n:
            return q
    return base * 2


def unpack_field(packed_f, packed_i, cols_f, cols_i, name):
    """Slice one named field out of packed row blocks.

    Works on the (N, F) store and on gathered (..., F) blocks alike.
    """
    for cname, start, shape in cols_f:
        if cname == name:
            w = _row_width(shape)
            out = packed_f[..., start : start + w]
            return out.reshape(out.shape[:-1] + tuple(shape)) if shape else out[..., 0]
    for cname, start, shape, dtype_str in cols_i:
        if cname == name:
            w = _row_width(shape)
            # int columns are stored as f32 bit-halves inside packed_f
            # (see stage_ptype): reassemble i64 from consecutive pairs
            bits = packed_f[..., start : start + 2 * w]
            pairs = bits.reshape(bits.shape[:-1] + (w, 2))
            out = jax.lax.bitcast_convert_type(pairs, jnp.int64)
            dt = jnp.dtype(dtype_str)
            if dt == jnp.uint64:
                out = jax.lax.bitcast_convert_type(out, jnp.uint64)
            elif dt != jnp.int64:
                out = out.astype(dt)
            return out.reshape(out.shape[:-1] + tuple(shape)) if shape else out[..., 0]
    raise KeyError(name)


@jax.tree_util.register_pytree_node_class
@dataclass
class ChunkData:
    """All particle types of one chunk, device-resident."""

    boxsize: float  # static, comoving internal units
    ptypes: Dict[str, PTypeChunk]

    def tree_flatten(self):
        names = tuple(sorted(self.ptypes))
        return tuple(self.ptypes[k] for k in names), (self.boxsize, names)

    @classmethod
    def tree_unflatten(cls, aux, children):
        boxsize, names = aux
        return cls(boxsize, dict(zip(names, children)))


def _summed_area_table(values: jnp.ndarray, dims, dtype) -> jnp.ndarray:
    """3D inclusive prefix sum with a leading zero plane per axis.

    ``sat[i, j, k]`` = sum of per-cell values in cells [0:i, 0:j, 0:k].
    """
    c = values.reshape(dims).astype(dtype)
    c = jnp.cumsum(c, axis=0)
    c = jnp.cumsum(c, axis=1)
    c = jnp.cumsum(c, axis=2)
    return jnp.pad(c, ((1, 0), (1, 0), (1, 0)))


def _host_sat(counts: np.ndarray, dims, dtype) -> np.ndarray:
    """Host-side `_summed_area_table` (same semantics, numpy)."""
    c = counts.reshape(dims).astype(dtype)
    c = np.cumsum(c, axis=0, dtype=dtype)
    c = np.cumsum(c, axis=1, dtype=dtype)
    c = np.cumsum(c, axis=2, dtype=dtype)
    return np.pad(c, ((1, 0), (1, 0), (1, 0)))


def stage_ptype(
    pos: np.ndarray,  # (N, 3) float64 comoving, already inside [0, box)
    fields: Dict[str, np.ndarray],
    boxsize: float,
    resolution: Optional[int] = None,
) -> PTypeChunk:
    """Stage one particle type into the packed cell-sorted store (host).

    The grid always covers the full periodic box (chunks read a masked
    subset of cells but halo queries still wrap around the box edges).

    Everything — the cell sort, the summed-area tables, and the packed
    column block — is built host-side in numpy, and the returned
    ``PTypeChunk`` holds HOST arrays; the engine transfers the stacked
    store to the device in ONE ``device_put``.  The previous
    device-side staging paid one host->device round trip per field plus
    a jit compile of the sort program, which dominated chunk latency
    over a remote-TPU link (222 MB staged in ~115 s; the
    single-transfer path moves the same chunk in a few seconds).
    """
    n = len(pos)
    empty = n == 0
    if empty:
        # absent particle type (reference-snapshot mechanism,
        # ``swift_cells.py:705-722``): keep one unreachable padding row so
        # device gathers have a valid source; all cell counts stay zero
        pos = np.zeros((1, 3), np.float64)
        fields = {
            k: np.zeros((1,) + np.asarray(v).shape[1:], np.asarray(v).dtype)
            for k, v in fields.items()
        }
    if resolution is None:
        resolution = choose_resolution(n)
    spec = GridSpec(
        origin=(0.0, 0.0, 0.0),
        cell_size=(
            boxsize / resolution,
            boxsize / resolution,
            boxsize / resolution,
        ),
        dims=(resolution, resolution, resolution),
        periodic=True,
    )
    hi, lo = geometry.split_hi_lo(pos)

    # flat cell keys in f32 arithmetic (must match `cell_index_of`, which
    # the engine's query side evaluates on f32 hi positions)
    cell_f32 = np.asarray(spec.cell_size, np.float32)
    ijk = np.floor(hi / cell_f32).astype(np.int32)
    dims_arr = np.asarray(spec.dims, np.int32)
    ijk = np.mod(ijk, dims_arr)
    keys = (ijk[:, 0] * spec.dims[1] + ijk[:, 1]) * spec.dims[2] + ijk[:, 2]
    order = np.argsort(keys, kind="stable")
    counts_h = np.bincount(keys, minlength=spec.n_cells).astype(np.int32)
    offsets_h = np.zeros(spec.n_cells, np.int32)
    np.cumsum(counts_h[:-1], out=offsets_h[1:])
    mass = fields.get("Masses")
    if mass is None:
        cell_mass_h = counts_h.astype(np.float32)
    else:
        cell_mass_h = np.bincount(
            keys, weights=np.asarray(mass, np.float64), minlength=spec.n_cells
        ).astype(np.float32)
    if empty:
        counts_h = np.zeros_like(counts_h)
        offsets_h = np.zeros_like(offsets_h)
        cell_mass_h = np.zeros_like(cell_mass_h)
    sat_h = _host_sat(counts_h, spec.dims, np.int32)
    mass_sat_h = _host_sat(cell_mass_h, spec.dims, np.float32)

    # ---- pack into one host (rows, F) f32 block, then transfer once ----
    # column layout: pos_hi | pos_lo | f32 fields | int fields as bit-halves
    cols_f = []
    cols_i = []
    off_f = 6
    names = sorted(fields)
    for name in names:
        arr = np.asarray(fields[name])
        shape = tuple(int(s) for s in arr.shape[1:])
        w = _row_width(shape)
        if np.issubdtype(arr.dtype, np.floating):
            cols_f.append((name, off_f, shape))
            off_f += w
        else:
            # integer columns live INSIDE the f32 block as bitcast
            # bit-halves: ONE row gather (or DMA copy) serves every
            # field.  numpy `.view(f32)` on little-endian i64 yields
            # [lo32, hi32] pairs — the same minor-dimension order as
            # XLA's i64->f32 bitcast_convert_type, so `unpack_field`'s
            # device-side reassembly is unchanged.  Only copy/slice ops
            # ever touch the bits before the bitcast back, so NaN
            # payloads survive.
            cols_i.append((name, off_f, shape, str(arr.dtype)))
            off_f += 2 * w
    # pad the f32 block's width so whole rows tile 128-lane lines: the
    # run-length DMA gather copies sub-blocks of rows as (rows*F/128,
    # 128) lines, which requires F to divide (or be a multiple of) 128.
    # Trailing pad columns are invisible to ``unpack_field``
    from soap_tpu.ops.dma_gather import pad_columns_for_dma

    f_pad = pad_columns_for_dma(off_f)
    # quantize the device row count (quarter-pow2 steps, <= 25% padding):
    # bucket programs are compiled against the store's static shape, so
    # quantization lets successive chunks (and restarts) reuse compiled
    # programs / hit the persistent cache instead of recompiling per
    # chunk.  Padded rows are unreachable: cell offsets/counts only
    # reference the real rows.
    # +1024 guard rows: the run-length DMA gather copies fixed-size
    # sub-blocks and may overrun a range's true end by up to one block
    # (the tail is marked invalid, but the read must stay in bounds)
    n_rows = len(pos)
    npad = _quantize_rows(n_rows + 1024)
    packed_h = np.zeros((npad, f_pad), np.float32)
    packed_h[:n_rows, 0:3] = hi[order]
    packed_h[:n_rows, 3:6] = lo[order]
    for name, start, shape in cols_f:
        arr = np.asarray(fields[name])
        packed_h[:n_rows, start : start + _row_width(shape)] = arr[
            order
        ].reshape(n_rows, -1)
    for name, start, shape, dtype_str in cols_i:
        arr = np.asarray(fields[name]).reshape(n_rows, -1)[order]
        if arr.dtype != np.int64 and arr.dtype != np.uint64:
            arr = arr.astype(np.int64)
        bits = np.ascontiguousarray(arr).view(np.float32)
        packed_h[:n_rows, start : start + bits.shape[1]] = bits
    # arrays stay HOST-resident: the engine stacks the chunk stores and
    # device_puts the result ONCE (`HaloEngine.__init__`).  Transferring
    # here and re-stacking on device would hold two copies of the packed
    # block in HBM for the engine's lifetime.
    return PTypeChunk(
        spec=spec,
        n=n,
        # host reshape to the 128-lane line layout is a free view
        packed_lines=packed_h.reshape(-1, 128),
        packed_i=None,
        row_width=f_pad,
        cols_f=tuple(cols_f),
        cols_i=tuple(cols_i),
        offsets=offsets_h,
        counts=counts_h,
        sat=sat_h,
        mass_sat=mass_sat_h,
    )


def _axis_intervals(lo, hi, d):
    """Wrapped [lo, hi] cell-index span -> two half-open index intervals.

    Each interval is (start, stop) with 0 <= start <= stop <= d; the
    second is (0, 0) when no wrap occurs.  ``lo``/``hi`` are unwrapped
    (may be negative or >= d); the span never exceeds the axis length.
    """
    full = (hi - lo + 1) >= d
    lo_w = jnp.mod(lo, d)
    hi_w = jnp.mod(hi, d)
    wraps = (~full) & (hi_w < lo_w)
    a0 = jnp.where(full, 0, lo_w)
    b0 = jnp.where(full, d, jnp.where(wraps, d, hi_w + 1))
    a1 = jnp.zeros_like(lo_w)
    b1 = jnp.where(wraps, hi_w + 1, 0)
    return (a0, b0), (a1, b1)


def sat_aabb_sum(
    sat: jnp.ndarray,  # (d0+1, d1+1, d2+1) summed-area table
    dims,
    cell_size,
    centre: jnp.ndarray,  # (H, 3)
    radius: jnp.ndarray,  # (H,)
) -> jnp.ndarray:
    """Sum of per-cell values over each halo's periodic search AABB
    (8 periodic sub-boxes x 8 SAT corners per halo)."""
    cell = jnp.asarray(cell_size, dtype=jnp.float32)
    d = jnp.asarray(dims, dtype=jnp.int32)
    lo = jnp.floor((centre - radius[:, None]) / cell).astype(jnp.int32)
    hi = jnp.floor((centre + radius[:, None]) / cell).astype(jnp.int32)

    def box_sum(ix, iy, iz):
        (a, b) = ix
        (c, e) = iy
        (f, g) = iz
        return (
            sat[b, e, g]
            - sat[a, e, g]
            - sat[b, c, g]
            - sat[b, e, f]
            + sat[a, c, g]
            + sat[a, e, f]
            + sat[b, c, f]
            - sat[a, c, f]
        )

    total = jnp.zeros(centre.shape[0], dtype=sat.dtype)
    ivx = _axis_intervals(lo[:, 0], hi[:, 0], d[0])
    ivy = _axis_intervals(lo[:, 1], hi[:, 1], d[1])
    ivz = _axis_intervals(lo[:, 2], hi[:, 2], d[2])
    for ix in ivx:
        for iy in ivy:
            for iz in ivz:
                total = total + box_sum(ix, iy, iz)
    return total


def count_candidates(
    chunk_pt: PTypeChunk,
    centre_hi: jnp.ndarray,  # (H, 3) comoving f32
    radius: jnp.ndarray,  # (H,) comoving f32 search radii
) -> jnp.ndarray:
    """Exact candidate-row count per halo via the summed-area table."""
    spec = chunk_pt.spec
    return sat_aabb_sum(
        chunk_pt.sat, spec.dims, spec.cell_size, centre_hi, radius
    )


count_candidates_jit = jax.jit(count_candidates)


@partial(jax.jit, static_argnames=("n_steps",))
def presize_so_radius(
    chunk: "ChunkData",
    centre_hi: jnp.ndarray,  # (H, 3) comoving
    radius0: jnp.ndarray,  # (H,) comoving initial radii
    target_density_com: jnp.ndarray,  # scalar comoving density threshold
    grow: float = 1.2,
    n_steps: int = 24,
) -> jnp.ndarray:
    """Grow each radius by ``grow`` until the enclosed mean density drops
    below the SO threshold — the batched analogue of the reference's
    radius-growth loop (``SOAP/core/halo_tasks.py:73-103``), evaluated
    with mass summed-area tables instead of mesh queries.  The AABB mass
    overestimates the sphere mass, so the result radius is conservative
    (always large enough); invalid for halos processed without SO.

    Vacuum-gap rule: the SO solver registers the threshold crossing only
    at a PARTICLE whose enclosed density is below the target
    (``ops/so_radius.py`` ``is_crossing``; reference
    ``SO_properties.py:119-156`` likewise raises
    ``SearchRadiusTooSmallError`` until a below-threshold particle is in
    the region).  When the density drops below the target inside a
    particle-free gap (isolated halos in a sparse field), a region
    stopping at the density radius has no such particle and every SO
    definition retries.  Detector: if the final growth step captured NO
    new candidates (AABB count unchanged — local vacuum), keep growing
    until the count increases.  In a continuous density field the count
    grows every step, so the detector never fires and the radius is
    EXACTLY the density radius — zero cost where presize already worked.
    """
    # grid extended one step below radius0 so the vacuum detector has a
    # "previous step" count even when the initial radius already passes
    factors = grow ** jnp.arange(-1, n_steps, dtype=jnp.float32)  # (S+1,)

    def density_ok(r):
        total = jnp.zeros(centre_hi.shape[0], jnp.float32)
        for pt in chunk.ptypes.values():
            total = total + sat_aabb_sum(
                pt.mass_sat, pt.spec.dims, pt.spec.cell_size, centre_hi, r
            )
        vol = _FOUR_PI_3 * r**3
        return total <= target_density_com * vol

    def count_all(r):
        total = jnp.zeros(centre_hi.shape[0], jnp.int32)
        for pt in chunk.ptypes.values():
            total = total + sat_aabb_sum(
                pt.sat, pt.spec.dims, pt.spec.cell_size, centre_hi, r
            )
        return total

    # evaluate all growth steps in parallel (S is small); pick the first
    # radius whose enclosed density is below the threshold
    radii = radius0[None, :] * factors[:, None]  # (S+1, H)
    ok = jax.vmap(density_ok)(radii[1:])  # (S, H)
    cnt = jax.vmap(count_all)(radii)  # (S+1, H)
    any_ok = jnp.any(ok, axis=0)
    first = jnp.argmax(ok, axis=0)  # index into rows 1.. of ``radii``
    chosen = radius0 * grow ** first.astype(jnp.float32)
    cnt_d = jnp.take_along_axis(cnt, (first + 1)[None, :], axis=0)[0]
    cnt_prev = jnp.take_along_axis(cnt, first[None, :], axis=0)[0]
    vacuum = cnt_d == cnt_prev
    # first step at/after the density radius that captures a new particle
    grew = ok & (cnt[1:] > cnt_d[None, :])
    any_grew = jnp.any(grew, axis=0)
    first_grew = jnp.argmax(grew, axis=0)
    r_grew = jnp.where(
        any_grew,
        radius0 * grow ** first_grew.astype(jnp.float32),
        radius0 * grow ** (n_steps - 1),
    )
    chosen = jnp.where(vacuum, jnp.maximum(chosen, r_grew), chosen)
    return jnp.where(any_ok, chosen, radius0 * grow ** (n_steps - 1))


_FOUR_PI_3 = 4.0 * np.pi / 3.0


@partial(jax.jit, static_argnames=("ptypes", "do_presize", "do_trunc"))
def presize_and_count(
    chunk: "ChunkData",
    centre_hi: jnp.ndarray,  # (H, 3) comoving
    radius0: jnp.ndarray,  # (H,) comoving
    so_eligible: jnp.ndarray,  # (H,) bool: grow these to the SO target
    target_density_com: jnp.ndarray,  # scalar comoving threshold
    ptypes: Tuple[str, ...],
    do_presize: bool = True,
    radius_trunc: Optional[jnp.ndarray] = None,  # (H,) comoving
    do_trunc: bool = False,
):
    """One fused device program for the host's bucketing pre-pass:
    optional SO gather-radius growth + exact per-type candidate counts
    (a single round-trip instead of one per step — dispatch latency is
    the dominant cost over a remote-TPU link).  ``radius_trunc`` adds a
    second count at a smaller radius — the sorted-prefix bound for the
    bound/aperture row-truncation (see ``engine._run``)."""
    if do_presize:
        grown = presize_so_radius(chunk, centre_hi, radius0, target_density_com)
        radius = jnp.where(so_eligible, jnp.maximum(radius0, grown), radius0)
    else:
        radius = radius0
    counts = tuple(
        count_candidates(chunk.ptypes[pt], centre_hi, radius) for pt in ptypes
    )
    if do_trunc:
        rt = jnp.minimum(radius_trunc, radius)
        counts_b = tuple(
            count_candidates(chunk.ptypes[pt], centre_hi, rt)
            for pt in ptypes
        )
    else:
        counts_b = tuple(jnp.zeros_like(c) for c in counts)
    return radius, counts, counts_b
