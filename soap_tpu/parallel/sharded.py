"""Multi-chip execution: chunk x halo data parallelism over a device mesh.

The reference's two parallelism levels (SURVEY.md §2.5) map onto a 2D
``jax.sharding.Mesh``:

 - ``'chunks'`` axis — the inter-node chunk parallelism (P1): each mesh
   slice owns one spatial chunk's particle arrays (the TPU analogue of
   one compute node's shared-memory copy,
   ``SOAP/core/task_queue.py:63-216`` + ``chunk_tasks.py``);
 - ``'halos'`` axis — the intra-node halo parallelism (P2): a chunk's
   halo batch is sharded across the chips of its slice, replacing the
   RMA atomic work claiming (``SOAP/core/halo_tasks.py:319-357``) with
   static batched sharding.

This module runs the REAL engine path under the mesh: the stacked
per-chunk particle stores (cell-sorted grids + summed-area tables) are
sharded along ``'chunks'``, halo batches along ``('chunks', 'halos')``,
and each step executes the same ``_process_bucket_impl`` as the
single-device engine — SO gather presizing, exact candidate counting,
ragged-range expansion, padded gather, the full lazy property DAG, and
the ``needs_bigger``/overflow retry bits — vmapped over the chunk axis.
The per-halo computation is embarrassingly parallel (that is the point
of the design); cross-chip collectives appear only in global statistics
and, at combine time, in distributed sorts.  The host-side retry ladder
(radius x1.5 re-bucketing, ``halo_tasks.py:166-187``) is identical to
``HaloEngine.process``.
"""

from __future__ import annotations

import dataclasses
import math
import time
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from soap_tpu.models.context import HaloContext
from soap_tpu.models.halo_slice import HaloParticles, HaloScalars
from soap_tpu.ops import geometry
from soap_tpu.pipeline.chunk_data import ChunkData, PTypeChunk, presize_and_count
from soap_tpu.pipeline.engine import (
    MAX_BATCH,
    MAX_SEARCH_RADIUS,
    READ_RADIUS_FACTOR,
    TARGET_ROWS,
    EngineStats,
    HaloEngine,
    HaloTypeSpec,
    _halo_fn,
    _next_pow2,
    _process_bucket_impl,
)


def make_mesh(n_devices: int, n_chunks: int = 1) -> Mesh:
    """Create the (chunks, halos) mesh over the first n_devices."""
    devices = np.array(jax.devices()[:n_devices]).reshape(n_chunks, -1)
    return Mesh(devices, ("chunks", "halos"))


def _pad_axis0(x, n: int):
    if x.shape[0] == n:
        return x
    pad = [(0, n - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
    return np.pad(np.asarray(x), pad)


def _stack0(parts):
    """Host-side stack; a single part becomes a zero-copy numpy view."""
    if len(parts) == 1:
        return np.asarray(parts[0])[None]
    return np.stack([np.asarray(p) for p in parts])


def stack_chunks(chunks: Sequence[ChunkData]) -> ChunkData:
    """Stack per-chunk particle stores along a new leading chunk axis.

    All chunks must share grid geometry (stage them with the same
    ``resolution`` over the full periodic box) and field sets.  Particle
    arrays are zero-padded to the largest chunk's count; padded rows are
    unreachable (cell offsets/counts never reference them).

    Stacking happens HOST-side on the host-resident staged arrays
    (``stage_ptype``); the engine device_puts the stacked result once —
    HBM never holds both a per-chunk and a stacked copy of the store.
    """
    assert len(chunks) >= 1
    boxsize = chunks[0].boxsize
    names = sorted(chunks[0].ptypes)
    stacked: Dict[str, PTypeChunk] = {}
    for name in names:
        pts = [c.ptypes[name] for c in chunks]
        spec = pts[0].spec
        for pt in pts:
            assert pt.spec == spec, "chunks must share grid geometry"
            assert pt.cols_f == pts[0].cols_f and pt.cols_i == pts[0].cols_i
        l_max = max(pt.packed_lines.shape[0] for pt in pts)
        stacked[name] = PTypeChunk(
            spec=spec,
            n=l_max * 128 // pts[0].row_width,
            packed_lines=_stack0(
                [_pad_axis0(pt.packed_lines, l_max) for pt in pts]
            ),
            packed_i=None,
            row_width=pts[0].row_width,
            cols_f=pts[0].cols_f,
            cols_i=pts[0].cols_i,
            offsets=_stack0([pt.offsets for pt in pts]),
            counts=_stack0([pt.counts for pt in pts]),
            sat=_stack0([pt.sat for pt in pts]),
            mass_sat=_stack0([pt.mass_sat for pt in pts]),
        )
    return ChunkData(boxsize=boxsize, ptypes=stacked)


@partial(jax.jit, static_argnames=("ptypes", "do_presize", "do_trunc"))
def _sharded_presize_count(
    stacked: ChunkData,
    centre_hi: jnp.ndarray,  # (C, H, 3)
    radius0: jnp.ndarray,  # (C, H)
    so_eligible: jnp.ndarray,  # (C, H) bool
    target_density_com: jnp.ndarray,  # scalar
    ptypes: Tuple[str, ...],
    do_presize: bool,
    radius_trunc: jnp.ndarray = None,  # (C, H) or None
    do_trunc: bool = False,
):
    def one(chunk, c, r, e, rt):
        return presize_and_count(
            chunk, c, r, e, target_density_com, ptypes, do_presize,
            radius_trunc=rt, do_trunc=do_trunc,
        )

    rt = radius_trunc if radius_trunc is not None else jnp.zeros_like(radius0)
    return jax.vmap(one, in_axes=(0, 0, 0, 0, 0))(
        stacked, centre_hi, radius0, so_eligible, rt
    )


@partial(jax.jit, static_argnames=("ctx", "specs", "cubes", "boxsize"))
def _sharded_bucket(
    ctx: HaloContext,
    specs: Tuple[HaloTypeSpec, ...],
    cubes: Tuple[int, ...],
    boxsize: float,
    stacked: ChunkData,
    centre_hi: jnp.ndarray,  # (C, B, 3)
    centre_lo: jnp.ndarray,
    radius_com: jnp.ndarray,  # (C, B)
    index: jnp.ndarray,  # (C, B)
    search_radius_phys: jnp.ndarray,
    is_central: jnp.ndarray,
    fof_id: jnp.ndarray,
    aux=None,
):
    """The single-device bucket program vmapped over the chunk axis.

    Under a committed ('chunks', 'halos') input sharding XLA partitions
    both leading axes across the mesh with no collectives: every device
    gathers from its own chunk's particle store for its own halo lanes.
    """
    f = partial(_process_bucket_impl, ctx, specs, cubes, boxsize)
    return jax.vmap(f, in_axes=(0,) * 8 + (None,))(
        stacked,
        centre_hi,
        centre_lo,
        radius_com,
        index,
        search_radius_phys,
        is_central,
        fof_id,
        aux,
    )


class ShardedHaloEngine(HaloEngine):
    """Multi-chip engine: C chunks x B halos per step over the mesh.

    Thin constructor over the unified ``HaloEngine`` (one orchestrator
    for both modes — the single-device engine is the C=1, mesh-free
    special case).  ``process`` takes per-chunk lists and returns
    per-chunk result dicts; all production features (packed output
    pools, aperture-copy, wide/narrow pass split, satellite/central
    phases, halo timings, retry ladder) run under the mesh.
    """

    def __init__(
        self,
        ctx_base: HaloContext,
        chunks: Sequence[ChunkData],
        specs: Sequence[HaloTypeSpec],
        mesh: Mesh,
        aux=None,
    ):
        super().__init__(ctx_base, list(chunks), specs, aux=aux, mesh=mesh)
