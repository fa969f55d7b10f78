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
    HaloTypeSpec,
    _halo_fn,
    _next_pow2,
    _process_bucket_impl,
)


def make_mesh(n_devices: int, n_chunks: int = 1) -> Mesh:
    """Create the (chunks, halos) mesh over the first n_devices."""
    devices = np.array(jax.devices()[:n_devices]).reshape(n_chunks, -1)
    return Mesh(devices, ("chunks", "halos"))


def _pad_axis0(x: jnp.ndarray, n: int) -> jnp.ndarray:
    if x.shape[0] == n:
        return x
    pad = [(0, n - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad)


def stack_chunks(chunks: Sequence[ChunkData]) -> ChunkData:
    """Stack per-chunk particle stores along a new leading chunk axis.

    All chunks must share grid geometry (stage them with the same
    ``resolution`` over the full periodic box) and field sets.  Particle
    arrays are zero-padded to the largest chunk's count; padded rows are
    unreachable (cell offsets/counts never reference them).
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
        n_max = max(pt.packed_f.shape[0] for pt in pts)
        stacked[name] = PTypeChunk(
            spec=spec,
            n=n_max,
            packed_f=jnp.stack([_pad_axis0(pt.packed_f, n_max) for pt in pts]),
            packed_i=(
                jnp.stack([_pad_axis0(pt.packed_i, n_max) for pt in pts])
                if pts[0].packed_i is not None
                else None
            ),
            cols_f=pts[0].cols_f,
            cols_i=pts[0].cols_i,
            offsets=jnp.stack([pt.offsets for pt in pts]),
            counts=jnp.stack([pt.counts for pt in pts]),
            sat=jnp.stack([pt.sat for pt in pts]),
            mass_sat=jnp.stack([pt.mass_sat for pt in pts]),
        )
    return ChunkData(boxsize=boxsize, ptypes=stacked)


@partial(jax.jit, static_argnames=("ptypes", "do_presize"))
def _sharded_presize_count(
    stacked: ChunkData,
    centre_hi: jnp.ndarray,  # (C, H, 3)
    radius0: jnp.ndarray,  # (C, H)
    so_eligible: jnp.ndarray,  # (C, H) bool
    target_density_com: jnp.ndarray,  # scalar
    ptypes: Tuple[str, ...],
    do_presize: bool,
):
    def one(chunk, c, r, e):
        return presize_and_count(
            chunk, c, r, e, target_density_com, ptypes, do_presize
        )

    return jax.vmap(one, in_axes=(0, 0, 0, 0))(
        stacked, centre_hi, radius0, so_eligible
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


class ShardedHaloEngine:
    """Multi-chip analogue of ``HaloEngine``: C chunks x B halos per step.

    Mirrors ``HaloEngine.process`` (presize -> count -> bucket -> gather
    -> DAG -> retry) with one difference: bucket shapes are shared across
    chunks (SPMD requires one program), so tiles are cut against the
    max-over-chunks candidate count per sorted position.  Centrals-only
    (SO) specs are computed for every lane and masked at assembly — the
    static-schedule analogue of the reference's per-halo filter skip
    (``SO_properties.py:3627``).
    """

    def __init__(
        self,
        ctx_base: HaloContext,
        chunks: Sequence[ChunkData],
        specs: Sequence[HaloTypeSpec],
        mesh: Mesh,
        aux: Optional[Dict[str, object]] = None,
    ):
        assert len(chunks) == mesh.shape["chunks"], (
            f"need one chunk per 'chunks' mesh slice: "
            f"{len(chunks)} chunks vs mesh {dict(mesh.shape)}"
        )
        self.ctx_base = ctx_base
        self.specs = tuple(specs)
        self.mesh = mesh
        self.n_chunks = len(chunks)
        self.boxsize = chunks[0].boxsize
        self._grid_specs = {
            name: chunks[0].ptypes[name].spec for name in chunks[0].ptypes
        }
        chunk_sharding = NamedSharding(mesh, P("chunks"))
        self.stacked = jax.device_put(stack_chunks(chunks), chunk_sharding)
        self.halo_sharding = NamedSharding(mesh, P("chunks", "halos"))
        self.replicated = NamedSharding(mesh, P())
        self.aux = (
            jax.device_put(
                {k: jax.tree_util.tree_map(jnp.asarray, v) for k, v in aux.items()},
                self.replicated,
            )
            if aux
            else {}
        )
        self.stats = EngineStats()

    # -- helpers ---------------------------------------------------------
    def _cube_for(self, ptype: str, radius_com: float) -> int:
        spec = self._grid_specs[ptype]
        cell = spec.cell_size[0]
        need = int(math.floor(2.0 * radius_com / cell)) + 2
        need = min(need, spec.dims[0])
        for q in (2, 3, 5, 7, 9, 13, 17, 25, 33, 49, 65, 97, 129, 192, 256):
            if q >= need:
                return min(q, spec.dims[0])
        return spec.dims[0]

    def _put_halos(self, x: np.ndarray) -> jnp.ndarray:
        return jax.device_put(jnp.asarray(x), self.halo_sharding)

    # -- main ------------------------------------------------------------
    def process(
        self,
        centres: Sequence[np.ndarray],  # per chunk (H_c, 3) float64 comoving
        search_radius_phys: Sequence[np.ndarray],
        index: Sequence[np.ndarray],
        is_central: Sequence[np.ndarray],
        fof_id: Sequence[np.ndarray],
    ) -> List[Dict[str, Dict[str, np.ndarray]]]:
        """Process every chunk's halos; returns per-chunk result dicts."""
        ctx0 = self.ctx_base
        specs = self.specs
        a = ctx0.a
        C = self.n_chunks
        halos_axis = self.mesh.shape["halos"]
        H = [len(ix) for ix in index]

        from soap_tpu.pipeline.engine import min_physical_radius

        results: List[Dict[str, Dict[str, np.ndarray]]] = [{} for _ in range(C)]
        floor_phys = min_physical_radius(specs)
        radius_phys = [
            np.maximum(r.astype(np.float64), floor_phys)
            for r in search_radius_phys
        ]
        pending = [np.arange(h) for h in H]
        chi_clo = [geometry.split_hi_lo(c) for c in centres]

        so_targets = []
        for spec in specs:
            if spec.kind != "SO":
                continue
            t = spec.target_density(ctx0)
            if t is None:
                continue
            if spec.radius_multiple_of is not None and spec.radius_multiple:
                t = t / float(spec.radius_multiple) ** 3
            so_targets.append(t)
        target_com = min(so_targets) * a**3 / 1.5 if so_targets else 0.0
        so_centrals_only = any(
            s.centrals_only for s in specs if s.kind == "SO"
        )

        first_round = True
        while any(len(p) for p in pending):
            Hp = max(max(len(p) for p in pending), 1)
            Hp = ((Hp + halos_axis - 1) // halos_axis) * halos_axis
            # ---- sharded presize + exact candidate counts ----
            c_pad = np.zeros((C, Hp, 3), np.float32)
            r_pad = np.full((C, Hp), 1e-3, np.float32)
            e_pad = np.zeros((C, Hp), bool)
            for c in range(C):
                p = pending[c]
                if len(p) == 0:
                    continue
                c_pad[c, : len(p)] = chi_clo[c][0][p]
                r_pad[c, : len(p)] = (radius_phys[c][p] / a).astype(np.float32)
                e_pad[c, : len(p)] = (
                    is_central[c][p] if so_centrals_only else True
                )
            radius_dev, counts_dev = _sharded_presize_count(
                self.stacked,
                self._put_halos(c_pad),
                self._put_halos(r_pad),
                self._put_halos(e_pad),
                jnp.float32(target_com),
                ctx0.ptypes,
                bool(so_targets) and first_round,
            )
            first_round = False
            radius_com_all = np.asarray(radius_dev)  # (C, Hp)
            per_type_counts = {
                pt: np.asarray(cd) for pt, cd in zip(ctx0.ptypes, counts_dev)
            }
            totals = np.zeros((C, Hp), np.int64)
            for cnt in per_type_counts.values():
                totals += cnt

            orders, rcom, rphys_round = [], [], []
            for c in range(C):
                p = pending[c]
                rp = np.minimum(
                    np.maximum(
                        radius_phys[c][p],
                        radius_com_all[c, : len(p)].astype(np.float64) * a,
                    ),
                    MAX_SEARCH_RADIUS,
                )
                radius_phys[c][p] = rp
                rcom.append((rp / a).astype(np.float32))
                orders.append(np.argsort(totals[c, : len(p)]))
                rphys_round.append(rp)

            # ---- global tile segmentation against max-over-chunks ----
            n_pos = max(len(p) for p in pending)
            rowmax = np.zeros(n_pos, np.int64)
            for c in range(C):
                k = len(pending[c])
                if k:
                    rowmax[:k] = np.maximum(
                        rowmax[:k], totals[c, : len(pending[c])][orders[c]]
                    )

            next_pending: List[List[int]] = [[] for _ in range(C)]
            in_flight: List[Dict] = []
            pos = 0
            while pos < n_pos:
                n_sel = 1
                cap_total = _next_pow2(int(rowmax[pos]) + 8)
                while pos + n_sel < n_pos and n_sel < MAX_BATCH:
                    cap_next = _next_pow2(int(rowmax[pos + n_sel]) + 8)
                    if (n_sel + 1) * max(cap_total, cap_next) > TARGET_ROWS:
                        break
                    cap_total = max(cap_total, cap_next)
                    n_sel += 1
                B = _next_pow2(n_sel, max(8, halos_axis))

                sels = []  # per-chunk local pending positions in this tile
                caps_need = {pt: 8 for pt in ctx0.ptypes}
                rmax_tile = 1e-3
                for c in range(C):
                    sel = orders[c][pos : pos + n_sel]
                    sels.append(sel)
                    if len(sel):
                        p = pending[c][sel]
                        for pt in ctx0.ptypes:
                            caps_need[pt] = max(
                                caps_need[pt],
                                int(per_type_counts[pt][c, sel].max()) + 8,
                            )
                        rmax_tile = max(rmax_tile, float(rcom[c][sel].max()))
                pos += n_sel

                caps = tuple(
                    _next_pow2(caps_need[pt], 128) for pt in ctx0.ptypes
                )
                cubes = tuple(
                    self._cube_for(pt, rmax_tile) for pt in ctx0.ptypes
                )
                ctx = dataclasses.replace(ctx0, capacities=caps)

                # ---- build padded (C, B, ...) halo inputs ----
                t_chi = np.zeros((C, B, 3), np.float32)
                t_clo = np.zeros((C, B, 3), np.float32)
                t_rcom = np.full((C, B), 1e-3, np.float32)
                t_idx = np.full((C, B), -1, np.int64)
                t_srp = np.full((C, B), 1e-3, np.float32)
                t_cen = np.zeros((C, B), bool)
                t_fof = np.full((C, B), -1, np.int64)
                glob = []  # per-chunk global halo rows of this tile
                for c in range(C):
                    sel = sels[c]
                    g = pending[c][sel]
                    glob.append(g)
                    nb = len(sel)
                    if nb == 0:
                        continue
                    t_chi[c, :nb] = chi_clo[c][0][g]
                    t_clo[c, :nb] = chi_clo[c][1][g]
                    t_rcom[c, :nb] = rcom[c][sel]
                    t_idx[c, :nb] = index[c][g]
                    t_srp[c, :nb] = radius_phys[c][g].astype(np.float32)
                    t_cen[c, :nb] = is_central[c][g]
                    t_fof[c, :nb] = fof_id[c][g]

                t0 = time.perf_counter()
                out, overflow = _sharded_bucket(
                    ctx,
                    specs,
                    cubes,
                    float(self.boxsize),
                    self.stacked,
                    self._put_halos(t_chi),
                    self._put_halos(t_clo),
                    self._put_halos(t_rcom),
                    self._put_halos(t_idx),
                    self._put_halos(t_srp),
                    self._put_halos(t_cen),
                    self._put_halos(t_fof),
                    self.aux,
                )
                self.stats.n_bucket_calls += 1
                in_flight.append(
                    dict(
                        glob=glob,
                        B=B,
                        caps=caps,
                        cubes=cubes,
                        out=out,
                        overflow=overflow,
                        t_dispatch=t0,
                    )
                )

            # ---- materialize all tiles of this round ----
            for fl in in_flight:
                out = fl["out"]
                overflow_np = np.asarray(fl["overflow"])  # (C, B)
                n_real = sum(len(g) for g in fl["glob"])
                self.stats.bucket_records.append(
                    (
                        n_real,
                        fl["B"] * C,
                        sum(fl["caps"]),
                        max(fl["cubes"]),
                        time.perf_counter() - fl["t_dispatch"],
                    )
                )
                host_out = {
                    group: {k: np.asarray(v) for k, v in g.items()}
                    for group, g in out.items()
                }
                for c in range(C):
                    g = fl["glob"][c]
                    nb = len(g)
                    if nb == 0:
                        continue
                    needs = np.zeros(nb, bool)
                    for spec in specs:
                        res = host_out[spec.group]
                        nbig = res["__needs_bigger__"][c, :nb]
                        if spec.centrals_only:
                            nbig = nbig & is_central[c][g]
                        needs |= nbig
                        buf = results[c].setdefault(spec.group, {})
                        for key in spec.keys:
                            arr = res[key][c, :nb]
                            if key not in buf:
                                buf[key] = np.zeros(
                                    (H[c],) + arr.shape[1:], arr.dtype
                                )
                            if spec.centrals_only:
                                m = is_central[c][g].reshape(
                                    (-1,) + (1,) * (arr.ndim - 1)
                                )
                                arr = np.where(m, arr, 0)
                            buf[key][g] = arr
                    ov = overflow_np[c, :nb]
                    retry = ov | (
                        needs & (radius_phys[c][g] < MAX_SEARCH_RADIUS)
                    )
                    self.stats.n_overflow += int(ov.sum())
                    if retry.any():
                        grown = g[retry]
                        radius_phys[c][grown] *= READ_RADIUS_FACTOR
                        next_pending[c].extend(grown.tolist())
                        self.stats.n_retries += len(grown)

            pending = [
                np.array(sorted(np_), dtype=np.int64) for np_ in next_pending
            ]

        self.stats.halos_done = sum(H)
        return results
