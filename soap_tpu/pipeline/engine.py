"""Halo-batch processing engine: the TPU replacement for SOAP's per-halo
dynamic work claiming.

The reference's inner loop claims one halo at a time per MPI rank with an
RMA atomic counter and retries halos whose search region proved too small
(``SOAP/core/halo_tasks.py:276-407``).  Here, halos are processed in
size-bucketed batches:

 1. a counting pre-pass computes the EXACT number of candidate particle
    rows for every halo (summed-area table over grid-cell counts);
 2. halos are bucketed by candidate count into padded-capacity buckets
    (powers of two), and each bucket is processed by ONE jitted program:
    ragged-range expansion -> padded gather -> vmapped lazy property DAG;
 3. halos flagged ``needs_bigger`` (SO threshold not crossed inside the
    region, aperture/ellipsoid exceeding the region — the batched
    analogues of ``SearchRadiusTooSmallError``) get their radius grown
    x1.5 (``READ_RADIUS_FACTOR``, ``halo_tasks.py:166-187``) and are
    re-bucketed, until done or the hard 20 Mpc cap
    (``halo_tasks.py:19-20``).

Compiled programs are cached per (capacity, cube, batch-size, spec-set)
signature; capacities and batch sizes are quantized so a production run
compiles a handful of programs total.
"""

from __future__ import annotations

import dataclasses
import math
import time
from dataclasses import dataclass, field
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from soap_tpu.models.context import HaloContext
from soap_tpu.models.halo_slice import (
    ApertureSlice,
    BoundSubhaloSlice,
    HaloParticles,
    HaloScalars,
    ProjectedApertureSlice,
    SOSlice,
    compute_properties,
)
from soap_tpu.ops import geometry
from soap_tpu.ops.gather import expand_ranges, gather_rows
from soap_tpu.ops.grid import halo_cell_ranges
from soap_tpu.pipeline.chunk_data import ChunkData, presize_and_count

SEARCH_RADIUS_FACTOR = 1.2  # reference halo_tasks.py:14
READ_RADIUS_FACTOR = 1.5  # reference halo_tasks.py:16
MAX_SEARCH_RADIUS = 20.0  # Mpc physical; reference halo_tasks.py:19-20


@dataclass(frozen=True)
class HaloTypeSpec:
    """Static description of one halo-type calculation instance.

    Mirrors the reference's halo_prop_list entries
    (``compute_halo_properties.py:224-511``): one spec per output group.
    """

    kind: str  # 'bound' | 'SO' | 'aperture' | 'projected'
    group: str  # output group name, e.g. 'SO/200_crit'
    keys: Tuple[str, ...]  # property-table keys to compute
    # SO options
    so_type: Optional[str] = None  # 'crit' | 'mean' | 'BN98' | 'physical'
    so_multiple: Optional[float] = None  # e.g. 200.0 (or Mpc for physical)
    radius_multiple_of: Optional[str] = None  # parent SO group name
    radius_multiple: Optional[float] = None  # e.g. 5.0
    core_excision_fraction: Optional[float] = None
    # aperture options
    aperture_radius_mpc: Optional[float] = None  # physical
    inclusive: bool = False
    # aperture radius as a multiple of a previously computed property
    # (reference ``aperture_properties.py:3909-3915``): (source group,
    # source table key, multiplier)
    radius_property: Optional[Tuple[str, str, float]] = None
    # projected options
    axis: Optional[int] = None
    # halo filter: 'basic' computes for every halo; SO specs additionally
    # restrict to centrals (reference SO_properties.py:3627)
    centrals_only: bool = False
    # variation-level category filter (reference
    # ``compute_halo_properties.py:278-502``: ``variations: {filter: ...}``):
    # halos failing this category get every key of this spec zeroed, and
    # the group's mask metadata records the category
    halo_filter: str = "basic"
    # aperture-copy optimization (reference
    # ``aperture_properties.py:4082-4123``): when every halo of a bucket
    # has EncloseRadius <= the next-smaller aperture's radius, this
    # spec's non-radius-dependent keys are copied from that aperture
    # instead of recomputed.  ``copy_keys`` lists the keys that must
    # still be computed when the copy triggers (radius-dependent ones
    # under strict_halo_copy; empty = copy everything).
    copy_from: Optional[str] = None  # group name of the next-smaller aperture
    copy_from_radius_mpc: Optional[float] = None
    strict_keys: Tuple[str, ...] = ()  # keys recomputed even when copying

    def target_density(self, ctx: HaloContext) -> Optional[float]:
        if self.kind != "SO" or self.so_type in (None, "physical"):
            return None
        if self.so_type == "crit":
            return self.so_multiple * ctx.critical_density
        if self.so_type == "mean":
            return self.so_multiple * ctx.mean_density
        if self.so_type == "BN98":
            return self.so_multiple * ctx.critical_density
        raise ValueError(self.so_type)


def _make_slice(spec, ctx, parts, scalars, prior, dens, aux):
    if spec.kind == "bound":
        return BoundSubhaloSlice(ctx, parts, scalars, aux=aux)
    if spec.kind == "SO":
        if spec.radius_multiple_of is not None:
            parent_r = prior[spec.radius_multiple_of]["r"]
            return SOSlice(
                ctx,
                parts,
                scalars,
                physical_radius=spec.radius_multiple * parent_r,
                virial=True,
                aux=aux,
            )
        if spec.so_type == "physical":
            return SOSlice(
                ctx,
                parts,
                scalars,
                physical_radius=jnp.float32(spec.so_multiple),
                virial=False,
                aux=aux,
            )
        return SOSlice(
            ctx,
            parts,
            scalars,
            target_density=jnp.float32(dens),
            aux=aux,
            core_excision_fraction=spec.core_excision_fraction,
        )
    if spec.kind in ("aperture", "projected"):
        if spec.radius_property is not None:
            src_group, src_key, mult = spec.radius_property
            radius = jnp.float32(mult) * prior[src_group][src_key]
        else:
            radius = jnp.float32(spec.aperture_radius_mpc)
        if spec.kind == "aperture":
            return ApertureSlice(
                ctx, parts, scalars, radius, spec.inclusive, aux=aux
            )
        return ProjectedApertureSlice(
            ctx, parts, scalars, radius, spec.axis, aux=aux
        )
    raise ValueError(spec.kind)


def _block_signature(spec: HaloTypeSpec, dens) -> Optional[tuple]:
    """Blocking signature: consecutive specs with the same signature are
    evaluated as ONE vmapped computation over their scalar parameter
    (SO threshold density / aperture radius) instead of unrolled DAG
    copies.  This is the TPU-native answer to the reference's 38-entry
    ``halo_prop_list``: the parameter-independent intermediates (gather,
    radius sort, masks) stay unbatched inside the vmap, so XLA compiles
    ONE sort + batched reductions rather than N copies of everything —
    compile time and HLO size drop by ~the family size.
    """
    if (
        spec.kind == "SO"
        and dens is not None
        and spec.radius_multiple_of is None
    ):
        return ("SO", spec.keys, spec.core_excision_fraction)
    if spec.kind == "aperture" and spec.radius_property is None:
        return ("aperture", spec.keys, spec.inclusive)
    if spec.kind == "projected" and spec.radius_property is None:
        return ("projected", spec.keys, spec.axis)
    return None


def _pad_pow2(n: int) -> int:
    """Quantize vmapped-block lengths (the aperture-copy optimization
    leaves variable-length surviving-radius prefixes; padding to powers
    of two bounds the number of distinct compiled shapes)."""
    p = 1
    while p < n:
        p *= 2
    return p


def _halo_fn(ctx: HaloContext, specs: Tuple[HaloTypeSpec, ...], densities, aux=None):
    """Single-halo property evaluation over all specs (vmapped later).

    ``aux`` holds shared non-batched device constants (e.g. the cosmology
    age table); it is closed over, NOT vmapped.
    """
    blocks: List[Tuple[Optional[tuple], List[Tuple[HaloTypeSpec, object]]]] = []
    for spec, dens in zip(specs, densities):
        sig = _block_signature(spec, dens)
        if sig is not None and blocks and blocks[-1][0] == sig:
            blocks[-1][1].append((spec, dens))
        else:
            blocks.append((sig, [(spec, dens)]))

    def fn(parts: HaloParticles, scalars: HaloScalars):
        out = {}
        prior = {}
        # ONE radius sort serves every 3D slice family of this program
        # (the sort + payload gathers dominate device time at large K)
        from soap_tpu.models.halo_slice import shared_sort_artifacts

        shared = shared_sort_artifacts(parts, scalars)

        def seed(s, spec):
            if spec.kind != "projected":
                s.__dict__.update(shared)
            return s

        for sig, members in blocks:
            if sig is None or len(members) == 1:
                for spec, dens in members:
                    s = seed(
                        _make_slice(
                            spec, ctx, parts, scalars, prior, dens, aux
                        ),
                        spec,
                    )
                    res = compute_properties(s, spec.keys)
                    prior[spec.group] = res
                    out[spec.group] = res
                continue
            kind = sig[0]
            spec0 = members[0][0]
            keys = spec0.keys
            if kind == "SO":
                params = [float(dens) for _, dens in members]
            else:
                params = [float(s.aperture_radius_mpc) for s, _ in members]
            n = len(members)
            params = params + [params[-1]] * (_pad_pow2(n) - n)
            pvec = jnp.asarray(np.asarray(params, np.float32))

            def one(p):
                if kind == "SO":
                    s = SOSlice(
                        ctx,
                        parts,
                        scalars,
                        target_density=p,
                        aux=aux,
                        core_excision_fraction=spec0.core_excision_fraction,
                    )
                    s.__dict__.update(shared)
                elif kind == "aperture":
                    s = ApertureSlice(
                        ctx, parts, scalars, p, spec0.inclusive, aux=aux
                    )
                    s.__dict__.update(shared)
                else:
                    s = ProjectedApertureSlice(
                        ctx, parts, scalars, p, spec0.axis, aux=aux
                    )
                return compute_properties(s, keys)

            stacked = jax.vmap(one)(pvec)
            for i, (spec, _) in enumerate(members):
                res = {k: v[i] for k, v in stacked.items()}
                prior[spec.group] = res
                out[spec.group] = res
        return out

    return fn


def _process_bucket_impl(
    ctx: HaloContext,
    specs: Tuple[HaloTypeSpec, ...],
    cubes: Tuple[int, ...],  # per-ptype search-cube sizes (static)
    boxsize: float,
    chunk: ChunkData,
    centre_hi: jnp.ndarray,  # (B, 3) comoving
    centre_lo: jnp.ndarray,  # (B, 3)
    radius_com: jnp.ndarray,  # (B,) comoving gather radius
    index: jnp.ndarray,  # (B,) i64
    search_radius_phys: jnp.ndarray,  # (B,) physical
    is_central: jnp.ndarray,  # (B,) bool
    fof_id: jnp.ndarray,  # (B,) i64
    aux=None,  # pytree of shared (non-batched) device constants
):
    """One padded bucket: gather + all property calculations."""
    a = jnp.float32(ctx.a)

    from soap_tpu.pipeline.chunk_data import unpack_field

    parts_per_type = []
    overflow = jnp.zeros(centre_hi.shape[0], dtype=bool)
    fields_concat: Dict[str, jnp.ndarray] = {}
    for ptype, cap, cube in zip(ctx.ptypes, ctx.capacities, cubes):
        pt = chunk.ptypes[ptype]

        def one(c_hi, r):
            starts, counts = halo_cell_ranges(
                pt.spec, pt.offsets, pt.counts, c_hi, r, cube
            )
            return expand_ranges(starts, counts, cap)

        idx, valid, total = jax.vmap(one)(centre_hi, radius_com)
        overflow = overflow | (total > cap)

        # TWO gathers per ptype: all f32 columns and all i64 columns ride
        # one packed row block each (TPU gathers are per-row-bound; the
        # previous one-gather-per-field layout was the dominant cost)
        gf = gather_rows(pt.packed_f, idx)  # (B, K, Ff)
        gi = gather_rows(pt.packed_i, idx) if pt.packed_i is not None else None

        def fld(name):
            return unpack_field(gf, gi, pt.cols_f, pt.cols_i, name)

        g_pos_hi = gf[..., 0:3]
        g_pos_lo = gf[..., 3:6]
        # halo-relative physical positions
        rel = jax.vmap(
            lambda ph, pl, ch, cl: geometry.periodic_offset(ph, pl, ch, cl, boxsize)
        )(g_pos_hi, g_pos_lo, centre_hi, centre_lo) * a

        mass = fld("Masses")
        if ptype == "PartType6" and pt.has_field("Weights"):
            # SO mass profiles use delta-f weighted neutrino masses; the
            # raw masses stay accessible as a per-type field (RawNeutrinoMass)
            fields_concat["PartType6/Masses"] = mass
            mass = mass * fld("Weights")
        vel = fld("Velocities")
        groupnr = (
            fld("GroupNr_bound")
            if pt.has_field("GroupNr_bound")
            else jnp.full(idx.shape, -1, dtype=jnp.int64)
        )
        fofid = (
            fld("FOFGroupIDs")
            if pt.has_field("FOFGroupIDs")
            else jnp.full(idx.shape, -1, dtype=jnp.int64)
        )
        ti = int(ptype[-1])
        soft = jnp.full(idx.shape, jnp.float32(ctx.softening[ctx.ptypes.index(ptype)]))
        parts_per_type.append(
            dict(
                valid=valid,
                mass=jnp.where(valid, mass, 0.0),
                pos=jnp.where(valid[..., None], rel, 0.0),
                vel=jnp.where(valid[..., None], vel, 0.0),
                groupnr=jnp.where(valid, groupnr, -1),
                fofid=jnp.where(valid, fofid, -1),
                softening=soft,
            )
        )
        for fname in pt.field_names:
            if fname in ("Masses", "Velocities", "GroupNr_bound", "FOFGroupIDs"):
                continue
            fields_concat[f"{ptype}/{fname}"] = fld(fname)

    def cat(key):
        return jnp.concatenate([p[key] for p in parts_per_type], axis=1)

    parts = HaloParticles(
        valid=cat("valid"),
        mass=cat("mass"),
        pos=cat("pos"),
        vel=cat("vel"),
        groupnr=cat("groupnr"),
        fofid=cat("fofid"),
        softening=cat("softening"),
        fields=fields_concat,
    )
    scalars = HaloScalars(
        index=index,
        centre=centre_hi.astype(jnp.float32) + centre_lo,
        search_radius=search_radius_phys,
        is_central=is_central,
        fof_id=fof_id,
    )

    densities = tuple(spec.target_density(ctx) for spec in specs)
    fn = _halo_fn(ctx, specs, densities, aux)
    out = jax.vmap(fn)(parts, scalars)

    # zero out and re-flag halos whose candidate buffer overflowed
    for group in out:
        nb = out[group]["__needs_bigger__"] & (~overflow)
        out[group]["__needs_bigger__"] = nb
    # SO for satellites: computed but masked at assembly (centrals_only)
    return out, overflow


#: jitted single-chunk entry point; the sharded multi-chip path vmaps
#: ``_process_bucket_impl`` over a stacked chunk axis instead
#: (``soap_tpu/parallel/sharded.py``).
_process_bucket = partial(
    jax.jit, static_argnames=("ctx", "specs", "cubes", "boxsize")
)(_process_bucket_impl)


# ---------------------------------------------------------------------------
# Packed bucket outputs.
#
# A bucket's result dict holds hundreds of small per-key arrays (506
# property keys across the production spec list); materializing each one
# is a separate device->host transfer, and over a remote-TPU link those
# transfers — not device compute — dominate wall-clock (isolated bucket
# compute: ~0.1 s; attributed pipeline time: seconds).  The packed path
# concatenates every output into ONE dense pool per dtype family on
# device and unpacks views host-side: <= 4 transfers per bucket
# regardless of how many properties are enabled.
# ---------------------------------------------------------------------------

#: static unpack layouts keyed by the engine-supplied token; written at
#: trace time (once per compiled signature per process)
_PACK_LAYOUTS: Dict[str, List[Tuple[str, str, str, int, int, tuple, object]]] = {}

_POOL_DTYPES = {
    "f32": jnp.float32,
    "f64": jnp.float64,
    "i64": jnp.int64,
    "bool": jnp.bool_,
}


def _pool_for(dtype) -> str:
    if dtype == jnp.bool_:
        return "bool"
    if jnp.issubdtype(dtype, jnp.integer) or jnp.issubdtype(
        dtype, jnp.unsignedinteger
    ):
        return "i64"
    if dtype == jnp.float64:
        return "f64"
    return "f32"


def _process_bucket_packed_impl(
    ctx,
    specs,
    token,
    cubes,
    boxsize,
    chunk,
    centre_hi,
    centre_lo,
    radius_com,
    index,
    search_radius_phys,
    is_central,
    fof_id,
    aux=None,
):
    out, overflow = _process_bucket_impl(
        ctx,
        specs,
        cubes,
        boxsize,
        chunk,
        centre_hi,
        centre_lo,
        radius_com,
        index,
        search_radius_phys,
        is_central,
        fof_id,
        aux,
    )
    layout: List[Tuple[str, str, str, int, int, tuple, object]] = []
    cols = {name: 0 for name in _POOL_DTYPES}
    pieces = {name: [] for name in _POOL_DTYPES}
    for group in out:
        for key, arr in out[group].items():
            pool = _pool_for(arr.dtype)
            B = arr.shape[0]
            flat = arr.reshape(B, -1).astype(_POOL_DTYPES[pool])
            width = flat.shape[1]
            layout.append(
                (group, key, pool, cols[pool], width, arr.shape[1:], arr.dtype)
            )
            cols[pool] += width
            pieces[pool].append(flat)
    _PACK_LAYOUTS[token] = layout
    pools = {
        name: jnp.concatenate(parts, axis=1)
        for name, parts in pieces.items()
        if parts
    }
    return pools, overflow


_process_bucket_packed = partial(
    jax.jit, static_argnames=("ctx", "specs", "token", "cubes", "boxsize")
)(_process_bucket_packed_impl)


def _unpack_bucket(token: str, pools: Dict[str, np.ndarray]):
    """Rebuild {group: {key: array}} from materialized pools."""
    out: Dict[str, Dict[str, np.ndarray]] = {}
    for group, key, pool, col, width, row_shape, dtype in _PACK_LAYOUTS[token]:
        flat = pools[pool][:, col : col + width]
        arr = flat.reshape((flat.shape[0],) + tuple(row_shape)).astype(
            np.dtype(dtype), copy=False
        )
        out.setdefault(group, {})[key] = arr
    return out


def _next_pow2(n: int, floor: int = 256) -> int:
    return max(floor, 1 << int(math.ceil(math.log2(max(n, 1)))))


def min_physical_radius(specs: Sequence[HaloTypeSpec]) -> float:
    """Largest fixed physical radius any spec needs (Mpc).

    The reference clips every halo's read/search radius to the maximum
    ``physical_radius_mpc`` over the property list up front
    (``halo_centres.py:166-227``); without the floor, a 3 Mpc aperture
    sends every small halo through ~6 rounds of the x1.5 retry ladder.
    """
    r = 0.0
    for spec in specs:
        if spec.kind in ("aperture", "projected") and spec.aperture_radius_mpc:
            r = max(r, float(spec.aperture_radius_mpc))
        if spec.kind == "SO" and spec.so_type == "physical" and spec.so_multiple:
            r = max(r, float(spec.so_multiple))
    return r


#: target padded rows per bucket invocation (B * K).  Larger buckets mean
#: fewer device invocations (each costs ~0.5-1 s of dispatch latency over
#: a remote-TPU tunnel, vastly more than the compute) at the price of
#: more padding and peak HBM (~40 bytes/row for the gathered slices).
import os as _os

TARGET_ROWS = int(_os.environ.get("SOAP_TPU_TARGET_ROWS", 8 * 1024 * 1024))
MAX_BATCH = 4096

#: fixed-radius specs LARGER than this (Mpc) run in a separate "wide"
#: pass: the 3 Mpc production apertures would otherwise set the gather
#: capacity K for EVERY spec, making all ~500 property keys stream over
#: rows only the big apertures need.  The narrow pass keeps the
#: SO-presize-driven K (4-16x smaller for typical halos) for ~90% of the
#: keys; the wide pass runs the handful of big-aperture keys at large K.
#: 0 disables the split.
WIDE_RADIUS_MPC = float(_os.environ.get("SOAP_TPU_WIDE_RADIUS", 0.4))


@dataclass
class EngineStats:
    """Scheduling/throughput observability (the analogue of the
    reference's dead-time and per-halo timing instrumentation,
    ``task_queue.py:196-205``, ``--record-halo-timings``)."""

    n_bucket_calls: int = 0
    n_retries: int = 0
    n_overflow: int = 0
    n_copied_specs: int = 0  # aperture-copy optimization hits
    halos_done: int = 0
    # per-spec device seconds (only with record_spec_timings)
    spec_seconds: Dict[str, float] = field(default_factory=dict)
    # per-bucket records: (n_halos, padded_B, capacity_K, cube, seconds)
    bucket_records: List[Tuple[int, int, int, int, float]] = field(
        default_factory=list
    )
    # per-halo timing chunks (record_halo_timings): tuples of
    # (catalogue index, attributed seconds, n_loop) — the analogue of the
    # reference's ``--record-halo-timings`` datasets
    # (``halo_centres.py:183-218``, ``halo_tasks.py:70-194``).  Bucket
    # wall time is attributed to halos proportional to their candidate
    # counts; with async dispatch the split is approximate (queue time
    # lands on the bucket that materializes it).
    halo_timing_chunks: List[Tuple[np.ndarray, np.ndarray, np.ndarray]] = field(
        default_factory=list
    )

    def halo_timings(self) -> Optional[Dict[str, np.ndarray]]:
        """Merged per-halo timings keyed by catalogue index, or None."""
        if not self.halo_timing_chunks:
            return None
        idx = np.concatenate([c[0] for c in self.halo_timing_chunks])
        sec = np.concatenate([c[1] for c in self.halo_timing_chunks])
        loops = np.concatenate([c[2] for c in self.halo_timing_chunks])
        # a halo appears once per engine invocation that covered it;
        # accumulate (satellite/central split runs disjoint subsets)
        uniq, inv = np.unique(idx, return_inverse=True)
        sec_m = np.zeros(len(uniq))
        loop_m = np.zeros(len(uniq), np.int32)
        np.add.at(sec_m, inv, sec)
        np.add.at(loop_m, inv, loops)
        return {"index": uniq, "process_time": sec_m, "n_loop": loop_m}

    @property
    def compute_seconds(self) -> float:
        return sum(r[4] for r in self.bucket_records)

    @property
    def padding_efficiency(self) -> float:
        """Fraction of padded batch lanes holding real halos."""
        lanes = sum(r[1] for r in self.bucket_records)
        real = sum(r[0] for r in self.bucket_records)
        return real / lanes if lanes else 1.0

    def timing_report(self) -> str:
        lines = [
            f"bucket calls: {self.n_bucket_calls}, halos: {self.halos_done}, "
            f"retries: {self.n_retries}, overflow: {self.n_overflow}",
            f"device compute: {self.compute_seconds:.2f}s, "
            f"lane efficiency: {self.padding_efficiency:.1%}",
        ]
        for n, B, K, cube, dt in self.bucket_records:
            lines.append(
                f"  bucket n={n:5d} B={B:5d} K={K:7d} cube={cube:3d} "
                f"{dt:7.3f}s ({n/max(dt,1e-9):9.1f} halos/s)"
            )
        return "\n".join(lines)


class HaloEngine:
    """Orchestrates bucketed processing of all halos in a chunk."""

    def __init__(
        self,
        ctx_base: HaloContext,
        chunk: ChunkData,
        specs: Sequence[HaloTypeSpec],
        aux: Optional[Dict[str, object]] = None,
        record_spec_timings: bool = False,
        record_halo_timings: bool = False,
    ):
        #: when on, every spec runs in its own device program and its
        #: wall time is accumulated in ``stats.spec_seconds`` — the
        #: analogue of the reference's ``--record-property-timings``
        #: (per-property `_time` datasets, README.md:203-211).  Slower
        #: (no cross-spec fusion); for profiling only.
        self.record_spec_timings = record_spec_timings
        #: per-halo process_time / n_loop recording (the analogue of the
        #: reference's ``--record-halo-timings``)
        self.record_halo_timings = record_halo_timings
        self.ctx_base = ctx_base
        self.chunk = chunk
        self.specs = tuple(specs)
        self.aux = (
            {k: jax.tree_util.tree_map(jnp.asarray, v) for k, v in aux.items()}
            if aux
            else {}
        )
        self.stats = EngineStats()

    def _cube_for(self, ptype: str, radius_com: float) -> int:
        pt = self.chunk.ptypes[ptype]
        cell = pt.spec.cell_size[0]
        need = int(math.floor(2.0 * radius_com / cell)) + 2
        need = min(need, pt.spec.dims[0])
        # quantize to limit distinct compilations
        for q in (2, 3, 5, 7, 9, 13, 17, 25, 33, 49, 65, 97, 129, 192, 256):
            if q >= need:
                return min(q, pt.spec.dims[0])
        return pt.spec.dims[0]

    def process(
        self,
        centres: np.ndarray,  # (H, 3) float64 comoving
        search_radius_phys: np.ndarray,  # (H,) physical initial radii
        index: np.ndarray,  # (H,) i64 catalogue indices
        is_central: np.ndarray,  # (H,) bool
        fof_id: np.ndarray,  # (H,) i64
        enclose_radius_phys: Optional[np.ndarray] = None,  # (H,) physical
        specs: Optional[Tuple[HaloTypeSpec, ...]] = None,
    ) -> Dict[str, Dict[str, np.ndarray]]:
        """Process all halos; returns {group: {key: (H, ...) array}}."""
        H = len(index)
        if specs is None:
            specs = self.specs

        # Gather-radius pass split: fixed apertures above WIDE_RADIUS_MPC
        # (the 3 Mpc production spheres) run in their own few-key pass so
        # they do not inflate the gather capacity K of the other ~90% of
        # property keys.  (A finer three-way split — separating the SO
        # presized gather from the bound/small-aperture pass — was
        # measured to be a wash: the extra pass's own radius sort costs
        # what the smaller row sets save.)  copy_from links crossing a
        # boundary are severed (the copy source must be computed in the
        # same pass); radius-property and radius-multiple dependencies
        # stay within their class by construction.
        def _pass_class(s: HaloTypeSpec) -> str:
            if (
                s.kind in ("aperture", "projected")
                and s.aperture_radius_mpc is not None
                and s.aperture_radius_mpc > WIDE_RADIUS_MPC
            ):
                return "wide"
            return "narrow"

        classes: Dict[str, List[HaloTypeSpec]] = {}
        if WIDE_RADIUS_MPC > 0:
            for s in specs:
                classes.setdefault(_pass_class(s), []).append(s)
        if len(classes) > 1:

            def _fix_links(subset):
                groups = {s.group for s in subset}
                return tuple(
                    dataclasses.replace(
                        s, copy_from=None, copy_from_radius_mpc=None
                    )
                    if s.copy_from is not None and s.copy_from not in groups
                    else s
                    for s in subset
                )

            kwargs = dict(
                centres=centres,
                search_radius_phys=search_radius_phys,
                index=index,
                is_central=is_central,
                fof_id=fof_id,
                enclose_radius_phys=enclose_radius_phys,
            )
            merged: Dict[str, Dict[str, np.ndarray]] = {}
            for name in ("narrow", "wide"):
                if name in classes:
                    merged.update(
                        self.process(
                            **kwargs, specs=_fix_links(tuple(classes[name]))
                        )
                    )
            self.stats.halos_done = H
            return merged

        # Satellites never compute centrals-only (SO) specs — split the
        # population so satellite buckets trace a program WITHOUT the SO
        # DAG instead of computing-and-masking it (the batch analogue of
        # the reference's per-halo filter skip, ``SO_properties.py:3627``).
        co_specs = [s for s in specs if s.centrals_only]
        central_mask = np.asarray(is_central, dtype=bool)
        if co_specs and H and not central_mask.all():
            non_co = tuple(s for s in specs if not s.centrals_only)
            cen = np.flatnonzero(central_mask)
            sat = np.flatnonzero(~central_mask)

            def subset(rows, sub_specs):
                if len(rows) == 0 or not sub_specs:
                    return {}
                return self.process(
                    centres[rows],
                    search_radius_phys[rows],
                    index[rows],
                    is_central[rows],
                    fof_id[rows],
                    None
                    if enclose_radius_phys is None
                    else enclose_radius_phys[rows],
                    specs=tuple(sub_specs),
                )

            res_c = subset(cen, specs)
            res_s = subset(sat, non_co)
            merged: Dict[str, Dict[str, np.ndarray]] = {}
            for spec in specs:
                buf = merged.setdefault(spec.group, {})
                for key in spec.keys:
                    src_c = res_c.get(spec.group, {}).get(key)
                    src_s = res_s.get(spec.group, {}).get(key)
                    template = src_c if src_c is not None else src_s
                    full = np.zeros((H,) + template.shape[1:], template.dtype)
                    if src_c is not None:
                        full[cen] = src_c
                    if src_s is not None:
                        full[sat] = src_s
                    buf[key] = full
            self.stats.halos_done = H
            return merged

        ctx0 = self.ctx_base
        a = ctx0.a
        boxsize = self.chunk.boxsize

        # result buffers filled incrementally
        results: Dict[str, Dict[str, np.ndarray]] = {}

        radius_phys = np.maximum(
            search_radius_phys.astype(np.float64), min_physical_radius(specs)
        )
        pending = np.arange(H)
        halo_seconds = np.zeros(H) if self.record_halo_timings else None
        halo_nloop = np.zeros(H, np.int32) if self.record_halo_timings else None

        c_hi, c_lo = geometry.split_hi_lo(centres)

        # SO gather-radius presize: grow central halos' regions until the
        # enclosed mean density is below the *lowest* SO threshold, so the
        # density crossing is inside the first gather (the batched form of
        # the reference's radius-growth loop, ``halo_tasks.py:73-103`` and
        # minimum-target logic ``halo_tasks.py:302-317``).
        so_targets = []
        for spec in specs:
            if spec.kind != "SO":
                continue
            t = spec.target_density(ctx0)
            if t is None:
                continue
            if spec.radius_multiple_of is not None and spec.radius_multiple:
                # e.g. 5xR500_crit: the gather must reach m x R_parent;
                # the mean enclosed density there is at least
                # target_parent / m^3 (mass is non-decreasing in r)
                t = t / float(spec.radius_multiple) ** 3
            so_targets.append(t)
        # margin 1.5: the flow-rate shell reaches 1.05 x R_SO and the
        # crossing interpolation needs particles past the threshold
        # radius, so presize to a slightly lower density target
        target_com = min(so_targets) * a**3 / 1.5 if so_targets else 0.0
        so_eligible = (
            is_central
            if any(s.centrals_only for s in specs if s.kind == "SO")
            else np.ones(H, bool)
        )

        first_round = True
        while len(pending):
            # one fused device round-trip: (first round only) SO
            # gather-radius presizing + exact per-type candidate counts
            radius_dev, counts_dev = presize_and_count(
                self.chunk,
                jnp.asarray(c_hi[pending]),
                jnp.asarray((radius_phys[pending] / a).astype(np.float32)),
                jnp.asarray(so_eligible[pending]),
                jnp.float32(target_com),
                ctx0.ptypes,
                do_presize=bool(so_targets) and first_round,
            )
            radius_com = np.asarray(radius_dev)
            radius_phys[pending] = np.minimum(
                np.maximum(radius_phys[pending], radius_com.astype(np.float64) * a),
                MAX_SEARCH_RADIUS,
            )
            radius_com = (radius_phys[pending] / a).astype(np.float32)
            first_round = False
            totals = np.zeros(len(pending), dtype=np.int64)
            per_type_counts = {}
            for ptype, cnt_dev in zip(ctx0.ptypes, counts_dev):
                cnt = np.asarray(cnt_dev)
                per_type_counts[ptype] = cnt
                totals = totals + cnt

            order = np.argsort(totals)
            next_pending: List[int] = []
            in_flight: List[Dict] = []

            pos = 0
            while pos < len(order):
                # build one bucket: extend along the sorted halos while the
                # padded row budget B * K stays within TARGET_ROWS, where K
                # tracks the bucket's (quantized) maximum candidate count
                n_sel = 1
                cap_total = _next_pow2(int(totals[order[pos]]) + 8)
                while pos + n_sel < len(order) and n_sel < MAX_BATCH:
                    cap_next = _next_pow2(int(totals[order[pos + n_sel]]) + 8)
                    if (n_sel + 1) * max(cap_total, cap_next) > TARGET_ROWS:
                        break
                    cap_total = max(cap_total, cap_next)
                    n_sel += 1
                sel = order[pos : pos + n_sel]
                # pad only to the next power of two of the real count — a
                # small fixed set of (B, K) shapes keeps the jit cache hot
                # without blowing up padded work
                B = _next_pow2(len(sel), 8)
                # capacity per ptype from the bucket's maxima
                caps = []
                for ptype in ctx0.ptypes:
                    caps.append(
                        _next_pow2(int(per_type_counts[ptype][sel].max()) + 8, 128)
                    )
                pos += len(sel)

                bucket_global = pending[sel]
                rcom = radius_com[sel]
                cubes = tuple(
                    self._cube_for(pt, float(rcom.max())) for pt in ctx0.ptypes
                )
                ctx = dataclasses.replace(ctx0, capacities=tuple(caps))

                # pad the batch to B
                nb = len(sel)
                pad = B - nb

                def padded(x, fill=0):
                    x = np.asarray(x)
                    if pad == 0:
                        return x
                    return np.concatenate(
                        [x, np.full((pad,) + x.shape[1:], fill, dtype=x.dtype)]
                    )

                # aperture-copy optimization: when every halo of the
                # bucket is fully enclosed by the next-smaller aperture,
                # compute only the radius-dependent keys and copy the rest
                copied: Dict[str, HaloTypeSpec] = {}
                bucket_specs: List[HaloTypeSpec] = []
                if enclose_radius_phys is not None:
                    max_enclose = float(enclose_radius_phys[bucket_global].max())
                    for spec in specs:
                        if (
                            spec.copy_from is not None
                            and spec.copy_from_radius_mpc is not None
                            and max_enclose <= spec.copy_from_radius_mpc
                        ):
                            copied[spec.group] = spec
                            if spec.strict_keys:
                                bucket_specs.append(
                                    dataclasses.replace(
                                        spec, keys=tuple(spec.strict_keys)
                                    )
                                )
                        else:
                            bucket_specs.append(spec)
                else:
                    bucket_specs = list(specs)
                self.stats.n_copied_specs += len(copied)

                # DISPATCH ONLY — jax execution is asynchronous; bucket
                # programs queue back-to-back on the device and the host
                # keeps building the next bucket.  Materializing outputs
                # here would serialize one device round-trip per bucket
                # (ruinous over a remote-TPU link).
                bucket_args = (
                    cubes,
                    float(boxsize),
                    self.chunk,
                    jnp.asarray(padded(c_hi[bucket_global])),
                    jnp.asarray(padded(c_lo[bucket_global])),
                    jnp.asarray(padded(rcom, 1e-3)),
                    jnp.asarray(padded(index[bucket_global], -1)),
                    jnp.asarray(
                        padded(radius_phys[bucket_global].astype(np.float32), 1e-3)
                    ),
                    jnp.asarray(padded(is_central[bucket_global], False)),
                    jnp.asarray(padded(fof_id[bucket_global], -1)),
                    self.aux,
                )
                t_bucket = time.perf_counter()
                token = None
                if self.record_spec_timings:
                    # profiling mode: one device program per spec, timed
                    # synchronously (radius-multiple specs recompute their
                    # parent so the chain stays inside one program)
                    out = {}
                    overflow = None
                    by_group = {s.group: s for s in bucket_specs}
                    for spec in bucket_specs:
                        tup = (spec,)
                        if spec.radius_multiple_of in by_group:
                            tup = (by_group[spec.radius_multiple_of], spec)
                        t0s = time.perf_counter()
                        o, ov = _process_bucket(ctx, tup, *bucket_args)
                        jax.block_until_ready(o)
                        self.stats.spec_seconds[spec.group] = (
                            self.stats.spec_seconds.get(spec.group, 0.0)
                            + time.perf_counter()
                            - t0s
                        )
                        out[spec.group] = o[spec.group]
                        overflow = ov
                else:
                    # packed dispatch: every property lands in one dense
                    # pool per dtype family, so materialization costs
                    # <= 4 device->host transfers per bucket
                    token = (tuple(bucket_specs), B)
                    out, overflow = _process_bucket_packed(
                        ctx, tuple(bucket_specs), token, *bucket_args
                    )
                self.stats.n_bucket_calls += 1
                in_flight.append(
                    dict(
                        bucket_global=bucket_global,
                        nb=nb,
                        B=B,
                        caps=caps,
                        cubes=cubes,
                        out=out,
                        token=token,
                        overflow=overflow,
                        t_dispatch=t_bucket,
                        halo_counts=totals[sel],
                    )
                )

            # ---- materialize all buckets of this round at once ----
            for fl in in_flight:
                bucket_global = fl["bucket_global"]
                nb = fl["nb"]
                if fl["token"] is not None:
                    pools = {k: np.asarray(v) for k, v in fl["out"].items()}
                    out = _unpack_bucket(fl["token"], pools)
                else:
                    out = fl["out"]
                overflow_h = np.asarray(fl["overflow"])[:nb]
                dt_bucket = time.perf_counter() - fl["t_dispatch"]
                self.stats.bucket_records.append(
                    (nb, fl["B"], sum(fl["caps"]), max(fl["cubes"]), dt_bucket)
                )
                if halo_seconds is not None:
                    # attribute bucket wall time ~ candidate-count share
                    w = fl["halo_counts"].astype(np.float64) + 1.0
                    halo_seconds[bucket_global] += dt_bucket * w / w.sum()
                    halo_nloop[bucket_global] += 1
                # resolve per-bucket outputs in spec order so copied
                # apertures can chain off earlier (possibly also copied)
                # apertures
                needs = np.zeros(nb, dtype=bool)
                bucket_out: Dict[str, Dict[str, np.ndarray]] = {}
                for spec in specs:
                    g = out.get(spec.group, {})
                    source = bucket_out.get(spec.copy_from or "", {})
                    res: Dict[str, np.ndarray] = {}
                    for key in spec.keys:
                        if key in g:
                            res[key] = np.asarray(g[key])[:nb]
                        else:
                            res[key] = source[key]
                    if "__needs_bigger__" in g:
                        res["__needs_bigger__"] = np.asarray(
                            g["__needs_bigger__"]
                        )[:nb]
                    else:
                        res["__needs_bigger__"] = source["__needs_bigger__"]
                    bucket_out[spec.group] = res

                for spec in specs:
                    res = bucket_out[spec.group]
                    needs |= res["__needs_bigger__"]
                    buf = results.setdefault(spec.group, {})
                    for key in spec.keys:
                        arr = res[key]
                        if key not in buf:
                            buf[key] = np.zeros((H,) + arr.shape[1:], arr.dtype)
                        if spec.centrals_only:
                            arr = np.where(
                                _expand_mask(
                                    is_central[bucket_global], arr.shape
                                ),
                                arr,
                                0,
                            )
                        buf[key][bucket_global] = arr

                retry = overflow_h | (
                    needs & (radius_phys[bucket_global] < MAX_SEARCH_RADIUS)
                )
                self.stats.n_overflow += int(overflow_h.sum())
                if retry.any():
                    grown = bucket_global[retry]
                    radius_phys[grown] *= READ_RADIUS_FACTOR
                    next_pending.extend(grown.tolist())
                    self.stats.n_retries += len(grown)

            pending = np.array(sorted(next_pending), dtype=np.int64)

        if halo_seconds is not None:
            self.stats.halo_timing_chunks.append(
                (np.asarray(index, np.int64).copy(), halo_seconds, halo_nloop)
            )
        self.stats.halos_done = H
        return results


def _expand_mask(mask_1d: np.ndarray, shape) -> np.ndarray:
    m = np.asarray(mask_1d, dtype=bool)
    return m.reshape((-1,) + (1,) * (len(shape) - 1))
