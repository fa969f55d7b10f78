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
import logging
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

_log = logging.getLogger(__name__)

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


@jax.tree_util.register_pytree_node_class
class _FamilyStack:
    """Family-blocked outputs kept stacked over the member axis.

    The per-member unpack used to happen at trace time — one slice +
    reshape per (member, key), thousands of HLO ops per program (the
    dominant graph-size term: 7k ops in the 38-calculation hydro
    program).  The stack now rides through the output pools whole and
    members become column offsets in the host-side unpack layout.
    """

    def __init__(self, groups, data):
        self.groups = tuple(groups)
        self.data = dict(data)

    def tree_flatten(self):
        names = tuple(sorted(self.data))
        return tuple(self.data[n] for n in names), (self.groups, names)

    @classmethod
    def tree_unflatten(cls, aux, children):
        groups, names = aux
        return cls(groups, dict(zip(names, children)))


class _MemberView:
    """Lazy per-member view into a family stack for the ``prior``
    chain: only the scalars a dependent spec actually reads are
    sliced out of the stack."""

    __slots__ = ("_data", "_i")

    def __init__(self, data, i):
        self._data, self._i = data, i

    def __getitem__(self, key):
        return self._data[key][self._i]


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


def _spec_truncatable(spec: HaloTypeSpec) -> bool:
    """Specs whose particle needs are bounded by
    max(EncloseRadius, fixed aperture radius): BoundSubhalo (bound rows
    only), fixed-radius exclusive/inclusive apertures (members + ALL
    bound rows for the inertia ellipsoids,
    ``aperture_properties.py:3596-3610``), and projected apertures
    (bound rows only).  SO (the ellipsoid may deform past R_SO and the
    density crossing needs the full gathered profile) and
    radius-property apertures (dynamic radius) need every row."""
    if spec.kind == "bound":
        return True
    return (
        spec.kind in ("aperture", "projected")
        and spec.radius_property is None
    )


def _halo_fn(
    ctx: HaloContext,
    specs: Tuple[HaloTypeSpec, ...],
    densities,
    aux=None,
    trunc: Optional[int] = None,
):
    """Single-halo property evaluation over all specs (vmapped later).

    ``aux`` holds shared non-batched device constants (e.g. the cosmology
    age table); it is closed over, NOT vmapped.

    ``trunc`` (static): sorted-prefix row truncation.  The bucket's rows
    are radius-sorted anyway (the shared sort); every spec whose
    particle needs are bounded by max(EncloseRadius, aperture radius)
    (``_spec_truncatable``) then runs on the FIRST ``trunc`` sorted rows
    — pure prefix slices of the sort outputs (velocities ride the sort
    as payloads) — instead of the full gather capacity K.  The host
    sizes ``trunc`` from summed-area-table counts at that radius, so the
    prefix provably covers every row inside it; a cheap bound-count
    cross-check flags (-> retry untruncated) halos whose catalogue
    EncloseRadius lied.  The DAG's masked reductions are HBM-bandwidth
    bound at (B, lanes, K) working-set scale, so their cost scales
    directly with the row count.
    """
    blocks: List[Tuple[Optional[tuple], List[Tuple[HaloTypeSpec, object]]]] = []
    for spec, dens in zip(specs, densities):
        sig = _block_signature(spec, dens)
        if sig is not None and blocks and blocks[-1][0] == sig:
            blocks[-1][1].append((spec, dens))
        else:
            blocks.append((sig, [(spec, dens)]))

    ctx_b = (
        dataclasses.replace(ctx, capacities=(trunc,))
        if trunc is not None
        else None
    )

    def fn(parts: HaloParticles, scalars: HaloScalars):
        out = {}
        prior = {}
        # ONE radius sort serves every 3D slice family of this program
        # (the sort + payload gathers dominate device time at large K)
        from soap_tpu.models.halo_slice import shared_sort_artifacts

        shared = shared_sort_artifacts(
            parts, scalars, ctx, vel_payload=trunc is not None
        )

        if trunc is not None:
            kb = trunc
            bound_b = shared["_bound_sorted"][:kb]
            parts_b = HaloParticles(
                valid=shared["_valid_sorted"][:kb],
                mass=shared["_m_sorted"][:kb],
                pos=shared["_pos_sorted"][:kb],
                vel=shared["_vel_sorted"][:kb],
                # exact for the one consumer (bound_mask, seeded below);
                # full group labels are an SO-only need and SO never
                # truncates
                groupnr=jnp.where(
                    bound_b, scalars.index, jnp.int64(-1)
                ),
                fofid=jnp.full((kb,), -1, jnp.int64),
                softening=parts.softening[:kb],
                fields={},
            )
            shared_b = {
                "radius": shared["_r_sorted"][:kb],
                "_rsort_order": jnp.arange(kb, dtype=jnp.int32),
                "_r_sorted": shared["_r_sorted"][:kb],
                "_m_sorted": parts_b.mass,
                "_bound_sorted": bound_b,
                "_pos_sorted": parts_b.pos,
                "_valid_sorted": parts_b.valid,
                "bound_mask": bound_b,
            }
            # catalogue-EncloseRadius cross-check: a bound row past the
            # prefix means the finder's radius lied — retry untruncated
            trunc_bad = jnp.sum(
                shared["_bound_sorted"].astype(jnp.int32)
            ) > jnp.sum(bound_b.astype(jnp.int32))
        else:
            parts_b = None
            shared_b = None
            trunc_bad = None

        def pick(spec_kind_truncatable):
            if trunc is not None and spec_kind_truncatable:
                return ctx_b, parts_b, shared_b, True
            return ctx, parts, shared, False

        def seed(s, spec, shr):
            if spec.kind != "projected":
                s.__dict__.update(shr)
            elif "bound_mask" in shr:
                s.__dict__["bound_mask"] = shr["bound_mask"]
            return s

        def flag_bad(res, truncated):
            if truncated and trunc_bad is not None:
                res["__needs_bigger__"] = res["__needs_bigger__"] | trunc_bad
            return res

        for sig, members in blocks:
            if sig is None or len(members) == 1:
                for spec, dens in members:
                    cx, pr, shr, truncated = pick(_spec_truncatable(spec))
                    s = seed(
                        _make_slice(spec, cx, pr, scalars, prior, dens, aux),
                        spec,
                        shr,
                    )
                    res = flag_bad(
                        compute_properties(s, spec.keys), truncated
                    )
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
            cx, pr, shr, truncated = pick(_spec_truncatable(spec0))

            def one(p):
                if kind == "SO":
                    s = SOSlice(
                        cx,
                        pr,
                        scalars,
                        target_density=p,
                        aux=aux,
                        core_excision_fraction=spec0.core_excision_fraction,
                    )
                    s.__dict__.update(shr)
                elif kind == "aperture":
                    s = ApertureSlice(
                        cx, pr, scalars, p, spec0.inclusive, aux=aux
                    )
                    s.__dict__.update(shr)
                else:
                    s = ProjectedApertureSlice(
                        cx, pr, scalars, p, spec0.axis, aux=aux
                    )
                    if truncated:
                        s.__dict__["bound_mask"] = shr["bound_mask"]
                return compute_properties(s, keys)

            stacked = jax.vmap(one)(pvec)
            if truncated and trunc_bad is not None:
                stacked["__needs_bigger__"] = (
                    stacked["__needs_bigger__"] | trunc_bad
                )
            groups = tuple(spec.group for spec, _ in members)
            for i, (spec, _) in enumerate(members):
                prior[spec.group] = _MemberView(stacked, i)
            out["\x00" + groups[0]] = _FamilyStack(
                groups, {k: v[: len(members)] for k, v in stacked.items()}
            )
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
    dma_s: Optional[int] = None,  # static: DMA-gather sub-block rows
    trunc: Optional[int] = None,  # static: sorted-prefix row truncation
):
    """One padded bucket: gather + all property calculations."""
    a = jnp.float32(ctx.a)

    from soap_tpu.pipeline.chunk_data import unpack_field

    parts_per_type = []
    overflow = jnp.zeros(centre_hi.shape[0], dtype=bool)
    fields_concat: Dict[str, jnp.ndarray] = {}
    for ptype, cap, cube in zip(ctx.ptypes, ctx.capacities, cubes):
        pt = chunk.ptypes[ptype]

        if dma_s is not None:
            # run-length DMA gather: copy whole sub-blocks of each
            # halo's contiguous cell ranges with the DMA engines
            # (ops/dma_gather.py) instead of one random access per row —
            # the XLA row gather runs at ~0.7 GB/s on v5e and dominates
            # large buckets.  The small i64 block rides a companion XLA
            # gather on the same layout so row slots stay aligned.
            from soap_tpu.ops.dma_gather import (
                merge_adjacent_ranges,
                range_gather_rows,
            )

            def ranges(c_hi, r):
                s, c = halo_cell_ranges(
                    pt.spec, pt.offsets, pt.counts, c_hi, r, cube
                )
                # z-runs of the cube are contiguous in the cell-sorted
                # store: coalescing them cuts per-range padding (the
                # destination slack) and the DMA count by ~cube/2
                return merge_adjacent_ranges(s, c)

            starts, counts = jax.vmap(ranges)(centre_hi, radius_com)
            gf, valid, src_rows, total = range_gather_rows(
                pt.packed_f,
                starts,
                counts,
                dma_s,
                cap,
                # CPU (SOAP_TPU_DMA_GATHER=1 in tests): identical layout
                # through the XLA fallback — the layout contract is what
                # the equality tests pin; the kernel itself needs TPU
                use_dma=jax.devices()[0].platform != "cpu",
            )
            overflow = overflow | (total > cap)
            gi = (
                jnp.take(pt.packed_i, src_rows, axis=0)
                if pt.packed_i is not None
                else None
            )
            idx = src_rows
        else:

            def one(c_hi, r):
                starts, counts = halo_cell_ranges(
                    pt.spec, pt.offsets, pt.counts, c_hi, r, cube
                )
                return expand_ranges(starts, counts, cap)

            idx, valid, total = jax.vmap(one)(centre_hi, radius_com)
            overflow = overflow | (total > cap)

            # TWO gathers per ptype: all f32 columns and all i64 columns
            # ride one packed row block each (TPU gathers are
            # per-row-bound; the previous one-gather-per-field layout
            # was the dominant cost)
            gf = gather_rows(pt.packed_f, idx)  # (B, K, Ff)
            gi = (
                gather_rows(pt.packed_i, idx)
                if pt.packed_i is not None
                else None
            )

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
    fn = _halo_fn(ctx, specs, densities, aux, trunc=trunc)
    out = jax.vmap(fn)(parts, scalars)

    # zero out and re-flag halos whose candidate buffer overflowed
    for group, res in out.items():
        if isinstance(res, _FamilyStack):
            res.data["__needs_bigger__"] = res.data["__needs_bigger__"] & (
                ~overflow[:, None]
            )
        else:
            res["__needs_bigger__"] = res["__needs_bigger__"] & (~overflow)
    # SO for satellites: computed but masked at assembly (centrals_only)
    return out, overflow


#: process-wide AOT bucket-program cache: (store/mesh key, signature) ->
#: compiled executable.  Engines are constructed per chunk; this cache
#: (with shape-quantized stores) is what makes chunk N+1 reuse chunk N's
#: compiled programs.
_AOT_CACHE: Dict[tuple, object] = {}


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


def _process_bucket_packed_multi_impl(
    ctx,
    specs,
    token,
    cubes,
    boxsize,
    stacked,  # ChunkData with a leading chunk axis on every array
    centre_hi,  # (C, B, 3)
    centre_lo,
    radius_com,
    index,
    search_radius_phys,
    is_central,
    fof_id,
    aux=None,
    dma_s=None,
    trunc=None,
):
    """The bucket program vmapped over the chunk axis, with packed
    output pools.

    Mesh engines run this body under ``jax.shard_map`` (one call per
    device on its local (chunk, halo) block — see
    ``HaloEngine._aot_compile``), so every device gathers from its own
    chunk's particle store for its own halo lanes with no collectives,
    and ``dma_s`` (static) drives the run-length DMA-gather Pallas
    kernel per device.  On a single device the C=1 vmap is free; the
    un-meshed multi-chunk path keeps the XLA gather (a Pallas call
    cannot ride the chunk-axis vmap).  Output pools are (C, B, cols) —
    still <= 4 device->host transfers per bucket.
    """
    f = partial(_process_bucket_impl, ctx, specs, cubes, boxsize)
    C = centre_hi.shape[0]
    if C == 1 and dma_s is not None:
        out, overflow = f(
            jax.tree_util.tree_map(lambda x: x[0], stacked),
            centre_hi[0],
            centre_lo[0],
            radius_com[0],
            index[0],
            search_radius_phys[0],
            is_central[0],
            fof_id[0],
            aux,
            dma_s=dma_s,
            trunc=trunc,
        )
        # pack WITHOUT the chunk axis, add it once on the <=4 pools
        # (lifting every key costs ~1k broadcast ops in the graph)
        pools = _pack_pools(out, token, lead=1)
        pools = {name: p[None] for name, p in pools.items()}
        return pools, overflow[None]
    out, overflow = jax.vmap(
        partial(f, dma_s=None, trunc=trunc), in_axes=(0,) * 8 + (None,)
    )(
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
    return _pack_pools(out, token, lead=2), overflow


def _pack_pools(out, token, lead):
    """Concatenate bucket outputs into one dense pool per dtype family.

    ``lead`` = number of leading batch axes on every output array
    ((B,) on the un-vmapped C==1 path, (C, B) under the chunk vmap);
    the unpack layout is written per member key either way.
    """
    layout: List[Tuple[str, str, str, int, int, tuple, object]] = []
    cols = {name: 0 for name in _POOL_DTYPES}
    pieces = {name: [] for name in _POOL_DTYPES}
    for group, val in out.items():
        if isinstance(val, _FamilyStack):
            # stacked family: ONE flatten per key; members become
            # column offsets in the host-side unpack layout
            for key, arr in val.data.items():
                pool = _pool_for(arr.dtype)
                n = arr.shape[lead]
                row_shape = arr.shape[lead + 1 :]
                wpm = 1
                for d in row_shape:
                    wpm *= int(d)
                flat = arr.reshape(arr.shape[:lead] + (-1,)).astype(
                    _POOL_DTYPES[pool]
                )
                for i, grp in enumerate(val.groups):
                    layout.append(
                        (
                            grp,
                            key,
                            pool,
                            cols[pool] + i * wpm,
                            wpm,
                            row_shape,
                            arr.dtype,
                        )
                    )
                cols[pool] += wpm * n
                pieces[pool].append(flat)
            continue
        for key, arr in val.items():
            pool = _pool_for(arr.dtype)
            flat = arr.reshape(arr.shape[:lead] + (-1,)).astype(
                _POOL_DTYPES[pool]
            )
            width = flat.shape[lead]
            layout.append(
                (
                    group,
                    key,
                    pool,
                    cols[pool],
                    width,
                    arr.shape[lead:],
                    arr.dtype,
                )
            )
            cols[pool] += width
            pieces[pool].append(flat)
    _PACK_LAYOUTS[token] = layout
    return {
        name: jnp.concatenate(parts, axis=lead)
        for name, parts in pieces.items()
        if parts
    }


_process_bucket_packed_multi = partial(
    jax.jit,
    static_argnames=(
        "ctx", "specs", "token", "cubes", "boxsize", "dma_s", "trunc",
    ),
)(_process_bucket_packed_multi_impl)


def _unpack_bucket_multi(token: str, pools: Dict[str, np.ndarray]):
    """Rebuild {group: {key: (C, B, ...) array}} from (C, B, cols) pools."""
    out: Dict[str, Dict[str, np.ndarray]] = {}
    for group, key, pool, col, width, row_shape, dtype in _PACK_LAYOUTS[token]:
        flat = pools[pool][:, :, col : col + width]
        arr = flat.reshape(flat.shape[:2] + tuple(row_shape)).astype(
            np.dtype(dtype), copy=False
        )
        out.setdefault(group, {})[key] = arr
    return out


def _next_pow2(n: int, floor: int = 256) -> int:
    return max(floor, 1 << int(math.ceil(math.log2(max(n, 1)))))


def _quantize_cap(n: int, S: int, floor: int = 128) -> int:
    """Quarter-pow2 row capacity >= n, a multiple of max(128, S).

    The DMA-gather layout slack would otherwise routinely push a
    just-under-pow2 candidate count over the boundary and DOUBLE the
    bucket's row count; quarter steps cap the padding at 25% for a
    modest increase in distinct compiled shapes."""
    q = max(128, S)
    n = max(n, floor, q)
    k = 1 << int(math.ceil(math.log2(n)))
    for c in (k // 2 + k // 8, k // 2 + k // 4, k // 2 + 3 * (k // 8), k):
        if c >= n and c % q == 0:
            return c
    return k


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
    #: retry attribution: {spec group: halos flagged needs_bigger}
    retry_groups: Dict[str, int] = field(default_factory=dict)
    n_overflow: int = 0
    n_copied_specs: int = 0  # aperture-copy optimization hits
    halos_done: int = 0
    #: wall seconds spent in (parallel) AOT bucket-program compilation;
    #: persistent-cache hits make this near zero on warm starts
    compile_seconds: float = 0.0
    #: wall seconds inside ``HaloEngine.process`` (device compute +
    #: dispatch, excluding IO/staging) accumulated by ``process_chunks``
    #: — the engine-only denominator for pipeline-level throughput
    process_seconds: float = 0.0
    # per-spec device seconds (only with record_spec_timings)
    spec_seconds: Dict[str, float] = field(default_factory=dict)
    # per-halo per-spec attribution (record_spec_timings): tuples of
    # (group, catalogue index array, attributed seconds) — feeds the
    # reference's per-property ``_time`` catalogue datasets
    # (``aperture_properties.py:4226-4242``, README.md:203-211)
    spec_halo_chunks: List[Tuple[str, np.ndarray, np.ndarray]] = field(
        default_factory=list
    )

    def property_timings(self) -> Dict[str, Dict[int, float]]:
        """{group: {catalogue index: seconds}} from the per-spec runs."""
        out: Dict[str, Dict[int, float]] = {}
        for group, idx, sec in self.spec_halo_chunks:
            d = out.setdefault(group, {})
            for i, s in zip(idx.tolist(), sec.tolist()):
                d[i] = d.get(i, 0.0) + s
        return out
    # per-bucket records:
    # (n_halos, padded_B, capacity_K, cube, seconds, trunc_K or 0)
    bucket_records: List[Tuple[int, int, int, int, float, int]] = field(
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
            f"retries: {self.n_retries}, overflow: {self.n_overflow}"
            + (
                f", retry groups: {self.retry_groups}"
                if self.retry_groups
                else ""
            ),
            f"device compute: {self.compute_seconds:.2f}s, "
            f"lane efficiency: {self.padding_efficiency:.1%}, "
            f"compile: {self.compile_seconds:.1f}s",
        ]
        for n, B, K, cube, dt, trunc in self.bucket_records:
            lines.append(
                f"  bucket n={n:5d} B={B:5d} K={K:7d} cube={cube:3d} "
                f"Kb={trunc:7d} {dt:7.3f}s ({n/max(dt,1e-9):9.1f} halos/s)"
            )
        return "\n".join(lines)


class StagedStore:
    """A chunk store already stacked and device-resident.

    Produced by ``HaloEngine.stage`` (typically from a prefetch/reader
    thread so the host->device transfer of chunk N+1 overlaps chunk N's
    compute — the TPU analogue of the reference's parallel reader ranks
    filling node shared memory, ``swift_cells.py:548-734``); accepted by
    ``HaloEngine`` in place of raw ``ChunkData``.
    """

    __slots__ = ("stacked", "C")

    def __init__(self, stacked, C: int):
        self.stacked = stacked
        self.C = C


class HaloEngine:
    """Unified bucketed orchestrator over ``C`` chunks x ``B`` halos.

    ONE orchestrator serves both execution modes (the reference's two
    parallelism levels, ``SOAP/core/task_queue.py:63-216`` +
    ``SOAP/core/halo_tasks.py:319-357``):

     - single device: ``mesh=None``; the chunk axis is a free C=1 vmap;
     - multi-chip: a ``('chunks', 'halos')`` ``jax.sharding.Mesh``; the
       stacked chunk stores are sharded along ``'chunks'`` (replicated
       across the ``'halos'`` sub-axis — the TPU analogue of one
       shared-memory copy per node) and halo batches along both axes.
       Per-halo work is embarrassingly parallel, so bucket programs run
       without collectives.

    All production features run in both modes: SO gather presizing,
    exact candidate counting, wide/narrow gather-radius pass split,
    satellite/central population phases (satellite buckets trace a
    program WITHOUT the centrals-only SO DAG), the aperture-copy
    optimization, packed <=4-transfer output pools, the
    ``needs_bigger``/overflow x1.5 retry ladder, and per-halo timing
    attribution.  Bucket programs are AOT-compiled; distinct signatures
    of a round compile CONCURRENTLY in a thread pool (XLA releases the
    GIL), so warmup wall-clock approaches the slowest single compile
    instead of the sum.
    """

    def __init__(
        self,
        ctx_base: HaloContext,
        chunks,  # ChunkData or Sequence[ChunkData]
        specs: Sequence[HaloTypeSpec],
        aux: Optional[Dict[str, object]] = None,
        mesh=None,  # Optional[jax.sharding.Mesh] with ('chunks','halos')
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
        if isinstance(chunks, StagedStore):
            # pre-staged from a prefetch thread (``HaloEngine.stage``):
            # the store already carries the leading chunk axis and lives
            # on device — the device_puts below are no-ops, so engine
            # construction costs nothing and the host->device transfer
            # overlapped the PREVIOUS chunk's compute
            stacked = chunks.stacked
            self._single_chunk_api = chunks.C == 1
            self.C = chunks.C
        else:
            single = isinstance(chunks, ChunkData)
            chunk_list = [chunks] if single else list(chunks)
            self._single_chunk_api = single
            self.C = len(chunk_list)
            from soap_tpu.parallel.sharded import stack_chunks

            stacked = stack_chunks(chunk_list)
        self.mesh = mesh
        self.boxsize = stacked.boxsize
        self._grid_specs = {
            name: stacked.ptypes[name].spec for name in stacked.ptypes
        }
        # NOTE on parameter layouts: XLA's auto-layout picks (0, 2, 1)
        # for the (C, N, F) packed store, which costs one whole-store
        # relayout copy inside every bucket call (~9 ms on the bench
        # store).  Pinning the parameter layout row-major (via
        # jax.experimental.layout.Format) removes those copies but was
        # measured a net LOSS: per-program compile time tripled
        # (~110s vs ~35s on v5e-over-axon) for a within-noise timed-pass
        # delta (820 vs 837 halos/s), so the pin was removed.
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            assert mesh.shape["chunks"] == self.C, (
                f"need one chunk per 'chunks' mesh slice: {self.C} chunks "
                f"vs mesh {dict(mesh.shape)}"
            )
            self._chunk_sharding = NamedSharding(mesh, P("chunks"))
            self._halo_sharding = NamedSharding(mesh, P("chunks", "halos"))
            self._replicated = NamedSharding(mesh, P())
            self.stacked = jax.device_put(stacked, self._chunk_sharding)
            self._halos_quant = mesh.shape["halos"]
        else:
            self._chunk_sharding = None
            self._halo_sharding = None
            self._replicated = None
            # stage_ptype/stack_chunks keep the store host-resident;
            # this is the ONE host->device transfer of the chunk
            self.stacked = jax.device_put(stacked)
            self._halos_quant = 1
        aux_tree = (
            {k: jax.tree_util.tree_map(jnp.asarray, v) for k, v in aux.items()}
            if aux
            else {}
        )
        self.aux = (
            jax.device_put(aux_tree, self._replicated)
            if mesh is not None and aux_tree
            else aux_tree
        )
        self.specs = tuple(specs)
        self.stats = EngineStats()
        #: narrow-pass results serving as copy sources for the wide
        #: gather pass (set only between the two passes of one
        #: ``process`` call); list per chunk of {group: {key: (H,...)}}
        self._cross_copy_sources = None
        # AOT programs live in a GLOBAL cache keyed by (store shapes,
        # mesh, signature): one engine is built per chunk, and staged row
        # counts are shape-quantized precisely so successive chunks reuse
        # compiled programs instead of re-lowering per chunk
        mesh_key = (
            None
            if mesh is None
            else (
                tuple(mesh.shape.items()),
                tuple(d.id for d in np.asarray(mesh.devices).flat),
            )
        )

        def _shapes(tree):
            return (
                jax.tree_util.tree_structure(tree),
                tuple(
                    (l.shape, str(l.dtype))
                    for l in jax.tree_util.tree_leaves(tree)
                ),
            )

        # ---- run-length DMA gather (ops/dma_gather.py) ----
        # "auto": on when targeting real TPU hardware.  Mesh engines run
        # the bucket body under shard_map (see _aot_compile), so the
        # Pallas kernel executes per device on its local (chunk, halo)
        # shard; un-meshed multi-chunk engines keep the XLA gather (the
        # chunk-axis vmap cannot carry a Pallas call).  "0" forces off,
        # "1" forces on (any backend — the layout-identical XLA fallback
        # runs where the kernel cannot).
        dma_env = _os.environ.get("SOAP_TPU_DMA_GATHER", "auto")
        use_dma = (
            dma_env == "1"
            or (
                dma_env != "0"
                and (self.C == 1 or mesh is not None)
                and jax.devices()[0].platform in ("tpu", "axon")
            )
        )
        #: static DMA sub-block rows (None = XLA row gather)
        self._dma_s = (
            int(_os.environ.get("SOAP_TPU_DMA_S", 64)) if use_dma else None
        )

        self._prog_key = (
            _shapes(self.stacked),
            _shapes(self.aux),
            mesh_key,
            float(self.boxsize),
            self._dma_s,
        )

    # -- helpers ---------------------------------------------------------

    def free(self) -> None:
        """Release the device-resident chunk store deterministically.

        The store is the engine's dominant HBM footprint; Python GC of
        pytree/closure cycles can delay its release past the NEXT
        chunk's staging (observed as RESOURCE_EXHAUSTED on back-to-back
        production runs).  Call after the last ``process`` of a chunk.
        """
        for leaf in jax.tree_util.tree_leaves(self.stacked):
            if hasattr(leaf, "delete"):
                try:
                    leaf.delete()
                except Exception:
                    pass
        self.stacked = None

    @staticmethod
    def stage(chunks, mesh=None, block: bool = True) -> "StagedStore":
        """Stack + upload a chunk store ahead of engine construction.

        Call from a reader/prefetch thread so the transfer overlaps the
        previous chunk's device compute (``jax.device_put`` dispatch is
        thread-safe); pass the result to ``HaloEngine`` as ``chunks``.
        Peak HBM holds two chunk stores during the overlap window.
        """
        single = isinstance(chunks, ChunkData)
        chunk_list = [chunks] if single else list(chunks)
        from soap_tpu.parallel.sharded import stack_chunks

        stacked = stack_chunks(chunk_list)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            staged = jax.device_put(stacked, NamedSharding(mesh, P("chunks")))
        else:
            staged = jax.device_put(stacked)
        if block:
            jax.block_until_ready(jax.tree_util.tree_leaves(staged))
        return StagedStore(staged, len(chunk_list))

    def _cube_for(self, ptype: str, radius_com: float) -> int:
        spec = self._grid_specs[ptype]
        cell = spec.cell_size[0]
        need = int(math.floor(2.0 * radius_com / cell)) + 2
        need = min(need, spec.dims[0])
        # quantize to limit distinct compilations
        for q in (2, 3, 5, 7, 9, 13, 17, 25, 33, 49, 65, 97, 129, 192, 256):
            if q >= need:
                return min(q, spec.dims[0])
        return spec.dims[0]

    def _put_halos(self, x: np.ndarray) -> jnp.ndarray:
        if self._halo_sharding is not None:
            return jax.device_put(jnp.asarray(x), self._halo_sharding)
        return jnp.asarray(x)

    def _avatar(self, tree, sharding):
        def leaf(x):
            s = None if sharding is None else sharding
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=s)

        return jax.tree_util.tree_map(leaf, tree)

    def _aot_lower(self, ctx, bucket_specs, token, cubes, B, dma_s, trunc):
        """Lower one bucket program.

        MUST be called from one thread at a time: concurrent lowering
        produces interleaving-dependent MLIR (measured: 2 of 6 bench
        programs hash differently run-to-run when lowered from a
        6-worker pool), which silently changes the persistent-cache key
        every process — the round-3 bench paid full cold compile on
        every run because of exactly this.  ``_precompile`` therefore
        lowers sequentially and parallelizes only ``compile()``.
        """
        C = self.C
        f32 = jnp.float32

        def halo_av(shape, dtype):
            return jax.ShapeDtypeStruct(shape, dtype, sharding=self._halo_sharding)

        stacked_av = self._avatar(self.stacked, self._chunk_sharding)
        aux_av = self._avatar(self.aux, self._replicated)
        halo_avs = (
            halo_av((C, B, 3), f32),
            halo_av((C, B, 3), f32),
            halo_av((C, B), f32),
            halo_av((C, B), jnp.int64),
            halo_av((C, B), f32),
            halo_av((C, B), jnp.bool_),
            halo_av((C, B), jnp.int64),
        )
        if self.mesh is not None:
            # shard_map instead of GSPMD auto-partitioning: each device
            # runs the C==1 single-shard bucket body on its local
            # (chunk, halo) block, so the run-length DMA-gather Pallas
            # kernel executes PER DEVICE (under the chunk-axis vmap
            # GSPMD would replicate a Pallas call rather than partition
            # it — the mesh path previously fell back to the XLA row
            # gather).  Per-halo work has no cross-device dependencies,
            # so in/out specs are plain block shardings.
            from jax.sharding import PartitionSpec as _P

            body = partial(
                _process_bucket_packed_multi_impl,
                ctx,
                bucket_specs,
                token,
                cubes,
                float(self.boxsize),
            )
            hs = _P("chunks", "halos")
            smapped = jax.shard_map(
                lambda stacked, *args: body(
                    *(stacked,) + args, dma_s=dma_s, trunc=trunc
                ),
                mesh=self.mesh,
                in_specs=((_P("chunks"),) + (hs,) * 7 + (_P(),)),
                out_specs=(hs, hs),
                # the body is collective-free by design (per-halo work is
                # embarrassingly parallel); skip varying-axis tracking,
                # which rejects while_loop carries mixing device-varying
                # data with replicated loop constants
                check_vma=False,
            )
            lowered = jax.jit(smapped).lower(
                stacked_av, *halo_avs, aux_av
            )
        else:
            lowered = _process_bucket_packed_multi.lower(
                ctx,
                bucket_specs,
                token,
                cubes,
                float(self.boxsize),
                stacked_av,
                *halo_avs,
                aux_av,
                dma_s,
                trunc,
            )
        return lowered

    def _aot_compile(
        self, sig, ctx, bucket_specs, token, cubes, B, dma_s, trunc,
        lowered=None,
    ):
        """Lower (unless pre-lowered) + compile one bucket program.

        ``compile()`` is thread-safe and releases the GIL; lowering is
        NOT reproducible under concurrency (see ``_aot_lower``) — pass
        ``lowered`` when calling from a worker pool."""
        cache_key = (self._prog_key, sig)
        if cache_key in _AOT_CACHE:
            return _AOT_CACHE[cache_key]
        t_lower = time.perf_counter()
        if lowered is None:
            lowered = self._aot_lower(
                ctx, bucket_specs, token, cubes, B, dma_s, trunc
            )
        t0 = time.perf_counter()
        dt_lower = t0 - t_lower
        # streamed start marker: a driver watching stderr can tell a
        # long compile from a hung device (VERDICT r3: a silent warmup
        # was killed with no diagnosable tail)
        _log.info(
            "compiling bucket program B=%d C=%d sig#%08x ...",
            B,
            self.C,
            hash(sig) & 0xFFFFFFFF,
        )
        compiled = lowered.compile()
        dt = time.perf_counter() - t0
        # heuristic persistent-cache classification: a real XLA compile
        # of a bucket program takes tens of seconds; a disk-cache hit
        # deserializes in well under 3.  Lowering (the Python trace) is
        # reported separately: the persistent cache cannot skip it, and
        # concurrent lowers serialize on the GIL.
        _log.info(
            "compiled bucket program B=%d C=%d: lower %.1fs, compile "
            "%.1fs (%s)",
            B,
            self.C,
            dt_lower,
            dt,
            "persistent-cache hit" if dt < 3.0 else "cache miss",
        )
        _AOT_CACHE[cache_key] = compiled
        return compiled

    def _precompile(self, plans) -> None:
        """Compile every distinct bucket signature of a round in
        parallel (the quantized-shape-ladder warmup of VERDICT item 7:
        warmup wall-clock ~ the slowest compile, and persistent-cache
        hits are logged per program)."""
        todo = {}
        for pl in plans:
            if (self._prog_key, pl["sig"]) not in _AOT_CACHE and pl[
                "sig"
            ] not in todo:
                todo[pl["sig"]] = pl
        if not todo:
            return
        if len(todo) == 1:
            pl = next(iter(todo.values()))
            t0 = time.perf_counter()
            self._aot_compile(
                pl["sig"], pl["ctx"], pl["specs"], pl["token"], pl["cubes"],
                pl["B"], pl["dma_s"], pl["trunc"]
            )
            self.stats.compile_seconds += time.perf_counter() - t0
            return
        import concurrent.futures as cf

        # Concurrency is bounded by the host, not the program count:
        # lowering is GIL-bound Python and each compile runs a
        # tpu_compile_helper subprocess (observed SIGKILLed when 8
        # piled up on a 1-core host).  2 x cpu_count keeps one trace on
        # the GIL while one compile runs in a subprocess.  Remote-compile
        # platforms (axon tunnel) spend the ~100s per program on the
        # server, not this host — overlap more aggressively there
        # (measured: 11 programs x ~110s at 2 workers = 430s warmup).
        # (the tunnel plugin has reported platform "axon" and now plain
        # "tpu" — match both; only pure-CPU hosts compile locally)
        remote_compile = jax.devices()[0].platform != "cpu"
        default_workers = max(2, 2 * (_os.cpu_count() or 1))
        if remote_compile:
            default_workers = max(8, default_workers)
        workers = int(
            _os.environ.get("SOAP_TPU_COMPILE_WORKERS", default_workers)
        )
        t0 = time.perf_counter()
        with cf.ThreadPoolExecutor(max_workers=min(workers, len(todo))) as ex:
            futs = []
            for pl in todo.values():
                # lower HERE, sequentially: concurrent lowering emits
                # interleaving-dependent MLIR, which changes the
                # persistent-cache key every process (the r3 bench
                # recompiled everything cold each run because of this);
                # only compile() — thread-safe, GIL-releasing, and the
                # dominant cost — goes to the pool
                lowered = self._aot_lower(
                    pl["ctx"],
                    pl["specs"],
                    pl["token"],
                    pl["cubes"],
                    pl["B"],
                    pl["dma_s"],
                    pl["trunc"],
                )
                futs.append(
                    ex.submit(
                        self._aot_compile,
                        pl["sig"],
                        pl["ctx"],
                        pl["specs"],
                        pl["token"],
                        pl["cubes"],
                        pl["B"],
                        pl["dma_s"],
                        pl["trunc"],
                        lowered=lowered,
                    )
                )
            for f in futs:
                # bounded wait with progress logging: a wedged remote
                # compile (tunnel outage) stays diagnosable instead of
                # blocking silently forever
                while True:
                    try:
                        f.result(timeout=120.0)
                        break
                    except cf.TimeoutError:
                        _log.warning(
                            "a bucket compile has been running >2 min; "
                            "still waiting (%.0fs elapsed in warmup)",
                            time.perf_counter() - t0,
                        )
        self.stats.compile_seconds += time.perf_counter() - t0

    # -- main ------------------------------------------------------------

    def process(
        self,
        centres,  # (H, 3) float64 comoving, or per-chunk list
        search_radius_phys,  # (H,) physical initial radii (or list)
        index,  # (H,) i64 catalogue indices (or list)
        is_central,  # (H,) bool (or list)
        fof_id,  # (H,) i64 (or list)
        enclose_radius_phys=None,  # (H,) physical (or list), optional
        specs: Optional[Tuple[HaloTypeSpec, ...]] = None,
    ):
        """Process all halos of every chunk.

        Single-chunk engines accept flat arrays and return
        ``{group: {key: (H, ...)}}``; multi-chunk engines accept
        per-chunk lists and return a list of such dicts.
        """
        if specs is None:
            specs = self.specs
        list_input = isinstance(centres, (list, tuple))
        if not list_input:
            centres = [centres]
            search_radius_phys = [search_radius_phys]
            index = [index]
            is_central = [is_central]
            fof_id = [fof_id]
            if enclose_radius_phys is not None:
                enclose_radius_phys = [enclose_radius_phys]
        assert len(centres) == self.C
        if enclose_radius_phys is None:
            enclose_radius_phys = [None] * self.C
        H = [len(ix) for ix in index]
        results: List[Dict[str, Dict[str, np.ndarray]]] = [{} for _ in range(self.C)]

        # ---- gather-radius pass split (wide/narrow) ----
        # Fixed apertures above WIDE_RADIUS_MPC (the 3 Mpc production
        # spheres) run in their own few-key pass so they do not inflate
        # the gather capacity K of the other ~90% of property keys.
        # copy_from links crossing the boundary are severed (the copy
        # source must be computed in the same pass).
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
            # the split only pays when the wide apertures would inflate
            # the narrow gather radius: when EVERY halo's input search
            # radius already covers the widest aperture (e.g. cluster
            # catalogues), both passes would gather identical K ladders
            # and the split would only double the compiled programs —
            # run one merged pass instead (keeps copy_from links whole)
            wide_max = max(
                s.aperture_radius_mpc for s in classes["wide"]
            )
            if all(
                len(s) == 0 or float(np.min(s)) >= wide_max
                for s in search_radius_phys
            ):
                classes = {}
        if len(classes) > 1:

            def _fix_links(subset, available):
                return tuple(
                    dataclasses.replace(
                        s, copy_from=None, copy_from_radius_mpc=None
                    )
                    if s.copy_from is not None
                    and s.copy_from not in available
                    else s
                    for s in subset
                )

            narrow_groups = {s.group for s in classes.get("narrow", ())}
            try:
                for name in ("narrow", "wide"):
                    if name not in classes:
                        continue
                    groups = {s.group for s in classes[name]}
                    if name == "wide":
                        # cross-pass aperture copy: the narrow pass
                        # already computed the copy sources (the first
                        # wide aperture copies from the largest narrow
                        # one when a tile's halos are fully enclosed by
                        # it, ``aperture_properties.py:4082-4123``) —
                        # keep those links and serve them from the
                        # narrow results
                        groups |= narrow_groups
                    part = self.process(
                        centres,
                        search_radius_phys,
                        index,
                        is_central,
                        fof_id,
                        enclose_radius_phys,
                        specs=_fix_links(tuple(classes[name]), groups),
                    )
                    for c in range(self.C):
                        results[c].update(part[c])
                    if name == "narrow":
                        # wide-pass copy sources (the wide pass has no
                        # centrals-only specs, so no sat/cen phase
                        # remaps its halo indexing)
                        self._cross_copy_sources = results
            finally:
                self._cross_copy_sources = None
            self.stats.halos_done = sum(H)
            return results if list_input else results[0]

        # ---- satellite/central population phases ----
        # Satellites never compute centrals-only (SO) specs: the
        # satellite phase traces a program WITHOUT the SO DAG (the batch
        # analogue of the reference's per-halo filter skip,
        # ``SO_properties.py:3627``).  Phasing keeps SPMD tiles uniform
        # across chunks.
        co_specs = [s for s in specs if s.centrals_only]
        cen_masks = [np.asarray(c, dtype=bool) for c in is_central]
        any_sat = any((~m).any() for m in cen_masks)
        if co_specs and any_sat:
            non_co = tuple(s for s in specs if not s.centrals_only)
            for phase, sub_specs in (("cen", tuple(specs)), ("sat", non_co)):
                rows = [
                    np.flatnonzero(m if phase == "cen" else ~m)
                    for m in cen_masks
                ]
                if not any(len(r) for r in rows) or not sub_specs:
                    continue
                part = self.process(
                    [c[r] for c, r in zip(centres, rows)],
                    [s[r] for s, r in zip(search_radius_phys, rows)],
                    [i[r] for i, r in zip(index, rows)],
                    [m[r] for m, r in zip(cen_masks, rows)],
                    [f[r] for f, r in zip(fof_id, rows)],
                    [
                        None if e is None else e[r]
                        for e, r in zip(enclose_radius_phys, rows)
                    ],
                    specs=sub_specs,
                )
                for c in range(self.C):
                    rws = rows[c]
                    if len(rws) == 0:
                        continue
                    for spec in sub_specs:
                        buf = results[c].setdefault(spec.group, {})
                        src = part[c].get(spec.group, {})
                        for key in spec.keys:
                            arr = src[key]
                            if key not in buf:
                                buf[key] = np.zeros(
                                    (H[c],) + arr.shape[1:], arr.dtype
                                )
                            buf[key][rws] = arr
            # centrals-only groups of pure-satellite chunks still need
            # zero-filled buffers
            for c in range(self.C):
                for spec in specs:
                    buf = results[c].setdefault(spec.group, {})
                    for key in spec.keys:
                        if key not in buf:
                            tmpl = None
                            for c2 in range(self.C):
                                if key in results[c2].get(spec.group, {}):
                                    tmpl = results[c2][spec.group][key]
                                    break
                            shape = (H[c],) + (
                                tmpl.shape[1:] if tmpl is not None else ()
                            )
                            dtype = tmpl.dtype if tmpl is not None else np.float32
                            buf[key] = np.zeros(shape, dtype)
            self.stats.halos_done = sum(H)
            return results if list_input else results[0]

        self._run(
            centres,
            search_radius_phys,
            index,
            cen_masks,
            fof_id,
            enclose_radius_phys,
            specs,
            results,
            H,
        )
        self.stats.halos_done = sum(H)
        return results if list_input else results[0]

    # -- one population through the round/tile machinery -----------------

    def _run(
        self,
        centres,
        search_radius_phys,
        index,
        is_central,
        fof_id,
        enclose_radius_phys,
        specs,
        results,
        H,
    ):
        ctx0 = self.ctx_base
        a = ctx0.a
        C = self.C

        radius_phys = [
            np.maximum(
                np.asarray(r, np.float64), min_physical_radius(specs)
            )
            for r in search_radius_phys
        ]
        pending = [np.arange(h) for h in H]
        halo_seconds = (
            [np.zeros(h) for h in H] if self.record_halo_timings else None
        )
        halo_nloop = (
            [np.zeros(h, np.int32) for h in H]
            if self.record_halo_timings
            else None
        )
        chi_clo = [geometry.split_hi_lo(np.asarray(c)) for c in centres]

        # SO gather-radius presize targets (see module docstring)
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

        from soap_tpu.parallel.sharded import _sharded_presize_count

        # ---- sorted-prefix truncation radius (see _halo_fn) ----
        # Bound/aperture/projected specs only ever touch rows within
        # max(EncloseRadius, largest fixed aperture radius); SAT counts
        # at that radius bound the sorted prefix they need.  Single
        # particle type only (multi-type truncated views would need
        # per-type re-partitions); extra staged fields would need a
        # prefix gather the slices don't implement yet.
        ap_max_t = max(
            (
                float(s.aperture_radius_mpc)
                for s in specs
                if _spec_truncatable(s) and s.aperture_radius_mpc
            ),
            default=0.0,
        )
        base_fields = {
            "Masses", "Velocities", "GroupNr_bound", "FOFGroupIDs",
        }
        trunc_enabled = (
            _os.environ.get("SOAP_TPU_TRUNCATE", "1") == "1"
            and len(ctx0.ptypes) == 1
            and all(e is not None for e in enclose_radius_phys)
            and any(_spec_truncatable(s) for s in specs)
            and all(
                set(pt.field_names) <= base_fields
                for pt in self.stacked.ptypes.values()
            )
        )
        rb_phys = (
            [
                np.maximum(np.asarray(e, np.float64), ap_max_t)
                * 1.001
                + 1e-4
                for e in enclose_radius_phys
            ]
            if trunc_enabled
            else None
        )

        # SOAP_TPU_TIMING=1: per-phase wall-clock lines (the analogue of
        # the reference's dead-time fractions, ``task_queue.py:196-205``)
        _timing = _os.environ.get("SOAP_TPU_TIMING", "0") == "1"
        _t_phase = time.perf_counter()

        def _phase(name):
            nonlocal _t_phase
            if _timing:
                now = time.perf_counter()
                _log.info("phase %-22s %7.3fs", name, now - _t_phase)
                _t_phase = now

        first_round = True
        while any(len(p) for p in pending):
            # truncation only in the first round: retried halos carry a
            # grown radius (and possibly a lying EncloseRadius) — the
            # rare retry re-runs on the full row set
            do_trunc = trunc_enabled and first_round
            Hp = max(max(len(p) for p in pending), 1)
            Hp = -(-Hp // self._halos_quant) * self._halos_quant
            c_pad = np.zeros((C, Hp, 3), np.float32)
            r_pad = np.full((C, Hp), 1e-3, np.float32)
            rb_pad = np.full((C, Hp), 1e-3, np.float32)
            e_pad = np.zeros((C, Hp), bool)
            for c in range(C):
                p = pending[c]
                if len(p) == 0:
                    continue
                c_pad[c, : len(p)] = chi_clo[c][0][p]
                r_pad[c, : len(p)] = (radius_phys[c][p] / a).astype(np.float32)
                if do_trunc:
                    rb_pad[c, : len(p)] = (rb_phys[c][p] / a).astype(
                        np.float32
                    )
                e_pad[c, : len(p)] = (
                    is_central[c][p] if so_centrals_only else True
                )
            radius_dev, counts_dev, counts_b_dev = _sharded_presize_count(
                self.stacked,
                self._put_halos(c_pad),
                self._put_halos(r_pad),
                self._put_halos(e_pad),
                jnp.float32(target_com),
                ctx0.ptypes,
                bool(so_targets) and first_round,
                radius_trunc=self._put_halos(rb_pad),
                do_trunc=do_trunc,
            )
            first_round = False
            _phase("presize dispatch")
            for v in (radius_dev, *counts_dev, *counts_b_dev):
                if hasattr(v, "copy_to_host_async"):
                    v.copy_to_host_async()
            radius_com_all = np.asarray(radius_dev)  # (C, Hp)
            per_type_counts = {
                pt: np.asarray(cd) for pt, cd in zip(ctx0.ptypes, counts_dev)
            }
            totals = np.zeros((C, Hp), np.int64)
            for cnt in per_type_counts.values():
                totals += cnt
            totals_b = np.zeros((C, Hp), np.int64)
            if do_trunc:
                for cd in counts_b_dev:
                    totals_b += np.asarray(cd)

            orders, rcom = [], []
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

            # ---- tile segmentation against the max-over-chunks profile.
            # The row budget counts the SUM of per-type padded
            # capacities (what the compiled program actually allocates:
            # every type is padded to a power of two + minimum
            # independently), not the padded total — a multi-type run
            # would otherwise overshoot TARGET_ROWS by ~2x and, with the
            # per-lane hydro field blocks on top, OOM the device.
            n_pos = max(len(p) for p in pending)
            # per sorted position, per type: max candidate count over chunks
            typemax = {
                pt: np.zeros(n_pos, np.int64) for pt in ctx0.ptypes
            }
            for c in range(C):
                k = len(pending[c])
                if k:
                    for pt in ctx0.ptypes:
                        typemax[pt][:k] = np.maximum(
                            typemax[pt][:k],
                            per_type_counts[pt][c, :k][orders[c]],
                        )
            # per sorted position: max truncation-row count over chunks
            truncmax = np.zeros(n_pos, np.int64)
            if do_trunc:
                for c in range(C):
                    k = len(pending[c])
                    if k:
                        truncmax[:k] = np.maximum(
                            truncmax[:k], totals_b[c, :k][orders[c]]
                        )

            def _caps_sum(maxes):
                return sum(
                    _next_pow2(int(m) + 8, 128) for m in maxes.values()
                )

            # hydro programs hold several live (B, lanes, K, 3) vector
            # temporaries per fused family (lane-relative velocities
            # etc.) that a DMO program does not — the row budget shrinks
            # accordingly so peak HBM stays bounded.  Measured on v5e
            # (bench hydro config, 38 calculations): B=128 x K=21888
            # needs 19.8 GB of HLO temps — XLA lays the (B, 4, K)
            # family-lane temps out with the 4-long lane axis in the
            # 128-wide minor position (32x padding expansion), so the
            # usable budget is ~4x smaller than the unpadded-bytes
            # model suggests.  /4 puts the same program at B=64
            # (~10 GB), which fits with headroom.
            # hydro OOM headroom: ~20 live (B, lanes, K) f32 temps per
            # fused family; at TARGET_ROWS/2 rows that is ~2.6 GB peak
            # on a 16 GB chip (the /4 round-2 setting predates the
            # quarter-pow2 caps and left B at 8-32 — dispatch-bound)
            # //5 (was //4): the 2048-halo production-mass-function
            # hydro bench OOM'd by 4% (16.39 G of 15.75 G hbm) on its
            # largest narrow tile at //4
            budget = TARGET_ROWS // (5 if len(ctx0.ptypes) > 1 else 1)
            # hydro batch cap: HLO temp footprint is NOT linear in
            # B x K_sum — the lane-padded (B, lanes, K) family temps
            # grow with B at roughly constant padded-K cost, so a
            # B=512 x K=4096 hydro program needs 48 GB where
            # B=64 x K=32768 (same row product) fits in ~10 GB
            # (measured on v5e, 2048-halo production-mass-function
            # hydro bench).  DMO programs carry no per-lane field
            # blocks and keep the full MAX_BATCH.
            max_batch = (
                MAX_BATCH
                if len(ctx0.ptypes) == 1
                else int(_os.environ.get("SOAP_TPU_HYDRO_MAX_BATCH", 64))
            )

            plans: List[Dict] = []
            pos = 0
            while pos < n_pos:
                n_sel = 1
                maxes = {pt: typemax[pt][pos] for pt in ctx0.ptypes}
                bq = max(8, self._halos_quant)
                tile_budget = budget
                if bq * _caps_sum(maxes) >= budget:
                    # giant-halo tile (K ~ 1e6): padding a singleton
                    # tile to the 8-lane floor multiplies the live
                    # (B, K) program temps 8x and OOMs the chip
                    # (measured 25.2 GB at B=8, K=1048576 on a 16 GB
                    # v5e).  Drop the lane floor to the mesh quantum
                    # and halve the row budget — the huge-K programs
                    # keep ~2x more live bytes per row than the
                    # production-K ones (less fusion headroom).
                    bq = max(1, self._halos_quant)
                    tile_budget = budget // 2
                while pos + n_sel < n_pos and n_sel < max_batch:
                    cand = {
                        pt: max(maxes[pt], typemax[pt][pos + n_sel])
                        for pt in ctx0.ptypes
                    }
                    # the program allocates the PADDED batch (pow2): use
                    # it in the budget, not the raw selection count
                    if _next_pow2(n_sel + 1, bq) * _caps_sum(cand) > tile_budget:
                        break
                    maxes = cand
                    n_sel += 1
                B = _next_pow2(n_sel, bq)
                # occupancy clamp: when the padded batch would run far
                # under-filled (<75%), emit a full pow2 tile now and
                # leave the tail to the next tile, which re-derives its
                # own (smaller) row caps.  Bucket cost scales ~linearly
                # with B at fixed K, so padding e.g. 1250 lanes to 2048
                # costs ~60% more device time than 1024 + 256 (measured
                # 79.8% lane efficiency on the DMO bench before this).
                if B > bq and n_sel < 0.75 * B:
                    B //= 2
                    n_sel = B

                sels = []
                rmax_tile = 1e-3
                max_enclose = 0.0
                have_enclose = all(
                    e is not None for e in enclose_radius_phys
                )
                for c in range(C):
                    sel = orders[c][pos : pos + n_sel]
                    sels.append(sel)
                    if len(sel):
                        rmax_tile = max(rmax_tile, float(rcom[c][sel].max()))
                        if have_enclose:
                            max_enclose = max(
                                max_enclose,
                                float(
                                    enclose_radius_phys[c][
                                        pending[c][sel]
                                    ].max()
                                ),
                            )
                pos += n_sel

                cubes = tuple(
                    self._cube_for(pt, rmax_tile) for pt in ctx0.ptypes
                )
                tile_dma_s = None
                if self._dma_s is not None:
                    # DMA-gather layout slack: each of the cube^3 cell
                    # ranges may pad up to (S-1) tail rows + (align-1)
                    # head rows (ops/dma_gather.py layout contract).
                    # S scales up per tile so one halo's block-table
                    # row (cap/S i32 entries, the kernel's per-program
                    # SMEM block) stays within SMEM (1 MiB per core;
                    # budget 48K entries = 192 KiB)
                    from soap_tpu.ops.dma_gather import row_alignment

                    def _dma_caps(S):
                        # <= 2*cube^2 coalesced ranges after the z-run
                        # merge (merge_adjacent_ranges), each padded by
                        # up to S tail + align head rows
                        return tuple(
                            _quantize_cap(
                                int(maxes[pt])
                                + 8
                                + 2
                                * cube**2
                                * (
                                    S
                                    + row_alignment(
                                        self.stacked.ptypes[pt].row_width
                                    )
                                ),
                                S,
                            )
                            for pt, cube in zip(ctx0.ptypes, cubes)
                        )

                    tile_dma_s = self._dma_s
                    caps = _dma_caps(tile_dma_s)
                    while max(caps) // tile_dma_s > 48 * 1024:
                        tile_dma_s *= 2
                        caps = _dma_caps(tile_dma_s)
                else:
                    caps = tuple(
                        _next_pow2(int(maxes[pt]) + 8, 128)
                        for pt in ctx0.ptypes
                    )
                ctx = dataclasses.replace(ctx0, capacities=caps)

                # aperture-copy optimization: when every halo of the tile
                # (across all chunks) is fully enclosed by the
                # next-smaller aperture, compute only the radius-dependent
                # keys and copy the rest (``aperture_properties.py:4082``)
                copied: Dict[str, HaloTypeSpec] = {}
                bucket_specs: List[HaloTypeSpec] = []
                if have_enclose:
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
                bucket_specs = tuple(bucket_specs)
                # sorted-prefix truncation cap for this tile (None when
                # it would not shrink the row set meaningfully); the
                # prefix of the (cap-wide) sorted rows provably covers
                # every row inside the truncation radius, so it needs no
                # DMA-slack term
                trunc_tile = None
                if do_trunc:
                    kb = int(truncmax[pos - n_sel : pos].max(initial=0))
                    kb = _quantize_cap(kb + 8, 1, 256)
                    if kb < 0.85 * sum(caps):
                        trunc_tile = min(kb, sum(caps))
                token = (bucket_specs, B, C, trunc_tile)
                sig = (ctx, bucket_specs, cubes, B, tile_dma_s, trunc_tile)
                plans.append(
                    dict(
                        sels=sels,
                        B=B,
                        caps=caps,
                        cubes=cubes,
                        ctx=ctx,
                        specs=bucket_specs,
                        token=token,
                        sig=sig,
                        dma_s=tile_dma_s,
                        trunc=trunc_tile,
                        rcom_tile=[rcom[c][sels[c]] for c in range(C)],
                    )
                )

            _phase("presize materialize")
            # ---- compile all distinct signatures of the round in parallel
            if not self.record_spec_timings:
                self._precompile(plans)
            _phase("precompile")

            # ---- dispatch (async) ----
            in_flight: List[Dict] = []
            for pl in plans:
                B = pl["B"]
                t_chi = np.zeros((C, B, 3), np.float32)
                t_clo = np.zeros((C, B, 3), np.float32)
                t_rcom = np.full((C, B), 1e-3, np.float32)
                t_idx = np.full((C, B), -1, np.int64)
                t_srp = np.full((C, B), 1e-3, np.float32)
                t_cen = np.zeros((C, B), bool)
                t_fof = np.full((C, B), -1, np.int64)
                glob = []
                for c in range(C):
                    sel = pl["sels"][c]
                    g = pending[c][sel]
                    glob.append(g)
                    nb = len(sel)
                    if nb == 0:
                        continue
                    t_chi[c, :nb] = chi_clo[c][0][g]
                    t_clo[c, :nb] = chi_clo[c][1][g]
                    t_rcom[c, :nb] = pl["rcom_tile"][c]
                    t_idx[c, :nb] = index[c][g]
                    t_srp[c, :nb] = radius_phys[c][g].astype(np.float32)
                    t_cen[c, :nb] = is_central[c][g]
                    t_fof[c, :nb] = fof_id[c][g]

                t_bucket = time.perf_counter()
                halo_args = (
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
                if self.record_spec_timings:
                    # profiling mode: one device program per spec, timed
                    # synchronously (radius-multiple specs recompute
                    # their parent so the chain stays in one program)
                    out = {}
                    overflow = None
                    by_group = {s.group: s for s in pl["specs"]}
                    for spec in pl["specs"]:
                        tup = (spec,)
                        if spec.radius_multiple_of in by_group:
                            tup = (by_group[spec.radius_multiple_of], spec)
                        t0s = time.perf_counter()
                        o, ov = _process_bucket_multi_raw(
                            pl["ctx"],
                            tup,
                            pl["cubes"],
                            float(self.boxsize),
                            *halo_args,
                        )
                        jax.block_until_ready(o)
                        dt_spec = time.perf_counter() - t0s
                        self.stats.spec_seconds[spec.group] = (
                            self.stats.spec_seconds.get(spec.group, 0.0)
                            + dt_spec
                        )
                        # attribute the spec's wall time over the tile's
                        # halos by candidate-count share (per chunk)
                        n_tile = sum(len(g) for g in glob)
                        for c in range(C):
                            g = glob[c]
                            if len(g) == 0:
                                continue
                            w = (
                                totals[c, pl["sels"][c]].astype(np.float64)
                                + 1.0
                            )
                            self.stats.spec_halo_chunks.append(
                                (
                                    spec.group,
                                    np.asarray(index[c][g], np.int64),
                                    dt_spec
                                    * (len(g) / max(n_tile, 1))
                                    * w
                                    / w.sum(),
                                )
                            )
                        out[spec.group] = o[spec.group]
                        overflow = ov
                    token = None
                else:
                    compiled = self._aot_compile(
                        pl["sig"],
                        pl["ctx"],
                        pl["specs"],
                        pl["token"],
                        pl["cubes"],
                        B,
                        pl["dma_s"],
                        pl["trunc"],
                    )
                    out, overflow = compiled(*halo_args)
                    token = pl["token"]
                _phase(f"dispatch B={B} K={sum(pl['caps'])}")
                self.stats.n_bucket_calls += 1
                in_flight.append(
                    dict(
                        glob=glob,
                        B=B,
                        caps=pl["caps"],
                        cubes=pl["cubes"],
                        specs=pl["specs"],
                        trunc=pl.get("trunc"),
                        out=out,
                        token=token,
                        overflow=overflow,
                        t_dispatch=t_bucket,
                        halo_counts=[
                            totals[c, pl["sels"][c]] for c in range(C)
                        ],
                        tile_specs=specs,
                    )
                )

            # ---- materialize all tiles of this round at once ----
            # Start ALL device->host copies first: each np.asarray would
            # otherwise block on its own transfer, serializing one
            # round-trip per pool over the (high-latency) device link —
            # measured as the dominant wall-clock term of a warm DMO
            # pass (device compute ~3 s, wall ~15 s).  With the async
            # copies issued up front the transfers pipeline behind each
            # other and behind the remaining bucket compute.
            for fl in in_flight:
                vals = (
                    fl["out"].values()
                    if fl["token"] is not None
                    else (v for d in fl["out"].values() for v in d.values())
                )
                for v in vals:
                    if hasattr(v, "copy_to_host_async"):
                        v.copy_to_host_async()
                if hasattr(fl["overflow"], "copy_to_host_async"):
                    fl["overflow"].copy_to_host_async()
            _phase("start host copies")
            next_pending: List[List[int]] = [[] for _ in range(C)]
            for fl in in_flight:
                if fl["token"] is not None:
                    pools = {k: np.asarray(v) for k, v in fl["out"].items()}
                    out = _unpack_bucket_multi(fl["token"], pools)
                else:
                    out = {
                        g: {k: np.asarray(v) for k, v in d.items()}
                        for g, d in fl["out"].items()
                    }
                overflow_np = np.asarray(fl["overflow"])  # (C, B)
                dt_bucket = time.perf_counter() - fl["t_dispatch"]
                _phase(f"materialize B={fl['B']}")
                n_real = sum(len(g) for g in fl["glob"])
                self.stats.bucket_records.append(
                    (
                        n_real,
                        fl["B"] * C,
                        sum(fl["caps"]),
                        max(fl["cubes"]),
                        dt_bucket,
                        fl.get("trunc") or 0,
                    )
                )
                for c in range(C):
                    g = fl["glob"][c]
                    nb = len(g)
                    if nb == 0:
                        continue
                    if halo_seconds is not None:
                        w = fl["halo_counts"][c].astype(np.float64) + 1.0
                        halo_seconds[c][g] += (
                            dt_bucket * (nb / max(n_real, 1)) * w / w.sum()
                        )
                        halo_nloop[c][g] += 1
                    # resolve outputs in spec order so copied apertures
                    # chain off earlier (possibly also copied) apertures
                    needs = np.zeros(nb, dtype=bool)
                    bucket_out: Dict[str, Dict[str, np.ndarray]] = {}
                    for spec in specs:
                        gdict = out.get(spec.group, {})
                        source = bucket_out.get(spec.copy_from or "", None)
                        if (
                            source is None
                            and spec.copy_from
                            and self._cross_copy_sources is not None
                        ):
                            # copy source computed in the narrow pass:
                            # slice its final (H,)-indexed results to
                            # this tile's halos; narrow retries already
                            # resolved, so no needs_bigger carries over
                            xs = self._cross_copy_sources[c].get(
                                spec.copy_from
                            )
                            if xs is not None:
                                source = {
                                    key: xs[key][g]
                                    for key in spec.keys
                                    if key in xs
                                }
                                source["__needs_bigger__"] = np.zeros(
                                    nb, bool
                                )
                        source = source if source is not None else {}
                        res: Dict[str, np.ndarray] = {}
                        for key in spec.keys:
                            if key in gdict:
                                res[key] = gdict[key][c, :nb]
                            else:
                                res[key] = source[key]
                        if "__needs_bigger__" in gdict:
                            res["__needs_bigger__"] = gdict[
                                "__needs_bigger__"
                            ][c, :nb]
                        else:
                            res["__needs_bigger__"] = source["__needs_bigger__"]
                        bucket_out[spec.group] = res

                    for spec in specs:
                        res = bucket_out[spec.group]
                        nb_flags = res["__needs_bigger__"]
                        if spec.centrals_only:
                            nb_flags = nb_flags & is_central[c][g]
                        nflag = int(np.sum(nb_flags))
                        if nflag:
                            self.stats.retry_groups[spec.group] = (
                                self.stats.retry_groups.get(spec.group, 0)
                                + nflag
                            )
                        needs |= nb_flags
                        buf = results[c].setdefault(spec.group, {})
                        for key in spec.keys:
                            arr = res[key]
                            if key not in buf:
                                buf[key] = np.zeros(
                                    (H[c],) + arr.shape[1:], arr.dtype
                                )
                            if spec.centrals_only:
                                arr = np.where(
                                    _expand_mask(is_central[c][g], arr.shape),
                                    arr,
                                    0,
                                )
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
                np.array(sorted(npd), dtype=np.int64) for npd in next_pending
            ]

        if halo_seconds is not None:
            for c in range(C):
                self.stats.halo_timing_chunks.append(
                    (
                        np.asarray(index[c], np.int64).copy(),
                        halo_seconds[c],
                        halo_nloop[c],
                    )
                )


#: non-packed multi program for the per-spec timing mode
def _process_bucket_multi_raw_impl(
    ctx, specs, cubes, boxsize, stacked, *halo_args
):
    f = partial(_process_bucket_impl, ctx, specs, cubes, boxsize)
    out, overflow = jax.vmap(f, in_axes=(0,) * 8 + (None,))(
        stacked, *halo_args
    )
    # profiling path: expand family stacks into plain per-group dicts
    real = {}
    for g, val in out.items():
        if isinstance(val, _FamilyStack):
            for i, grp in enumerate(val.groups):
                real[grp] = {k: a[:, :, i] for k, a in val.data.items()}
        else:
            real[g] = val
    return real, overflow


_process_bucket_multi_raw = partial(
    jax.jit, static_argnames=("ctx", "specs", "cubes", "boxsize")
)(_process_bucket_multi_raw_impl)


def _expand_mask(mask_1d: np.ndarray, shape) -> np.ndarray:
    m = np.asarray(mask_1d, dtype=bool)
    return m.reshape((-1,) + (1,) * (len(shape) - 1))
