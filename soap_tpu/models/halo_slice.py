"""Per-halo property evaluation as a trace-time lazy DAG.

The reference evaluates halo properties through ``@lazy_property``-memoized
attribute chains on a per-halo particle-data object
(``SOAP/core/lazy_properties.py``, design rationale in
``SOAP/particle_selection/aperture_properties.py:3-133``): each property
pulls exactly the intermediates it needs, and shared intermediates (sorted
radii, centre-of-mass velocity, ...) are computed once.

The TPU-native version keeps that exact structure but moves it to *trace
time*: a ``HaloSlice`` instance holds traced (abstract) arrays for ONE
halo's padded particle slice, and ``functools.cached_property``-style
memoization deduplicates intermediates while JAX traces the computation.
The whole object is evaluated under ``jax.vmap`` over a halo batch, so
every property method is written for a single halo with (K,)-shaped
padded arrays and a validity mask — no data-dependent shapes anywhere.

Property methods are named by their property-table *key* (``Mtot``,
``com``, ``veldisp_matrix_dm``, ...), matching the reference's calculator
attribute names, so the engine can request any subset of table keys and
dead code is eliminated by construction (unrequested attributes are never
traced).

All positions are halo-relative PHYSICAL internal-unit coordinates,
velocities are peculiar velocities; this matches the reference's
``compute_basics`` conversion to physical (e.g.
``SOAP/particle_selection/SO_properties.py:313-355``).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from soap_tpu.models.chemistry import ChemistryMixin
from soap_tpu.models.context import HaloContext
from soap_tpu.models.lazy import lazy_property
from soap_tpu.ops import inertia as inertia_ops
from soap_tpu.ops import kinematics as kin
from soap_tpu.ops import radii as radii_ops
from soap_tpu.ops import reductions as red
from soap_tpu.ops import so_radius as so_ops


class HaloParticles(NamedTuple):
    """One halo's padded candidate particles (concatenated over ptypes).

    Layout is static: rows [seg(t)] belong to particle type t as recorded
    in the ``HaloContext``.  Invalid (padding) rows have ``valid=False``
    and zeroed payloads.
    """

    valid: jnp.ndarray  # (K,) bool
    mass: jnp.ndarray  # (K,) f32
    pos: jnp.ndarray  # (K, 3) f32 halo-relative physical
    vel: jnp.ndarray  # (K, 3) f32 peculiar
    groupnr: jnp.ndarray  # (K,) i64 bound-subhalo index (-1 unbound)
    fofid: jnp.ndarray  # (K,) i64 FOF group id (-1 field)
    softening: jnp.ndarray  # (K,) f32 physical softening
    fields: Dict[str, jnp.ndarray]  # extra per-ptype datasets, (K_t, ...)


class HaloScalars(NamedTuple):
    """Per-halo scalar inputs."""

    index: jnp.ndarray  # i64 halo catalogue index
    centre: jnp.ndarray  # (3,) f64/f32 comoving absolute centre
    search_radius: jnp.ndarray  # f32 physical: data complete within this
    is_central: jnp.ndarray  # bool
    fof_id: jnp.ndarray  # i64 FOF id of the halo's host FOF group


def _zero():
    return jnp.float32(0.0)


#: index of the GAMA r band in SWIFT's 9-band Luminosities named columns
#: (u, g, r, i, z, Y, J, H, K — reference
#: ``snapshot_datasets.get_column_index("PartType4/Luminosities", "GAMA_r")``)
GAMA_R_BAND = 2

#: 3D inertia key table: output key -> (species, reduced, iterative,
#: luminosity-weighted).  Drives the one-batched-loop evaluation
#: (``HaloSlice._inertia_batch3d``).
_INERTIA3D_KEYS = {}
for _sp_name, _sp in (
    ("Total", "tot"),
    ("Gas", "gas"),
    ("DarkMatter", "dm"),
    ("Stellar", "star"),
):
    for _red in (False, True):
        for _it in (True, False):
            _k = (
                f"{_sp_name}InertiaTensor"
                + ("Reduced" if _red else "")
                + ("" if _it else "Noniterative")
            )
            _INERTIA3D_KEYS[_k] = (_sp, _red, _it, False)
for _red in (False, True):
    for _it in (True, False):
        _k = (
            "StellarInertiaTensor"
            + ("Reduced" if _red else "")
            + ("" if _it else "Noniterative")
            + "LuminosityWeighted"
        )
        _INERTIA3D_KEYS[_k] = ("star", _red, _it, True)

#: 2D (projected) analogue
_INERTIA2D_KEYS = {}
for _sp_name, _sp in (("Total", "tot"), ("Gas", "gas"), ("Stellar", "star")):
    for _red in (False, True):
        for _it in (True, False):
            _k = (
                f"Projected{_sp_name}InertiaTensor"
                + ("Reduced" if _red else "")
                + ("" if _it else "Noniterative")
            )
            _INERTIA2D_KEYS[_k] = (_sp, _red, _it, False)
for _red in (False, True):
    for _it in (True, False):
        _k = (
            "ProjectedStellarInertiaTensor"
            + ("Reduced" if _red else "")
            + ("" if _it else "Noniterative")
            + "LuminosityWeighted"
        )
        _INERTIA2D_KEYS[_k] = ("star", _red, _it, True)


class HaloSlice(ChemistryMixin):
    """Base class: one halo's selected particles + lazy property methods.

    Subclasses define ``selection`` — the boolean mask of particles that
    belong to this halo type (bound / inside SO radius / inside aperture).
    Chemistry/dust/species properties come from ``ChemistryMixin``.
    """

    def __init__(
        self,
        ctx: HaloContext,
        parts: HaloParticles,
        scalars: HaloScalars,
        aux: Optional[Dict[str, object]] = None,
    ):
        self.ctx = ctx
        self.parts = parts
        self.scalars = scalars
        #: shared non-batched constants (e.g. the cosmology age table);
        #: closed over by the vmapped evaluation, not vmapped themselves
        self.aux = aux or {}

    # ---------------- selection & basic masks ----------------

    @lazy_property
    def selection(self) -> jnp.ndarray:
        raise NotImplementedError

    @lazy_property
    def bound_mask(self) -> jnp.ndarray:
        """Particles bound to *this* subhalo (GroupNr_bound == index);
        reference ``subhalo_properties.py:142-144``."""
        return self.parts.valid & (self.parts.groupnr == self.scalars.index)

    def type_mask(self, ptype: str) -> jnp.ndarray:
        """Selected particles of one type (a static row segment)."""
        lo, hi = self.ctx.segment(ptype)
        k = self.parts.valid.shape[0]
        row = jnp.arange(k, dtype=jnp.int32)
        return self.selection & (row >= lo) & (row < hi)

    @lazy_property
    def mask_gas(self):
        return self.type_mask("PartType0")

    @lazy_property
    def mask_dm(self):
        return self.type_mask("PartType1")

    @lazy_property
    def mask_star(self):
        return self.type_mask("PartType4")

    @lazy_property
    def mask_bh(self):
        return self.type_mask("PartType5")

    @lazy_property
    def mask_nu(self):
        return self.type_mask("PartType6")

    @lazy_property
    def radius(self) -> jnp.ndarray:
        """Physical radius of every candidate particle.

        Elementwise row norm: a (K, 3) axis-1 reduce materializes a
        trailing-singleton temp the TPU layout pads 128x at giant K
        (see shared_sort_artifacts)."""
        p = self.parts.pos
        x, y, z = p[:, 0], p[:, 1], p[:, 2]
        return jnp.sqrt(x * x + y * y + z * z)

    @lazy_property
    def soft_radius(self) -> jnp.ndarray:
        """Radius floored at the particle's softening (reference
        ``subhalo_properties.py:1027``)."""
        return jnp.maximum(self.radius, self.parts.softening)

    # ---------------- shared radius sort ----------------
    # ONE sort serves every profile kernel (half-mass radii, Vmax, the
    # SO solver); the reference re-sorts per kernel.  The engine seeds
    # these caches with ``shared_sort_artifacts`` so ONE physical sort
    # also serves every 3D slice family of the fused program (XLA does
    # not reliably CSE big sorts across the unrolled/vmapped DAGs).
    #
    # Sorted masks are DERIVED ELEMENTWISE, never gathered: the bound
    # flag rides through the sort as a payload, particle-type segments
    # are recovered by comparing the sorted permutation against the
    # static segment bounds, and radius cuts compare the sorted radius
    # key directly.  Permutation gathers of per-lane masks were the
    # single largest device cost of a bucket (each (B, K) gather runs at
    # ~100 M elem/s on TPU; a 38-spec program issued ~70 of them).

    @lazy_property
    def _rsort_order(self):
        return jnp.argsort(jnp.where(self.parts.valid, self.radius, jnp.inf))

    @lazy_property
    def _r_sorted(self):
        return jnp.where(self.parts.valid, self.radius, jnp.inf)[
            self._rsort_order
        ]

    @lazy_property
    def _m_sorted(self):
        return self.parts.mass[self._rsort_order]

    @lazy_property
    def _valid_sorted(self):
        return self.parts.valid[self._rsort_order]

    @lazy_property
    def _pos_sorted(self):
        # engine-seeded as a shared-sort payload; gather fallback for
        # unseeded (single-slice / test) paths
        return self.parts.pos[self._rsort_order]

    def _sorted(self, mask: jnp.ndarray) -> jnp.ndarray:
        return mask[self._rsort_order]

    @lazy_property
    def _bound_sorted(self):
        """Bound-to-this-subhalo flag in radius-sorted order (a sort
        payload when engine-seeded; gather fallback otherwise)."""
        return self._sorted(self.bound_mask)

    def _seg_sorted(self, ptype: str) -> jnp.ndarray:
        """Particle-type membership in sorted order — derived from the
        sort permutation vs the static segment bounds (no gather)."""
        name = f"_seg_sorted_{ptype}"
        if name not in self.__dict__:
            lo, hi = self.ctx.segment(ptype)
            o = self._rsort_order
            self.__dict__[name] = (o >= lo) & (o < hi)
        return self.__dict__[name]

    @lazy_property
    def _sel_sorted(self):
        """Selection mask in sorted order.  Subclasses override with an
        elementwise derivation (radius cut / bound payload); the base
        fallback gathers."""
        return self._sorted(self.selection)

    @lazy_property
    def _gas_sorted(self):
        return self._sel_sorted & self._seg_sorted("PartType0")

    @lazy_property
    def _dm_sorted(self):
        return self._sel_sorted & self._seg_sorted("PartType1")

    @lazy_property
    def _star_sorted(self):
        return self._sel_sorted & self._seg_sorted("PartType4")

    # ---------------- profile-radius view ----------------
    # Half-mass/half-light profile kernels defined on this base class go
    # through these indirections so ``ProjectedApertureSlice`` can remap
    # them to its PROJECTED radius sort (the reference's projected
    # apertures profile in projected radius:
    # ``projected_aperture_properties.py:1492-1566``).

    @property
    def _prof_r_sorted(self):
        return self._r_sorted

    @property
    def _prof_m_sorted(self):
        return self._m_sorted

    @property
    def _prof_order(self):
        return self._rsort_order

    @property
    def _prof_sel_sorted(self):
        return self._sel_sorted

    def _prof_seg_sorted(self, ptype: str) -> jnp.ndarray:
        return self._seg_sorted(ptype)

    @property
    def _prof_gas_sorted(self):
        return self._gas_sorted

    @property
    def _prof_star_radius(self):
        """Star-segment profile radius (3D; projected overrides)."""
        return self._star_r_local

    def _star_sel_sorted(self):
        """Selection mask in STAR-SORT order, derived elementwise from
        the engine-seeded star-sort artifacts; None when the class has
        no elementwise derivation (then the gather path runs)."""
        return None

    # ---------------- needs-bigger-region ladder ----------------

    @property
    def flags(self):
        """Accumulated needs-bigger-region bits (the batched analogue of
        ``SearchRadiusTooSmallError``)."""
        if "_flags" not in self.__dict__:
            self._flags = [jnp.zeros((), bool)]
        return self._flags

    def add_flag(self, flag):
        self.flags.append(flag)

    @property
    def needs_bigger(self) -> jnp.ndarray:
        out = self.flags[0]
        for f in self.flags[1:]:
            out = out | f
        return out

    # ---------------- masses and counts ----------------

    @lazy_property
    def Mtot(self):
        return red.masked_sum(self.parts.mass, self.selection)

    @lazy_property
    def Mgas(self):
        return red.masked_sum(self.parts.mass, self.mask_gas)

    @lazy_property
    def Mdm(self):
        return red.masked_sum(self.parts.mass, self.mask_dm)

    @lazy_property
    def Mstar(self):
        return red.masked_sum(self.parts.mass, self.mask_star)

    @lazy_property
    def Mbh_dynamical(self):
        return red.masked_sum(self.parts.mass, self.mask_bh)

    @lazy_property
    def Ngas(self):
        return red.masked_count(self.mask_gas, jnp.uint32)

    @lazy_property
    def Ndm(self):
        return red.masked_count(self.mask_dm, jnp.uint32)

    @lazy_property
    def Nstar(self):
        return red.masked_count(self.mask_star, jnp.uint32)

    @lazy_property
    def Nbh(self):
        return red.masked_count(self.mask_bh, jnp.uint32)

    @lazy_property
    def Nnu(self):
        return red.masked_count(self.mask_nu, jnp.uint32)

    @lazy_property
    def Mnu(self):
        """Raw (unweighted) neutrino particle mass inside the selection;
        the concatenated mass array carries delta-f weights, so the raw
        masses come from the per-type field."""
        if "PartType6/Masses" in self.parts.fields:
            lo, hi = self.ctx.segment("PartType6")
            sel = self._seg_arr(self.mask_nu, "PartType6")
            return jnp.sum(
                jnp.where(sel, self.parts.fields["PartType6/Masses"], 0.0)
            )
        return red.masked_sum(self.parts.mass, self.mask_nu)

    # ---------------- centre of mass ----------------

    @lazy_property
    def _com_pair(self):
        return red.centre_of_mass(self.parts.mass, self.parts.pos, self.selection)

    @lazy_property
    def com(self):
        """Absolute physical centre of mass (writer converts to the
        catalogue's comoving convention)."""
        _, rel = self._com_pair
        return self.scalars.centre * self.ctx.a + rel

    @lazy_property
    def vcom(self):
        return red.centre_of_mass_velocity(
            self.parts.mass, self.parts.vel, self.selection
        )

    @lazy_property
    def vcom_dm(self):
        return red.centre_of_mass_velocity(
            self.parts.mass, self.parts.vel, self.mask_dm
        )

    @lazy_property
    def vcom_gas(self):
        return red.centre_of_mass_velocity(
            self.parts.mass, self.parts.vel, self.mask_gas
        )

    @lazy_property
    def vcom_star(self):
        return red.centre_of_mass_velocity(
            self.parts.mass, self.parts.vel, self.mask_star
        )

    # ---------------- radii ----------------

    @lazy_property
    def EncloseRadius(self):
        """Radius of the furthest selected particle
        (``subhalo_properties.py:2337``)."""
        return radii_ops.enclose_radius(self.radius, self.selection)

    @lazy_property
    def HalfMassRadiusTot(self):
        return radii_ops.half_weight_radius_sorted(
            self._r_sorted, self._m_sorted, self._sel_sorted, self.Mtot
        )

    @lazy_property
    def HalfMassRadiusGas(self):
        return radii_ops.half_weight_radius_sorted(
            self._r_sorted, self._m_sorted, self._gas_sorted, self.Mgas
        )

    @lazy_property
    def HalfMassRadiusDM(self):
        return radii_ops.half_weight_radius_sorted(
            self._r_sorted, self._m_sorted, self._dm_sorted, self.Mdm
        )

    @lazy_property
    def HalfMassRadiusStar(self):
        return radii_ops.half_weight_radius_sorted(
            self._r_sorted, self._m_sorted, self._star_sorted, self.Mstar
        )

    # ---------------- kinematics ----------------

    @lazy_property
    def Ldm(self):
        """Angular momentum of DM about (centre, vcom_dm);
        reference frame per ``subhalo_properties.py:1292-1300``."""
        vel_rel = self.parts.vel - self.vcom_dm[None, :]
        return kin.angular_momentum(
            self.parts.mass, self.parts.pos, vel_rel, self.mask_dm
        )

    @lazy_property
    def Lgas(self):
        vel_rel = self.parts.vel - self.vcom_gas[None, :]
        return kin.angular_momentum(
            self.parts.mass, self.parts.pos, vel_rel, self.mask_gas
        )

    @lazy_property
    def Lstar(self):
        vel_rel = self.parts.vel - self.vcom_star[None, :]
        return kin.angular_momentum(
            self.parts.mass, self.parts.pos, vel_rel, self.mask_star
        )

    @lazy_property
    def veldisp_matrix_dm(self):
        return red.velocity_dispersion_matrix(
            self.parts.mass, self.parts.vel, self.vcom_dm, self.mask_dm
        )

    @lazy_property
    def veldisp_matrix_gas(self):
        return red.velocity_dispersion_matrix(
            self.parts.mass, self.parts.vel, self.vcom_gas, self.mask_gas
        )

    @lazy_property
    def veldisp_matrix_star(self):
        return red.velocity_dispersion_matrix(
            self.parts.mass, self.parts.vel, self.vcom_star, self.mask_star
        )

    @property
    def _uniform_softening(self) -> bool:
        """True when every particle type shares one softening length —
        then max(r, soft) is monotone in r and the softened profiles can
        reuse the shared radius sort (saves one full XLA sort per kernel,
        the dominant per-bucket cost on TPU)."""
        return len(set(self.ctx.softening)) <= 1

    def _vmax_soft_for(self, sorted_mask, mask, ptypes=None):
        """Softened Vmax on the shared radius sort.

        With one softening value ``max(r, s)`` is monotone in r and the
        shared order IS the softened order; with per-type softenings the
        step-function formulation (``kin.vmax_sorted_multi_soft``) stays
        exact on the shared order — no per-call argsort/gathers.
        ``ptypes`` restricts to the types the selection can contain
        (e.g. the DM-only Vmax), minimizing the per-type cumsums.
        """
        softs = dict(zip(self.ctx.ptypes, self.ctx.softening))
        pts = [
            pt
            for pt in (ptypes if ptypes is not None else self.ctx.ptypes)
            if pt in softs
        ]
        values = sorted({softs[pt] for pt in pts})
        if len(values) <= 1:
            soft = jnp.float32(values[0] if values else 0.0)
            return kin.vmax_sorted(
                self._m_sorted,
                jnp.maximum(self._r_sorted, soft),
                sorted_mask,
            )
        # group ptypes by softening value: one cumsum per distinct value
        masks = []
        for s in values:
            seg = None
            for pt in pts:
                if softs[pt] == s:
                    m = self._seg_sorted(pt)
                    seg = m if seg is None else (seg | m)
            masks.append(sorted_mask & seg)
        return kin.vmax_sorted_multi_soft(
            self._m_sorted, self._r_sorted, masks, tuple(values)
        )

    @lazy_property
    def _vmax_soft(self):
        return self._vmax_soft_for(self._sel_sorted, self.selection)

    @lazy_property
    def _vmax_unsoft(self):
        return kin.vmax_sorted(self._m_sorted, self._r_sorted, self._sel_sorted)

    @lazy_property
    def Vmax_soft(self):
        return jnp.sqrt(self.ctx.G * self._vmax_soft.vmax_sq_over_G)

    @lazy_property
    def Vmax_unsoft(self):
        return jnp.sqrt(self.ctx.G * self._vmax_unsoft.vmax_sq_over_G)

    @lazy_property
    def R_vmax_soft(self):
        return self._vmax_soft.radius

    @lazy_property
    def R_vmax_unsoft(self):
        return self._vmax_unsoft.radius

    @lazy_property
    def spin_parameter(self):
        """Bullock et al. (2001) spin inside R_vmax_soft
        (``subhalo_properties.py:1047-1073``)."""
        R = self.R_vmax_soft
        V = self.Vmax_soft
        inside = self.selection & (self.radius <= R)
        vel_rel = self.parts.vel - self.vcom[None, :]
        L = kin.angular_momentum(self.parts.mass, self.parts.pos, vel_rel, inside)
        Lnorm = jnp.sqrt(jnp.sum(L * L))
        M = red.masked_sum(self.parts.mass, inside)
        denom = jnp.sqrt(2.0) * M * V * R
        ok = (self.Mtot > 0) & (R > 0) & (V > 0) & (M > 0)
        return jnp.where(ok, Lnorm / jnp.maximum(denom, 1e-37), 0.0)

    # ---------------- inertia tensors ----------------
    #
    # Per-halo-type semantics follow the reference exactly:
    #  - BoundSubhalo: sphere = 10 x half-mass radius of the species, bound
    #    particles only, NO search-radius check (all bound particles are
    #    always in the region — ``inertia_tensors.py:110-112``);
    #  - apertures: sphere = the aperture radius, ALL bound particles of
    #    the species (``aperture_properties.py:3596-3610``), no check;
    #  - SO: sphere = the SO radius, every candidate particle (including
    #    beyond the SO radius, the ellipsoid may deform outward), WITH the
    #    search-radius check (``SO_properties.py:620-670``).

    def _inertia_cfg(self, species: str):
        """(mask, sphere_radius, search_radius|None, gate_mass)."""
        masks = {
            "tot": (self.selection, self.HalfMassRadiusTot, self.Mtot),
            "gas": (self.mask_gas, self.HalfMassRadiusGas, self.Mgas),
            "dm": (self.mask_dm, self.HalfMassRadiusDM, self.Mdm),
            "star": (self.mask_star, self.HalfMassRadiusStar, self.Mstar),
        }
        mask, hmr, gate = masks[species]
        return mask, 10.0 * hmr, None, gate

    def _inertia_mask_sorted(self, species: str):
        """``_inertia_cfg``'s selection mask in RADIUS-SORT order,
        derived elementwise from shared-sort payloads (no gather)."""
        return {
            "tot": lambda: self._sel_sorted,
            "gas": lambda: self._gas_sorted,
            "dm": lambda: self._dm_sorted,
            "star": lambda: self._star_sorted,
        }[species]()

    def _inertia_star_mask_sorted(self):
        """Luminosity-inertia selection in STAR-SORT order: bound star
        particles (``_inertia_cfg('star')``'s mask restricted to the
        star segment) for bound/aperture slices; SO overrides to all
        valid candidates."""
        return self._star_sort_bound

    def _inertia(self, species, reduced, iterative):
        """One 3D inertia tensor.  When the engine pre-registered the
        requested key set (``compute_properties``), ALL requested inertia
        configs of this slice are evaluated in ONE batched while loop
        (``inertia_tensor_multi``) — each iteration then streams the
        shared (K, 3) positions once instead of once per config, and the
        DAG compiles one loop instead of ~10."""
        batch = self._inertia_batch3d
        key = (species, reduced, iterative, None)
        if batch is not None and key in batch:
            return batch[key]
        mask, sphere, search, gate = self._inertia_cfg(species)
        result = inertia_ops.inertia_tensor(
            self.parts.mass,
            self.parts.pos,
            mask,
            sphere,
            search_radius=search,
            reduced=reduced,
            max_iterations=20 if iterative else 1,
        )
        if search is not None:
            self.add_flag(result.needs_bigger)
        return jnp.where(gate > 0, result.tensor, 0.0)

    @lazy_property
    def _inertia_batch3d(self):
        """{(species, reduced, iterative, band|None): (6,) tensor} for
        every REQUESTED 3D inertia key, via one batched kernel call."""
        reqs = getattr(self, "_requested_keys", None)
        if reqs is None:
            return None
        configs = []  # (species, reduced, iterative, band)
        for key in reqs:
            spec3d = _INERTIA3D_KEYS.get(key)
            if spec3d is None:
                continue
            species, red_, it, lum = spec3d
            if lum:
                if not self._has("PartType4/Luminosities"):
                    continue
                configs.extend((species, red_, it, b) for b in range(9))
            else:
                configs.append((species, red_, it, None))
        if not configs:
            return {}
        lo4, hi4 = self.ctx.segment("PartType4")
        out: Dict[tuple, jnp.ndarray] = {}

        def run_batch(cfgs, seg):
            """One batched kernel call on RADIUS-SORTED rows (sorted
            positions/masses are shared-sort payloads, sorted masks are
            derived elementwise) — the Pallas heavy pass then stops at
            each config's selection extent / ellipsoid extent instead of
            sweeping the whole bucket.  ``seg`` restricts to the star
            segment (luminosity-band configs never select other rows, so
            streaming only the segment keeps the per-iteration work and
            the (C, K) mask block small)."""
            m_rows, r_rows, red_rows, it_rows, chk_rows, gates = (
                [], [], [], [], [], []
            )
            w_rows = []
            search = None
            star_sorted = seg and "_star_sort_pos" in self.__dict__
            for species, red_, it, band in cfgs:
                mask, sphere, search_c, gate = self._inertia_cfg(species)
                if star_sorted:
                    mask = self._inertia_star_mask_sorted()
                    w_rows.append(self._star_sort_lum[:, band])
                elif seg:
                    mask = mask[lo4:hi4]
                    w_rows.append(self._star_lum[:, band])
                else:
                    mask = self._inertia_mask_sorted(species)
                m_rows.append(mask)
                r_rows.append(jnp.asarray(sphere, jnp.float32))
                red_rows.append(red_)
                it_rows.append(it)
                chk_rows.append(search_c is not None)
                gates.append(gate)
                if search_c is not None:
                    search = search_c
            # mass-weighted configs share ONE (K,) weight vector — no
            # (C, K) weight block is ever materialized
            if star_sorted:
                pos, weights = self._star_sort_pos, jnp.stack(w_rows)
            elif seg:
                pos, weights = self.parts.pos[lo4:hi4], jnp.stack(w_rows)
            else:
                pos, weights = self._pos_sorted, self._m_sorted
            result = inertia_ops.inertia_tensor_multi(
                weights,
                pos,
                jnp.stack(m_rows),
                jnp.stack(r_rows),
                # static numpy flags: under jit, jnp.asarray(np_array)
                # produces a TRACER, which would silently disable the
                # static-flag Pallas kernel gate in inertia_tensor_multi
                np.asarray(red_rows),
                np.asarray(it_rows),
                search_radius=search,
                check_search=(
                    np.asarray(chk_rows) if search is not None else None
                ),
                single_pass=not any(it_rows),
                rows_radius_sorted=star_sorted or not seg,
            )
            if search is not None:
                self.add_flag(jnp.any(result.needs_bigger))
            for i, (cfg, gate) in enumerate(zip(cfgs, gates)):
                out[cfg] = jnp.where(gate > 0, result.tensor[i], 0.0)

        # the iterative flag is static per key: run the non-iterative
        # configs in a loop-free single pass instead of keeping them in
        # the while loop, where they'd pay the full per-iteration (C, K)
        # bandwidth until the iterative configs converge
        for it_flag in (False, True):
            mass_cfgs = [
                c for c in configs if c[3] is None and c[2] == it_flag
            ]
            lum_cfgs = [
                c for c in configs if c[3] is not None and c[2] == it_flag
            ]
            if mass_cfgs:
                run_batch(mass_cfgs, seg=False)
            if lum_cfgs:
                run_batch(lum_cfgs, seg=True)
        return out

    @lazy_property
    def TotalInertiaTensor(self):
        return self._inertia("tot", False, True)

    @lazy_property
    def TotalInertiaTensorReduced(self):
        return self._inertia("tot", True, True)

    @lazy_property
    def TotalInertiaTensorNoniterative(self):
        return self._inertia("tot", False, False)

    @lazy_property
    def TotalInertiaTensorReducedNoniterative(self):
        return self._inertia("tot", True, False)

    @lazy_property
    def DarkMatterInertiaTensor(self):
        return self._inertia("dm", False, True)

    @lazy_property
    def DarkMatterInertiaTensorReduced(self):
        return self._inertia("dm", True, True)

    @lazy_property
    def DarkMatterInertiaTensorNoniterative(self):
        return self._inertia("dm", False, False)

    @lazy_property
    def DarkMatterInertiaTensorReducedNoniterative(self):
        return self._inertia("dm", True, False)

    @lazy_property
    def GasInertiaTensor(self):
        return self._inertia("gas", False, True)

    @lazy_property
    def GasInertiaTensorReduced(self):
        return self._inertia("gas", True, True)

    @lazy_property
    def GasInertiaTensorNoniterative(self):
        return self._inertia("gas", False, False)

    @lazy_property
    def GasInertiaTensorReducedNoniterative(self):
        return self._inertia("gas", True, False)

    def _inertia_lum(self, reduced, iterative):
        """Luminosity-weighted stellar inertia: one (6,) tensor per GAMA
        band, concatenated -> (54,) (``inertia_tensors.py:168-224``);
        sphere radius follows the class's stellar inertia configuration."""
        if not self._has("PartType4/Luminosities"):
            return jnp.zeros(54, jnp.float32)
        batch = self._inertia_batch3d
        if batch is not None and ("star", reduced, iterative, 0) in batch:
            return jnp.concatenate(
                [batch[("star", reduced, iterative, b)] for b in range(9)]
            )
        mask, sphere, search, gate = self._inertia_cfg("star")
        lo, hi = self.ctx.segment("PartType4")
        outs = []
        for band in range(9):
            weights = jnp.zeros(self.parts.valid.shape[0], jnp.float32)
            weights = weights.at[lo:hi].set(self._star_lum[:, band])
            result = inertia_ops.inertia_tensor(
                weights,
                self.parts.pos,
                mask,
                sphere,
                search_radius=search,
                reduced=reduced,
                max_iterations=20 if iterative else 1,
            )
            if search is not None:
                self.add_flag(result.needs_bigger)
            outs.append(jnp.where(gate > 0, result.tensor, 0.0))
        return jnp.concatenate(outs)

    @lazy_property
    def StellarInertiaTensorLuminosityWeighted(self):
        return self._inertia_lum(False, True)

    @lazy_property
    def StellarInertiaTensorReducedLuminosityWeighted(self):
        return self._inertia_lum(True, True)

    @lazy_property
    def StellarInertiaTensorNoniterativeLuminosityWeighted(self):
        return self._inertia_lum(False, False)

    @lazy_property
    def StellarInertiaTensorReducedNoniterativeLuminosityWeighted(self):
        return self._inertia_lum(True, False)

    @lazy_property
    def StellarInertiaTensor(self):
        return self._inertia("star", False, True)

    @lazy_property
    def StellarInertiaTensorReduced(self):
        return self._inertia("star", True, True)

    @lazy_property
    def StellarInertiaTensorNoniterative(self):
        return self._inertia("star", False, False)

    @lazy_property
    def StellarInertiaTensorReducedNoniterative(self):
        return self._inertia("star", True, False)

    # ---------------- misc ----------------

    @lazy_property
    def ExSituFraction(self):
        """Fraction of stellar mass formed ex situ; needs star-formation
        tracking data — 0 when stars are absent (DMO)."""
        return _zero()

    # =====================================================================
    # Hydro tier: gas / star / black-hole properties.
    # Extra per-type datasets are carried in ``parts.fields`` with
    # type-local row counts; the helpers below slice the concatenated
    # common arrays (mass/pos/vel/masks) down to one type's segment so
    # both align.  Missing datasets degrade to zeros (DMO runs never
    # request these keys; the guards protect partial snapshots).
    # =====================================================================

    def _seg_arr(self, arr: jnp.ndarray, ptype: str) -> jnp.ndarray:
        lo, hi = self.ctx.segment(ptype)
        return arr[lo:hi]

    def _has(self, name: str) -> bool:
        return name in self.parts.fields

    def field(self, name: str) -> jnp.ndarray:
        return self.parts.fields[name]

    # ---- gas ----

    @lazy_property
    def _gas_sel(self):
        """Selected-gas mask, gas-segment local."""
        return self._seg_arr(self.mask_gas, "PartType0")

    @lazy_property
    def _gas_mass(self):
        return self._seg_arr(self.parts.mass, "PartType0")

    @lazy_property
    def _gas_sfr(self):
        """SFR with SWIFT's negative last-SF-scale-factor encoding zeroed
        (``subhalo_properties.py`` gas_SFR)."""
        sfr = self.field("PartType0/StarFormationRates")
        return jnp.maximum(sfr, 0.0)

    @lazy_property
    def SFR(self):
        if not self._has("PartType0/StarFormationRates"):
            return _zero()
        return jnp.sum(jnp.where(self._gas_sel, self._gas_sfr, 0.0))

    @lazy_property
    def Mgas_SF(self):
        if not self._has("PartType0/StarFormationRates"):
            return _zero()
        sf = self._gas_sel & (self._gas_sfr > 0.0)
        return jnp.sum(jnp.where(sf, self._gas_mass, 0.0))

    @lazy_property
    def _gas_metal_mass(self):
        return self._gas_mass * self.field("PartType0/MetalMassFractions")

    @lazy_property
    def gasmetalfrac(self):
        if not self._has("PartType0/MetalMassFractions"):
            return _zero()
        mm = jnp.sum(jnp.where(self._gas_sel, self._gas_metal_mass, 0.0))
        return jnp.where(self.Mgas > 0, mm / jnp.maximum(self.Mgas, 1e-37), 0.0)

    @lazy_property
    def gasmetalfrac_SF(self):
        if not (
            self._has("PartType0/MetalMassFractions")
            and self._has("PartType0/StarFormationRates")
        ):
            return _zero()
        sf = self._gas_sel & (self._gas_sfr > 0.0)
        mm = jnp.sum(jnp.where(sf, self._gas_metal_mass, 0.0))
        return jnp.where(
            self.Mgas_SF > 0, mm / jnp.maximum(self.Mgas_SF, 1e-37), 0.0
        )

    #: hot/cool boundary (K) — reference Tgas_no_cool / Mhotgas
    T_COOL_MAX = 1.0e5

    @lazy_property
    def _gas_temp(self):
        return self.field("PartType0/Temperatures")

    @lazy_property
    def Tgas(self):
        if not self._has("PartType0/Temperatures"):
            return _zero()
        m = jnp.where(self._gas_sel, self._gas_mass, 0.0)
        return jnp.sum(m * self._gas_temp) / jnp.maximum(self.Mgas, 1e-37)

    @lazy_property
    def Tgas_no_cool(self):
        """Mass-weighted temperature of gas with T >= 1e5 K."""
        if not self._has("PartType0/Temperatures"):
            return _zero()
        no_cool = self._gas_sel & (self._gas_temp >= self.T_COOL_MAX)
        m = jnp.where(no_cool, self._gas_mass, 0.0)
        mtot = jnp.sum(m)
        return jnp.where(
            mtot > 0, jnp.sum(m * self._gas_temp) / jnp.maximum(mtot, 1e-37), 0.0
        )

    @lazy_property
    def Mhotgas(self):
        if not self._has("PartType0/Temperatures"):
            return _zero()
        hot = self._gas_sel & (self._gas_temp >= self.T_COOL_MAX)
        return jnp.sum(jnp.where(hot, self._gas_mass, 0.0))

    @lazy_property
    def com_gas(self):
        _, rel = red.centre_of_mass(self.parts.mass, self.parts.pos, self.mask_gas)
        return jnp.where(
            self.Mgas > 0, self.scalars.centre * self.ctx.a + rel, 0.0
        )

    @lazy_property
    def com_dm(self):
        _, rel = red.centre_of_mass(self.parts.mass, self.parts.pos, self.mask_dm)
        return jnp.where(
            self.Mdm > 0, self.scalars.centre * self.ctx.a + rel, 0.0
        )

    @lazy_property
    def com_star(self):
        _, rel = red.centre_of_mass(self.parts.mass, self.parts.pos, self.mask_star)
        return jnp.where(
            self.Mstar > 0, self.scalars.centre * self.ctx.a + rel, 0.0
        )

    # ---- kinetic energies (vcom + Hubble-flow frame,
    #      ``subhalo_properties.py`` KineticEnergyTotal) ----

    def _kinetic_energy(self, mask):
        v = (
            self.parts.vel
            - self.vcom[None, :]
            + self.parts.pos * jnp.float32(self.ctx.H)
        )
        m = jnp.where(mask, self.parts.mass, 0.0)
        return 0.5 * jnp.sum(m * jnp.sum(v * v, axis=1))

    @lazy_property
    def KineticEnergyTotal(self):
        return self._kinetic_energy(self.selection)

    @lazy_property
    def KineticEnergyGas(self):
        return self._kinetic_energy(self.mask_gas)

    @lazy_property
    def KineticEnergyStars(self):
        return self._kinetic_energy(self.mask_star)

    # ---- kappa_corot family ----

    def _kappa(self, mask, vcom_species):
        vel_rel = self.parts.vel - vcom_species[None, :]
        res = kin.angular_momentum_and_kappa(
            self.parts.mass, self.parts.pos, vel_rel, mask
        )
        return res

    @lazy_property
    def kappa_corot_gas(self):
        return self._kappa(self.mask_gas, self.vcom_gas).kappa_corot

    @lazy_property
    def kappa_corot_star(self):
        return self._kappa(self.mask_star, self.vcom_star).kappa_corot

    @lazy_property
    def vcom_bar(self):
        return red.centre_of_mass_velocity(
            self.parts.mass, self.parts.vel, self.mask_gas | self.mask_star
        )

    @lazy_property
    def Lbaryons(self):
        bar = self.mask_gas | self.mask_star
        vel_rel = self.parts.vel - self.vcom_bar[None, :]
        return kin.angular_momentum(
            self.parts.mass, self.parts.pos, vel_rel, bar
        )

    @lazy_property
    def kappa_corot_baryons(self):
        return self._kappa(self.mask_gas | self.mask_star, self.vcom_bar).kappa_corot

    @lazy_property
    def _Mcountrot_gas(self):
        return self._kappa(self.mask_gas, self.vcom_gas).m_counterrot

    @lazy_property
    def _Mcountrot_star(self):
        return self._kappa(self.mask_star, self.vcom_star).m_counterrot

    @lazy_property
    def DtoTgas(self):
        """Disc-to-total = 1 - 2 Mcounterrot/M (``subhalo_properties.py``)."""
        return jnp.where(
            self.Mgas > 0,
            1.0 - 2.0 * self._Mcountrot_gas / jnp.maximum(self.Mgas, 1e-37),
            0.0,
        )

    @lazy_property
    def DtoTstar(self):
        return jnp.where(
            self.Mstar > 0,
            1.0 - 2.0 * self._Mcountrot_star / jnp.maximum(self.Mstar, 1e-37),
            0.0,
        )

    # ---- stars ----

    @lazy_property
    def _star_sel(self):
        return self._seg_arr(self.mask_star, "PartType4")

    @lazy_property
    def _star_mass(self):
        return self._seg_arr(self.parts.mass, "PartType4")

    @lazy_property
    def Mstar_init(self):
        if not self._has("PartType4/InitialMasses"):
            return _zero()
        return jnp.sum(
            jnp.where(self._star_sel, self.field("PartType4/InitialMasses"), 0.0)
        )

    @lazy_property
    def starmetalfrac(self):
        if not self._has("PartType4/MetalMassFractions"):
            return _zero()
        mm = jnp.sum(
            jnp.where(
                self._star_sel,
                self._star_mass * self.field("PartType4/MetalMassFractions"),
                0.0,
            )
        )
        return jnp.where(self.Mstar > 0, mm / jnp.maximum(self.Mstar, 1e-37), 0.0)

    @lazy_property
    def _star_lum(self):
        """(K4, 9) luminosities in the GAMA bands."""
        return self.field("PartType4/Luminosities")

    @lazy_property
    def StellarLuminosity(self):
        if not self._has("PartType4/Luminosities"):
            return jnp.zeros(9, jnp.float32)
        return jnp.sum(
            jnp.where(self._star_sel[:, None], self._star_lum, 0.0), axis=0
        )

    @lazy_property
    def _star_r_local(self):
        return self._seg_arr(self.radius, "PartType4")

    @lazy_property
    def HalfLightRadiusStar(self):
        """Per-band half-light radii (reference
        ``half_mass_radius.py:102-161``); one shared star-segment sort.

        The sort key is VALID-masked (not selection-masked) so it stays
        unbatched under the aperture radius-block vmap; the selection
        rides along as a gapped mask.
        """
        if not self._has("PartType4/Luminosities"):
            return jnp.zeros(9, jnp.float32)
        sel_s = (
            self._star_sel_sorted()
            if "_star_sort_r" in self.__dict__
            else None
        )
        if sel_s is not None:
            r_s = self._star_sort_r
            lum_s = self._star_sort_lum
        else:
            valid = self._seg_arr(self.parts.valid, "PartType4")
            r = jnp.where(valid, self._prof_star_radius, jnp.inf)
            order = jnp.argsort(r)
            r_s = r[order]
            sel_s = self._star_sel[order]
            lum_s = self._star_lum[order]
        out = []
        for band in range(9):
            w = lum_s[:, band]
            total = jnp.sum(jnp.where(sel_s, w, 0.0))
            out.append(
                radii_ops.half_weight_radius_sorted(r_s, w, sel_s, total)
            )
        return jnp.stack(out)

    @lazy_property
    def HalfMassRadiusBaryon(self):
        bar_sorted = self._prof_sel_sorted & (
            self._prof_seg_sorted("PartType0")
            | self._prof_seg_sorted("PartType4")
        )
        mbar = self.Mgas + self.Mstar
        return radii_ops.half_weight_radius_sorted(
            self._prof_r_sorted, self._prof_m_sorted, bar_sorted, mbar
        )

    @lazy_property
    def _stellar_ages(self):
        """Per-star age from birth scale factor via the age table
        (reference ``stellar_age_calculator.py:21-113``).  The staged
        chunk carries the host-precomputed ``StellarAges`` field when it
        went through the production pipeline; the device interp is the
        fallback for directly-staged stores."""
        if self._has("PartType4/StellarAges"):
            return self.field("PartType4/StellarAges")
        birth_a = self.field("PartType4/BirthScaleFactors")
        age_a, age_t = self.aux["age_table"]
        t_birth = jnp.interp(birth_a, age_a, age_t)
        t_now = jnp.interp(jnp.float32(self.ctx.a), age_a, age_t)
        return jnp.maximum(t_now - t_birth, 0.0)

    @lazy_property
    def stellar_age_mw(self):
        if not self._has("PartType4/BirthScaleFactors") or "age_table" not in self.aux:
            return _zero()
        m = jnp.where(self._star_sel, self._star_mass, 0.0)
        return jnp.where(
            self.Mstar > 0,
            jnp.sum(m * self._stellar_ages) / jnp.maximum(self.Mstar, 1e-37),
            0.0,
        )

    @lazy_property
    def stellar_age_lw(self):
        """r-band-luminosity-weighted mean age (GAMA_r = band 2)."""
        if (
            not self._has("PartType4/BirthScaleFactors")
            or not self._has("PartType4/Luminosities")
            or "age_table" not in self.aux
        ):
            return _zero()
        Lr = jnp.where(self._star_sel, self._star_lum[:, GAMA_R_BAND], 0.0)
        Ltot = jnp.sum(Lr)
        return jnp.where(
            Ltot > 0, jnp.sum(Lr * self._stellar_ages) / jnp.maximum(Ltot, 1e-37), 0.0
        )

    # ---- stellar cylindrical kinematics ----

    @lazy_property
    def _star_pos_local(self):
        return self._seg_arr(self.parts.pos, "PartType4")

    @lazy_property
    def _star_vel_local(self):
        return self._seg_arr(self.parts.vel, "PartType4")

    @lazy_property
    def _star_vcyl(self):
        """Cylindrical star velocities: z along Lstar, velocities about
        vcom_star (``subhalo_properties.py:1410-1432``)."""
        vel = jnp.where(
            self._star_sel[:, None],
            self._star_vel_local - self.vcom_star[None, :],
            0.0,
        )
        pos = jnp.where(self._star_sel[:, None], self._star_pos_local, 0.0)
        return kin.cylindrical_velocities(pos, vel, self.Lstar)

    @lazy_property
    def _star_cyl_ok(self):
        return (self.Nstar >= 2) & (jnp.sum(self.Lstar * self.Lstar) > 0)

    @lazy_property
    def StellarRotationalVelocity(self):
        v = kin.weighted_rotation_velocity(
            self._star_mass, self._star_vcyl[:, 1], self._star_sel
        )
        return jnp.where(self._star_cyl_ok, v, 0.0)

    @lazy_property
    def _star_cyl_disp(self):
        return kin.weighted_cylindrical_dispersion(
            self._star_mass, self._star_vcyl, self._star_sel
        )

    @lazy_property
    def StellarCylindricalVelocityDispersion(self):
        v = jnp.sqrt(jnp.sum(self._star_cyl_disp**2) / 3.0)
        return jnp.where(self._star_cyl_ok, v, 0.0)

    @lazy_property
    def StellarCylindricalVelocityDispersionVertical(self):
        return jnp.where(self._star_cyl_ok, self._star_cyl_disp[2], 0.0)

    @lazy_property
    def StellarCylindricalVelocityDispersionDiscPlane(self):
        v = jnp.sqrt((self._star_cyl_disp[0] ** 2 + self._star_cyl_disp[1] ** 2) / 2.0)
        return jnp.where(self._star_cyl_ok, v, 0.0)

    # luminosity-weighted variants: per-band L frame
    @lazy_property
    def _star_lum_L(self):
        """(9, 3) per-band luminosity-weighted angular momenta."""
        if not self._has("PartType4/Luminosities"):
            return jnp.zeros((9, 3), jnp.float32)
        return jnp.stack(
            [
                kin.angular_momentum(
                    self._star_lum[:, b],
                    self._star_pos_local,
                    self._star_vel_local - self._star_vlum_coms[b][None, :],
                    self._star_sel,
                )
                for b in range(9)
            ]
        )

    @lazy_property
    def _star_vlum_coms(self):
        """(9, 3) luminosity-weighted mean velocities per band."""
        out = []
        for b in range(9):
            w = jnp.where(self._star_sel, self._star_lum[:, b], 0.0)
            wsum = jnp.maximum(jnp.sum(w), 1e-37)
            out.append(jnp.sum(w[:, None] * self._star_vel_local, axis=0) / wsum)
        return jnp.stack(out)

    @lazy_property
    def Lstar_luminosity_weighted(self):
        """(27,) = 9 bands x 3 components."""
        return self._star_lum_L.reshape(-1)

    @lazy_property
    def _kappa_star_lw_bands(self):
        """Per-band luminosity-weighted kappa/counter-rotation results."""
        out = []
        for b in range(9):
            vel_rel = self._star_vel_local - self._star_vlum_coms[b][None, :]
            out.append(
                kin.angular_momentum_and_kappa(
                    self._star_lum[:, b],
                    self._star_pos_local,
                    vel_rel,
                    self._star_sel,
                )
            )
        return out

    @lazy_property
    def kappa_corot_star_luminosity_weighted(self):
        """(9,) kappa_corot per GAMA band, luminosity weighted."""
        if not self._has("PartType4/Luminosities"):
            return jnp.zeros(9, jnp.float32)
        return jnp.stack([r.kappa_corot for r in self._kappa_star_lw_bands])

    @lazy_property
    def Lstar_lw_r(self):
        return self._star_lum_L[GAMA_R_BAND]

    @lazy_property
    def _star_vcyl_lw_bands(self):
        """Per-band cylindrical velocities about the band's luminosity-
        weighted frame; list of ((K4, 3) vcyl, ok flag)."""
        out = []
        for b in range(9):
            L = self._star_lum_L[b]
            vel = jnp.where(
                self._star_sel[:, None],
                self._star_vel_local - self._star_vlum_coms[b][None, :],
                0.0,
            )
            pos = jnp.where(self._star_sel[:, None], self._star_pos_local, 0.0)
            vcyl = kin.cylindrical_velocities(pos, vel, L)
            ok = (self.Nstar >= 2) & (jnp.sum(L * L) > 0)
            out.append((vcyl, ok))
        return out

    @lazy_property
    def StellarRotationalVelocityLuminosityWeighted(self):
        """(9,) per-band luminosity-weighted rotational velocity."""
        if not self._has("PartType4/Luminosities"):
            return jnp.zeros(9, jnp.float32)
        vals = []
        for b, (vcyl, ok) in enumerate(self._star_vcyl_lw_bands):
            v = kin.weighted_rotation_velocity(
                self._star_lum[:, b], vcyl[:, 1], self._star_sel
            )
            vals.append(jnp.where(ok, v, 0.0))
        return jnp.stack(vals)

    @lazy_property
    def _star_cyl_disp_lw_bands(self):
        """(9, 3) per-band luminosity-weighted cylindrical dispersions."""
        rows = []
        for b, (vcyl, ok) in enumerate(self._star_vcyl_lw_bands):
            d = kin.weighted_cylindrical_dispersion(
                self._star_lum[:, b], vcyl, self._star_sel
            )
            rows.append(jnp.where(ok, d, 0.0))
        return jnp.stack(rows)

    @lazy_property
    def StellarCylindricalVelocityDispersionLuminosityWeighted(self):
        if not self._has("PartType4/Luminosities"):
            return jnp.zeros(9, jnp.float32)
        d = self._star_cyl_disp_lw_bands
        return jnp.sqrt(jnp.sum(d**2, axis=1) / 3.0)

    @lazy_property
    def StellarCylindricalVelocityDispersionVerticalLuminosityWeighted(self):
        if not self._has("PartType4/Luminosities"):
            return jnp.zeros(9, jnp.float32)
        return self._star_cyl_disp_lw_bands[:, 2]

    @lazy_property
    def StellarCylindricalVelocityDispersionDiscPlaneLuminosityWeighted(self):
        if not self._has("PartType4/Luminosities"):
            return jnp.zeros(9, jnp.float32)
        d = self._star_cyl_disp_lw_bands
        return jnp.sqrt((d[:, 0] ** 2 + d[:, 1] ** 2) / 2.0)

    # ---- DtoT luminosity-weighted variants (per band, shape 9) ----

    @lazy_property
    def DtoTstar_luminosity_weighted_luminosity_ratio(self):
        """(9,) 1 - 2 x (counter-rotating band luminosity) / (total)."""
        if not self._has("PartType4/Luminosities"):
            return jnp.zeros(9, jnp.float32)
        vals = []
        for b, res in enumerate(self._kappa_star_lw_bands):
            Ltot = jnp.sum(jnp.where(self._star_sel, self._star_lum[:, b], 0.0))
            vals.append(
                jnp.where(
                    Ltot > 0,
                    1.0 - 2.0 * res.m_counterrot / jnp.maximum(Ltot, 1e-37),
                    0.0,
                )
            )
        return jnp.stack(vals)

    @lazy_property
    def DtoTstar_luminosity_weighted_mass_ratio(self):
        """(9,) 1 - 2 x (mass counter-rotating wrt each band's
        luminosity-weighted L) / (total stellar mass)."""
        if not self._has("PartType4/Luminosities"):
            return jnp.zeros(9, jnp.float32)
        vals = []
        for b in range(9):
            vel_rel = self._star_vel_local - self._star_vlum_coms[b][None, :]
            L = self._star_lum_L[b]
            Ldir = L / jnp.sqrt(jnp.maximum(jnp.sum(L * L), 1e-37))
            Li = jnp.sum(
                self._star_mass[:, None]
                * jnp.cross(self._star_pos_local, vel_rel)
                * Ldir[None, :],
                axis=1,
            )
            counter = self._star_sel & (Li < 0.0)
            m_counter = jnp.sum(jnp.where(counter, self._star_mass, 0.0))
            vals.append(
                jnp.where(
                    self.Mstar > 0,
                    1.0 - 2.0 * m_counter / jnp.maximum(self.Mstar, 1e-37),
                    0.0,
                )
            )
        return jnp.stack(vals)

    # ---- black holes ----

    @lazy_property
    def _bh_sel(self):
        return self._seg_arr(self.mask_bh, "PartType5")

    @lazy_property
    def Mbh_subgrid(self):
        if not self._has("PartType5/SubgridMasses"):
            return _zero()
        return jnp.sum(
            jnp.where(self._bh_sel, self.field("PartType5/SubgridMasses"), 0.0)
        )

    @lazy_property
    def _bh_max_idx(self):
        """(index, found) of the most massive (subgrid) selected BH."""
        sub = jnp.where(
            self._bh_sel, self.field("PartType5/SubgridMasses"), -jnp.inf
        )
        return jnp.argmax(sub), jnp.any(self._bh_sel)

    def _bh_max_field(self, name, fill=0.0):
        if not (self._has("PartType5/SubgridMasses") and self._has(name)):
            return jnp.float32(fill)
        idx, found = self._bh_max_idx
        val = self.field(name)[idx]
        return jnp.where(found, val, jnp.zeros_like(val) + fill)

    @lazy_property
    def BHmaxM(self):
        return self._bh_max_field("PartType5/SubgridMasses")

    @lazy_property
    def BHmaxID(self):
        if not (
            self._has("PartType5/SubgridMasses")
            and self._has("PartType5/ParticleIDs")
        ):
            return jnp.uint64(0)
        idx, found = self._bh_max_idx
        return jnp.where(found, self.field("PartType5/ParticleIDs")[idx], 0)

    @lazy_property
    def BHmaxpos(self):
        if not self._has("PartType5/SubgridMasses"):
            return jnp.zeros(3, jnp.float32)
        idx, found = self._bh_max_idx
        rel = self._seg_arr(self.parts.pos, "PartType5")[idx]
        return jnp.where(found, self.scalars.centre * self.ctx.a + rel, 0.0)

    @lazy_property
    def BHmaxvel(self):
        if not self._has("PartType5/SubgridMasses"):
            return jnp.zeros(3, jnp.float32)
        idx, found = self._bh_max_idx
        return jnp.where(
            found, self._seg_arr(self.parts.vel, "PartType5")[idx], 0.0
        )

    @lazy_property
    def BHmaxAR(self):
        return self._bh_max_field("PartType5/AccretionRates")

    @lazy_property
    def BHmaxlasteventa(self):
        return self._bh_max_field("PartType5/LastAGNFeedbackScaleFactors")

    @lazy_property
    def BHlasteventa(self):
        """Most recent AGN event scale factor over all selected BHs."""
        if not self._has("PartType5/LastAGNFeedbackScaleFactors"):
            return _zero()
        a = jnp.where(
            self._bh_sel, self.field("PartType5/LastAGNFeedbackScaleFactors"), 0.0
        )
        return jnp.max(a)

    @lazy_property
    def BlackHolesTotalInjectedThermalEnergy(self):
        if not self._has("PartType5/AGNTotalInjectedEnergies"):
            return _zero()
        return jnp.sum(
            jnp.where(
                self._bh_sel, self.field("PartType5/AGNTotalInjectedEnergies"), 0.0
            )
        )

    @lazy_property
    def BlackHolesTotalInjectedJetEnergy(self):
        if not self._has("PartType5/InjectedJetEnergies"):
            return _zero()
        return jnp.sum(
            jnp.where(self._bh_sel, self.field("PartType5/InjectedJetEnergies"), 0.0)
        )

    # ---- AGN recently-heated filter + *_no_agn temperatures ----

    @lazy_property
    def _gas_recently_heated(self):
        """Recently-AGN-heated gas (reference
        ``recently_heated_gas_filter.py:155-173``)."""
        if not self._has("PartType0/LastAGNFeedbackScaleFactors"):
            lo, hi = self.ctx.segment("PartType0")
            return jnp.zeros(hi - lo, bool)
        last_a = self.field("PartType0/LastAGNFeedbackScaleFactors")
        heated = last_a >= jnp.float32(self.ctx.agn_a_limit)
        if self._has("PartType0/Temperatures"):
            heated = (
                heated
                & (self._gas_temp >= jnp.float32(self.ctx.agn_Tmin))
                & (self._gas_temp <= jnp.float32(self.ctx.agn_Tmax))
            )
        return heated

    def _masked_mw_temperature(self, extra_mask):
        m = jnp.where(self._gas_sel & extra_mask, self._gas_mass, 0.0)
        mtot = jnp.sum(m)
        return jnp.where(
            mtot > 0,
            jnp.sum(m * self._gas_temp) / jnp.maximum(mtot, 1e-37),
            0.0,
        )

    @lazy_property
    def Tgas_no_agn(self):
        if not self._has("PartType0/Temperatures"):
            return _zero()
        return self._masked_mw_temperature(~self._gas_recently_heated)

    @lazy_property
    def Tgas_no_cool_no_agn(self):
        if not self._has("PartType0/Temperatures"):
            return _zero()
        return self._masked_mw_temperature(
            (~self._gas_recently_heated) & (self._gas_temp >= self.T_COOL_MAX)
        )

    # ---- averaged SFR (two recording windows) ----

    @lazy_property
    def AveragedStarFormationRate(self):
        if not self._has("PartType0/AveragedStarFormationRates"):
            return jnp.zeros(2, jnp.float32)
        avg = self.field("PartType0/AveragedStarFormationRates")
        return jnp.sum(jnp.where(self._gas_sel[:, None], avg, 0.0), axis=0)

    # ---- dust ----

    @lazy_property
    def DustMass(self):
        if not self._has("PartType0/TotalDustMassFractions"):
            return _zero()
        return jnp.sum(
            jnp.where(
                self._gas_sel,
                self._gas_mass * self.field("PartType0/TotalDustMassFractions"),
                0.0,
            )
        )

    @lazy_property
    def HalfMassRadiusDust(self):
        if not self._has("PartType0/TotalDustMassFractions"):
            return _zero()
        lo, hi = self.ctx.segment("PartType0")
        w = jnp.zeros(self.parts.valid.shape[0], jnp.float32)
        w = w.at[lo:hi].set(
            self._gas_mass * self.field("PartType0/TotalDustMassFractions")
        )
        return radii_ops.half_weight_radius_sorted(
            self._prof_r_sorted,
            w[self._prof_order],
            self._prof_gas_sorted,
            self.DustMass,
        )

    # ---- thermal / potential energies ----

    @lazy_property
    def ThermalEnergyGas(self):
        """Sum m * u with u = P / ((gamma - 1) rho), gamma = 5/3
        (reference ``subhalo_properties.py`` ThermalEnergyGas)."""
        if not (
            self._has("PartType0/Pressures") and self._has("PartType0/Densities")
        ):
            return _zero()
        u = self.field("PartType0/Pressures") / (
            (5.0 / 3.0 - 1.0)
            * jnp.maximum(self.field("PartType0/Densities"), 1e-37)
        )
        return jnp.sum(jnp.where(self._gas_sel, self._gas_mass * u, 0.0))

    @lazy_property
    def PotentialEnergyTotal(self):
        """Sum of m * specific potential / 2 over all selected types
        (pairwise energies counted once)."""
        total = _zero()
        for ptype, mass_name in (
            ("PartType0", None),
            ("PartType1", None),
            ("PartType4", None),
            ("PartType5", "PartType5/DynamicalMasses"),
        ):
            key = f"{ptype}/SpecificPotentialEnergies"
            if not self._has(key):
                continue
            lo, hi = self.ctx.segment(ptype)
            sel = self._seg_arr(self.selection, ptype)
            m = (
                self.field(mass_name)
                if mass_name and self._has(mass_name)
                else self._seg_arr(self.parts.mass, ptype)
            )
            total = total + 0.5 * jnp.sum(
                jnp.where(sel, m * self.field(key), 0.0)
            )
        return total

    # ---- stellar birth statistics (median / min / max) ----

    def _star_birth_stat(self, name, stat):
        if not self._has(name):
            return _zero()
        vals = self.field(name)
        sel = self._star_sel
        if stat == "min":
            return jnp.min(jnp.where(sel, vals, jnp.inf))
        if stat == "max":
            return jnp.max(jnp.where(sel, vals, -jnp.inf))
        # masked median matching np.median: average the two middle values
        v = jnp.sort(jnp.where(sel, vals, jnp.inf))
        n = jnp.sum(sel.astype(jnp.int32))
        i_lo = jnp.maximum((n - 1) // 2, 0)
        i_hi = jnp.maximum(n // 2, 0)
        med = 0.5 * (jnp.take(v, i_lo) + jnp.take(v, i_hi))
        return jnp.where(n > 0, med, 0.0)

    @lazy_property
    def MedianStellarBirthDensity(self):
        return self._star_birth_stat("PartType4/BirthDensities", "median")

    @lazy_property
    def MinimumStellarBirthDensity(self):
        v = self._star_birth_stat("PartType4/BirthDensities", "min")
        return jnp.where(jnp.isfinite(v), v, 0.0)

    @lazy_property
    def MaximumStellarBirthDensity(self):
        v = self._star_birth_stat("PartType4/BirthDensities", "max")
        return jnp.where(jnp.isfinite(v), v, 0.0)

    @lazy_property
    def MedianStellarBirthTemperature(self):
        return self._star_birth_stat("PartType4/BirthTemperatures", "median")

    @lazy_property
    def MinimumStellarBirthTemperature(self):
        v = self._star_birth_stat("PartType4/BirthTemperatures", "min")
        return jnp.where(jnp.isfinite(v), v, 0.0)

    @lazy_property
    def MaximumStellarBirthTemperature(self):
        v = self._star_birth_stat("PartType4/BirthTemperatures", "max")
        return jnp.where(jnp.isfinite(v), v, 0.0)

    @lazy_property
    def _star_birth_pressure(self):
        """Birth pressure P = rho * k_B * T (ideal gas, mean molecular
        weight folded into the table unit convention)."""
        return self.field("PartType4/BirthDensities") * self.field(
            "PartType4/BirthTemperatures"
        )

    def _birth_pressure_stat(self, stat):
        if not (
            self._has("PartType4/BirthDensities")
            and self._has("PartType4/BirthTemperatures")
        ):
            return _zero()
        vals = self._star_birth_pressure
        sel = self._star_sel
        if stat == "min":
            v = jnp.min(jnp.where(sel, vals, jnp.inf))
            return jnp.where(jnp.isfinite(v), v, 0.0)
        if stat == "max":
            v = jnp.max(jnp.where(sel, vals, -jnp.inf))
            return jnp.where(jnp.isfinite(v), v, 0.0)
        v = jnp.sort(jnp.where(sel, vals, jnp.inf))
        n = jnp.sum(sel.astype(jnp.int32))
        med = 0.5 * (
            jnp.take(v, jnp.maximum((n - 1) // 2, 0))
            + jnp.take(v, jnp.maximum(n // 2, 0))
        )
        return jnp.where(n > 0, med, 0.0)

    @lazy_property
    def MedianStellarBirthPressure(self):
        return self._birth_pressure_stat("median")

    @lazy_property
    def MinimumStellarBirthPressure(self):
        return self._birth_pressure_stat("min")

    @lazy_property
    def MaximumStellarBirthPressure(self):
        return self._birth_pressure_stat("max")

    @lazy_property
    def LastSupernovaEventMaximumGasDensity(self):
        """Max over gas of the larger of the last SNII thermal/kinetic
        feedback densities."""
        have_t = self._has("PartType0/LastSNIIThermalFeedbackDensities")
        have_k = self._has("PartType0/LastSNIIKineticFeedbackDensities")
        if not (have_t or have_k):
            return _zero()
        dens = None
        if have_t:
            dens = self.field("PartType0/LastSNIIThermalFeedbackDensities")
        if have_k:
            k = self.field("PartType0/LastSNIIKineticFeedbackDensities")
            dens = k if dens is None else jnp.maximum(dens, k)
        v = jnp.max(jnp.where(self._gas_sel, dens, -jnp.inf))
        return jnp.where(jnp.isfinite(v), v, 0.0)

    # ---- X-ray / Compton-y / spectroscopic-like temperatures ----
    # X-ray luminosities are per-particle datasets (snapshot or the
    # recalculated extra-input tables, reference ``swift_cells.py:350-372``);
    # the properties are masked band-wise sums (``SO_properties.py:1709``).

    def _gas_band_sum(self, name, extra_mask=None, bands=3):
        if not self._has(name):
            return jnp.zeros(bands, jnp.float32)
        mask = self._gas_sel if extra_mask is None else (self._gas_sel & extra_mask)
        return jnp.sum(jnp.where(mask[:, None], self.field(name), 0.0), axis=0)

    @lazy_property
    def Xraylum(self):
        return self._gas_band_sum("PartType0/XrayLuminosities")

    @lazy_property
    def Xrayphlum(self):
        return self._gas_band_sum("PartType0/XrayPhotonLuminosities")

    @lazy_property
    def Xraylum_restframe(self):
        return self._gas_band_sum("PartType0/XrayLuminositiesRestframe")

    @lazy_property
    def Xrayphlum_restframe(self):
        return self._gas_band_sum("PartType0/XrayPhotonLuminositiesRestframe")

    @lazy_property
    def Xraylum_no_agn(self):
        return self._gas_band_sum(
            "PartType0/XrayLuminosities", ~self._gas_recently_heated
        )

    @lazy_property
    def Xrayphlum_no_agn(self):
        return self._gas_band_sum(
            "PartType0/XrayPhotonLuminosities", ~self._gas_recently_heated
        )

    @lazy_property
    def Xraylum_restframe_no_agn(self):
        return self._gas_band_sum(
            "PartType0/XrayLuminositiesRestframe", ~self._gas_recently_heated
        )

    @lazy_property
    def Xrayphlum_restframe_no_agn(self):
        return self._gas_band_sum(
            "PartType0/XrayPhotonLuminositiesRestframe", ~self._gas_recently_heated
        )

    @lazy_property
    def compY(self):
        if not self._has("PartType0/ComptonYParameters"):
            return _zero()
        return jnp.sum(
            jnp.where(
                self._gas_sel, self.field("PartType0/ComptonYParameters"), 0.0
            )
        )

    @lazy_property
    def compY_no_agn(self):
        if not self._has("PartType0/ComptonYParameters"):
            return _zero()
        return jnp.sum(
            jnp.where(
                self._gas_sel & (~self._gas_recently_heated),
                self.field("PartType0/ComptonYParameters"),
                0.0,
            )
        )

    def _cy_weighted_T(self, extra_mask=None):
        """Compton-y-weighted mean temperature (``SO_properties.py:1472``)."""
        if not (
            self._has("PartType0/ComptonYParameters")
            and self._has("PartType0/Temperatures")
        ):
            return _zero()
        mask = self._gas_sel if extra_mask is None else (self._gas_sel & extra_mask)
        y = jnp.where(mask, self.field("PartType0/ComptonYParameters"), 0.0)
        ysum = jnp.sum(y)
        return jnp.where(
            ysum > 0,
            jnp.sum(y * self._gas_temp) / jnp.maximum(ysum, 1e-37),
            0.0,
        )

    @lazy_property
    def Tgas_cy_weighted(self):
        return self._cy_weighted_T()

    @lazy_property
    def Tgas_cy_weighted_no_agn(self):
        return self._cy_weighted_T(~self._gas_recently_heated)

    #: X-ray temperature selection threshold (``SO_properties.py``
    #: gas_selection_xray_temperature)
    T_XRAY_MIN = 1.16e6

    def _spectroscopic_like_T(self, extra_mask=None):
        """rho m T^(1/4) / rho m T^(-3/4) over gas hotter than 1.16e6 K
        (``SO_properties.py:2110``)."""
        if not (
            self._has("PartType0/Densities")
            and self._has("PartType0/Temperatures")
        ):
            return _zero()
        mask = self._gas_sel & (self._gas_temp > self.T_XRAY_MIN)
        if extra_mask is not None:
            mask = mask & extra_mask
        rho_m = self.field("PartType0/Densities") * self._gas_mass
        T = jnp.maximum(self._gas_temp, 1e-30)
        num = jnp.sum(jnp.where(mask, rho_m * T ** 0.25, 0.0))
        den = jnp.sum(jnp.where(mask, rho_m * T ** -0.75, 0.0))
        return jnp.where(den > 0, num / jnp.maximum(den, 1e-37), 0.0)

    @lazy_property
    def SpectroscopicLikeTemperature(self):
        return self._spectroscopic_like_T()

    @lazy_property
    def SpectroscopicLikeTemperature_no_agn(self):
        return self._spectroscopic_like_T(~self._gas_recently_heated)

    # ---- neutrinos ----

    @lazy_property
    def MnuNS(self):
        """Noise-suppressed neutrino mass: sum of weighted masses (the
        concatenated mass array already carries the weights)."""
        return red.masked_sum(self.parts.mass, self.mask_nu)

    # ---- DM-only softened Vmax ----

    @lazy_property
    def _vmax_dm_soft(self):
        return self._vmax_soft_for(
            self._dm_sorted, self.mask_dm, ptypes=("PartType1",)
        )

    @lazy_property
    def DM_Vmax_soft(self):
        return jnp.sqrt(self.ctx.G * self._vmax_dm_soft.vmax_sq_over_G)

    @lazy_property
    def DM_R_vmax_soft(self):
        return self._vmax_dm_soft.radius


#: "most massive BH" detail lookups: key -> (dataset, value shape, int?)
#: (each is the dataset value of the subgrid-most-massive selected BH;
#: reference ``subhalo_properties.py`` BHmax* family)
_BH_MAX_DETAIL = {
    "MostMassiveBlackHoleAveragedAccretionRate": (
        "PartType5/AveragedAccretionRates", (2,), False),
    "MostMassiveBlackHoleAccretionMode": (
        "PartType5/AccretionModes", (), True),
    "MostMassiveBlackHoleFormationScalefactor": (
        "PartType5/FormationScaleFactors", (), False),
    "MostMassiveBlackHoleGWMassLoss": (
        "PartType5/GWMassLosses", (), False),
    "MostMassiveBlackHoleInjectedJetEnergyByMode": (
        "PartType5/InjectedJetEnergiesByMode", (3,), False),
    "MostMassiveBlackHoleInjectedThermalEnergy": (
        "PartType5/AGNTotalInjectedEnergies", (), False),
    "MostMassiveBlackHoleLastJetEventScalefactor": (
        "PartType5/LastAGNJetScaleFactors", (), False),
    "MostMassiveBlackHoleNumberOfAGNEvents": (
        "PartType5/NumberOfAGNEvents", (), True),
    "MostMassiveBlackHoleNumberOfAGNJetEvents": (
        "PartType5/NumberOfAGNJetEvents", (), True),
    "MostMassiveBlackHoleNumberOfMergers": (
        "PartType5/NumberOfMergers", (), True),
    "MostMassiveBlackHoleRadiatedEnergyByMode": (
        "PartType5/RadiatedEnergiesByMode", (3,), False),
    "MostMassiveBlackHoleSpin": ("PartType5/Spins", (), False),
    "MostMassiveBlackHoleTotalAccretedMass": (
        "PartType5/TotalAccretedMasses", (), False),
    "MostMassiveBlackHoleTotalAccretedMassesByMode": (
        "PartType5/TotalAccretedMassesByMode", (3,), False),
    "MostMassiveBlackHoleWindEnergyByMode": (
        "PartType5/WindEnergiesByMode", (3,), False),
}


def _make_bh_detail(key, dataset, shape, is_int):
    def method(self):
        dtype = jnp.int32 if is_int else jnp.float32
        if not (self._has("PartType5/SubgridMasses") and self._has(dataset)):
            return jnp.zeros(shape, dtype)
        idx, found = self._bh_max_idx
        val = self.field(dataset)[idx]
        return jnp.where(found, val, jnp.zeros(shape, val.dtype))

    method.__name__ = key
    method.__doc__ = f"{dataset} of the most massive (subgrid) bound BH."
    return lazy_property(method)


for _key, (_ds, _shape, _int) in _BH_MAX_DETAIL.items():
    setattr(HaloSlice, _key, _make_bh_detail(_key, _ds, _shape, _int))


class BoundSubhaloSlice(HaloSlice):
    """``BoundSubhalo/*`` selection: particles bound to this subhalo."""

    @lazy_property
    def selection(self):
        return self.bound_mask

    @lazy_property
    def _sel_sorted(self):
        # selection == bound_mask: the sort payload, no gather
        return self._bound_sorted

    def _star_sel_sorted(self):
        return self._star_sort_bound


class SOSlice(HaloSlice):
    """``SO/<X>/*`` selection: ALL particles inside the spherical
    overdensity radius (centrals only; reference ``SO_properties.py:3627``).

    ``target_density`` is the PHYSICAL threshold density (e.g. 200 x
    critical); for fixed physical radii pass ``physical_radius`` instead.
    """

    def __init__(
        self,
        ctx: HaloContext,
        parts: HaloParticles,
        scalars: HaloScalars,
        target_density: Optional[jnp.ndarray] = None,
        physical_radius: Optional[jnp.ndarray] = None,
        virial: bool = True,
        aux: Optional[Dict[str, object]] = None,
        core_excision_fraction: Optional[float] = None,
    ):
        super().__init__(ctx, parts, scalars, aux)
        self.target_density = target_density
        self.physical_radius = physical_radius
        self.core_excision_fraction = core_excision_fraction
        # crit/mean/BN98 definitions (incl. radius multiples of them) are
        # "virial"; fixed-kpc SOs are not (``SO_properties.py:3455-3469``)
        self.virial_definition = virial

    def _inertia_cfg(self, species: str):
        """SO inertia: sphere = SO radius, ALL candidates of the species
        (the ellipsoid may deform beyond R_SO), search-radius check on
        (``SO_properties.py:620-670``)."""
        masks = {
            "tot": (self.parts.valid, self.SO_mass),
            "gas": (self._valid_type_mask("PartType0"), self.Mgas),
            "dm": (self._valid_type_mask("PartType1"), self.Mdm),
            "star": (self._valid_type_mask("PartType4"), self.Mstar),
        }
        mask, gate = masks[species]
        return mask, self.r, self.scalars.search_radius, gate

    def _inertia_mask_sorted(self, species: str):
        if species == "tot":
            return self._valid_sorted
        pt = {"gas": "PartType0", "dm": "PartType1", "star": "PartType4"}[
            species
        ]
        return self._valid_sorted & self._seg_sorted(pt)

    def _inertia_star_mask_sorted(self):
        return jnp.isfinite(self._star_sort_r)

    @lazy_property
    def _so_solution(self) -> so_ops.SOResult:
        res = so_ops.so_radius_sorted(
            self._r_sorted,
            self._m_sorted,
            self._valid_sorted,
            self.target_density,
            jnp.float32(self.ctx.nu_density),
        )
        self.add_flag(res.needs_bigger)
        return res

    @lazy_property
    def r(self):
        """The SO radius (``SORadius``)."""
        if self.physical_radius is not None:
            return self.physical_radius
        return self._so_solution.radius

    @lazy_property
    def SO_mass(self):
        if self.physical_radius is not None:
            return so_ops.enclosed_mass_sorted(
                self._r_sorted,
                self._m_sorted,
                self._valid_sorted,
                self.physical_radius,
                jnp.float32(self.ctx.nu_density),
            )
        return self._so_solution.mass

    @lazy_property
    def exists(self):
        return (self.r > 0) & (self.SO_mass > 0)

    @lazy_property
    def selection(self):
        """All particles within the SO radius (``SO_properties.py:485``)."""
        return self.parts.valid & (self.radius < self.r) & self.exists

    @lazy_property
    def _sel_sorted(self):
        # derived elementwise from the sorted radius key (no gather)
        return self._valid_sorted & (self._r_sorted < self.r) & self.exists

    @lazy_property
    def Mtot(self):
        """SO mass is defined by the density threshold crossing, not a
        particle sum (``SO_properties.py:356-452``)."""
        return self.SO_mass

    # -- satellite / external fractions (``SO_properties.py:459-466,675-697``)

    @lazy_property
    def _halo_fofid(self):
        """FOF id of the halo = FOFGroupID of the closest non-neutrino
        particle (reference ``SO_properties.py:408-409``), NOT the
        catalogue's HostHaloId: in production the snapshot's SWIFT FOF
        ids and the halo finder's host ids are different id spaces, so
        only the central particle's own label is comparable to the
        other particles' labels."""
        p = self.parts
        ok = p.valid & ~self.type_mask("PartType6")
        i = jnp.argmin(jnp.where(ok, self.radius, jnp.inf))
        return p.fofid[i]

    @lazy_property
    def _bound_to_satellite(self):
        p = self.parts
        return (
            self.selection
            & (p.groupnr >= 0)
            & (p.groupnr != self.scalars.index)
            & (p.fofid == self._halo_fofid)
        )

    @lazy_property
    def _bound_to_external(self):
        p = self.parts
        return (
            self.selection
            & (p.groupnr >= 0)
            & (p.groupnr != self.scalars.index)
            & (p.fofid != self._halo_fofid)
        )

    @lazy_property
    def Mfrac_satellites(self):
        m = red.masked_sum(self.parts.mass, self._bound_to_satellite)
        return jnp.where(self.exists, m / jnp.maximum(self.SO_mass, 1e-37), 0.0)

    @lazy_property
    def Mfrac_external(self):
        m = red.masked_sum(self.parts.mass, self._bound_to_external)
        return jnp.where(self.exists, m / jnp.maximum(self.SO_mass, 1e-37), 0.0)

    # -- concentration (``SO_properties.py:2725-2790``)

    # -- shell flow rates (``SO_properties.py:2815-3057``)

    @lazy_property
    def vcom_ten_percent(self):
        inside = self.parts.valid & (self.radius < 0.1 * self.r)
        return red.centre_of_mass_velocity(self.parts.mass, self.parts.vel, inside)

    @lazy_property
    def vcom_thirty_percent(self):
        inside = self.parts.valid & (self.radius < 0.3 * self.r)
        return red.centre_of_mass_velocity(self.parts.mass, self.parts.vel, inside)

    def _flow_rate_mass(self, mask_species, weights, fast_outflows=False):
        return self._flow_rate(mask_species, weights, "mass", fast_outflows)

    #: shell fractions of R_SO for the flow rates
    _FLOW_FRACS = (0.1, 0.3, 1.0)

    @lazy_property
    def _flow_shells(self):
        """Config-independent shell kinematics, computed ONCE for the
        ~17 flow-rate configs (species x metal x 4 T-bands x 3 flow
        types): per shell fraction the radial velocity about the
        fraction's CoM frame, the geometric shell mask, the shell
        width, and the kinetic term.  Every config previously rebuilt
        dv / v_r / the shell window from scratch
        (``SO_properties.py:2847-2908`` recomputes them per call too —
        per halo on CPU that is cache-resident; per (B, lanes, K) on
        TPU it was ~6x redundant HBM traffic and ~100 extra fused
        reduce chains in the program)."""
        r = self.radius
        rhat = self.parts.pos / jnp.maximum(r, 1e-37)[:, None]
        # pseudo-evolution of the SO radius (``SO_properties.py:2875-2884``)
        Rdot_base = (2.0 / 3.0) * (
            self.ctx.G * self.SO_mass * self.ctx.H / 100.0
        ) ** (1.0 / 3.0)
        Rdot_base = Rdot_base * (
            2.0 * self.ctx.omega_g + 1.5 * self.ctx.omega_m
        )
        vcoms = {
            0.1: self.vcom_ten_percent,
            0.3: self.vcom_thirty_percent,
            1.0: self.vcom,
        }
        out = {}
        for frac in self._FLOW_FRACS:
            R = frac * self.r
            dR = 0.1 * R
            self.add_flag(
                self.exists & (R + 0.5 * dR > self.scalars.search_radius)
            )
            geom = (r > R - 0.5 * dR) & (r < R + 0.5 * dR)
            dv = self.parts.vel - vcoms[frac][None, :]
            vx, vy, vz = dv[:, 0], dv[:, 1], dv[:, 2]
            v_r = (
                vx * rhat[:, 0] + vy * rhat[:, 1] + vz * rhat[:, 2]
            ) - frac * Rdot_base
            kinetic = 0.5 * (vx * vx + vy * vy + vz * vz)
            out[frac] = (v_r, geom, dR, kinetic)
        return out

    def _flow_rate(self, mask_species, weights, flow_type, fast_outflows=False):
        """In/outflow mass rates through shells at 0.1, 0.3, 1.0 x R_SO.

        Shell thickness dR = 0.1 R_shell; radial velocity is measured
        about the CoM velocity of particles within the shell's fraction
        radius, with the pseudo-evolution term R_dot subtracted
        (``SO_properties.py:2847-2908``); output is (6,): three inflow
        then three outflow rates — plus three fast-outflow rates
        (v_r > 0.25 Vmax_soft) when ``fast_outflows`` is on (shape 9).
        """
        shells = []
        for frac in self._FLOW_FRACS:
            v_r, geom, dR, kinetic = self._flow_shells[frac]
            in_shell = mask_species & geom
            if flow_type == "mass":
                fr = weights * jnp.abs(v_r)
            elif flow_type == "energy":
                # m |v_r| (kinetic + internal); SO_properties.py:2894-2899
                fr = weights * jnp.abs(v_r) * (kinetic + self._u_full)
            elif flow_type == "momentum":
                # m (v_r^2 + c_s^2/gamma), c_s^2 = gamma(gamma-1) u
                fr = weights * (v_r**2 + (5.0 / 3.0 - 1.0) * self._u_full)
            else:
                raise ValueError(flow_type)
            inflow = jnp.sum(jnp.where(in_shell & (v_r < 0), fr, 0.0)) / dR
            outflow = jnp.sum(jnp.where(in_shell & (v_r > 0), fr, 0.0)) / dR
            fast = jnp.sum(
                jnp.where(in_shell & (v_r > 0.25 * self.Vmax_soft), fr, 0.0)
            ) / dR
            shells.append((inflow, outflow, fast))
        flat = [s[0] for s in shells] + [s[1] for s in shells]
        if fast_outflows:
            flat += [s[2] for s in shells]
        out = jnp.stack(flat)
        return jnp.where(self.exists, out, 0.0)

    #: temperature bands for the sliced gas flow rates (K); reference
    #: ``SO_properties.py:3057-3104``
    _GAS_T_BANDS = {
        "Cold": (None, 1.0e3),
        "Cool": (1.0e3, 1.0e5),
        "Warm": (1.0e5, 1.0e7),
        "Hot": (1.0e7, None),
    }

    @lazy_property
    def _u_full(self):
        """Specific internal energies scattered to the full concatenated
        axis (zero outside the gas segment)."""
        u = jnp.zeros(self.parts.valid.shape[0], jnp.float32)
        if self._has("PartType0/InternalEnergies"):
            lo, hi = self.ctx.segment("PartType0")
            u = u.at[lo:hi].set(self.field("PartType0/InternalEnergies"))
        return u

    def _gas_T_flow(self, band, flow_type="mass"):
        if not (self.virial_definition and self._has("PartType0/Temperatures")):
            return jnp.zeros(9, jnp.float32)
        if flow_type != "mass" and not self._has("PartType0/InternalEnergies"):
            return jnp.zeros(9, jnp.float32)
        tmin, tmax = self._GAS_T_BANDS[band]
        lo, hi = self.ctx.segment("PartType0")
        t_full = jnp.zeros(self.parts.valid.shape[0], jnp.float32)
        t_full = t_full.at[lo:hi].set(self._gas_temp)
        mask = self._valid_type_mask("PartType0")
        if tmin is not None:
            mask = mask & (t_full > tmin)
        if tmax is not None:
            mask = mask & (t_full < tmax)
        return self._flow_rate(mask, self.parts.mass, flow_type, fast_outflows=True)

    @lazy_property
    def ColdGasMassFlowRate(self):
        return self._gas_T_flow("Cold")

    @lazy_property
    def CoolGasMassFlowRate(self):
        return self._gas_T_flow("Cool")

    @lazy_property
    def WarmGasMassFlowRate(self):
        return self._gas_T_flow("Warm")

    @lazy_property
    def HotGasMassFlowRate(self):
        return self._gas_T_flow("Hot")

    @lazy_property
    def ColdGasEnergyFlowRate(self):
        return self._gas_T_flow("Cold", "energy")

    @lazy_property
    def CoolGasEnergyFlowRate(self):
        return self._gas_T_flow("Cool", "energy")

    @lazy_property
    def WarmGasEnergyFlowRate(self):
        return self._gas_T_flow("Warm", "energy")

    @lazy_property
    def HotGasEnergyFlowRate(self):
        return self._gas_T_flow("Hot", "energy")

    @lazy_property
    def ColdGasMomentumFlowRate(self):
        return self._gas_T_flow("Cold", "momentum")

    @lazy_property
    def CoolGasMomentumFlowRate(self):
        return self._gas_T_flow("Cool", "momentum")

    @lazy_property
    def WarmGasMomentumFlowRate(self):
        return self._gas_T_flow("Warm", "momentum")

    @lazy_property
    def HotGasMomentumFlowRate(self):
        return self._gas_T_flow("Hot", "momentum")

    @lazy_property
    def MetalMassFlowRate(self):
        if not (
            self.virial_definition
            and self._has("PartType0/MetalMassFractions")
        ):
            return jnp.zeros(6, jnp.float32)
        lo, hi = self.ctx.segment("PartType0")
        w = jnp.zeros(self.parts.valid.shape[0], jnp.float32)
        w = w.at[lo:hi].set(
            self._gas_mass * self.field("PartType0/MetalMassFractions")
        )
        return self._flow_rate_mass(self._valid_type_mask("PartType0"), w)

    def _valid_type_mask(self, ptype: str) -> jnp.ndarray:
        """All VALID candidates of a type — flow-rate shells extend beyond
        the SO radius, so the SO selection must not be applied."""
        lo, hi = self.ctx.segment(ptype)
        k = self.parts.valid.shape[0]
        row = jnp.arange(k, dtype=jnp.int32)
        return self.parts.valid & (row >= lo) & (row < hi)

    @lazy_property
    def DarkMatterMassFlowRate(self):
        if not self.virial_definition:
            return jnp.zeros(6, jnp.float32)
        return self._flow_rate_mass(
            self._valid_type_mask("PartType1"), self.parts.mass
        )

    @lazy_property
    def StellarMassFlowRate(self):
        if not self.virial_definition:
            return jnp.zeros(6, jnp.float32)
        return self._flow_rate_mass(
            self._valid_type_mask("PartType4"), self.parts.mass
        )

    def _concentration(self, radius_arr):
        """R1-statistic concentration with missed-mass correction."""
        r_clipped = jnp.where(self.selection, radius_arr, 0.0)
        R1 = jnp.sum(jnp.where(self.selection, self.parts.mass * r_clipped, 0.0))
        missed = self.SO_mass - red.masked_sum(self.parts.mass, self.selection)
        # uniform neutrino background contribution
        R1 = R1 + jnp.pi * self.ctx.nu_density * self.r**4
        missed = missed - self.ctx.nu_density * (4.0 / 3.0) * jnp.pi * self.r**3
        R1 = R1 + missed * self.r
        R1 = R1 / jnp.maximum(self.r * self.SO_mass, 1e-37)
        # polynomial fit of log10(c) in log10(R1), Wang+23 style
        poly = jnp.array([-79.71, -222.46, -250.14, -140.17, -43.59, -5.07])
        x = jnp.log10(jnp.maximum(R1, 1e-10))
        logc = jnp.polyval(poly, x)
        logc = jnp.clip(logc, 0.0, 3.0)
        n_sel = red.masked_count(self.selection)
        ok = self.exists & (n_sel >= 10)
        return jnp.where(ok, 10.0**logc, 0.0)

    @lazy_property
    def _dm_missed_mass(self):
        """Interpolated mass of the first DM particle beyond R_SO
        (``SO_properties.py:468-482``): m2 (R_SO - r1) / (r2 - r1)."""
        dm_valid = self._valid_type_mask("PartType1")
        inside = dm_valid & (self.radius < self.r)
        outside = dm_valid & (self.radius >= self.r)
        r1 = jnp.max(jnp.where(inside, self.radius, -jnp.inf))
        r_out = jnp.where(outside, self.radius, jnp.inf)
        i2 = jnp.argmin(r_out)
        r2 = jnp.take(r_out, i2)
        m2 = jnp.take(self.parts.mass, i2)
        ok = jnp.any(inside) & jnp.any(outside) & (r2 > r1)
        return jnp.where(
            ok, m2 * (self.r - r1) / jnp.maximum(r2 - r1, 1e-37), 0.0
        )

    def _concentration_dmo(self, radius_arr):
        """DM-only R1 concentration with missed-mass correction
        (``SO_properties.py:2767-2790``)."""
        R1 = jnp.sum(jnp.where(self.mask_dm, self.parts.mass * radius_arr, 0.0))
        R1 = R1 + self._dm_missed_mass * self.r
        denom = self.r * (self.Mdm + self._dm_missed_mass)
        R1 = R1 / jnp.maximum(denom, 1e-37)
        poly = jnp.array([-79.71, -222.46, -250.14, -140.17, -43.59, -5.07])
        logc = jnp.clip(jnp.polyval(poly, jnp.log10(jnp.maximum(R1, 1e-10))), 0.0, 3.0)
        ok = self.exists & (self.Ndm >= 10)
        return jnp.where(ok, 10.0**logc, 0.0)

    @lazy_property
    def concentration_dmo_unsoft(self):
        if not self.virial_definition:
            return _zero()
        return self._concentration_dmo(self.radius)

    @lazy_property
    def concentration_dmo_soft(self):
        if not self.virial_definition:
            return _zero()
        return self._concentration_dmo(self.soft_radius)

    @lazy_property
    def concentration_unsoft(self):
        if not self.virial_definition:
            return _zero()
        return self._concentration(self.radius)

    @lazy_property
    def concentration_soft(self):
        if not self.virial_definition:
            return _zero()
        return self._concentration(self.soft_radius)

    # ---- DopplerB toward the lightcone observer ----

    @lazy_property
    def DopplerB(self):
        """Doppler-B along the line of sight to the observer position
        (``SO_properties.py:2251``): sum of sigma_T/c * n_e * v_r *
        (V_particle / (pi R_SO^2))."""
        if not (
            self._has("PartType0/ElectronNumberDensities")
            and self._has("PartType0/Densities")
        ):
            return _zero()
        lo, hi = self.ctx.segment("PartType0")
        sel = self._seg_arr(self.selection, "PartType0")
        pos = self._seg_arr(self.parts.pos, "PartType0")
        vel = self._seg_arr(self.parts.vel, "PartType0")
        obs = jnp.asarray(self.ctx.observer_position, jnp.float32) * jnp.float32(
            self.ctx.a
        )
        relpos = pos + self.scalars.centre * self.ctx.a - obs[None, :]
        dist = jnp.sqrt(jnp.sum(relpos * relpos, axis=1))
        has_d = dist > 0
        vr = jnp.where(
            has_d, jnp.sum(vel * relpos, axis=1) / jnp.maximum(dist, 1e-37), 0.0
        )
        ne = self.field("PartType0/ElectronNumberDensities")
        volumes = self._gas_mass / jnp.maximum(
            self.field("PartType0/Densities"), 1e-37
        )
        area = jnp.pi * jnp.maximum(self.r, 1e-37) ** 2
        # sigma_T / c in (Mpc^2, km/s) internal units ~ 2.3e-79: far below
        # the f32 range, so the reduction runs in f64 (cheap: one masked
        # sum) and the tiny constant is applied there.
        SIGMA_T_OVER_C = 6.6524587158e-29 / (3.0856775815e22**2) / 2.99792458e5
        total = jnp.sum(
            jnp.where(sel, ne * vr * volumes, 0.0).astype(jnp.float64)
        ) / area.astype(jnp.float64)
        out = SIGMA_T_OVER_C * total
        return jnp.where(self.exists, out, 0.0).astype(jnp.float32)

    # ---- satellite-excluded X-ray luminosities ----

    @lazy_property
    def _gas_not_satellite(self):
        """Gas not bound to another subhalo of the same FOF group."""
        return ~self._seg_arr(self._bound_to_satellite, "PartType0")

    @lazy_property
    def XRayLuminosityNoSat(self):
        return self._gas_band_sum(
            "PartType0/XrayLuminosities", self._gas_not_satellite
        )

    @lazy_property
    def XRayLuminosityCoreExcisionNoSat(self):
        return self._gas_band_sum(
            "PartType0/XrayLuminosities",
            self._gas_not_satellite & self._gas_core_excised,
        )

    # ---- core-excised variants (CoreExcisedSOProperties,
    #      ``SO_properties.py:3745-3794``) ----

    @lazy_property
    def _gas_core_excised(self):
        """Gas outside the excised core r < f x R_SO."""
        f = self.core_excision_fraction or 0.0
        r_gas = self._seg_arr(self.radius, "PartType0")
        return r_gas > jnp.float32(f) * self.r

    @lazy_property
    def Tgas_core_excision(self):
        if not self._has("PartType0/Temperatures"):
            return _zero()
        return self._masked_mw_temperature(self._gas_core_excised)

    @lazy_property
    def Tgas_no_cool_core_excision(self):
        if not self._has("PartType0/Temperatures"):
            return _zero()
        return self._masked_mw_temperature(
            self._gas_core_excised & (self._gas_temp >= self.T_COOL_MAX)
        )

    @lazy_property
    def Tgas_no_agn_core_excision(self):
        if not self._has("PartType0/Temperatures"):
            return _zero()
        return self._masked_mw_temperature(
            self._gas_core_excised & (~self._gas_recently_heated)
        )

    @lazy_property
    def Tgas_no_cool_no_agn_core_excision(self):
        if not self._has("PartType0/Temperatures"):
            return _zero()
        return self._masked_mw_temperature(
            self._gas_core_excised
            & (~self._gas_recently_heated)
            & (self._gas_temp >= self.T_COOL_MAX)
        )

    @lazy_property
    def Tgas_cy_weighted_core_excision(self):
        return self._cy_weighted_T(self._gas_core_excised)

    @lazy_property
    def Tgas_cy_weighted_core_excision_no_agn(self):
        return self._cy_weighted_T(
            self._gas_core_excised & (~self._gas_recently_heated)
        )

    @lazy_property
    def SpectroscopicLikeTemperature_core_excision(self):
        return self._spectroscopic_like_T(self._gas_core_excised)

    @lazy_property
    def SpectroscopicLikeTemperature_no_agn_core_excision(self):
        return self._spectroscopic_like_T(
            self._gas_core_excised & (~self._gas_recently_heated)
        )

    @lazy_property
    def Xraylum_core_excision(self):
        return self._gas_band_sum(
            "PartType0/XrayLuminosities", self._gas_core_excised
        )

    @lazy_property
    def Xraylum_no_agn_core_excision(self):
        return self._gas_band_sum(
            "PartType0/XrayLuminosities",
            self._gas_core_excised & (~self._gas_recently_heated),
        )

    @lazy_property
    def Xrayphlum_core_excision(self):
        return self._gas_band_sum(
            "PartType0/XrayPhotonLuminosities", self._gas_core_excised
        )

    @lazy_property
    def Xrayphlum_no_agn_core_excision(self):
        return self._gas_band_sum(
            "PartType0/XrayPhotonLuminosities",
            self._gas_core_excised & (~self._gas_recently_heated),
        )

    @lazy_property
    def Xraylum_restframe_core_excision(self):
        return self._gas_band_sum(
            "PartType0/XrayLuminositiesRestframe", self._gas_core_excised
        )

    @lazy_property
    def Xraylum_restframe_no_agn_core_excision(self):
        return self._gas_band_sum(
            "PartType0/XrayLuminositiesRestframe",
            self._gas_core_excised & (~self._gas_recently_heated),
        )

    @lazy_property
    def Xrayphlum_restframe_core_excision(self):
        return self._gas_band_sum(
            "PartType0/XrayPhotonLuminositiesRestframe", self._gas_core_excised
        )

    @lazy_property
    def Xrayphlum_restframe_no_agn_core_excision(self):
        return self._gas_band_sum(
            "PartType0/XrayPhotonLuminositiesRestframe",
            self._gas_core_excised & (~self._gas_recently_heated),
        )

    @lazy_property
    def spin_parameter(self):
        """SO spin: lambda = |L| / (sqrt(2) M V R) with V = sqrt(G M / R)
        at the SO radius."""
        vel_rel = self.parts.vel - self.vcom[None, :]
        L = kin.angular_momentum(self.parts.mass, self.parts.pos, vel_rel, self.selection)
        Lnorm = jnp.sqrt(jnp.sum(L * L))
        lam = kin.spin_parameter(Lnorm, self.SO_mass, self.r, self.ctx.G)
        return jnp.where(self.exists, lam, 0.0)


class ApertureSlice(HaloSlice):
    """``ExclusiveSphere/<R>kpc`` (bound only) or ``InclusiveSphere/<R>kpc``
    (all particles) within a fixed physical radius
    (``aperture_properties.py:270-317``)."""

    def __init__(
        self,
        ctx: HaloContext,
        parts: HaloParticles,
        scalars: HaloScalars,
        aperture_radius: jnp.ndarray,  # physical internal units
        inclusive: bool,
        aux: Optional[Dict[str, object]] = None,
    ):
        super().__init__(ctx, parts, scalars, aux)
        self.aperture_radius = aperture_radius
        self.inclusive = inclusive

    @lazy_property
    def selection(self):
        inside = self.parts.valid & (self.radius < self.aperture_radius)
        # aperture larger than the region read -> need a bigger region
        # (``aperture_properties.py:4140-4143``)
        self.add_flag(self.aperture_radius > self.scalars.search_radius)
        if self.inclusive:
            return inside
        return inside & self.bound_mask

    @lazy_property
    def _sel_sorted(self):
        # elementwise: radius cut on the sorted key, bound via payload
        self.add_flag(self.aperture_radius > self.scalars.search_radius)
        inside = self._valid_sorted & (self._r_sorted < self.aperture_radius)
        if self.inclusive:
            return inside
        return inside & self._bound_sorted

    def _star_sel_sorted(self):
        self.add_flag(self.aperture_radius > self.scalars.search_radius)
        inside = jnp.isfinite(self._star_sort_r) & (
            self._star_sort_r < self.aperture_radius
        )
        if self.inclusive:
            return inside
        return inside & self._star_sort_bound

    def _type_bound(self, ptype: str) -> jnp.ndarray:
        lo, hi = self.ctx.segment(ptype)
        k = self.parts.valid.shape[0]
        row = jnp.arange(k, dtype=jnp.int32)
        return self.bound_mask & (row >= lo) & (row < hi)

    def _inertia_cfg(self, species: str):
        """Aperture inertia: sphere = the aperture radius, ALL bound
        particles of the species regardless of the aperture (the ellipsoid
        may deform beyond it) — ``aperture_properties.py:3596-3610``."""
        masks = {
            "tot": (self.bound_mask, self.Mtot),
            "gas": (self._type_bound("PartType0"), self.Mgas),
            "dm": (self._type_bound("PartType1"), self.Mdm),
            "star": (self._type_bound("PartType4"), self.Mstar),
        }
        mask, gate = masks[species]
        return mask, self.aperture_radius, None, gate

    def _inertia_mask_sorted(self, species: str):
        if species == "tot":
            return self._bound_sorted
        pt = {"gas": "PartType0", "dm": "PartType1", "star": "PartType4"}[
            species
        ]
        return self._bound_sorted & self._seg_sorted(pt)


class ProjectedApertureSlice(HaloSlice):
    """``ProjectedAperture/<R>kpc/proj{x,y,z}``: bound particles within the
    projected radius along one axis, no line-of-sight cut
    (``projected_aperture_properties.py:98-143``)."""

    def __init__(
        self,
        ctx: HaloContext,
        parts: HaloParticles,
        scalars: HaloScalars,
        aperture_radius: jnp.ndarray,
        axis: int,  # 0, 1, 2 = projection along x, y, z
        aux: Optional[Dict[str, object]] = None,
    ):
        super().__init__(ctx, parts, scalars, aux)
        self.aperture_radius = aperture_radius
        self.axis = axis
        self._proj_dims = tuple(d for d in range(3) if d != axis)

    @lazy_property
    def proj_pos(self):
        return self.parts.pos[:, self._proj_dims]

    @lazy_property
    def proj_radius(self):
        p = self.proj_pos
        return jnp.sqrt(p[:, 0] * p[:, 0] + p[:, 1] * p[:, 1])

    @lazy_property
    def selection(self):
        self.add_flag(self.aperture_radius > self.scalars.search_radius)
        return self.bound_mask & (self.proj_radius < self.aperture_radius)

    # projected half-mass radii use the projected radius; ONE shared
    # valid-masked sort serves all of them, and because the sort key is
    # independent of the aperture radius it stays UNBATCHED under the
    # radius-block vmap.  The bound flag rides through the sort as a
    # payload; selection/type masks are derived elementwise in sorted
    # order (radius cut on the sorted key, segments from the sorted
    # permutation) — no per-lane permutation gathers.
    @lazy_property
    def _proj_sort(self):
        key = jnp.where(self.parts.valid, self.proj_radius, jnp.inf)
        iota = jnp.arange(key.shape[0], dtype=jnp.int32)
        r_s, order, m_s, b_s = jax.lax.sort(
            (key, iota, self.parts.mass, self.bound_mask),
            num_keys=1,
            is_stable=True,
        )
        return r_s, order, m_s, b_s

    @lazy_property
    def _proj_sel_sorted(self):
        r_s, _, _, b_s = self._proj_sort
        self.add_flag(self.aperture_radius > self.scalars.search_radius)
        return b_s & (r_s < self.aperture_radius)

    def _proj_seg_sorted(self, ptype: str) -> jnp.ndarray:
        lo, hi = self.ctx.segment(ptype)
        order = self._proj_sort[1]
        return (order >= lo) & (order < hi)

    # profile-radius view: base-class half-mass/half-light kernels
    # profile in the PROJECTED radius here (reference
    # ``projected_aperture_properties.py:1492-1566``)
    @property
    def _prof_r_sorted(self):
        return self._proj_sort[0]

    @property
    def _prof_m_sorted(self):
        return self._proj_sort[2]

    @property
    def _prof_order(self):
        return self._proj_sort[1]

    @property
    def _prof_sel_sorted(self):
        return self._proj_sel_sorted

    def _prof_seg_sorted(self, ptype: str) -> jnp.ndarray:
        return self._proj_seg_sorted(ptype)

    @property
    def _prof_gas_sorted(self):
        return self._proj_sel_sorted & self._proj_seg_sorted("PartType0")

    @property
    def _prof_star_radius(self):
        return self._seg_arr(self.proj_radius, "PartType4")

    def _proj_half_mass(self, sorted_mask, total):
        r_s, order, m_s, _ = self._proj_sort
        return radii_ops.half_weight_radius_sorted(r_s, m_s, sorted_mask, total)

    @lazy_property
    def HalfMassRadiusTot(self):
        return self._proj_half_mass(self._proj_sel_sorted, self.Mtot)

    @lazy_property
    def HalfMassRadiusGas(self):
        return self._proj_half_mass(
            self._proj_sel_sorted & self._proj_seg_sorted("PartType0"), self.Mgas
        )

    @lazy_property
    def HalfMassRadiusDM(self):
        return self._proj_half_mass(
            self._proj_sel_sorted & self._proj_seg_sorted("PartType1"), self.Mdm
        )

    @lazy_property
    def HalfMassRadiusStar(self):
        return self._proj_half_mass(
            self._proj_sel_sorted & self._proj_seg_sorted("PartType4"), self.Mstar
        )

    def _proj_veldisp(self, mask, vcom_species):
        """1D velocity dispersion along the projection axis
        (``projected_aperture_properties.py`` proj_veldisp_*)."""
        dv = self.parts.vel[:, self.axis] - vcom_species[self.axis]
        m = jnp.where(mask, self.parts.mass, 0.0)
        mtot = jnp.sum(m)
        var = jnp.sum(m * dv * dv) / jnp.maximum(mtot, 1e-37)
        return jnp.where(mtot > 0, jnp.sqrt(var), 0.0)

    # ---- projected inertia tensors (``inertia_tensors.py:226-343``) ----
    # Circle radius = the projected aperture radius; ALL bound particles
    # of the species (the ellipse may deform beyond the aperture).

    def _proj_mask_gate(self, species):
        return {
            "tot": (self.bound_mask, self.Mtot),
            "gas": (self._type_bound_proj("PartType0"), self.Mgas),
            "star": (self._type_bound_proj("PartType4"), self.Mstar),
        }[species]

    @lazy_property
    def _inertia_batch2d(self):
        """{(species, reduced, iterative, band|None): (3,) tensor} for
        every REQUESTED projected inertia key, one batched loop."""
        reqs = getattr(self, "_requested_keys", None)
        if reqs is None:
            return None
        configs = []
        for key in reqs:
            spec2d = _INERTIA2D_KEYS.get(key)
            if spec2d is None:
                continue
            species, red_, it, lum = spec2d
            if lum:
                if not self._has("PartType4/Luminosities"):
                    continue
                configs.extend((species, red_, it, b) for b in range(9))
            else:
                configs.append((species, red_, it, None))
        if not configs:
            return {}
        lo4, hi4 = self.ctx.segment("PartType4")
        out: Dict[tuple, jnp.ndarray] = {}

        def run_batch(cfgs, pos2d, seg):
            m_rows, r_rows, red_rows, it_rows, gates = [], [], [], [], []
            w_rows = []
            for species, red_, it, band in cfgs:
                mask, gate = self._proj_mask_gate(species)
                if seg:
                    mask = mask[lo4:hi4]
                    w_rows.append(self._star_lum[:, band])
                m_rows.append(mask)
                r_rows.append(jnp.asarray(self.aperture_radius, jnp.float32))
                red_rows.append(red_)
                it_rows.append(it)
                gates.append(gate)
            weights = jnp.stack(w_rows) if seg else self.parts.mass
            result = inertia_ops.projected_inertia_tensor_multi(
                weights,
                pos2d,
                jnp.stack(m_rows),
                jnp.stack(r_rows),
                np.asarray(red_rows),
                np.asarray(it_rows),
                single_pass=not any(it_rows),
            )
            for i, (cfg, gate) in enumerate(zip(cfgs, gates)):
                out[cfg] = jnp.where(gate > 0, result.tensor[i], 0.0)

        # static split: non-iterative configs run loop-free (see
        # _inertia_batch3d)
        for it_flag in (False, True):
            mass_cfgs = [
                c for c in configs if c[3] is None and c[2] == it_flag
            ]
            lum_cfgs = [
                c for c in configs if c[3] is not None and c[2] == it_flag
            ]
            if mass_cfgs:
                run_batch(mass_cfgs, self.proj_pos, seg=False)
            if lum_cfgs:
                run_batch(lum_cfgs, self.proj_pos[lo4:hi4], seg=True)
        return out

    def _proj_inertia(self, species, reduced, iterative, lum_weighted=False):
        batch = self._inertia_batch2d
        if batch is not None:
            if not lum_weighted and (species, reduced, iterative, None) in batch:
                return batch[(species, reduced, iterative, None)]
            if lum_weighted and (species, reduced, iterative, 0) in batch:
                return jnp.concatenate(
                    [batch[(species, reduced, iterative, b)] for b in range(9)]
                )
        mask, gate = self._proj_mask_gate(species)
        if lum_weighted:
            # one (3,) tensor per GAMA band, concatenated -> (27,)
            # (``inertia_tensors.py:168-224``)
            if not self._has("PartType4/Luminosities"):
                return jnp.zeros(27, jnp.float32)
            lo, hi = self.ctx.segment("PartType4")
            outs = []
            for band in range(9):
                weights = jnp.zeros(self.parts.valid.shape[0], jnp.float32)
                weights = weights.at[lo:hi].set(self._star_lum[:, band])
                result = inertia_ops.projected_inertia_tensor(
                    weights,
                    self.proj_pos,
                    mask,
                    self.aperture_radius,
                    max_iterations=20 if iterative else 1,
                    reduced=reduced,
                )
                outs.append(jnp.where(gate > 0, result.tensor, 0.0))
            return jnp.concatenate(outs)
        result = inertia_ops.projected_inertia_tensor(
            self.parts.mass,
            self.proj_pos,
            mask,
            self.aperture_radius,
            max_iterations=20 if iterative else 1,
            reduced=reduced,
        )
        return jnp.where(gate > 0, result.tensor, 0.0)

    def _type_bound_proj(self, ptype: str) -> jnp.ndarray:
        lo, hi = self.ctx.segment(ptype)
        k = self.parts.valid.shape[0]
        row = jnp.arange(k, dtype=jnp.int32)
        return self.bound_mask & (row >= lo) & (row < hi)

    @lazy_property
    def ProjectedTotalInertiaTensor(self):
        return self._proj_inertia("tot", False, True)

    @lazy_property
    def ProjectedTotalInertiaTensorReduced(self):
        return self._proj_inertia("tot", True, True)

    @lazy_property
    def ProjectedTotalInertiaTensorNoniterative(self):
        return self._proj_inertia("tot", False, False)

    @lazy_property
    def ProjectedTotalInertiaTensorReducedNoniterative(self):
        return self._proj_inertia("tot", True, False)

    @lazy_property
    def ProjectedGasInertiaTensor(self):
        return self._proj_inertia("gas", False, True)

    @lazy_property
    def ProjectedGasInertiaTensorReduced(self):
        return self._proj_inertia("gas", True, True)

    @lazy_property
    def ProjectedGasInertiaTensorNoniterative(self):
        return self._proj_inertia("gas", False, False)

    @lazy_property
    def ProjectedGasInertiaTensorReducedNoniterative(self):
        return self._proj_inertia("gas", True, False)

    @lazy_property
    def ProjectedStellarInertiaTensor(self):
        return self._proj_inertia("star", False, True)

    @lazy_property
    def ProjectedStellarInertiaTensorReduced(self):
        return self._proj_inertia("star", True, True)

    @lazy_property
    def ProjectedStellarInertiaTensorNoniterative(self):
        return self._proj_inertia("star", False, False)

    @lazy_property
    def ProjectedStellarInertiaTensorReducedNoniterative(self):
        return self._proj_inertia("star", True, False)

    @lazy_property
    def ProjectedStellarInertiaTensorLuminosityWeighted(self):
        return self._proj_inertia("star", False, True, lum_weighted=True)

    @lazy_property
    def ProjectedStellarInertiaTensorReducedLuminosityWeighted(self):
        return self._proj_inertia("star", True, True, lum_weighted=True)

    @lazy_property
    def ProjectedStellarInertiaTensorNoniterativeLuminosityWeighted(self):
        return self._proj_inertia("star", False, False, lum_weighted=True)

    @lazy_property
    def ProjectedStellarInertiaTensorReducedNoniterativeLuminosityWeighted(self):
        return self._proj_inertia("star", True, False, lum_weighted=True)

    @lazy_property
    def proj_veldisp_gas(self):
        return self._proj_veldisp(self.mask_gas, self.vcom_gas)

    @lazy_property
    def proj_veldisp_dm(self):
        return self._proj_veldisp(self.mask_dm, self.vcom_dm)

    @lazy_property
    def proj_veldisp_star(self):
        return self._proj_veldisp(self.mask_star, self.vcom_star)


def shared_sort_artifacts(
    parts: HaloParticles, scalars: HaloScalars, ctx=None,
    vel_payload: bool = False,
) -> Dict[str, jnp.ndarray]:
    """The per-halo radius sort + its standard payloads, computed ONCE.

    One multi-operand ``lax.sort`` carries (radius key, permutation,
    mass, bound flag) through the sort network together — cheaper than
    an argsort followed by separate big gathers, and shared across every
    3D slice family by seeding the lazy-property caches
    (``HaloSlice._rsort_order`` etc.).  Stable sort with an iota
    tiebreak reproduces ``jnp.argsort`` exactly.  With the bound flag a
    payload and type segments derived from the permutation, NO sorted
    mask ever needs a permutation gather (see the sorted-mask block in
    ``HaloSlice``).
    """
    # elementwise row norm: a (K, 3) axis-1 reduce materializes a
    # trailing-singleton (B, K, 1) temp that the TPU layout pads 128x
    # (4 GB at K=2^20); the sliced form stays rank-2 and fuses
    x, y, z = parts.pos[:, 0], parts.pos[:, 1], parts.pos[:, 2]
    r = jnp.sqrt(x * x + y * y + z * z)
    key = jnp.where(parts.valid, r, jnp.inf)
    iota = jnp.arange(key.shape[0], dtype=jnp.int32)
    bound = parts.valid & (parts.groupnr == scalars.index)
    # optional chemistry payloads: the HI/H2 half-mass radii otherwise
    # permutation-gather their weight columns per slice instance
    extra_names = []
    extra_cols = []
    if ctx is not None and parts.fields:
        elem_ds = "PartType0/ElementMassFractions"
        spec_ds = "PartType0/SpeciesFractions"
        if (
            elem_ds in parts.fields
            and spec_ds in parts.fields
            and ctx.has_column(elem_ds, "Hydrogen")
        ):
            lo, hi = ctx.segment("PartType0")
            h = parts.fields[elem_ds][
                :, ctx.column_index(elem_ds, "Hydrogen")
            ]
            m_gas = parts.mass[lo:hi]
            for species, factor, name in (
                ("HI", 1.0, "_w_HI_sorted"),
                ("H2", 2.0, "_w_H2_sorted"),
            ):
                if not ctx.has_column(spec_ds, species):
                    continue
                s = parts.fields[spec_ds][
                    :, ctx.column_index(spec_ds, species)
                ]
                w = jnp.zeros(key.shape[0], jnp.float32)
                w = w.at[lo:hi].set(m_gas * h * s * factor)
                extra_names.append(name)
                extra_cols.append(w)
    # position payloads: the batched 3D inertia loop consumes rows in
    # radius order so its Pallas heavy pass can stop at each config's
    # selection extent / ellipsoid extent instead of sweeping the bucket.
    # Velocity payloads (``vel_payload``) let the engine's sorted-prefix
    # truncation hand bound/aperture slices a COMPLETE radius-sorted
    # particle view as pure prefix slices — no post-sort gathers.
    vel_cols = (
        (parts.vel[:, 0], parts.vel[:, 1], parts.vel[:, 2])
        if vel_payload
        else ()
    )
    sorted_ops = jax.lax.sort(
        (key, iota, parts.mass, bound, x, y, z) + vel_cols
        + tuple(extra_cols),
        num_keys=1,
        is_stable=True,
    )
    r_s, order, m_s, b_s, x_s, y_s, z_s = sorted_ops[:7]
    nfix = 7 + len(vel_cols)
    extra_s = sorted_ops[nfix:]
    out = {
        "radius": r,
        "_rsort_order": order,
        "_r_sorted": r_s,
        "_m_sorted": m_s,
        "_bound_sorted": b_s,
        "_pos_sorted": jnp.stack((x_s, y_s, z_s), axis=1),
        # invalid slots carry an inf key, so validity needs no payload
        "_valid_sorted": jnp.isfinite(r_s),
    }
    if vel_payload:
        out["_vel_sorted"] = jnp.stack(sorted_ops[7:10], axis=1)
    out.update(zip(extra_names, extra_s))

    # star-segment sort with luminosity payloads: HalfLightRadiusStar
    # otherwise argsorts the star segment and gathers 9 luminosity
    # columns PER SLICE INSTANCE.  XLA dead-code-eliminates this sort in
    # programs whose spec set never consumes the seeds.
    lum_ds = "PartType4/Luminosities"
    if ctx is not None and parts.fields and lum_ds in parts.fields:
        lo4, hi4 = ctx.segment("PartType4")
        if hi4 > lo4:
            key4 = jnp.where(
                parts.valid[lo4:hi4], r[lo4:hi4], jnp.inf
            )
            lum = parts.fields[lum_ds]
            sorted4 = jax.lax.sort(
                (key4, bound[lo4:hi4], x[lo4:hi4], y[lo4:hi4], z[lo4:hi4])
                + tuple(lum[:, b] for b in range(lum.shape[1])),
                num_keys=1,
                is_stable=True,
            )
            out["_star_sort_r"] = sorted4[0]
            out["_star_sort_bound"] = sorted4[1]
            out["_star_sort_pos"] = jnp.stack(sorted4[2:5], axis=1)
            out["_star_sort_lum"] = jnp.stack(sorted4[5:], axis=1)
    return out


def compute_properties(slice_obj: HaloSlice, keys) -> Dict[str, jnp.ndarray]:
    """Evaluate the requested property-table keys on one halo slice.

    Returns raw (unit-free) values; adds the ``needs_bigger`` flag under
    the reserved key ``__needs_bigger__``.
    """
    # pre-registering the key set lets batched evaluators (e.g. the
    # one-loop inertia kernel) cover exactly the requested configs.
    # ORDER MATTERS: batched evaluators iterate this collection while
    # tracing, so it must be deterministic across processes — a
    # frozenset here iterated in PYTHONHASHSEED order, making the
    # lowered HLO (lane order of the batched inertia loop) differ per
    # process and silently invalidating the persistent XLA compilation
    # cache between runs (~100 s re-compile per bucket program).
    slice_obj._requested_keys = tuple(dict.fromkeys(keys))
    out = {}
    for key in keys:
        out[key] = getattr(slice_obj, key)
    out["__needs_bigger__"] = slice_obj.needs_bigger
    return out
