"""Element chemistry, species, and dust properties (mixin).

Covers the reference's named-column chemistry families
(``SOAP/particle_selection/aperture_properties.py:2000-3500``):
hydrogen/helium masses, HI/H2 species masses, diffuse element masses,
dust grain species masses (with atomic / molecular / cold-dense slices),
cold-dense gas masses, and the Linear/Logarithmic mass-weighted element
abundance ratios with solar-relative low/high floors.

Column indices come from the snapshot's ``SubgridScheme/NamedColumns``
metadata carried statically on the ``HaloContext``; atomic mass ratios
(16.0 for O/H etc.) match the reference's constants exactly.

All methods live in a mixin consumed by ``HaloSlice``; they rely on the
gas/star segment helpers defined there (``_gas_sel``, ``field``, ...).
"""

from __future__ import annotations

import jax.numpy as jnp

from soap_tpu.models.context import HaloContext
from soap_tpu.models.lazy import lazy_property as _lazy


class ChemistryMixin:
    """Gas/star chemistry lazy properties (see module docstring)."""

    # ---- element fraction helpers ----

    def _elem(self, ptype: str, element: str):
        """Element mass-fraction column, segment-local; None if absent."""
        ds = f"{ptype}/ElementMassFractions"
        if not (self._has(ds) and self.ctx.has_column(ds, element)):
            return None
        return self.field(ds)[:, self.ctx.column_index(ds, element)]

    def _elem_diffuse(self, element: str):
        ds = "PartType0/ElementMassFractionsDiffuse"
        if not (self._has(ds) and self.ctx.has_column(ds, element)):
            return None
        return self.field(ds)[:, self.ctx.column_index(ds, element)]

    def _species(self, name: str):
        ds = "PartType0/SpeciesFractions"
        if not (self._has(ds) and self.ctx.has_column(ds, name)):
            return None
        return self.field(ds)[:, self.ctx.column_index(ds, name)]

    def _dust_col(self, name: str):
        ds = "PartType0/DustMassFractions"
        if not (self._has(ds) and self.ctx.has_column(ds, name)):
            return None
        return self.field(ds)[:, self.ctx.column_index(ds, name)]

    def _gas_sum(self, values, extra_mask=None):
        from soap_tpu.models.halo_slice import _zero

        if values is None:
            return _zero()
        mask = self._gas_sel if extra_mask is None else self._gas_sel & extra_mask
        return jnp.sum(jnp.where(mask, values, 0.0))

    # ---- hydrogen / helium / species masses ----

    @_lazy
    def HydrogenMass(self):
        e = self._elem("PartType0", "Hydrogen")
        return self._gas_sum(None if e is None else self._gas_mass * e)

    @_lazy
    def HeliumMass(self):
        e = self._elem("PartType0", "Helium")
        return self._gas_sum(None if e is None else self._gas_mass * e)

    @_lazy
    def _gas_HI_frac(self):
        """HI mass per unit gas mass: X_H * SpeciesFractions[HI]."""
        h = self._elem("PartType0", "Hydrogen")
        s = self._species("HI")
        if h is None or s is None:
            return None
        return h * s

    @_lazy
    def _gas_H2_frac(self):
        """H2 mass per unit gas mass (factor 2: two H atoms)."""
        h = self._elem("PartType0", "Hydrogen")
        s = self._species("H2")
        if h is None or s is None:
            return None
        return 2.0 * h * s

    @_lazy
    def AtomicHydrogenMass(self):
        f = self._gas_HI_frac
        return self._gas_sum(None if f is None else self._gas_mass * f)

    @_lazy
    def MolecularHydrogenMass(self):
        f = self._gas_H2_frac
        return self._gas_sum(None if f is None else self._gas_mass * f)

    @_lazy
    def HalfMassRadiusAtomicHydrogen(self):
        return self._half_mass_radius_gas_weighted(
            self._gas_HI_frac, self.AtomicHydrogenMass, "_w_HI_sorted"
        )

    @_lazy
    def HalfMassRadiusMolecularHydrogen(self):
        return self._half_mass_radius_gas_weighted(
            self._gas_H2_frac, self.MolecularHydrogenMass, "_w_H2_sorted"
        )

    def _half_mass_radius_gas_weighted(self, frac, total, seeded=None):
        from soap_tpu.models.halo_slice import _zero
        from soap_tpu.ops import radii as radii_ops

        if frac is None:
            return _zero()
        # engine-seeded sort payload (no per-slice permutation gather;
        # never seeded on projected slices, whose profile order differs)
        w_sorted = self.__dict__.get(seeded) if seeded else None
        if w_sorted is None:
            lo, hi = self.ctx.segment("PartType0")
            w = jnp.zeros(self.parts.valid.shape[0], jnp.float32)
            w = w.at[lo:hi].set(self._gas_mass * frac)
            w_sorted = w[self._prof_order]
        return radii_ops.half_weight_radius_sorted(
            self._prof_r_sorted,
            w_sorted,
            self._prof_gas_sorted,
            total,
        )

    # ---- diffuse element masses (dust excluded) ----

    @_lazy
    def DiffuseCarbonMass(self):
        e = self._elem_diffuse("Carbon")
        return self._gas_sum(None if e is None else self._gas_mass * e)

    @_lazy
    def DiffuseOxygenMass(self):
        e = self._elem_diffuse("Oxygen")
        return self._gas_sum(None if e is None else self._gas_mass * e)

    @_lazy
    def DiffuseMagnesiumMass(self):
        e = self._elem_diffuse("Magnesium")
        return self._gas_sum(None if e is None else self._gas_mass * e)

    @_lazy
    def DiffuseSiliconMass(self):
        e = self._elem_diffuse("Silicon")
        return self._gas_sum(None if e is None else self._gas_mass * e)

    @_lazy
    def DiffuseIronMass(self):
        e = self._elem_diffuse("Iron")
        return self._gas_sum(None if e is None else self._gas_mass * e)

    # ---- cold dense gas ----

    @_lazy
    def _gas_cold_dense(self):
        """T < Tmax and n_H > n_min (``cold_dense_gas_filter.py:57-77``);
        the number-density cut is evaluated as a physical mass-density
        threshold (f32-safe, see ``HaloContext.cold_dense_rho_threshold``).
        The snapshot stores comoving densities (a exponent -3)."""
        if not (
            self._has("PartType0/Temperatures")
            and self._has("PartType0/Densities")
        ):
            lo, hi = self.ctx.segment("PartType0")
            return jnp.zeros(hi - lo, bool)
        rho_com = self.field("PartType0/Densities")
        rho_thresh_comoving = self.ctx.cold_dense_rho_threshold * self.ctx.a**3
        return (self._gas_temp < self.ctx.cold_dense_Tmax) & (
            rho_com > jnp.float32(rho_thresh_comoving)
        )

    @_lazy
    def GasMassInColdDenseGas(self):
        return self._gas_sum(self._gas_mass, self._gas_cold_dense)

    @_lazy
    def GasMassInColdDenseDiffuseMetals(self):
        """Metal mass in cold dense gas, excluding dust."""
        if not (
            self._has("PartType0/MetalMassFractions")
            and self._has("PartType0/TotalDustMassFractions")
        ):
            from soap_tpu.models.halo_slice import _zero

            return _zero()
        diffuse_z = self.field("PartType0/MetalMassFractions") - self.field(
            "PartType0/TotalDustMassFractions"
        )
        return self._gas_sum(self._gas_mass * diffuse_z, self._gas_cold_dense)

    # ---- dust grain species ----

    @_lazy
    def _graphite_frac(self):
        l = self._dust_col("GraphiteLarge")
        s = self._dust_col("GraphiteSmall")
        if l is None or s is None:
            return None
        return l + s

    @_lazy
    def _silicates_frac(self):
        cols = [
            self._dust_col(n)
            for n in (
                "MgSilicatesLarge",
                "FeSilicatesLarge",
                "MgSilicatesSmall",
                "FeSilicatesSmall",
            )
        ]
        if any(c is None for c in cols):
            return None
        return cols[0] + cols[1] + cols[2] + cols[3]

    @_lazy
    def _large_grain_frac(self):
        cols = [
            self._dust_col(n)
            for n in ("GraphiteLarge", "MgSilicatesLarge", "FeSilicatesLarge")
        ]
        if any(c is None for c in cols):
            return None
        return cols[0] + cols[1] + cols[2]

    @_lazy
    def _small_grain_frac(self):
        cols = [
            self._dust_col(n)
            for n in ("GraphiteSmall", "MgSilicatesSmall", "FeSilicatesSmall")
        ]
        if any(c is None for c in cols):
            return None
        return cols[0] + cols[1] + cols[2]

    def _dust_mass(self, frac, extra_mask=None):
        return self._gas_sum(
            None if frac is None else self._gas_mass * frac, extra_mask
        )

    @_lazy
    def DustGraphiteMass(self):
        return self._dust_mass(self._graphite_frac)

    @_lazy
    def DustSilicatesMass(self):
        return self._dust_mass(self._silicates_frac)

    @_lazy
    def DustLargeGrainMass(self):
        return self._dust_mass(self._large_grain_frac)

    @_lazy
    def DustSmallGrainMass(self):
        return self._dust_mass(self._small_grain_frac)

    @_lazy
    def _gas_atomic_mask(self):
        f = self._gas_HI_frac
        h2 = self._gas_H2_frac
        if f is None or h2 is None:
            return None
        # "atomic gas": more HI than H2 (dominant phase slicing)
        return f > h2

    @_lazy
    def DustGraphiteMassInAtomicGas(self):
        m = self._gas_atomic_mask
        return self._dust_mass(self._graphite_frac, m) if m is not None else self._dust_mass(None)

    @_lazy
    def DustSilicatesMassInAtomicGas(self):
        m = self._gas_atomic_mask
        return self._dust_mass(self._silicates_frac, m) if m is not None else self._dust_mass(None)

    @_lazy
    def _gas_molecular_mask(self):
        f = self._gas_HI_frac
        h2 = self._gas_H2_frac
        if f is None or h2 is None:
            return None
        return h2 >= f

    @_lazy
    def DustGraphiteMassInMolecularGas(self):
        m = self._gas_molecular_mask
        return self._dust_mass(self._graphite_frac, m) if m is not None else self._dust_mass(None)

    @_lazy
    def DustSilicatesMassInMolecularGas(self):
        m = self._gas_molecular_mask
        return self._dust_mass(self._silicates_frac, m) if m is not None else self._dust_mass(None)

    @_lazy
    def DustGraphiteMassInColdDenseGas(self):
        return self._dust_mass(self._graphite_frac, self._gas_cold_dense)

    @_lazy
    def DustSilicatesMassInColdDenseGas(self):
        return self._dust_mass(self._silicates_frac, self._gas_cold_dense)

    @_lazy
    def DustLargeGrainMassInColdDenseGas(self):
        return self._dust_mass(self._large_grain_frac, self._gas_cold_dense)

    @_lazy
    def DustSmallGrainMassInColdDenseGas(self):
        return self._dust_mass(self._small_grain_frac, self._gas_cold_dense)

    @_lazy
    def _gas_sfr_mask(self):
        if not self._has("PartType0/StarFormationRates"):
            return None
        return self._gas_sfr > 0.0

    @_lazy
    def DustLargeGrainMassInMolecularGas(self):
        m = self._gas_molecular_mask
        return self._dust_mass(self._large_grain_frac, m) if m is not None else self._dust_mass(None)

    @_lazy
    def DustSmallGrainMassInMolecularGas(self):
        m = self._gas_molecular_mask
        return self._dust_mass(self._small_grain_frac, m) if m is not None else self._dust_mass(None)

    @_lazy
    def DustLargeGrainMassSFRWeighted(self):
        m = self._gas_sfr_mask
        return self._dust_mass(self._large_grain_frac, m) if m is not None else self._dust_mass(None)

    @_lazy
    def DustSmallGrainMassSFRWeighted(self):
        m = self._gas_sfr_mask
        return self._dust_mass(self._small_grain_frac, m) if m is not None else self._dust_mass(None)

    # ---- abundance ratios (gas, cold-dense-weighted) ----
    # atomic mass constants follow the reference exactly
    # (``aperture_properties.py:2660,2682,2705,3242,3398``)

    def _ratio_OH(self, O, H):
        if O is None or H is None:
            return None
        return O / (16.0 * jnp.maximum(H, 1e-37))

    def _ratio_NO(self, N, O):
        if N is None or O is None:
            return None
        return jnp.where(O != 0, (16.0 * N) / (14.0 * jnp.maximum(O, 1e-37)), 0.0)

    def _ratio_CO(self, C, O):
        if C is None or O is None:
            return None
        return jnp.where(O != 0, (16.0 * C) / (12.011 * jnp.maximum(O, 1e-37)), 0.0)

    def _linear_mw_gas(self, ratio):
        from soap_tpu.models.halo_slice import _zero

        if ratio is None:
            return _zero()
        num = self._gas_sum(self._gas_mass * ratio, self._gas_cold_dense)
        den = self.GasMassInColdDenseGas
        return jnp.where(den > 0, num / jnp.maximum(den, 1e-37), 0.0)

    def _log_mw_gas(self, ratio, solar_const, floor_factor, extra_mask=None):
        """10^(mass-weighted mean log10(ratio floored at
        floor_factor x solar)) over cold dense gas."""
        from soap_tpu.models.halo_slice import _zero

        if ratio is None:
            return _zero()
        solar = self.ctx.constant(solar_const, 0.0)
        if solar <= 0:
            return _zero()
        logr = jnp.log10(jnp.clip(ratio, solar * floor_factor, jnp.inf))
        mask = self._gas_cold_dense
        if extra_mask is not None:
            mask = mask & extra_mask
        num = self._gas_sum(self._gas_mass * logr, mask)
        den = self._gas_sum(self._gas_mass, mask)
        return jnp.where(den > 0, 10.0 ** (num / jnp.maximum(den, 1e-37)), 0.0)

    @_lazy
    def _gas_O_over_H_total(self):
        return self._ratio_OH(
            self._elem("PartType0", "Oxygen"), self._elem("PartType0", "Hydrogen")
        )

    @_lazy
    def _gas_O_over_H_diffuse(self):
        return self._ratio_OH(
            self._elem_diffuse("Oxygen"), self._elem("PartType0", "Hydrogen")
        )

    @_lazy
    def LinearMassWeightedOxygenOverHydrogenOfGas(self):
        return self._linear_mw_gas(self._gas_O_over_H_total)

    @_lazy
    def LinearMassWeightedDiffuseOxygenOverHydrogenOfGas(self):
        return self._linear_mw_gas(self._gas_O_over_H_diffuse)

    @_lazy
    def LinearMassWeightedNitrogenOverOxygenOfGas(self):
        return self._linear_mw_gas(
            self._ratio_NO(
                self._elem("PartType0", "Nitrogen"),
                self._elem("PartType0", "Oxygen"),
            )
        )

    @_lazy
    def LinearMassWeightedDiffuseNitrogenOverOxygenOfGas(self):
        return self._linear_mw_gas(
            self._ratio_NO(
                self._elem_diffuse("Nitrogen"), self._elem_diffuse("Oxygen")
            )
        )

    @_lazy
    def LinearMassWeightedCarbonOverOxygenOfGas(self):
        return self._linear_mw_gas(
            self._ratio_CO(
                self._elem("PartType0", "Carbon"),
                self._elem("PartType0", "Oxygen"),
            )
        )

    @_lazy
    def LinearMassWeightedDiffuseCarbonOverOxygenOfGas(self):
        return self._linear_mw_gas(
            self._ratio_CO(
                self._elem_diffuse("Carbon"), self._elem_diffuse("Oxygen")
            )
        )

    @_lazy
    def LogarithmicMassWeightedDiffuseOxygenOverHydrogenOfGasLowLimit(self):
        return self._log_mw_gas(self._gas_O_over_H_diffuse, "O_H_sun", 1.0e-4)

    @_lazy
    def LogarithmicMassWeightedDiffuseOxygenOverHydrogenOfGasHighLimit(self):
        return self._log_mw_gas(self._gas_O_over_H_diffuse, "O_H_sun", 1.0e-3)

    @_lazy
    def LogarithmicMassWeightedDiffuseNitrogenOverOxygenOfGasLowLimit(self):
        return self._log_mw_gas(
            self._ratio_NO(
                self._elem_diffuse("Nitrogen"), self._elem_diffuse("Oxygen")
            ),
            "N_O_sun",
            1.0e-4,
        )

    @_lazy
    def LogarithmicMassWeightedDiffuseNitrogenOverOxygenOfGasHighLimit(self):
        return self._log_mw_gas(
            self._ratio_NO(
                self._elem_diffuse("Nitrogen"), self._elem_diffuse("Oxygen")
            ),
            "N_O_sun",
            1.0e-3,
        )

    @_lazy
    def LogarithmicMassWeightedDiffuseCarbonOverOxygenOfGasLowLimit(self):
        return self._log_mw_gas(
            self._ratio_CO(
                self._elem_diffuse("Carbon"), self._elem_diffuse("Oxygen")
            ),
            "C_O_sun",
            1.0e-4,
        )

    @_lazy
    def LogarithmicMassWeightedDiffuseCarbonOverOxygenOfGasHighLimit(self):
        return self._log_mw_gas(
            self._ratio_CO(
                self._elem_diffuse("Carbon"), self._elem_diffuse("Oxygen")
            ),
            "C_O_sun",
            1.0e-3,
        )

    @_lazy
    def LogarithmicMassWeightedDiffuseOxygenOverHydrogenOfAtomicGasLowLimit(self):
        return self._log_mw_gas(
            self._gas_O_over_H_diffuse, "O_H_sun", 1.0e-4, self._gas_atomic_mask
        )

    @_lazy
    def LogarithmicMassWeightedDiffuseOxygenOverHydrogenOfAtomicGasHighLimit(self):
        return self._log_mw_gas(
            self._gas_O_over_H_diffuse, "O_H_sun", 1.0e-3, self._gas_atomic_mask
        )

    @_lazy
    def LogarithmicMassWeightedDiffuseOxygenOverHydrogenOfMolecularGasLowLimit(self):
        return self._log_mw_gas(
            self._gas_O_over_H_diffuse, "O_H_sun", 1.0e-4, self._gas_molecular_mask
        )

    @_lazy
    def LogarithmicMassWeightedDiffuseOxygenOverHydrogenOfMolecularGasHighLimit(self):
        return self._log_mw_gas(
            self._gas_O_over_H_diffuse, "O_H_sun", 1.0e-3, self._gas_molecular_mask
        )

    # ---- stellar abundance ratios ----

    def _star_sum(self, values, extra_mask=None):
        from soap_tpu.models.halo_slice import _zero

        if values is None:
            return _zero()
        mask = self._star_sel if extra_mask is None else self._star_sel & extra_mask
        return jnp.sum(jnp.where(mask, values, 0.0))

    def _linear_mw_star(self, ratio):
        from soap_tpu.models.halo_slice import _zero

        if ratio is None:
            return _zero()
        num = self._star_sum(self._star_mass * ratio)
        return jnp.where(
            self.Mstar > 0, num / jnp.maximum(self.Mstar, 1e-37), 0.0
        )

    def _log_mw_star(self, ratio, solar_const, floor_factor):
        from soap_tpu.models.halo_slice import _zero

        if ratio is None:
            return _zero()
        solar = self.ctx.constant(solar_const, 0.0)
        if solar <= 0:
            return _zero()
        logr = jnp.log10(jnp.clip(ratio, solar * floor_factor, jnp.inf))
        num = self._star_sum(self._star_mass * logr)
        return jnp.where(
            self.Mstar > 0,
            10.0 ** (num / jnp.maximum(self.Mstar, 1e-37)),
            0.0,
        )

    @_lazy
    def _star_Fe_over_H(self):
        fe = self._elem("PartType4", "Iron")
        h = self._elem("PartType4", "Hydrogen")
        if fe is None or h is None:
            return None
        return fe / (55.845 * jnp.maximum(h, 1e-37))

    @_lazy
    def _star_Mg_over_H(self):
        mg = self._elem("PartType4", "Magnesium")
        h = self._elem("PartType4", "Hydrogen")
        if mg is None or h is None:
            return None
        return mg / (24.305 * jnp.maximum(h, 1e-37))

    @_lazy
    def _star_FeSNIa_over_H(self):
        if not self._has("PartType4/IronMassFractionsFromSNIa"):
            return None
        h = self._elem("PartType4", "Hydrogen")
        if h is None:
            return None
        return self.field("PartType4/IronMassFractionsFromSNIa") / (
            55.845 * jnp.maximum(h, 1e-37)
        )

    @_lazy
    def LinearMassWeightedIronOverHydrogenOfStars(self):
        return self._linear_mw_star(self._star_Fe_over_H)

    @_lazy
    def LinearMassWeightedMagnesiumOverHydrogenOfStars(self):
        return self._linear_mw_star(self._star_Mg_over_H)

    @_lazy
    def LinearMassWeightedIronFromSNIaOverHydrogenOfStars(self):
        return self._linear_mw_star(self._star_FeSNIa_over_H)

    @_lazy
    def LogarithmicMassWeightedIronOverHydrogenOfStarsLowLimit(self):
        return self._log_mw_star(self._star_Fe_over_H, "Fe_H_sun", 1.0e-4)

    @_lazy
    def LogarithmicMassWeightedIronOverHydrogenOfStarsHighLimit(self):
        return self._log_mw_star(self._star_Fe_over_H, "Fe_H_sun", 1.0e-3)

    @_lazy
    def LogarithmicMassWeightedMagnesiumOverHydrogenOfStarsLowLimit(self):
        return self._log_mw_star(self._star_Mg_over_H, "Mg_H_sun", 1.0e-4)

    @_lazy
    def LogarithmicMassWeightedMagnesiumOverHydrogenOfStarsHighLimit(self):
        return self._log_mw_star(self._star_Mg_over_H, "Mg_H_sun", 1.0e-3)

    @_lazy
    def LogarithmicMassWeightedIronFromSNIaOverHydrogenOfStarsLowLimit(self):
        return self._log_mw_star(self._star_FeSNIa_over_H, "Fe_H_sun", 1.0e-4)

    # ---- gas element mass fractions ----

    def _gas_elem_frac(self, element, sf_only=False):
        e = self._elem("PartType0", element)
        if e is None:
            from soap_tpu.models.halo_slice import _zero

            return _zero()
        mask = self._gas_sfr_mask if sf_only else None
        if sf_only and mask is None:
            from soap_tpu.models.halo_slice import _zero

            return _zero()
        num = self._gas_sum(self._gas_mass * e, mask)
        den = self.Mgas_SF if sf_only else self.Mgas
        return jnp.where(den > 0, num / jnp.maximum(den, 1e-37), 0.0)

    @_lazy
    def gasOfrac(self):
        return self._gas_elem_frac("Oxygen")

    @_lazy
    def gasFefrac(self):
        return self._gas_elem_frac("Iron")

    @_lazy
    def gasOfrac_SF(self):
        return self._gas_elem_frac("Oxygen", sf_only=True)

    @_lazy
    def gasFefrac_SF(self):
        return self._gas_elem_frac("Iron", sf_only=True)

    # ---- supernova rates ----

    @_lazy
    def TotalSNIaRate(self):
        if not self._has("PartType4/SNIaRates"):
            from soap_tpu.models.halo_slice import _zero

            return _zero()
        return self._star_sum(self.field("PartType4/SNIaRates"))

    # ---- star element mass fractions ----

    @_lazy
    def starOfrac(self):
        e = self._elem("PartType4", "Oxygen")
        num = self._star_sum(None if e is None else self._star_mass * e)
        return jnp.where(self.Mstar > 0, num / jnp.maximum(self.Mstar, 1e-37), 0.0)

    @_lazy
    def starMgfrac(self):
        e = self._elem("PartType4", "Magnesium")
        num = self._star_sum(None if e is None else self._star_mass * e)
        return jnp.where(self.Mstar > 0, num / jnp.maximum(self.Mstar, 1e-37), 0.0)

    @_lazy
    def starFefrac(self):
        e = self._elem("PartType4", "Iron")
        num = self._star_sum(None if e is None else self._star_mass * e)
        return jnp.where(self.Mstar > 0, num / jnp.maximum(self.Mstar, 1e-37), 0.0)

    # ---- HI / H2 shell flow rates (SO) ----

    @_lazy
    def HIMassFlowRate(self):
        f = self._gas_HI_frac
        if f is None or not getattr(self, "virial_definition", False):
            return jnp.zeros(6, jnp.float32)
        lo, hi = self.ctx.segment("PartType0")
        w = jnp.zeros(self.parts.valid.shape[0], jnp.float32)
        w = w.at[lo:hi].set(self._gas_mass * f)
        return self._flow_rate_mass(self._valid_type_mask("PartType0"), w)

    @_lazy
    def H2MassFlowRate(self):
        f = self._gas_H2_frac
        if f is None or not getattr(self, "virial_definition", False):
            return jnp.zeros(6, jnp.float32)
        lo, hi = self.ctx.segment("PartType0")
        w = jnp.zeros(self.parts.valid.shape[0], jnp.float32)
        w = w.at[lo:hi].set(self._gas_mass * f)
        return self._flow_rate_mass(self._valid_type_mask("PartType0"), w)
