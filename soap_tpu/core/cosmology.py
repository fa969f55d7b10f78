"""Cosmology helpers: densities, virial multiples, ages.

Replaces the reference's use of snapshot-derived densities
(``SOAP/core/swift_cells.py:222-281``) and astropy's ``w0waCDM`` cosmology
(``SOAP/property_calculation/stellar_age_calculator.py:21-113``,
``SOAP/particle_filter/recently_heated_gas_filter.py:49-173``).  astropy is
not a dependency here: the required pieces — H(a) for a flat-ish w0waCDM
model with radiation and massive-neutrino contributions read from SWIFT
snapshot metadata, lookback times, and ages — are a one-dimensional
Friedmann integral evaluated on the host with fixed-order Gauss-Legendre
quadrature.  Device code consumes the results as lookup tables
(scale-factor -> age) interpolated with ``jnp.interp``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Mapping

import numpy as np

#: seconds per Gyr (Julian)
GYR_IN_S = 3.15576e16


@dataclass(frozen=True)
class Cosmology:
    """Flat w0waCDM parameters as recorded in SWIFT snapshot metadata."""

    a: float
    h: float
    H0_internal: float  # H0 in internal (code) units, from snapshot
    omega_m: float  # matter (cdm + baryons)
    omega_lambda: float
    omega_k: float
    omega_b: float = 0.0
    omega_r: float = 0.0  # photons + massless neutrinos
    omega_nu_0: float = 0.0  # massive neutrinos today (non-relativistic)
    w0: float = -1.0
    wa: float = 0.0

    @classmethod
    def from_attrs(cls, cosmo: Mapping[str, float]) -> "Cosmology":
        g = lambda k, d=0.0: float(cosmo.get(k, d))
        return cls(
            a=g("Scale-factor", 1.0),
            h=g("h", 0.681),
            H0_internal=g("H0 [internal units]", 0.0),
            omega_m=g("Omega_m"),
            omega_lambda=g("Omega_lambda"),
            omega_k=g("Omega_k", 0.0),
            omega_b=g("Omega_b", 0.0),
            omega_r=g("Omega_r", 0.0),
            omega_nu_0=g("Omega_nu_0", 0.0),
            w0=g("w_0", -1.0),
            wa=g("w_a", 0.0),
        )

    @property
    def z(self) -> float:
        return 1.0 / self.a - 1.0

    # ---- densities ----
    def critical_density_z0_internal(self, newton_G_internal: float) -> float:
        """rho_crit(z=0) in internal units: 3 H0^2 / (8 pi G).

        Reference: ``SOAP/core/swift_cells.py:259-263``.
        """
        return 3.0 * self.H0_internal**2 / (8.0 * np.pi * newton_G_internal)

    def mean_density_internal(self, newton_G_internal: float) -> float:
        """Physical mean matter density at the snapshot redshift.

        Includes non-relativistic massive neutrinos, matching the
        reference's SO mass convention (``SOAP/core/swift_cells.py:264-274``).
        """
        rho_crit0 = self.critical_density_z0_internal(newton_G_internal)
        omega = self.omega_m + self.omega_nu_0
        return rho_crit0 * omega / self.a**3

    def bn98_virial_multiple(self) -> float:
        """Bryan & Norman (1998) virial overdensity multiple at snapshot a.

        Reference: ``SOAP/core/swift_cells.py:276-281``; validity range is
        asserted identically.
        """
        x = -(self.omega_k / self.a**2 + self.omega_lambda) / (
            self.omega_k / self.a**2
            + self.omega_m / self.a**3
            + self.omega_lambda
        )
        vir = 18.0 * np.pi**2 + 82.0 * x - 39.0 * x**2
        if vir < 50.0 or vir > 1000.0:
            raise RuntimeError(f"Invalid value for virBN98: {vir}")
        return vir

    # ---- expansion history ----
    def E(self, a: np.ndarray) -> np.ndarray:
        """Dimensionless Hubble rate H(a)/H0 for flat w0waCDM + curvature.

        Dark-energy density follows the CPL parametrisation:
        rho_de(a)/rho_de0 = a^{-3(1+w0+wa)} exp(-3 wa (1-a)).
        Massive neutrinos are treated as matter (non-relativistic), the
        same approximation the reference adopts for SO reference densities.
        """
        a = np.asarray(a, dtype=np.float64)
        de = a ** (-3.0 * (1.0 + self.w0 + self.wa)) * np.exp(
            -3.0 * self.wa * (1.0 - a)
        )
        return np.sqrt(
            self.omega_r / a**4
            + (self.omega_m + self.omega_nu_0) / a**3
            + self.omega_k / a**2
            + self.omega_lambda * de
        )

    def age_of_universe_H0(self, a: float | np.ndarray, order: int = 256):
        """Age t(a) in units of 1/H0: integral of da'/(a' E(a')) from 0 to a.

        Uses Gauss-Legendre quadrature with the substitution x = a'^(1/2)
        to soften the a'->0 endpoint (the integrand ~ a'^{1/2} in matter/
        radiation domination, so the substituted integrand is smooth).
        """
        a = np.asarray(a, dtype=np.float64)
        nodes, weights = np.polynomial.legendre.leggauss(order)

        def single(av):
            if av <= 0.0:
                return 0.0
            # substitute a' = (u)^2, da' = 2 u du, u in (0, sqrt(av))
            umax = np.sqrt(av)
            u = 0.5 * umax * (nodes + 1.0)
            w = 0.5 * umax * weights
            ap = u**2
            integrand = 2.0 * u / (ap * self.E(ap))
            return float(np.sum(w * integrand))

        if a.ndim == 0:
            return single(float(a))
        return np.array([single(float(v)) for v in a.ravel()]).reshape(a.shape)

    def age_table(
        self, n: int = 4096, a_min: float = 1e-4
    ) -> tuple[np.ndarray, np.ndarray]:
        """Host-precomputed lookup table a -> age [1/H0 units].

        Device code interpolates this with ``jnp.interp``; replaces the
        reference's per-particle astropy cosmology calls
        (``stellar_age_calculator.py:55-113``).
        """
        a_grid = np.linspace(a_min, 1.0, n)
        ages = self.age_of_universe_H0(a_grid)
        return a_grid, ages

    def lookback_time_H0(self, a: float) -> float:
        """Lookback time from the snapshot epoch to scale factor ``a``."""
        return float(
            self.age_of_universe_H0(self.a) - self.age_of_universe_H0(a)
        )
