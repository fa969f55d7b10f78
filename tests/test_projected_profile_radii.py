"""Projected apertures must profile half-mass/half-light radii in the
PROJECTED radius (reference ``projected_aperture_properties.py:1492-1566``),
not the 3D radius — a regression test for the inherited base-class
kernels (HalfLightRadiusStar, HalfMassRadiusBaryon, HI/H2 half-mass)."""

import jax.numpy as jnp
import numpy as np

from soap_tpu.models.context import HaloContext
from soap_tpu.models.halo_slice import (
    HaloParticles,
    HaloScalars,
    ProjectedApertureSlice,
)
from soap_tpu.ops import radii as radii_ops


def _build(axis=2, seed=7):
    rng = np.random.default_rng(seed)
    G, S = 96, 64
    K = G + S
    # strong z spread so 3D and projected orders differ
    pos = rng.normal(0, 0.05, (K, 3)).astype(np.float32)
    pos[:, axis] *= 40.0
    mass = rng.uniform(0.5, 2.0, K).astype(np.float32)
    valid = np.ones(K, bool)
    groupnr = np.zeros(K, np.int64)  # all bound to halo 0
    lum = rng.uniform(0.1, 3.0, (S, 9)).astype(np.float32)
    elem = rng.uniform(0.5, 0.8, (G, 2)).astype(np.float32)
    spec = rng.uniform(0.0, 0.5, (G, 2)).astype(np.float32)
    parts = HaloParticles(
        valid=jnp.asarray(valid),
        mass=jnp.asarray(mass),
        pos=jnp.asarray(pos),
        vel=jnp.zeros((K, 3), jnp.float32),
        groupnr=jnp.asarray(groupnr),
        fofid=jnp.zeros(K, jnp.int64),
        softening=jnp.full(K, 0.001, jnp.float32),
        fields={
            "PartType4/Luminosities": jnp.asarray(lum),
            "PartType0/ElementMassFractions": jnp.asarray(elem),
            "PartType0/SpeciesFractions": jnp.asarray(spec),
        },
    )
    ctx = HaloContext(
        a=1.0,
        z=0.0,
        G=43.0,
        boxsize=100.0,
        critical_density=1.0,
        mean_density=0.3,
        softening=(0.001, 0.001),
        ptypes=("PartType0", "PartType4"),
        capacities=(G, S),
        dmo=False,
        named_columns=(
            ("PartType0/ElementMassFractions", ("Hydrogen", "Helium")),
            ("PartType0/SpeciesFractions", ("HI", "H2")),
        ),
    )
    scalars = HaloScalars(
        index=jnp.int64(0),
        centre=jnp.zeros(3),
        search_radius=jnp.float32(100.0),
        is_central=jnp.asarray(True),
        fof_id=jnp.int64(1),
    )
    R = jnp.float32(1e3)  # aperture covers everything: selection = bound
    sl = ProjectedApertureSlice(ctx, parts, scalars, R, axis)
    data = dict(pos=pos, mass=mass, lum=lum, elem=elem, spec=spec, G=G, S=S)
    return sl, data


def _half_weight_np(r, w):
    """Oracle via the tested sorted kernel on numpy-prepared inputs."""
    order = np.argsort(r)
    total = w.sum()
    return float(
        radii_ops.half_weight_radius_sorted(
            jnp.asarray(r[order]),
            jnp.asarray(w[order]),
            jnp.ones(len(r), bool),
            jnp.float32(total),
        )
    )


def test_projected_half_light_uses_projected_radius():
    axis = 2
    sl, d = _build(axis)
    dims = [i for i in range(3) if i != axis]
    star_pos = d["pos"][d["G"] :]
    r_proj = np.sqrt((star_pos[:, dims] ** 2).sum(1))
    r_3d = np.sqrt((star_pos**2).sum(1))
    got = np.asarray(sl.HalfLightRadiusStar)
    for band in range(9):
        want = _half_weight_np(r_proj, d["lum"][:, band])
        assert np.isclose(got[band], want, rtol=1e-5), band
    # the 3D-profiled value must differ (guards the regression)
    want_3d = _half_weight_np(r_3d, d["lum"][:, 0])
    assert not np.isclose(got[0], want_3d, rtol=1e-3)


def test_projected_hi_h2_baryon_half_mass_projected_radius():
    axis = 1
    sl, d = _build(axis)
    dims = [i for i in range(3) if i != axis]
    gas_pos = d["pos"][: d["G"]]
    gas_r = np.sqrt((gas_pos[:, dims] ** 2).sum(1))
    gas_m = d["mass"][: d["G"]]
    w_hi = gas_m * d["elem"][:, 0] * d["spec"][:, 0]
    w_h2 = gas_m * d["elem"][:, 0] * d["spec"][:, 1] * 2.0
    assert np.isclose(
        float(sl.HalfMassRadiusAtomicHydrogen),
        _half_weight_np(gas_r, w_hi),
        rtol=1e-5,
    )
    assert np.isclose(
        float(sl.HalfMassRadiusMolecularHydrogen),
        _half_weight_np(gas_r, w_h2),
        rtol=1e-5,
    )
    all_r = np.sqrt((d["pos"][:, dims] ** 2).sum(1))
    assert np.isclose(
        float(sl.HalfMassRadiusBaryon),
        _half_weight_np(all_r, d["mass"]),
        rtol=1e-5,
    )
