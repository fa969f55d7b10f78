"""Measure per-property-family cost on the real chip.

Runs the bench workload with key subsets to attribute device time:
full set, no inertia tensors, no profile kernels (vmax/hmr/SO), masses
only.  Prints one line per variant.
"""

import sys
import time

import numpy as np


def _check_device():
    """TPU plugin registration happens at interpreter startup and is
    exclusive — fail fast so a wrapper can retry with a NEW process
    (in-process retries can never succeed)."""
    import jax

    d = jax.devices()
    print(f"device: {d[0]}", flush=True)


def main():
    _check_device()
    from soap_tpu.core.halo_types import implemented_keys_for
    from soap_tpu.models.context import HaloContext
    from soap_tpu.pipeline.chunk_data import ChunkData, stage_ptype
    from soap_tpu.pipeline.engine import HaloEngine, HaloTypeSpec
    from soap_tpu.utils import mock_data

    G = mock_data.G_INTERNAL
    uni = mock_data.build_mock_universe(
        n_halos=256, n_field=200_000, boxsize=100.0, seed=7,
        mass_range=(20.0, 3000.0),
    )
    groupnr = np.full(len(uni.ids), -1, dtype=np.int64)
    id_to_row = np.empty(uni.ids.max() + 1, dtype=np.int64)
    id_to_row[uni.ids] = np.arange(len(uni.ids))
    for hi, ids in enumerate(uni.bound_ids):
        groupnr[id_to_row[ids]] = hi
    rho_crit0 = 3.0 * (100.0 * uni.h) ** 2 / (8.0 * np.pi * G)
    chunk = ChunkData(
        boxsize=uni.boxsize,
        ptypes={
            "PartType1": stage_ptype(
                uni.pos,
                {
                    "Masses": uni.mass.astype(np.float32),
                    "Velocities": uni.vel.astype(np.float32),
                    "GroupNr_bound": groupnr,
                    "FOFGroupIDs": uni.fof_ids,
                },
                uni.boxsize,
            )
        },
    )
    ctx = HaloContext(
        a=1.0, z=0.0, G=G, boxsize=uni.boxsize,
        critical_density=rho_crit0, mean_density=rho_crit0 * uni.omega_m,
        softening=(0.01,), ptypes=("PartType1",), capacities=(0,), dmo=True,
    )
    sub_all = implemented_keys_for("BoundSubhalo", True)
    so_all = implemented_keys_for("SO", True)
    inertia = tuple(k for k in sub_all + so_all if "InertiaTensor" in k)
    profiles = ("HalfMassRadiusTot", "HalfMassRadiusDM", "Vmax_soft",
                "Vmax_unsoft", "R_vmax_soft", "R_vmax_unsoft",
                "DM_Vmax_soft", "DM_R_vmax_soft")

    variants = {
        "full": (sub_all, so_all),
        "no_inertia": (
            tuple(k for k in sub_all if k not in inertia),
            tuple(k for k in so_all if k not in inertia),
        ),
        "no_inertia_no_profiles": (
            tuple(k for k in sub_all if k not in inertia and k not in profiles),
            tuple(k for k in so_all if k not in inertia and k not in profiles),
        ),
        "masses_only": (
            ("Mtot", "Mdm", "Ndm", "com", "vcom"),
            ("r", "Mtot", "Ndm"),
        ),
        "subhalo_only": (sub_all, None),
        "so_only": (None, so_all),
    }
    args = dict(
        centres=uni.halo_pos,
        search_radius_phys=uni.halo_renclose * 1.01,
        index=np.arange(uni.n_halos, dtype=np.int64),
        is_central=np.ones(uni.n_halos, dtype=bool),
        fof_id=np.arange(1, uni.n_halos + 1, dtype=np.int64),
    )
    for name, (sub_keys, so_keys) in variants.items():
        specs = []
        if sub_keys:
            specs.append(HaloTypeSpec(kind="bound", group="BoundSubhalo", keys=sub_keys))
        if so_keys:
            specs.append(HaloTypeSpec(kind="SO", group="SO/200_crit", keys=so_keys,
                                      so_type="crit", so_multiple=200.0, centrals_only=True))
        eng = HaloEngine(ctx, chunk, specs)
        t0 = time.time()
        eng.process(**args)  # compile + run
        t_compile = time.time() - t0
        eng2 = HaloEngine(ctx, chunk, specs)
        t0 = time.time()
        eng2.process(**args)
        dt = time.time() - t0
        print(f"{name:25s} {uni.n_halos/dt:8.1f} halos/s  run={dt:6.2f}s "
              f"first={t_compile:6.1f}s", flush=True)


if __name__ == "__main__":
    main()
