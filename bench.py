"""Benchmark: halos/sec through the full property engine on one chip.

Workload: a synthetic DMO volume (NFW halos + uniform background, same
generator as the tests), processed with the FULL production default
spec set — BoundSubhalo + all 9 SO variations (incl. BN98 and the
5xR500_crit radius multiple) + all 16 exclusive/inclusive 3D apertures
+ 4 projected apertures x 3 axes = 38 calculations, exactly the
reference's default ``halo_prop_list``
(``compute_halo_properties.py:224-511``), DMO-filtered keys.  The first
pass compiles (cached persistently across runs); the second pass
measures steady-state throughput, which is what a production run over
millions of halos sees.

Baseline: the reference publishes no benchmark numbers (BASELINE.md);
the only quantitative envelope is FLAMINGO L1000N0900 — ~2.5e6 halos,
full property set, <= 4 h on one 128-core COSMA8 node
(``scripts/FLAMINGO/L1000N0900/halo_properties_L1000N0900.sh``), i.e.
>= ~174 halos/s/node.  ``vs_baseline`` is measured halos/s per chip
divided by that envelope number.

Prints ONE JSON line on stdout; progress goes to stderr.
"""

import json
import sys
import time

import numpy as np

BASELINE_HALOS_PER_SEC = 2.5e6 / (4 * 3600.0)  # reference envelope


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    t0 = time.time()
    from soap_tpu.models.context import HaloContext
    from soap_tpu.pipeline.chunk_data import ChunkData, stage_ptype
    from soap_tpu.pipeline.engine import HaloEngine, HaloTypeSpec
    from soap_tpu.utils import mock_data

    G = mock_data.G_INTERNAL
    n_halos = 2048
    # log-uniform halo masses from ~32 to ~30000 particles: matches the
    # production situation where the small-halo majority dominates the
    # count (the reference envelope is per halo over the full mass
    # function, ``scripts/FLAMINGO/...``); enough halos that fixed
    # dispatch latency amortizes as it would in a production run
    uni = mock_data.build_mock_universe(
        n_halos=n_halos,
        n_field=400_000,
        boxsize=170.0,
        seed=20260816,
        mass_range=(3.2, 3000.0),
    )
    log(f"[{time.time()-t0:6.1f}s] mock universe: {len(uni.pos)} particles, "
        f"{uni.n_halos} halos")

    groupnr = np.full(len(uni.ids), -1, dtype=np.int64)
    id_to_row = np.empty(uni.ids.max() + 1, dtype=np.int64)
    id_to_row[uni.ids] = np.arange(len(uni.ids))
    for hi, ids in enumerate(uni.bound_ids):
        groupnr[id_to_row[ids]] = hi

    rho_crit0 = 3.0 * (100.0 * uni.h) ** 2 / (8.0 * np.pi * G)
    E2 = uni.omega_m / uni.a**3 + uni.omega_lambda
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
        a=uni.a,
        z=0.0,
        G=G,
        boxsize=uni.boxsize,
        critical_density=rho_crit0 * E2,
        mean_density=rho_crit0 * uni.omega_m / uni.a**3,
        softening=(0.01,),
        ptypes=("PartType1",),
        capacities=(0,),
        dmo=True,
    )
    # full production default calculation list (38 specs); BN98 bracket
    # density at z=0 for this cosmology: x = Omega_m(z) - 1,
    # Delta = 18 pi^2 + 82x - 39x^2 (Bryan & Norman 1998)
    from soap_tpu.pipeline.specs import build_specs

    x = uni.omega_m / E2 - 1.0
    bn98 = 18.0 * np.pi**2 + 82.0 * x - 39.0 * x * x
    specs = build_specs(None, dmo=True, bn98_value=bn98)
    log(f"spec set: {len(specs)} calculations "
        f"({sum(len(s.keys) for s in specs)} property keys)")
    args = dict(
        centres=uni.halo_pos,
        search_radius_phys=uni.halo_renclose * uni.a * 1.01,
        index=np.arange(uni.n_halos, dtype=np.int64),
        is_central=np.ones(uni.n_halos, dtype=bool),
        fof_id=np.arange(1, uni.n_halos + 1, dtype=np.int64),
        # enables the production aperture-copy optimization
        enclose_radius_phys=uni.halo_renclose * uni.a,
    )

    log(f"[{time.time()-t0:6.1f}s] warmup (compile) pass...")
    engine = HaloEngine(ctx, chunk, specs)
    engine.process(**args)
    log(f"[{time.time()-t0:6.1f}s] warmup done "
        f"({engine.stats.n_bucket_calls} bucket calls, "
        f"{engine.stats.n_retries} retries)")

    engine = HaloEngine(ctx, chunk, specs)
    t1 = time.time()
    engine.process(**args)
    dt = time.time() - t1
    halos_per_sec = n_halos / dt
    log(f"[{time.time()-t0:6.1f}s] timed pass: {dt:.3f}s -> "
        f"{halos_per_sec:.1f} halos/s")
    log(engine.stats.timing_report())

    print(
        json.dumps(
            {
                "metric": "halos_per_sec_per_chip",
                "value": round(halos_per_sec, 2),
                "unit": "halos/s",
                "vs_baseline": round(halos_per_sec / BASELINE_HALOS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
