"""Op-level TPU profile of one DMO engine bucket.

Reproduces the bench's DMO workload restricted to the small-halo
majority (the dominant narrow-pass bucket), traces one timed pass with
``jax.profiler``, and aggregates the device plane's "XLA Ops" line by
fusion/op name and source line.  Prints the top rows by device time —
the measurement tool behind the round-3 per-op cost attribution.

Usage: python tools/profile_bucket.py [max_bound_particles] [top_n]
"""

import collections
import glob
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_small_halo_workload(max_bound=2500):
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    uni, chunk, ctx, specs, args = bench._dmo_engine_setup(
        n_halos=2048,
        mass_range=(3.2, 3000.0),
        n_field=400_000,
        boxsize=170.0,
        seed=20260816,
    )
    nb = np.array([len(b) for b in uni.bound_ids])
    sel = np.flatnonzero(nb <= max_bound)
    print(f"{len(sel)}/{uni.n_halos} halos with <= {max_bound} bound particles")
    args = dict(
        centres=args["centres"][sel],
        search_radius_phys=args["search_radius_phys"][sel],
        index=args["index"][sel],
        is_central=args["is_central"][sel],
        fof_id=args["fof_id"][sel],
        enclose_radius_phys=args["enclose_radius_phys"][sel],
    )
    return chunk, ctx, specs, args


def parse_xspace(trace_dir, top_n=50):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        print("no xplane.pb found under", trace_dir)
        return
    space = xplane_pb2.XSpace()
    with open(paths[0], "rb") as f:
        space.ParseFromString(f.read())

    for plane in space.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        stat_names = {m.id: m.name for m in plane.stat_metadata.values()}
        ev_meta = {m.id: m for m in plane.event_metadata.values()}
        per_op = collections.defaultdict(float)
        op_src = {}
        total = 0.0
        for line in plane.lines:
            if "XLA Ops" not in line.name:
                continue
            for ev in line.events:
                md = ev_meta.get(ev.metadata_id)
                name = md.name if md else str(ev.metadata_id)
                dur = ev.duration_ps / 1e12
                per_op[name] += dur
                total += dur
                if name not in op_src:
                    src = ""
                    for st in list(ev.stats) + (list(md.stats) if md else []):
                        sn = stat_names.get(st.metadata_id, "")
                        if sn in ("source", "source_info", "tf_op", "hlo_category"):
                            v = st.str_value or (
                                space.hostnames and ""
                            )
                            if not v and st.ref_value:
                                v = stat_names.get(st.ref_value, "")
                            src += f" [{sn}: {v}]"
                    op_src[name] = src
        print(f"\nplane: {plane.name}  total XLA-op device time: {total:.3f}s")
        rows = sorted(per_op.items(), key=lambda kv: -kv[1])
        for name, dur in rows[:top_n]:
            print(f"  {dur*1e3:9.2f} ms  {100*dur/max(total,1e-12):5.1f}%  "
                  f"{name}{op_src.get(name,'')}")


def main():
    max_bound = int(sys.argv[1]) if len(sys.argv) > 1 else 2500
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    import jax

    from soap_tpu.pipeline.engine import HaloEngine

    chunk, ctx, specs, args = build_small_halo_workload(max_bound)
    t0 = time.time()
    engine = HaloEngine(ctx, chunk, specs)
    engine.process(**args)
    print(f"warmup done in {time.time()-t0:.1f}s "
          f"(compile {engine.stats.compile_seconds:.0f}s)")
    print(engine.stats.timing_report())

    trace_dir = tempfile.mkdtemp(prefix="soap_prof_")
    engine = HaloEngine(ctx, chunk, specs)
    t1 = time.time()
    with jax.profiler.trace(trace_dir):
        engine.process(**args)
    print(f"timed pass {time.time()-t1:.3f}s")
    print(engine.stats.timing_report())
    parse_xspace(trace_dir, top_n)


if __name__ == "__main__":
    main()
