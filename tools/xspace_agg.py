"""Aggregate a jax.profiler xplane trace by source line / HLO category.

Usage: python tools/xspace_agg.py <trace_dir> [top_n]
Complements ``profile_bucket.py`` (per-op rows) with rollups that answer
"which source line / op class owns the device time" across ALL bucket
programs of a traced pass.
"""

import collections
import glob
import os
import sys


def main():
    trace_dir = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(
        os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True
    )
    space = xplane_pb2.XSpace()
    with open(paths[0], "rb") as f:
        space.ParseFromString(f.read())

    for plane in space.planes:
        if "TPU" not in plane.name:
            continue
        stat_names = {m.id: m.name for m in plane.stat_metadata.values()}
        ev_meta = {m.id: m for m in plane.event_metadata.values()}

        def md_stat(md, want):
            for st in md.stats:
                if stat_names.get(st.metadata_id, "") == want:
                    if st.str_value:
                        return st.str_value
                    if st.ref_value:
                        return stat_names.get(st.ref_value, "")
            return ""

        by_src = collections.defaultdict(float)
        by_cat = collections.defaultdict(float)
        total = 0.0
        for line in plane.lines:
            if "XLA Ops" not in line.name:
                continue
            for ev in line.events:
                md = ev_meta.get(ev.metadata_id)
                dur = ev.duration_ps / 1e12
                total += dur
                src = md_stat(md, "source") if md else ""
                cat = md_stat(md, "hlo_category") if md else ""
                by_src[src or "<none>"] += dur
                by_cat[cat or "<none>"] += dur
        print(f"plane {plane.name}: total {total:.3f}s")
        print("\n-- by hlo_category --")
        for k, v in sorted(by_cat.items(), key=lambda kv: -kv[1])[:top_n]:
            print(f"  {v*1e3:9.1f} ms {100*v/total:5.1f}%  {k}")
        print("\n-- by source line --")
        for k, v in sorted(by_src.items(), key=lambda kv: -kv[1])[:top_n]:
            print(f"  {v*1e3:9.1f} ms {100*v/total:5.1f}%  {k}")


if __name__ == "__main__":
    main()
