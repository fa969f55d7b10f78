"""Combine-at-scale measurement: synthetic production-sized scratch.

Writes N_HALOS x full-key chunk scratch files (the shape of a FLAMINGO
L1000N0900-scale run: ~10^6 halos x ~500 float32 columns across 8
chunks), then measures wall-clock and peak RSS for

  (a) the lazy column-streaming combine feeding a column-at-a-time
      consumer (the production writer pattern), and
  (b) the eager full-materialization combine,

validating the memory claim behind ``LazyScratchColumns`` (reference
analogue: <= 100-property batches, ``combine_chunks.py:376-404``).

Usage: python tools/bench_combine.py [n_halos] [n_chunks] [phase]

``phase`` defaults to ``all`` (write + both combines in one process).
``write``/``lazy``/``eager`` run one step against a scratch dir named in
``SOAP_TPU_COMBINE_SCRATCH`` — peak RSS (``ru_maxrss``) is monotonic per
process, so a phase measured in its own subprocess cannot be polluted
by scratch writing or allocator history (the in-process ``all`` mode's
baseline occasionally absorbs earlier peaks under memory pressure).
"""

import os
import resource
import subprocess
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def peak_rss_mb():
    # VmHWM, not ru_maxrss: the latter survives execve on Linux, so a
    # subprocess forked from a fat parent (the test runner) inherits the
    # parent's peak and every phase reads the same polluted number
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmHWM:"):
                    return int(line.split()[1]) / 1024.0
    except OSError:
        pass
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def make_scratch(scratch, specs, n_halos, n_chunks, seed=0):
    import h5py

    rng = np.random.default_rng(seed)
    splits = np.array_split(rng.permutation(n_halos), n_chunks)
    for c, rows in enumerate(splits):
        with h5py.File(f"{scratch}/chunk_{c}.hdf5", "w") as f:
            f.create_dataset("rows", data=np.sort(rows))
            for spec in specs:
                g = f.create_group(spec.group)
                for key in spec.keys:
                    g.create_dataset(
                        key,
                        data=rng.normal(size=len(rows)).astype(np.float32),
                    )
            f.attrs["calc_names"] = [
                np.bytes_(f"{s.group}/{k}") for s in specs for k in s.keys
            ]
            import soap_tpu

            f.attrs["soap_tpu_version"] = np.bytes_(soap_tpu.__version__)
            f.attrs["Write complete"] = True
    return splits


def _run_lazy(scratch, specs, n_halos):
    """Iterate every column once (checksum), never retaining more than
    one column — the production writer's access pattern."""
    from soap_tpu.parallel import multihost

    t0 = time.time()
    lazy = multihost.combine_scratch(scratch, specs, n_halos, lazy=True)
    total = 0.0
    for spec in specs:
        cols = lazy[spec.group]
        for key in spec.keys:
            col = cols[key]
            total += float(col[:: max(n_halos // 7, 1)].sum())
            del col
    print(
        f"lazy combine+stream: {time.time()-t0:7.1f}s  peak RSS "
        f"{peak_rss_mb():.0f} MB (checksum {total:.3g})"
    )


def _run_eager(scratch, specs, n_halos):
    from soap_tpu.parallel import multihost

    t0 = time.time()
    merged = multihost.combine_scratch(scratch, specs, n_halos, lazy=False)
    print(
        f"eager combine:       {time.time()-t0:7.1f}s  peak RSS "
        f"{peak_rss_mb():.0f} MB ({sum(len(v) for v in merged.values())} "
        f"column groups)"
    )


def main():
    n_halos = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_chunks = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    phase = sys.argv[3] if len(sys.argv) > 3 else "all"

    from soap_tpu.pipeline.specs import build_specs

    specs = tuple(build_specs(None, dmo=True, bn98_value=100.0))
    n_cols = sum(len(s.keys) for s in specs)

    if phase in ("write", "lazy", "eager"):
        scratch = os.environ["SOAP_TPU_COMBINE_SCRATCH"]
        if phase == "write":
            t0 = time.time()
            make_scratch(scratch, specs, n_halos, n_chunks)
            print(f"scratch written in {time.time()-t0:.1f}s")
        elif phase == "lazy":
            print(f"baseline RSS {peak_rss_mb():.0f} MB")
            _run_lazy(scratch, specs, n_halos)
        else:
            print(f"baseline RSS {peak_rss_mb():.0f} MB")
            _run_eager(scratch, specs, n_halos)
        return

    scratch = tempfile.mkdtemp(prefix="combine_bench_")
    print(
        f"writing scratch: {n_halos} halos x {n_cols} columns "
        f"({n_halos * n_cols * 4 / 1e9:.1f} GB) in {n_chunks} chunks ..."
    )
    t0 = time.time()
    make_scratch(scratch, specs, n_halos, n_chunks)
    print(f"scratch written in {time.time()-t0:.1f}s; baseline RSS "
          f"{peak_rss_mb():.0f} MB")
    _run_lazy(scratch, specs, n_halos)
    _run_eager(scratch, specs, n_halos)


if __name__ == "__main__":
    main()
