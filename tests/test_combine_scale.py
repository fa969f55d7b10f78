"""Combine-at-scale smoke test (VERDICT r4 item 7).

Runs ``tools/bench_combine.py`` at reduced scale in a subprocess (peak
RSS is per-process and monotonic, so in-process measurement would be
polluted by earlier tests) and asserts the lazy column-streaming
combine stays memory-bounded while the eager combine materializes the
full catalogue.  The full 10^6-halo measurement (lazy 179 MB vs eager
2.1 GB peak RSS, 2.0 GB scratch) is recorded in PARITY.md.
"""

import os
import re
import subprocess
import sys


def test_lazy_combine_memory_bounded():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=repo)
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "bench_combine.py"),
         "200000", "4"],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    m = re.search(r"baseline RSS (\d+) MB", out.stdout)
    lazy = re.search(r"lazy combine\+stream:\s+[\d.]+s\s+peak RSS (\d+) MB",
                     out.stdout)
    eager = re.search(r"eager combine:\s+[\d.]+s\s+peak RSS (\d+) MB",
                      out.stdout)
    assert m and lazy and eager, out.stdout
    base, lazy_mb, eager_mb = int(m.group(1)), int(lazy.group(1)), int(
        eager.group(1)
    )
    # 200k halos x 508 f32 columns = ~400 MB materialized: the lazy pass
    # must stay well under one-tenth of that above baseline, the eager
    # pass must actually hold the catalogue
    assert lazy_mb - base < 120, (base, lazy_mb)
    assert eager_mb - base > 300, (base, eager_mb)
