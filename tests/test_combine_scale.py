"""Combine-at-scale smoke test (VERDICT r4 item 7).

Runs each phase of ``tools/bench_combine.py`` at reduced scale in its
OWN subprocess (peak RSS is per-process and monotonic, so a phase
sharing a process with scratch writing — or with allocator history
under memory pressure — reads a polluted baseline) and asserts the
lazy column-streaming combine stays memory-bounded while the eager
combine materializes the full catalogue.  The full 10^6-halo
measurement (lazy 179 MB vs eager 2.1 GB peak RSS, 2.0 GB scratch) is
recorded in PARITY.md.
"""

import os
import re
import subprocess
import sys
import tempfile

N_HALOS, N_CHUNKS = "200000", "4"


def _phase(repo, scratch, phase):
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        PYTHONPATH=repo,
        SOAP_TPU_COMBINE_SCRATCH=scratch,
    )
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "bench_combine.py"),
         N_HALOS, N_CHUNKS, phase],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert out.returncode == 0, (phase, out.stderr[-2000:])
    return out.stdout


def test_lazy_combine_memory_bounded():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    scratch = tempfile.mkdtemp(prefix="combine_scale_test_")
    _phase(repo, scratch, "write")

    def peak(stdout, pattern):
        m = re.search(pattern, stdout)
        base = re.search(r"baseline RSS (\d+) MB", stdout)
        assert m and base, stdout
        return int(base.group(1)), int(m.group(1))

    base_l, lazy_mb = peak(
        _phase(repo, scratch, "lazy"),
        r"lazy combine\+stream:\s+[\d.]+s\s+peak RSS (\d+) MB",
    )
    base_e, eager_mb = peak(
        _phase(repo, scratch, "eager"),
        r"eager combine:\s+[\d.]+s\s+peak RSS (\d+) MB",
    )
    # 200k halos x 508 f32 columns = ~400 MB materialized: the lazy pass
    # must stay well under one-tenth of that above baseline, the eager
    # pass must actually hold the catalogue
    assert lazy_mb - base_l < 120, (base_l, lazy_mb)
    assert eager_mb - base_e > 300, (base_e, eager_mb)
