"""Warm-start story for debug reruns (VERDICT r4 item 5).

A ``--halo-indices`` single-halo rerun must not recompile when repeated:
the second identical run (a NEW process, shared persistent compilation
cache) must take every bucket program from the persistent cache.  This
is also the regression guard for the round-4 root-cause fix: bucket
programs are lowered SEQUENTIALLY because concurrent lowering emits
interleaving-dependent MLIR, which changed the cache key every process
and made every run pay full cold compile (the round-3 driver-bench
timeout).
"""

import os
import subprocess
import sys

SCRIPT = r"""
import logging, os, sys
import numpy as np
logging.basicConfig(level=logging.DEBUG, stream=sys.stderr)
for name in ["jax._src.dispatch", "jax._src.interpreters",
             "jax._src.cache_key", "jax._src.compilation_cache"]:
    logging.getLogger(name).setLevel(logging.WARNING)
from soap_tpu.pipeline.engine import HaloTypeSpec
from soap_tpu.pipeline.run import compute_halo_properties

workdir = sys.argv[1]
specs = [
    HaloTypeSpec(kind="bound", group="BoundSubhalo", keys=("Mtot", "Ndm", "com")),
    HaloTypeSpec(kind="SO", group="SO/200_crit", keys=("r", "Mtot"),
                 so_type="crit", so_multiple=200.0, centrals_only=True),
]
run = compute_halo_properties(
    snapshot_file=f"{workdir}/snap_0077.hdf5",
    membership_file=f"{workdir}/mem.hdf5",
    halo_basename=f"{workdir}/SubSnap_077",
    output_file=None,
    dmo=True,
    specs=specs,
    halo_indices=np.array([3]),
    verbose=False,
)
assert float(np.asarray(run.results["BoundSubhalo"]["Mtot"]).sum()) > 0
print("RERUN_OK", flush=True)
"""


def test_single_halo_rerun_hits_persistent_cache(tmp_path):
    from soap_tpu.pipeline.membership import run_group_membership
    from soap_tpu.utils import mock_data

    workdir = str(tmp_path / "sim")
    os.makedirs(workdir)
    mock_data.make_mock_simulation(
        workdir, n_halos=8, n_field=5000, boxsize=20.0, seed=11
    )
    run_group_membership(
        f"{workdir}/snap_0077.hdf5", f"{workdir}/SubSnap_077",
        f"{workdir}/mem.hdf5",
    )
    cache = str(tmp_path / "xla_cache")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=1",
        PYTHONPATH=repo,
        SOAP_TPU_COMPILATION_CACHE=cache,
        SOAP_TPU_PREFETCH="0",
    )

    def rerun():
        return subprocess.run(
            [sys.executable, "-c", SCRIPT, workdir],
            capture_output=True, text=True, timeout=600, env=env,
        )

    r1 = rerun()
    assert r1.returncode == 0, r1.stderr[-3000:]
    assert "RERUN_OK" in r1.stdout
    assert os.path.isdir(cache) and len(os.listdir(cache)) > 0

    r2 = rerun()
    assert r2.returncode == 0, r2.stderr[-3000:]
    assert "RERUN_OK" in r2.stdout
    # the bucket program must be a PERSISTENT cache hit in the fresh
    # process — i.e. the lowered module (and thus the cache key) is
    # reproducible across processes
    hits = [
        ln for ln in r2.stderr.splitlines()
        if "Persistent compilation cache hit" in ln
        and "_process_bucket" in ln
    ]
    misses = [
        ln for ln in r2.stderr.splitlines()
        if "CACHE MISS" in ln and "_process_bucket" in ln
    ]
    assert hits, "no persistent-cache hit for the bucket program:\n" + (
        r2.stderr[-3000:]
    )
    assert not misses, "bucket program missed the persistent cache:\n" + (
        "\n".join(misses)
    )
