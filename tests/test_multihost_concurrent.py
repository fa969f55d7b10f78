"""CONCURRENT two-process multi-host run racing on one scratch dir.

VERDICT r4 ask #6: the sequential-in-one-process test
(``test_multihost.py``) never exercises the actual production topology —
two ``compute_halo_properties`` processes writing chunks into the same
scratch directory at the same time, both then attempting the combine.
Exactly one may win the combine claim (``multihost.claim_combine``'s
O_EXCL + pid-liveness lock), and the catalogue it writes must be
byte-identical to a sequential single-host run over the same chunk
layout."""

import os
import subprocess
import sys

import h5py
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPT = r"""
import sys
import numpy as np
from soap_tpu.pipeline.engine import HaloTypeSpec
from soap_tpu.pipeline.run import compute_halo_properties

workdir, host_index, host_count, out = (
    sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
)
specs = [
    HaloTypeSpec(kind="bound", group="BoundSubhalo", keys=("Mtot", "Ndm")),
    HaloTypeSpec(kind="SO", group="SO/200_crit", keys=("r", "Mtot"),
                 so_type="crit", so_multiple=200.0, centrals_only=True),
]
run = compute_halo_properties(
    snapshot_file=f"{workdir}/snap_0077.hdf5",
    membership_file=f"{workdir}/mem.hdf5",
    halo_basename=f"{workdir}/SubSnap_077",
    output_file=out,
    dmo=True,
    specs=specs,
    nr_chunks=4,
    scratch_dir=f"{workdir}/scratch",
    host_index=host_index,
    host_count=host_count,
    verbose=False,
)
print("WROTE" if run.output_path else "NO_CATALOGUE", flush=True)
"""


def _dataset_paths(f):
    out = []
    f.visititems(
        lambda name, obj: out.append(name)
        if isinstance(obj, h5py.Dataset)
        else None
    )
    return sorted(out)


@pytest.mark.slow
def test_concurrent_two_process_race(tmp_path):
    from soap_tpu.pipeline.membership import run_group_membership
    from soap_tpu.utils import mock_data

    workdir = str(tmp_path / "sim")
    os.makedirs(workdir)
    mock_data.make_mock_simulation(
        workdir, n_halos=12, n_field=6000, boxsize=24.0, seed=31
    )
    run_group_membership(
        f"{workdir}/snap_0077.hdf5",
        f"{workdir}/SubSnap_077",
        f"{workdir}/mem.hdf5",
    )
    cache = str(tmp_path / "xla_cache")
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=1",
        PYTHONPATH=REPO,
        SOAP_TPU_COMPILATION_CACHE=cache,
        SOAP_TPU_PREFETCH="0",
    )

    def launch(host_index, host_count, out):
        return subprocess.Popen(
            [
                sys.executable,
                "-c",
                SCRIPT,
                workdir,
                str(host_index),
                str(host_count),
                out,
            ],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
        )

    # warm the persistent compile cache once so the RACING processes
    # spend their time in the pipeline, not the compiler
    warm = launch(0, 1, str(tmp_path / "warm.hdf5"))
    warm_out, warm_err = warm.communicate(timeout=900)
    assert warm.returncode == 0, warm_err[-3000:]
    import shutil

    shutil.rmtree(f"{workdir}/scratch")

    # sequential single-host reference over the SAME 4-chunk layout
    ref_path = str(tmp_path / "ref.hdf5")
    ref = launch(0, 1, ref_path)
    ref_out, ref_err = ref.communicate(timeout=900)
    assert ref.returncode == 0, ref_err[-3000:]
    assert "WROTE" in ref_out
    shutil.rmtree(f"{workdir}/scratch")

    # the race: two hosts, disjoint chunk halves, one scratch dir
    out0 = str(tmp_path / "cat_host0.hdf5")
    out1 = str(tmp_path / "cat_host1.hdf5")
    p0 = launch(0, 2, out0)
    p1 = launch(1, 2, out1)
    o0, e0 = p0.communicate(timeout=900)
    o1, e1 = p1.communicate(timeout=900)
    assert p0.returncode == 0, e0[-3000:]
    assert p1.returncode == 0, e1[-3000:]

    written = [p for p in (out0, out1) if os.path.exists(p)]
    assert len(written) == 1, (
        f"expected exactly one combined catalogue, got {written}\n"
        f"host0: {o0!r}\nhost1: {o1!r}"
    )
    assert (o0 + o1).count("WROTE") == 1

    # byte-identical datasets vs the sequential reference
    with h5py.File(written[0], "r") as a, h5py.File(ref_path, "r") as b:
        paths_a = _dataset_paths(a)
        paths_b = _dataset_paths(b)
        assert paths_a == paths_b
        for name in paths_a:
            da, db = a[name][...], b[name][...]
            if da.dtype.kind in "fc":
                np.testing.assert_array_equal(
                    da, db, err_msg=name
                )  # bitwise: same programs, same schedule
            else:
                np.testing.assert_array_equal(da, db, err_msg=name)
