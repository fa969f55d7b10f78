"""Reference-snapshot mechanism for particle types absent at high z.

Reference behavior (``SOAP/core/swift_cells.py:374-404,705-722``): when a
snapshot lacks a particle type (no stars or BHs at early times), a
lower-z "reference" snapshot of the same run supplies the dataset
names/dtypes/shapes/units, and reads of those types return empty arrays —
so the property pipeline and output schema are identical to a later
snapshot's.
"""

import os
import shutil

import h5py
import numpy as np
import pytest

from soap_tpu.io import swift_snapshot
from soap_tpu.pipeline.membership import run_group_membership
from soap_tpu.pipeline.run import compute_halo_properties
from soap_tpu.utils import mock_data


@pytest.fixture(scope="module")
def highz_sim(tmp_path_factory):
    """A hydro mock, plus a copy of its snapshot with stars/BHs removed."""
    workdir = str(tmp_path_factory.mktemp("highz"))
    sim = mock_data.make_mock_simulation(
        workdir, n_halos=6, n_field=4000, boxsize=22.0, seed=31, hydro=True
    )
    highz_snap = os.path.join(workdir, "snapshot_highz.hdf5")
    shutil.copy(sim["snapshot"], highz_snap)
    with h5py.File(highz_snap, "r+") as f:
        for pt in ("PartType4", "PartType5"):
            if pt in f:
                del f[pt]
            for grp in ("Cells/Counts", "Cells/OffsetsInFile", "Cells/Files"):
                if grp in f and pt in f[grp]:
                    del f[f"{grp}/{pt}"]
    return dict(sim, highz_snapshot=highz_snap, workdir=workdir)


def test_metadata_registers_reference_ptypes(highz_sim):
    meta = swift_snapshot.SnapshotMetadata(
        highz_sim["highz_snapshot"], ref_filename=highz_sim["snapshot"]
    )
    assert set(meta.ref_ptypes) == {"PartType4", "PartType5"}
    assert "PartType4" in meta.ptypes
    # dtypes/shapes come from the reference snapshot
    ref_meta = swift_snapshot.SnapshotMetadata(highz_sim["snapshot"])
    for name, info in ref_meta.datasets["PartType4"].items():
        got = meta.datasets["PartType4"][name]
        assert got.dtype == info.dtype and got.row_shape == info.row_shape
        assert got.file_template is None
    # without the mechanism the types are genuinely absent
    bare = swift_snapshot.SnapshotMetadata(highz_sim["highz_snapshot"])
    assert "PartType4" not in bare.ptypes


def test_reads_return_empty_arrays(highz_sim):
    meta = swift_snapshot.SnapshotMetadata(
        highz_sim["highz_snapshot"], ref_filename=highz_sim["snapshot"]
    )
    mask = np.ones(meta.nr_cells, bool)
    data = swift_snapshot.read_masked_cells(
        meta,
        mask,
        {
            "PartType1": ["Coordinates", "Masses"],
            "PartType4": ["Coordinates", "Masses", "InitialMasses"],
        },
    )
    assert len(data["PartType1"]["Coordinates"]) > 0
    for name in ("Coordinates", "Masses", "InitialMasses"):
        arr = data["PartType4"][name]
        assert arr.shape[0] == 0
        ref_info = meta.datasets["PartType4"][name]
        assert arr.dtype == ref_info.dtype
        assert arr.shape[1:] == ref_info.row_shape


def test_highz_run_end_to_end(highz_sim):
    """Full hydro pipeline on the star-less snapshot: star/BH properties
    exist with the full-schema dtypes and are all zero."""
    workdir = highz_sim["workdir"]
    membership = os.path.join(workdir, "membership_highz.hdf5")
    run_group_membership(
        highz_sim["highz_snapshot"], highz_sim["hbt_basename"], membership
    )
    output = os.path.join(workdir, "catalogue_highz.hdf5")
    from soap_tpu.core.halo_types import implemented_keys_for
    from soap_tpu.pipeline.engine import HaloTypeSpec

    specs = [
        HaloTypeSpec(
            kind="bound",
            group="BoundSubhalo",
            keys=implemented_keys_for("BoundSubhalo", False),
        )
    ]
    run = compute_halo_properties(
        snapshot_file=highz_sim["highz_snapshot"],
        membership_file=membership,
        halo_basename=highz_sim["hbt_basename"],
        output_file=output,
        dmo=False,
        specs=specs,
        reference_snapshot=highz_sim["snapshot"],
        verbose=False,
    )
    sub = run.results["BoundSubhalo"]
    assert np.all(np.asarray(sub["Nstar"]) == 0)
    assert np.all(np.asarray(sub["Nbh"]) == 0)
    assert np.all(np.asarray(sub["Mstar"]) == 0)
    assert np.all(np.asarray(sub["Ngas"]) > 0)  # gas still present
    assert np.all(np.asarray(sub["Mtot"]) > 0)
    with h5py.File(output) as f:
        # schema parity: stellar datasets exist with correct dtypes
        assert f["BoundSubhalo/StellarMass"].dtype == np.float32
        assert np.all(f["BoundSubhalo/StellarMass"][...] == 0)
