"""Parallel reader pool + chunk prefetcher tests: results must be
byte-identical to the serial reader."""

import numpy as np

from soap_tpu.io import swift_snapshot
from soap_tpu.io.reader_pool import ChunkPrefetcher, read_masked_cells_parallel

FIELDS = {"PartType1": ["Coordinates", "Masses", "Velocities", "ParticleIDs"]}


def _compare(meta, mask):
    serial = swift_snapshot.read_masked_cells(meta, mask, FIELDS)
    par = read_masked_cells_parallel(meta, mask, FIELDS, n_processes=3)
    assert set(serial) == set(par)
    for pt in serial:
        assert set(serial[pt]) == set(par[pt])
        for name in serial[pt]:
            np.testing.assert_array_equal(
                serial[pt][name], par[pt][name], err_msg=f"{pt}/{name}"
            )


def test_parallel_read_matches_serial_full_mask(mock_sim):
    meta = swift_snapshot.SnapshotMetadata(mock_sim["snapshot"])
    mask = np.ones(meta.nr_cells, dtype=bool)
    _compare(meta, mask)


def test_parallel_read_matches_serial_partial_mask(mock_sim):
    meta = swift_snapshot.SnapshotMetadata(mock_sim["snapshot"])
    rng = np.random.default_rng(5)
    mask = rng.random(meta.nr_cells) < 0.4
    _compare(meta, mask)


def test_parallel_read_matches_serial_multifile(tmp_path):
    import os

    from soap_tpu.utils.mock_data import make_mock_simulation, split_snapshot_files

    sim = make_mock_simulation(
        str(tmp_path), n_halos=6, n_field=5000, boxsize=20.0, seed=21
    )
    os.makedirs(str(tmp_path / "multi"), exist_ok=True)
    template = str(tmp_path / "multi" / "snap.{file_nr}.hdf5")
    split_snapshot_files(sim["snapshot"], template, 3)
    meta = swift_snapshot.SnapshotMetadata(template)
    mask = np.ones(meta.nr_cells, dtype=bool)
    mask[::3] = False
    _compare(meta, mask)


def test_parallel_fallback_single_process(mock_sim):
    meta = swift_snapshot.SnapshotMetadata(mock_sim["snapshot"])
    mask = np.ones(meta.nr_cells, dtype=bool)
    serial = swift_snapshot.read_masked_cells(meta, mask, FIELDS)
    fb = read_masked_cells_parallel(meta, mask, FIELDS, n_processes=0)
    for pt in serial:
        for name in serial[pt]:
            np.testing.assert_array_equal(serial[pt][name], fb[pt][name])


def test_prefetcher_orders_and_propagates():
    pf = ChunkPrefetcher(enabled=True)
    calls = []

    def make(i):
        def fn():
            calls.append(i)
            return i * 10

        return fn

    pf.submit(0, make(0))
    pf.submit(1, make(1))
    pf.submit(1, make(99))  # duplicate submit is a no-op
    assert pf.take(0, make(0)) == 0
    assert pf.take(1, make(1)) == 10
    assert pf.take(2, make(2)) == 20  # not submitted: synchronous
    assert calls == [0, 1, 2]
    pf.close()

    def boom():
        raise RuntimeError("reader failed")

    pf2 = ChunkPrefetcher(enabled=True)
    pf2.submit(7, boom)
    try:
        pf2.take(7, boom)
        raised = False
    except RuntimeError:
        raised = True
    assert raised
    pf2.close()

    # disabled prefetcher: take() is synchronous
    pf3 = ChunkPrefetcher(enabled=False)
    pf3.submit(1, make(5))
    assert pf3.take(1, make(4)) == 40
    pf3.close()
