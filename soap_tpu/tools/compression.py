"""Catalogue compression: SWIFT-style lossy HDF5 filter pipelines + GZIP.

Equivalent of the reference's post-processing compressor
(``SOAP/compression/compress_soap_catalogue.py:22-101``): every dataset
carrying a ``Lossy compression filter`` attribute is rewritten with that
filter applied plus fletcher32 + GZIP-4, chunked at 1000 rows, and the
``Is Compressed`` attribute is set to True.

SWIFT's lossy filters are standard native HDF5 pipelines — H5Z_FILTER_NBIT
over a reduced-precision datatype for the FMantissa/DMantissa/Nbit
families and H5Z_FILTER_SCALEOFFSET (D-scale) for DScaleN
(``SOAP/compression/filters.yml``, ``extract_filters.py``).  Instead of
deserializing extracted filter blobs, the pipelines are SYNTHESIZED with
the h5py low-level API: an n-bit filter needs only a base IEEE type with
``set_precision``/``set_fields`` reduced to sign+exponent+mantissa bits.
Files read back with plain h5py/HDF5 — no plugins — and match the
reference's storage semantics (including Nbit40 on int64 ID columns,
which stores 40 of 64 bits).

``apply_lossy_filter`` remains as a NUMERIC emulation used as a fallback
(and by tests) when a pipeline cannot be created.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import h5py
import numpy as np

CHUNK_ROWS = 1000  # reference compress_soap_catalogue.py:22

#: filter name -> (base kind, exponent bits, mantissa bits) for the n-bit
#: float family; precision = 1 + esize + msize (matches the extracted
#: pipelines in the reference's filters.yml)
_NBIT_FLOAT = {
    "FMantissa9": ("f4", 8, 9),
    "FMantissa13": ("f4", 8, 13),
    "HalfFloat": ("f4", 5, 10),
    "BFloat16": ("f4", 8, 7),
    "DMantissa9": ("f8", 11, 9),
    "DMantissa13": ("f8", 11, 13),
    "DMantissa21": ("f8", 11, 21),
}

#: filter name -> stored bits for the integer n-bit family
_NBIT_INT = {"Nbit36": 36, "Nbit40": 40, "Nbit48": 48, "Nbit56": 56}


def _nbit_float_type(base: str, esize: int, msize: int) -> h5py.h5t.TypeFloatID:
    t = (h5py.h5t.IEEE_F32LE if base == "f4" else h5py.h5t.IEEE_F64LE).copy()
    prec = 1 + esize + msize
    t.set_fields(prec - 1, msize, esize, 0, msize)
    t.set_precision(prec)
    t.set_offset(0)
    return t


def _nbit_int_type(dtype: np.dtype, bits: int) -> h5py.h5t.TypeIntegerID:
    t = h5py.h5t.py_create(dtype).copy()
    t.set_precision(bits)
    t.set_offset(0)
    return t


def _filter_pipeline_type(
    filter_name: str, dtype: np.dtype
) -> Optional[Tuple[h5py.h5t.TypeID, np.dtype, Optional[int]]]:
    """(HDF5 storage type, cast dtype, scaleoffset digits) for a filter.

    Returns None when the filter does not apply to this dtype (e.g. a
    float filter on integer data) — the dataset is then stored lossless.
    """
    if filter_name in _NBIT_FLOAT:
        if dtype.kind != "f":
            return None
        base, esize, msize = _NBIT_FLOAT[filter_name]
        return _nbit_float_type(base, esize, msize), np.dtype(base), None
    if filter_name in _NBIT_INT:
        if dtype.kind not in "iu":
            return None
        cast = np.dtype("i8" if dtype.kind == "i" else "u8")
        return _nbit_int_type(cast, _NBIT_INT[filter_name]), cast, None
    if filter_name.startswith("DScale"):
        if dtype.kind != "f":
            return None
        digits = int(filter_name[len("DScale"):])
        return h5py.h5t.py_create(dtype).copy(), dtype, digits
    return None


def _create_lossy_dataset(
    f: h5py.File,
    name: str,
    data: np.ndarray,
    filter_name: str,
    gzip_level: int,
) -> Optional[h5py.Dataset]:
    """Create ``name`` with the real SWIFT filter pipeline; None = no-op.

    Pipeline order matches the reference (``compress_soap_catalogue.py:
    88-101``): lossy filter, fletcher32 checksum, deflate.
    """
    spec = _filter_pipeline_type(filter_name, data.dtype)
    if spec is None or data.ndim == 0 or data.shape[0] == 0:
        return None
    h5type, cast, scale_digits = spec
    data = np.ascontiguousarray(data.astype(cast, copy=False))
    plist = h5py.h5p.create(h5py.h5p.DATASET_CREATE)
    chunk = (min(data.shape[0], CHUNK_ROWS),) + data.shape[1:]
    plist.set_chunk(chunk)
    if scale_digits is not None:
        plist.set_scaleoffset(h5py.h5z.SO_FLOAT_DSCALE, scale_digits)
    else:
        plist.set_filter(h5py.h5z.FILTER_NBIT, h5py.h5z.FLAG_OPTIONAL, ())
    plist.set_fletcher32()
    plist.set_deflate(gzip_level)
    space = h5py.h5s.create_simple(data.shape, data.shape)
    parent = f.require_group(name.rsplit("/", 1)[0]) if "/" in name else f
    h5py.h5d.create(
        parent.id, name.rsplit("/", 1)[-1].encode("utf-8"), h5type, space,
        plist, None,
    ).close()
    ds = f[name]
    ds[...] = data
    return ds


def _round_mantissa(data: np.ndarray, keep_bits: int) -> np.ndarray:
    """Keep ``keep_bits`` mantissa bits (round-to-nearest) in float data."""
    if data.dtype == np.float32:
        u = data.view(np.uint32).copy()
        drop = 23 - keep_bits
        if drop <= 0:
            return data
        half = np.uint32(1 << (drop - 1))
        mask = np.uint32(~((1 << drop) - 1) & 0xFFFFFFFF)
        u = ((u + half) & mask).astype(np.uint32)
        return u.view(np.float32)
    if data.dtype == np.float64:
        u = data.view(np.uint64).copy()
        drop = 52 - keep_bits
        if drop <= 0:
            return data
        half = np.uint64(1 << (drop - 1))
        mask = np.uint64(~np.uint64((1 << drop) - 1))
        u = ((u + half) & mask).astype(np.uint64)
        return u.view(np.float64)
    return data


def apply_lossy_filter(data: np.ndarray, filter_name: str) -> np.ndarray:
    """Numerically emulate a SWIFT lossy filter (fallback path)."""
    if filter_name in ("None", "", None):
        return data
    if filter_name in _NBIT_FLOAT and data.dtype.kind == "f":
        return _round_mantissa(data, _NBIT_FLOAT[filter_name][2])
    if filter_name in _NBIT_INT and data.dtype.kind in "iu":
        bits = _NBIT_INT[filter_name]
        # storage keeps the low `bits` bits; values within range survive
        lo = -(1 << (bits - 1)) if data.dtype.kind == "i" else 0
        hi = (1 << (bits - 1)) - 1 if data.dtype.kind == "i" else (1 << bits) - 1
        return np.clip(data, lo, hi)
    if filter_name.startswith("DScale") and data.dtype.kind == "f":
        digits = int(filter_name[len("DScale"):])
        return np.round(data, digits)
    return data


def _relaxed_fapl() -> Optional[h5py.h5p.PropFAID]:
    """File-access plist with relaxed datatype integrity checks, or None.

    HDF5 >= 1.14.4 rejects n-bit float types whose precision is much
    smaller than their storage size (e.g. DMantissa9: 21 of 64 bits —
    exactly what reference-compressed catalogues contain) unless
    ``H5Pset_relax_file_integrity_checks`` is set; h5py does not expose
    it, so it is called through ctypes (best effort).
    """
    try:
        import ctypes
        import glob

        libs = glob.glob(
            os.path.join(
                os.path.dirname(h5py.__file__), "..", "h5py.libs", "libhdf5-*.so*"
            )
        )
        fn = ctypes.CDLL(libs[0]).H5Pset_relax_file_integrity_checks
        fn.argtypes = [ctypes.c_int64, ctypes.c_uint64]
        fapl = h5py.h5p.create(h5py.h5p.FILE_ACCESS)
        if fn(fapl.id, 0x0001) < 0:  # H5F_RFIC_UNUSUAL_NUM_UNUSED_NUMERIC_BITS
            return None
        return fapl
    except Exception:
        return None


def open_relaxed(path: str, mode: str = "r") -> h5py.File:
    """Open a (possibly lossy-compressed) catalogue.

    Needed for files carrying DMantissa9-style reduced-precision types
    (both ours and the reference's) under HDF5 >= 1.14.4.
    """
    fapl = _relaxed_fapl()
    if fapl is None:
        return h5py.File(path, mode)
    flags = {
        "r": h5py.h5f.ACC_RDONLY,
        "r+": h5py.h5f.ACC_RDWR,
    }.get(mode)
    if flags is None:
        fid = h5py.h5f.create(
            path.encode("utf-8"), h5py.h5f.ACC_TRUNC, fapl=fapl
        )
    else:
        fid = h5py.h5f.open(path.encode("utf-8"), flags, fapl=fapl)
    return h5py.File(fid)


def _open_output_relaxed(output_path: str) -> h5py.File:
    return open_relaxed(output_path, mode="w")


def extract_filters(snapshot_file: str) -> dict:
    """Extract the serialized lossy filter pipelines from a SWIFT file.

    Equivalent of the reference's ``compression/extract_filters.py``:
    for each distinct ``Lossy compression filter`` attribute found on a
    particle dataset, record the raw HDF5 filter tuples and the encoded
    storage datatype, and append a fletcher32 checksum filter.  The
    result feeds ``compress_catalogue(filters_file=...)`` for exact
    pipeline parity with reference-compressed catalogues.
    """
    filters: dict = {}
    with open_relaxed(snapshot_file) as f:
        for i in (0, 1, 4, 5, 6):
            gname = f"PartType{i}"
            if gname not in f:
                continue
            group = f[gname]
            for prop in group:
                if not isinstance(group[prop], h5py.Dataset):
                    continue
                fname = group[prop].attrs.get(
                    "Lossy compression filter", b"None"
                )
                if isinstance(fname, bytes):
                    fname = fname.decode()
                if fname in filters or fname in ("None", ""):
                    continue
                dset = h5py.h5d.open(group.id, prop.encode("utf-8"))
                plist = dset.get_create_plist()
                if plist.get_nfilters() < 1:
                    continue
                lossy = list(plist.get_filter(0))
                lossy[2] = [int(v) for v in lossy[2]]
                lossy[3] = (
                    lossy[3].decode() if isinstance(lossy[3], bytes) else lossy[3]
                )
                filters[fname] = {
                    "filters": [
                        [int(lossy[0]), int(lossy[1]), lossy[2], lossy[3]]
                    ],
                    "type": dset.get_type().encode(),
                }
    fletcher = [int(h5py.h5z.FILTER_FLETCHER32), 0, [], "fletcher32"]
    for fname in filters:
        filters[fname]["filters"].append(fletcher)
    return filters


def write_filters_yaml(snapshot_file: str, output_yaml: str) -> dict:
    """Extract filters and save them as YAML (reference filters.yml)."""
    import yaml

    filters = extract_filters(snapshot_file)
    os.makedirs(
        os.path.dirname(os.path.abspath(output_yaml)), exist_ok=True
    )
    with open(output_yaml, "w") as f:
        yaml.safe_dump(filters, f)
    return filters


def load_filters_yaml(filters_file: str) -> dict:
    import yaml

    with open(filters_file) as f:
        return yaml.safe_load(f) or {}


def _create_extracted_dataset(
    f: h5py.File,
    name: str,
    data: np.ndarray,
    fprops: dict,
    gzip_level: int,
) -> Optional[h5py.Dataset]:
    """Create ``name`` with an EXTRACTED filter pipeline (reference
    ``compress_soap_catalogue.py:88-101`` create_lossy_dataset)."""
    if data.ndim == 0 or data.shape[0] == 0:
        return None
    h5type = h5py.h5t.decode(bytes(fprops["type"]))
    plist = h5py.h5p.create(h5py.h5p.DATASET_CREATE)
    chunk = (min(data.shape[0], CHUNK_ROWS),) + data.shape[1:]
    plist.set_chunk(chunk)
    for filt in fprops["filters"]:
        plist.set_filter(int(filt[0]), int(filt[1]), tuple(filt[2]))
    plist.set_deflate(gzip_level)
    space = h5py.h5s.create_simple(data.shape, data.shape)
    parent = f.require_group(name.rsplit("/", 1)[0]) if "/" in name else f
    h5py.h5d.create(
        parent.id, name.rsplit("/", 1)[-1].encode("utf-8"), h5type, space,
        plist, None,
    ).close()
    ds = f[name]
    ds[...] = np.ascontiguousarray(data)
    return ds


def compress_catalogue(
    input_path: str,
    output_path: str,
    gzip_level: int = 4,
    filters_file: Optional[str] = None,
) -> int:
    """Write a compressed copy of a catalogue; returns datasets rewritten.

    With ``filters_file`` (YAML from ``extract_filters``), datasets use
    the exact filter pipelines extracted from a SWIFT snapshot; without
    it, equivalent pipelines are synthesized from the filter names.
    """
    n_done = 0
    extracted = load_filters_yaml(filters_file) if filters_file else {}
    with h5py.File(input_path, "r") as src, _open_output_relaxed(output_path) as dst:
        def copy_attrs(s, d):
            for k, v in s.attrs.items():
                d.attrs[k] = v

        copy_attrs(src, dst)

        def visit(name, obj):
            nonlocal n_done
            if isinstance(obj, h5py.Group):
                g = dst.require_group(name)
                copy_attrs(obj, g)
                return
            data = obj[...]
            filt = obj.attrs.get("Lossy compression filter", b"None")
            if isinstance(filt, bytes):
                filt = filt.decode()
            ds = None
            if filt not in ("None", ""):
                try:
                    if filt in extracted:
                        ds = _create_extracted_dataset(
                            dst, name, data, extracted[filt], gzip_level
                        )
                    else:
                        ds = _create_lossy_dataset(
                            dst, name, data, filt, gzip_level
                        )
                except Exception:
                    ds = None
                if ds is None:
                    # fallback: numeric emulation + plain gzip
                    data = apply_lossy_filter(data, filt)
            if ds is None:
                chunks = None
                if data.shape and data.shape[0] > CHUNK_ROWS:
                    chunks = (CHUNK_ROWS,) + data.shape[1:]
                ds = dst.create_dataset(
                    name,
                    data=data,
                    compression="gzip",
                    compression_opts=gzip_level,
                    shuffle=True,
                    chunks=chunks,
                )
            copy_attrs(obj, ds)
            ds.attrs["Is Compressed"] = True
            n_done += 1

        src.visititems(visit)
    return n_done


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description="Compress a SOAP catalogue")
    p.add_argument("input")
    p.add_argument("output")
    p.add_argument("--gzip-level", type=int, default=4)
    args = p.parse_args(argv)
    n = compress_catalogue(args.input, args.output, args.gzip_level)
    a = os.path.getsize(args.input)
    b = os.path.getsize(args.output)
    print(f"compressed {n} datasets: {a} -> {b} bytes ({b/a:.2%})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
