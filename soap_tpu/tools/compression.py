"""Catalogue compression: lossy filters + lossless GZIP.

Equivalent of the reference's post-processing compressor
(``SOAP/compression/compress_soap_catalogue.py:22-101``): every dataset
carrying a ``Lossy compression filter`` attribute is rewritten with that
filter applied plus shuffled GZIP-4, chunked at 1000 rows; the
``Is Compressed`` attribute is set to True.

Difference from the reference: instead of serialized SWIFT HDF5 filter
plugins (which require the SWIFT filter plugin library at read time),
the lossy filters are applied NUMERICALLY — mantissa truncation for
FMantissa/DMantissa/Nbit, decimal rounding for DScale — and the result
is stored as plain (gzip-compressed) IEEE data.  Readers need no custom
plugins, and the quantization error budget matches the reference's
documented precision table (``SOAP/property_table.py:297-307``).
"""

from __future__ import annotations

import os
from typing import Optional

import h5py
import numpy as np

CHUNK_ROWS = 1000  # reference compress_soap_catalogue.py


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
    """Numerically apply a SWIFT lossy filter (see module docstring)."""
    if filter_name in ("None", "", None):
        return data
    if filter_name in ("FMantissa9", "DMantissa9"):
        return _round_mantissa(data, 9)
    if filter_name == "FMantissa13":
        return _round_mantissa(data, 13)
    if filter_name == "Nbit40":
        # 40-bit storage of 64-bit values: keep 28 mantissa bits
        return _round_mantissa(data, 28)
    if filter_name.startswith("DScale"):
        digits = int(filter_name[len("DScale"):])
        return np.round(data, digits)
    return data


def compress_catalogue(
    input_path: str,
    output_path: str,
    gzip_level: int = 4,
) -> int:
    """Write a compressed copy of a catalogue; returns datasets rewritten."""
    n_done = 0
    with h5py.File(input_path, "r") as src, h5py.File(output_path, "w") as dst:
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
            if data.dtype.kind == "f":
                data = apply_lossy_filter(data, filt)
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
