"""Timing analysis over a catalogue's per-halo timing datasets.

Counterpart of the reference's ``misc/plot_time.py`` (which plots
``process_time`` vs halo size from ``--record-halo-timings`` output);
here a terminal report, since production runs live on headless hosts:
totals, percentiles, time-vs-size scaling exponent, retry-ladder stats
and the share of time in the largest halos.
"""

from __future__ import annotations

from typing import Dict, Optional

import h5py
import numpy as np


def analyze(catalogue: str) -> Dict[str, object]:
    with h5py.File(catalogue, "r") as f:
        if "InputHalos/process_time" not in f:
            raise KeyError(
                "no InputHalos/process_time — rerun halo-properties with "
                "--record-halo-timings"
            )
        t = np.asarray(f["InputHalos/process_time"], np.float64)
        n_loop = np.asarray(f["InputHalos/n_loop"])
        size = (
            np.asarray(f["InputHalos/NumberOfBoundParticles"])
            if "InputHalos/NumberOfBoundParticles" in f
            else None
        )
    out: Dict[str, object] = {
        "n_halos": len(t),
        "total_seconds": float(t.sum()),
        "mean_ms": float(t.mean() * 1e3),
        "p50_ms": float(np.percentile(t, 50) * 1e3),
        "p90_ms": float(np.percentile(t, 90) * 1e3),
        "p99_ms": float(np.percentile(t, 99) * 1e3),
        "max_ms": float(t.max() * 1e3),
        "retried_halos": int((n_loop > 1).sum()),
        "max_n_loop": int(n_loop.max()) if len(n_loop) else 0,
    }
    # share of total time spent in the top 1% largest-time halos
    if len(t):
        k = max(1, len(t) // 100)
        top = np.sort(t)[-k:]
        out["top1pct_time_share"] = float(top.sum() / max(t.sum(), 1e-30))
    if size is not None and len(size) == len(t) and (size > 0).any():
        # scaling exponent: t ~ N^alpha via log-log least squares
        ok = (size > 0) & (t > 0)
        if ok.sum() > 2:
            a = np.polyfit(np.log(size[ok]), np.log(t[ok]), 1)
            out["time_vs_size_exponent"] = float(a[0])
    return out


def analyze_properties(catalogue: str, top: int = 15) -> Dict[str, float]:
    """Per-calculation-group seconds from ``<name>_time`` datasets
    (``--record-property-timings``); one representative ``_time``
    dataset per group (all properties of a group share its fused
    program's attribution)."""
    groups: Dict[str, float] = {}
    with h5py.File(catalogue, "r") as f:

        def visit(name, obj):
            if isinstance(obj, h5py.Dataset) and name.endswith("_time"):
                group = name.rsplit("/", 1)[0]
                if group not in groups:
                    groups[group] = float(
                        np.asarray(obj, np.float64).sum()
                    )

        f.visititems(visit)
    return dict(
        sorted(groups.items(), key=lambda kv: -kv[1])[: top or None]
    )


def report(catalogue: str) -> str:
    s = analyze(catalogue)
    lines = [
        f"halos: {s['n_halos']}, total attributed time: "
        f"{s['total_seconds']:.2f}s",
        f"per-halo ms: mean {s['mean_ms']:.2f}  p50 {s['p50_ms']:.2f}  "
        f"p90 {s['p90_ms']:.2f}  p99 {s['p99_ms']:.2f}  "
        f"max {s['max_ms']:.2f}",
        f"retry ladder: {s['retried_halos']} halos took >1 round "
        f"(max {s['max_n_loop']} rounds)",
        f"top 1% of halos hold {s.get('top1pct_time_share', 0.0):.1%} "
        "of the time",
    ]
    if "time_vs_size_exponent" in s:
        lines.append(
            f"time ~ N^{s['time_vs_size_exponent']:.2f} "
            "(log-log fit vs bound particle count)"
        )
    per_prop = analyze_properties(catalogue)
    if per_prop:
        lines.append("per-calculation time (from _time datasets):")
        for group, sec in per_prop.items():
            lines.append(f"  {sec:8.3f}s  {group}")
    return "\n".join(lines)
