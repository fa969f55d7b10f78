"""Bench output contract (VERDICT r4 ask #1).

The driver parses the END of bench.py's MERGED stdout+stderr stream;
rounds 3 and 4 both lost their measured number because the headline
JSON was printed mid-stream and later phases buried it.  These tests
run ``python bench.py`` in a subprocess with merged streams and assert
that the LAST line parses as the headline JSON under BOTH exit paths:

 - normal completion (tiny DMO config), and
 - a forced mid-phase budget kill (watchdog fires during warmup).
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _run_bench(extra_env, timeout):
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=1",
        PYTHONPATH=REPO,
        SOAP_TPU_PREFETCH="0",
    )
    env.update(extra_env)
    return subprocess.run(
        [sys.executable, BENCH],
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,  # MERGED stream, exactly as the driver sees
        text=True,
        timeout=timeout,
        env=env,
        cwd=REPO,
    )


def _last_line(output):
    lines = [ln for ln in output.splitlines() if ln.strip()]
    assert lines, "bench produced no output"
    return lines[-1]


@pytest.mark.slow
def test_headline_is_last_line_on_normal_completion():
    r = _run_bench(
        {
            "SOAP_TPU_BENCH": "dmo",
            "SOAP_TPU_BENCH_HALOS": "8",
            "SOAP_TPU_BENCH_FIELD": "3000",
            "SOAP_TPU_BENCH_MESH": "0",
            "SOAP_TPU_BENCH_BUDGET": "600",
        },
        timeout=900,
    )
    assert r.returncode == 0, r.stdout[-3000:]
    fields = json.loads(_last_line(r.stdout))
    assert fields["metric"] == "halos_per_sec_per_chip"
    assert fields["value"] > 0, fields
    assert fields["unit"] == "halos/s"
    assert "vs_baseline" in fields
    # the early emission must ALSO be present (crash insurance): the
    # headline appears at least twice in the stream
    n_headlines = sum(
        1
        for ln in r.stdout.splitlines()
        if ln.strip().startswith("{") and '"halos_per_sec_per_chip"' in ln
    )
    assert n_headlines >= 2, r.stdout[-3000:]


def test_headline_is_last_line_on_budget_kill():
    r = _run_bench(
        {
            "SOAP_TPU_BENCH": "dmo",
            "SOAP_TPU_BENCH_HALOS": "8",
            "SOAP_TPU_BENCH_FIELD": "3000",
            "SOAP_TPU_BENCH_MESH": "0",
            # the watchdog must fire long before the warmup compile ends
            "SOAP_TPU_BENCH_BUDGET": "6",
        },
        timeout=300,
    )
    assert r.returncode == 0, r.stdout[-3000:]
    fields = json.loads(_last_line(r.stdout))
    assert fields["metric"] == "halos_per_sec_per_chip"
    assert fields.get("partial") is True, fields
    assert isinstance(fields["value"], (int, float))
    assert "phase_at_budget" in fields
