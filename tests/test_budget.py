"""Driver-artifact budget tests (VERDICT r3 item 8).

Round 3 shipped no verifiable driver artifacts because both landed as silent
timeouts: `BENCH_r03.json` rc=124 with no JSON, `MULTICHIP_r03.json` killed
after 2 of 4 tasks. These tests run the exact driver entry points as
subprocesses and assert they complete inside a wall-clock budget on this
host, so a compile-time regression fails the suite instead of the round.

Both tests double as compile-cache pre-warmers: they share `.cache/jax`
with the driver's own runs (core/cache.py), so a green suite implies the
driver's post-round invocations run warm.
"""

import json
import pathlib
import subprocess
import sys
import time

import pytest

pytestmark = pytest.mark.slow

ROOT = pathlib.Path(__file__).resolve().parent.parent

# Calibration (round 4): 299s standalone on this 1-core host, 607s when a
# full-scale TPU training run was compiling concurrently. The budget must
# absorb that load noise while still failing the round-3 class of
# regression (duplicate detection compiles -> >1200s, past the driver's
# kill window).
DRYRUN_BUDGET_S = 700
BENCH_DRY_BUDGET_S = 480


def test_dryrun_multichip_fits_driver_budget():
    """`dryrun_multichip(8)` — all four task steps + the serving-cascade
    check — must finish well under the driver budget. Runs through the same
    subprocess re-exec path the driver hits (jax already imported here)."""
    import __graft_entry__ as ge

    t0 = time.time()
    ge.dryrun_multichip(8)
    elapsed = time.time() - t0
    print(f"dryrun_multichip(8) took {elapsed:.0f}s")
    assert elapsed < DRYRUN_BUDGET_S, (
        f"dryrun took {elapsed:.0f}s — over the {DRYRUN_BUDGET_S}s budget; "
        "the driver's MULTICHIP capture will time out (VERDICT r3 weak #2)"
    )


def test_bench_dry_run_reaches_json_emit():
    """`bench.py --dry-run` (no TPU) must reach the single-JSON-line emit
    path: stdout's last line parses and carries the metric schema."""
    t0 = time.time()
    r = subprocess.run(
        [sys.executable, "bench.py", "--dry-run"],
        cwd=ROOT, capture_output=True, text=True,
        timeout=BENCH_DRY_BUDGET_S,
    )
    elapsed = time.time() - t0
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [l for l in r.stdout.strip().splitlines() if l.strip()]
    assert len(lines) == 1, f"stdout must be ONE JSON line, got: {r.stdout!r}"
    payload = json.loads(lines[0])
    assert payload["metric"] == "face_gated_pose_cascade_640_throughput"
    assert payload["unit"] == "images/sec"
    assert payload["value"] > 0
    assert "vs_baseline" in payload
    print(f"bench --dry-run took {elapsed:.0f}s -> {payload}")
