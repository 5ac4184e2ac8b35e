"""Unit-test bench.py's device-health probe logic (both branches).

The probe's degraded-device early exit (skip chain(128) when chain(8) alone
already reads below the degraded threshold) can never execute on a healthy
chip, so it is exercised here with an injected synthetic ``chain`` timing
function. Run in a subprocess: importing bench installs a process-global
FutureWarning->error filter that must not leak into the test session.
"""
import json
import subprocess
import sys

DRIVER = r"""
import json
import bench

calls = []

def make_chain(per_matmul_s, intercept_s):
    def chain(n):
        calls.append(n)
        return intercept_s + per_matmul_s * n
    return chain

# Healthy device: 6.13 ms/matmul + 25 ms dispatch intercept -> the slope
# method must difference the intercept out and read the pure rate.
healthy = bench._probe_tflops(chain=make_chain(6.13e-3, 25e-3))
healthy_calls = list(calls)

# 20x-degraded device (BENCH_r02-class): chain(8) alone lands far below
# DEGRADED_FRACTION * EXPECTED -> early exit, chain(128) never runs.
calls.clear()
degraded = bench._probe_tflops(chain=make_chain(20 * 6.13e-3, 25e-3))
degraded_calls = list(calls)

print(json.dumps({
    "healthy": healthy, "healthy_calls": healthy_calls,
    "degraded": degraded, "degraded_calls": degraded_calls,
    "expected": bench.EXPECTED_PROBE_TFLOPS,
    "fraction": bench.DEGRADED_FRACTION,
    "chains": list(bench.PROBE_CHAINS),
}))
"""


def test_probe_slope_and_degraded_early_exit():
    proc = subprocess.run([sys.executable, "-c", DRIVER],
                          capture_output=True, text=True, timeout=120)
    assert proc.returncode == 0, proc.stderr[-2000:]
    r = json.loads(proc.stdout.strip().splitlines()[-1])
    n1, n2 = r["chains"]

    # Healthy branch: both chain lengths timed; the 25 ms intercept is
    # differenced out exactly, so the rate equals the pure per-matmul rate.
    assert r["healthy_calls"] == [n1, n2]
    pure = 2 * 8192**3 / 6.13e-3 / 1e12
    assert abs(r["healthy"] - pure) / pure < 1e-9
    assert r["healthy"] > r["fraction"] * r["expected"]

    # Degraded branch: only chain(n1) ran, and the returned rough value is
    # below the threshold so the caller flags ``degraded``.
    assert r["degraded_calls"] == [n1]
    assert r["degraded"] < r["fraction"] * r["expected"]
