"""Host memory-bandwidth probe — the noise covariate for single-box
scaling runs.

This sandbox is a shared-host VM: co-tenant load shows up as a memory
-bandwidth collapse (measured healthy ≈ 12+ GB/s single-stream, observed
degraded to < 1 GB/s), while register-bound CPU work is unaffected.
Spark stages are bandwidth-heavy, so wall-clock measured during a
collapse says nothing about the plan. The scaling protocol records this
probe before every timed run so each measurement carries its own
machine-health stamp, and degraded runs can be identified instead of
silently polluting the median.

Usage: python tools/memprobe.py   → one JSON line {"gbps": N}
"""

from __future__ import annotations

import json
import time

import numpy as np


def probe_gbps(mb: int = 200, reps: int = 5) -> float:
    """Single-stream read+write bandwidth in GB/s (numpy scale op).

    The source buffer is written first: calloc-backed np.zeros pages all
    map to the kernel's shared zero page until touched, so reading an
    untouched buffer is cache-resident and the probe would mostly time
    output-side page faults instead of the 2×nbytes stream it reports.
    The output is preallocated and reused (np.multiply out=) so reps
    measure steady-state read+write bandwidth, not allocator cost."""
    a = np.zeros(mb * 1_000_000 // 8)
    a.fill(1.0)
    b = np.empty_like(a)
    best = 0.0
    for _ in range(reps):
        t0 = time.monotonic()
        np.multiply(a, 1.000001, out=b)
        dt = time.monotonic() - t0
        best = max(best, 2 * a.nbytes / dt / 1e9)
    return best


if __name__ == "__main__":
    print(json.dumps({"gbps": round(probe_gbps(), 2)}))
