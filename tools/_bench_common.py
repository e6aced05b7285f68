"""Shared measurement helpers for the bench scripts (r12 self-review:
one job-floor implementation, not three drifting copies)."""

from __future__ import annotations

import time


def job_floor_ms(spark, n: int = 9, warmup: int = 20) -> float:
    """Median wall time of ``spark.range(1).collect()`` in ms — the
    host's single-job scheduling floor (VERDICT r11 ask #1). Every
    per-query bench number includes at least one such dispatch, so when
    the floor approaches a baseline gate, (query − floor) is the number
    that grades the PLAN rather than the box. The probe is the cheapest
    possible plan — one task, no scan, no shuffle — so its cost is pure
    scheduler + Py4J round-trip. Sample it immediately before AND after
    the timed region; commit both.

    ``warmup`` (r13): a fresh JVM's first dozen-odd jobs pay codegen /
    class-loading / thread-pool spin-up, so a before-floor sampled
    right after session creation reads ~170 ms on a PROVABLY idle host
    (loadavg 0.4) while the same session reads ~18 ms minutes later —
    the control was measuring JVM cold-start, not host state. Throwaway
    probes first make "floor ≲ 50 ms ⇒ settled" a statement about the
    BOX, which is what the idle-settle discipline checks."""
    for _ in range(warmup):
        spark.range(1).collect()
    s = []
    for _ in range(n):
        t0 = time.perf_counter()
        spark.range(1).collect()
        s.append((time.perf_counter() - t0) * 1000.0)
    s.sort()
    return round(s[len(s) // 2], 1)
