"""Summarize a ``jax.profiler`` trace into a per-op-type time table.

The reference has no profiling tooling beyond wall-clock prints (SURVEY
§5); this is the TPU-side observability layer: aggregate the device-op
events of a captured trace (``jax.profiler.start_trace`` /
``--profile_steps`` in the train CLI) by op-type, with achieved-bandwidth
estimates, so "where did the step time go" is one command
(``scripts/profile_step.py``) instead of a TensorBoard session.

Works on the ``*.trace.json.gz`` Chrome-trace files the profiler writes;
no TensorBoard or profiler-plugin dependency (the plugin's native
xspace parser is version-locked to its TF build).
"""

from __future__ import annotations

import glob
import gzip
import json
import os
from typing import Dict, List, Optional, Tuple


def _load_events(trace_path: str) -> List[dict]:
    op = gzip.open if trace_path.endswith(".gz") else open
    with op(trace_path, "rt") as f:
        return json.load(f).get("traceEvents", [])


def find_trace_file(profile_dir: str) -> Optional[str]:
    """Newest Chrome-trace file under a profiler output directory."""
    pats = [
        os.path.join(profile_dir, "**", "*.trace.json.gz"),
        os.path.join(profile_dir, "**", "*.trace.json"),
    ]
    hits = [p for pat in pats for p in glob.glob(pat, recursive=True)]
    return max(hits, key=os.path.getmtime) if hits else None


def op_table(
    trace_path: str, thread: str = "XLA Ops"
) -> Tuple[float, int, List[Dict[str, float]]]:
    """Aggregate device-op durations by op-type.

    Returns ``(total_ms, n_module_runs, rows)``; rows are sorted by
    total time, each ``{name, ms, pct, gbps, count}``. ``ms``/``count``
    are totals across the whole trace (divide by ``n_module_runs`` for
    per-step numbers). Op ids are stripped (``fusion.123`` -> ``fusion``).
    """
    events = _load_events(trace_path)
    tnames: Dict[Tuple, str] = {}
    steps = 0
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tnames[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    agg: Dict[str, List[float]] = {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        tn = tnames.get((e.get("pid"), e.get("tid")), "")
        if tn == "XLA Modules":
            steps += 1
        if tn != thread:
            continue
        a = e.get("args", {})
        # device_duration_ps is the on-device time; fall back to the
        # wall duration (microseconds) when absent
        dur_ms = float(a.get("device_duration_ps", e.get("dur", 0) * 1e6)) / 1e9
        byts = float(a.get("bytes_accessed", 0))
        nm = e.get("name", "")
        head, _, tail = nm.rpartition(".")
        base = head if (head and tail.isdigit()) else nm
        row = agg.setdefault(base, [0.0, 0.0, 0])
        row[0] += dur_ms
        row[1] += byts
        row[2] += 1
        total += dur_ms
    rows = [
        {
            "name": k,
            "ms": ms,
            "pct": (100.0 * ms / total) if total else 0.0,
            "gbps": (b / 1e9) / (ms / 1e3) if ms else 0.0,
            "count": c,
        }
        for k, (ms, b, c) in agg.items()
    ]
    rows.sort(key=lambda r: -r["ms"])
    return total, steps, rows


def format_table(total_ms: float, steps: int, rows: List[Dict[str, float]], top: int = 25) -> str:
    n = max(1, steps)
    lines = [
        f"device op time: {total_ms / n:.1f} ms/step over {n} step(s)",
        f"{'ms/step':>9} {'%':>5} {'GB/s':>7} {'count':>7}  op type",
    ]
    for r in rows[:top]:
        lines.append(
            f"{r['ms'] / n:9.2f} {r['pct']:5.1f} {r['gbps']:7.0f} "
            f"{r['count'] // n:7d}  {r['name']}"
        )
    return "\n".join(lines)
