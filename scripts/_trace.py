"""Shared chrome-trace parsing for the bench/probe/profile scripts.

Every measurement script in scripts/ times DEVICE op totals from a
jax.profiler trace (wall clock through the dev tunnel is dispatch-bound
and unreliable — CLAUDE.md / PERF.md). This is the single copy of the
trace-parsing heuristic; keep prefix differences in the callers.
"""

from __future__ import annotations

import glob
import gzip
import json
from collections import defaultdict


def start_device_trace(outdir: str):
    """start_trace with the host PYTHON tracer off. The python tracer can
    emit ~1M host events on a multi-second step and flood the chrome trace
    past its event cap, truncating the DEVICE timeline we actually parse
    (first seen on the 0.25° train probe, r4)."""
    import jax

    opts = jax.profiler.ProfileOptions()
    opts.python_tracer_level = 0
    opts.host_tracer_level = 1
    jax.profiler.start_trace(outdir, profiler_options=opts)


def load_trace(outdir: str):
    """Parse the newest trace in ``outdir`` -> (events, device_pids)."""
    traces = sorted(glob.glob(outdir + "/**/*.trace.json.gz", recursive=True))
    if not traces:
        return [], set()
    with gzip.open(traces[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    pid_names = {
        e["pid"]: e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    dev_pids = {
        p for p, n in pid_names.items() if "TPU" in n or "/device" in n.lower()
    }
    return events, dev_pids


def device_ms(outdir: str, prefixes, n: int = 1) -> float:
    """Total device time (ms) of X events whose name starts with any of
    ``prefixes``, divided by ``n`` (steps)."""
    if isinstance(prefixes, str):
        prefixes = (prefixes,)
    events, dev_pids = load_trace(outdir)
    if not events:
        return float("nan")
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or (dev_pids and e.get("pid") not in dev_pids):
            continue
        name = e.get("name", "")
        if any(name.startswith(p) for p in prefixes):
            total += e.get("dur", 0) / 1e3
    return total / n


def device_op_totals(outdir: str):
    """Per-op-name device-time (ms) totals and call counts — the profile_*
    aggregation. Returns (totals, counts)."""
    events, dev_pids = load_trace(outdir)
    totals = defaultdict(float)
    counts = defaultdict(int)
    for e in events:
        if e.get("ph") != "X" or (dev_pids and e.get("pid") not in dev_pids):
            continue
        name = e.get("name", "")
        totals[name] += e.get("dur", 0) / 1e3
        counts[name] += 1
    return dict(totals), dict(counts)
