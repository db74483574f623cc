"""Profiling / tracing hooks.

The reference's only instrumentation is wall-clock FPS prints
(reference benchmark.py:31,46, SURVEY.md §5). Here:

- `trace(logdir)`: context manager around `jax.profiler` producing a
  TensorBoard/XPlane trace of device execution (works on TPU and CPU).
- `StageTimer`: lightweight named wall-clock stage accumulator for
  host-side pipeline breakdowns (read/preprocess/infer/draw) used by the
  benchmark CLI's --profile mode.
- `device_time_report(trace_dir)`: parses the XPlane proto from a trace
  directory and aggregates per-op device time — a poor man's
  `tensorboard` for headless environments.
"""

from __future__ import annotations

import contextlib
import glob
import gzip
import os
import time
from collections import defaultdict
from typing import Dict, Optional


@contextlib.contextmanager
def trace(logdir: str = "/tmp/posenet_trace"):
    """Capture a device trace for the enclosed block."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Accumulate wall-clock time per named pipeline stage."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        total = sum(self.totals.values()) or 1e-9
        for name, t in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(
                f"{name:>16}: {t*1000:9.2f} ms total, "
                f"{t/max(n,1)*1000:8.3f} ms/call x{n}, {t/total*100:5.1f}%")
        return "\n".join(lines)


def device_time_report(trace_dir: str, top: int = 25) -> str:
    """Aggregate device op durations from the newest XPlane trace under
    `trace_dir`. Returns a formatted table (best effort — returns a message
    if the trace format is unavailable)."""
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.xplane.pb")), key=os.path.getmtime)
    if not paths:
        return f"no xplane trace found under {trace_dir}"
    # Minimal standalone XPlane parse: read varint-delimited fields enough
    # to extract (event name, duration). The XPlane proto is stable; we
    # only need XSpace > XPlane > XLine > XEvent {metadata_id, duration_ps}
    # and XEventMetadata {id, name}. No TF/xprof dependency.
    try:
        return _parse_xplane(paths[-1], top)
    except Exception as e:  # pragma: no cover - best effort tooling
        return f"could not parse {paths[-1]}: {e}"


def _parse_xplane(path: str, top: int) -> str:
    """Tiny XPlane reader using protobuf wire format (no TF dependency)."""
    import struct

    with open(path, "rb") as f:
        data = f.read()

    def varint(buf, i):
        shift = 0
        val = 0
        while True:
            b = buf[i]
            i += 1
            val |= (b & 0x7F) << shift
            if not b & 0x80:
                return val, i
            shift += 7

    def fields(buf):
        i = 0
        while i < len(buf):
            key, i = varint(buf, i)
            tag, wire = key >> 3, key & 7
            if wire == 0:
                val, i = varint(buf, i)
                yield tag, val
            elif wire == 2:
                ln, i = varint(buf, i)
                yield tag, buf[i:i + ln]
                i += ln
            elif wire == 5:
                yield tag, buf[i:i + 4]
                i += 4
            elif wire == 1:
                yield tag, buf[i:i + 8]
                i += 8
            else:
                return

    op_time_ps: Dict[str, int] = defaultdict(int)
    op_count: Dict[str, int] = defaultdict(int)

    for tag, val in fields(data):           # XSpace
        if tag != 1 or not isinstance(val, bytes):
            continue
        # XPlane
        metadata = {}
        lines = []
        plane_name = ""
        for ptag, pval in fields(val):
            if ptag == 2 and isinstance(pval, bytes):
                plane_name = pval.decode("utf-8", "replace")
            elif ptag == 3 and isinstance(pval, bytes):
                lines.append(pval)
            elif ptag == 4 and isinstance(pval, bytes):
                # map<int64, XEventMetadata>
                mid, mname = None, ""
                for mtag, mval in fields(pval):
                    if mtag == 1:
                        mid = mval
                    elif mtag == 2 and isinstance(mval, bytes):
                        for etag, eval_ in fields(mval):
                            if etag == 1:
                                mid = eval_
                            elif etag == 2 and isinstance(eval_, bytes):
                                mname = eval_.decode("utf-8", "replace")
                if mid is not None:
                    metadata[mid] = mname
        if "TPU" not in plane_name and "Device" not in plane_name:
            continue
        # Device planes carry several XLines ("XLA Ops", "XLA Modules",
        # "Steps", ...). A module event's duration already equals the sum
        # of its ops' durations, so summing across ALL lines would roughly
        # double-count device time. Prefer the per-op line; fall back to
        # every line only when no line is named at all (older traces).
        parsed = []                     # (line_name, [event bytes])
        for line in lines:
            lname, events = "", []
            for ltag, lval in fields(line):
                if ltag == 2 and isinstance(lval, bytes):   # XLine.name
                    lname = lval.decode("utf-8", "replace")
                elif ltag == 4 and isinstance(lval, bytes):  # XEvent
                    events.append(lval)
            parsed.append((lname, events))
        op_lines = [ev for lname, ev in parsed if lname == "XLA Ops"]
        if op_lines:
            use = op_lines
        elif any(lname for lname, _ in parsed):
            use = [ev for lname, ev in parsed
                   if lname not in ("XLA Modules", "Steps")]
        else:
            use = [ev for _, ev in parsed]
        for events in use:
            for lval in events:
                mid = dur = 0
                for etag, ev in fields(lval):
                    if etag == 1:
                        mid = ev
                    elif etag == 3:
                        dur = ev
                name = metadata.get(mid, f"id{mid}")
                op_time_ps[name] += dur
                op_count[name] += 1

    if not op_time_ps:
        return "trace parsed but no device events found"
    rows = sorted(op_time_ps.items(), key=lambda kv: -kv[1])[:top]
    total = sum(op_time_ps.values())
    out = [f"{'device op':<60} {'ms':>10} {'count':>7} {'%':>6}"]
    for name, ps in rows:
        out.append(f"{name[:60]:<60} {ps/1e9:10.3f} {op_count[name]:7d} "
                   f"{ps/total*100:6.1f}")
    out.append(f"{'TOTAL':<60} {total/1e9:10.3f}")
    return "\n".join(out)
