#!/usr/bin/env python
"""Summarise a jax.profiler trace: per-op device time, grouped and ranked.

The reference has no profiling story at all (SURVEY.md §5.1 — wall-clock
FPS only, /root/reference/tools/benchmark.py:55-82); this tool closes the
loop on ours: `tools/benchmark.py --trace-dir DIR` dumps an XPlane trace,
and this CLI turns it into the numbers perf work actually needs — top ops
by device time, bucketed into kernels / fusions / copies / convolutions /
scans, per-iteration cost.

Usage:
  python tools/trace_summary.py /tmp/trace_dir [--iters N] [--top 30]
      [--group]         # bucket totals only
      [--match REGEX]   # filter op names

Works on the .xplane.pb files jax.profiler writes (parsed via the
tensorflow xplane proto when available, else a minimal built-in protobuf
wire-format reader — no tensorflow import needed for the common path).
"""
from __future__ import annotations

import argparse
import glob
import os
import re
import sys
from collections import defaultdict

# ---------------------------------------------------------------------------
# Minimal protobuf wire-format reader for xplane.pb (keeps startup fast and
# works without tensorflow). Schema (tensorflow/tsl profiler xplane.proto):
#   XSpace:    planes = 1 (repeated XPlane)
#   XPlane:    id=1, name=2, lines=3 (XLine), event_metadata=4 (map<int64,
#              XEventMetadata>), stat_metadata=5
#   XLine:     id=1, name=2, timestamp_ns=3, events=4, display_name=11
#   XEvent:    metadata_id=1, offset_ps=2, duration_ps=3, stats=4
#   XEventMetadata: id=1, name=2, display_name=4
# Map entries: key=1, value=2.
# ---------------------------------------------------------------------------


def _read_varint(buf, pos):
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _fields(buf):
    """Yield (field_number, wire_type, value) over a protobuf message."""
    pos, n = 0, len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        field, wt = tag >> 3, tag & 7
        if wt == 0:
            val, pos = _read_varint(buf, pos)
        elif wt == 1:
            val = buf[pos:pos + 8]
            pos += 8
        elif wt == 2:
            ln, pos = _read_varint(buf, pos)
            val = buf[pos:pos + ln]
            pos += ln
        elif wt == 5:
            val = buf[pos:pos + 4]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield field, wt, val


def _parse_event(buf):
    meta_id = dur = 0
    for f, _, v in _fields(buf):
        if f == 1:
            meta_id = v
        elif f == 3:
            dur = v
    return meta_id, dur


def _parse_line(buf):
    events = []
    name = ""
    for f, _, v in _fields(buf):
        if f == 2:
            name = v.decode("utf-8", "replace")
        elif f == 4:  # XLine.events (xplane.proto: repeated XEvent events = 4)
            events.append(_parse_event(v))
    return name, events


def _parse_meta_entry(buf):
    key = 0
    name = ""
    for f, _, v in _fields(buf):
        if f == 1:
            key = v
        elif f == 2:  # XEventMetadata
            for f2, _, v2 in _fields(v):
                if f2 == 2:
                    name = v2.decode("utf-8", "replace")
    return key, name


def _parse_plane(buf):
    name = ""
    lines = []
    meta = {}
    for f, _, v in _fields(buf):
        if f == 2:
            name = v.decode("utf-8", "replace")
        elif f == 3:
            lines.append(_parse_line(v))
        elif f == 4:
            k, n = _parse_meta_entry(v)
            meta[k] = n
    return name, lines, meta


def load_xspace(path):
    """[(plane_name, [(line_name, [(meta_id, dur_ps)])], {meta_id: name})]"""
    with open(path, "rb") as fh:
        buf = fh.read()
    planes = []
    for f, _, v in _fields(buf):
        if f == 1:
            planes.append(_parse_plane(v))
    return planes


# ---------------------------------------------------------------------------


_BUCKETS = (
    ("pallas", re.compile(r"msda|pallas|custom-call", re.I)),
    ("copy", re.compile(r"^%?(copy|bitcast|transpose|reshape)")),
    ("conv", re.compile(r"convolution|conv(?![a-z])", re.I)),
    ("dot", re.compile(r"^%?(dot|gemm|matmul)", re.I)),
    ("scan/while", re.compile(r"while|scan", re.I)),
    ("reduce", re.compile(r"reduce", re.I)),
    ("gather/scatter", re.compile(r"gather|scatter|dynamic-", re.I)),
    ("fusion", re.compile(r"^%?\w*fusion", re.I)),
)


def bucket_of(name: str) -> str:
    for label, pat in _BUCKETS:
        if pat.search(name):
            return label
    return "other"


def summarize(trace_dir, iters=None, top=30, group=False, match=None):
    paths = glob.glob(os.path.join(
        trace_dir, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        raise SystemExit(f"no .xplane.pb under {trace_dir}")
    path = max(paths, key=os.path.getmtime)
    planes = load_xspace(path)

    device_planes = [p for p in planes
                     if re.search(r"TPU|/device", p[0]) and
                     not re.search(r"Host|CPU", p[0])]
    if not device_planes:
        device_planes = planes
    per_op = defaultdict(lambda: [0.0, 0])  # name -> [ps, count]
    async_ps = 0.0
    for name, lines, meta in device_planes:
        # A TPU device plane carries several timelines: "XLA Ops" (the
        # TensorCore op timeline — the one that sums to wall time),
        # "XLA Modules" (whole-module aggregate spans; counting them
        # double-counts every op), "Async XLA Ops" (DMA/copy-start spans
        # that OVERLAP compute), "Steps", overlays. Attribute op time from
        # "XLA Ops" only; tally async spans separately as context.
        op_lines = [(ln, evs) for ln, evs in lines if ln == "XLA Ops"]
        if not op_lines:  # CPU planes etc.: fall back, minus aggregates
            op_lines = [(ln, evs) for ln, evs in lines
                        if not re.search(r"step|derived|module", ln, re.I)]
        for line_name, events in lines:
            if re.search(r"async", line_name, re.I):
                async_ps += sum(d for _, d in events)
        for line_name, events in op_lines:
            for meta_id, dur in events:
                op = meta.get(meta_id, f"#{meta_id}")
                per_op[op][0] += dur
                per_op[op][1] += 1

    if match:
        pat = re.compile(match)
        per_op = {k: v for k, v in per_op.items() if pat.search(k)}

    total_ps = sum(v[0] for v in per_op.values())
    scale = 1e-9  # ps -> ms
    div = iters or 1
    rows = sorted(per_op.items(), key=lambda kv: -kv[1][0])

    print(f"# trace: {path}")
    print(f"# device planes: {[p[0] for p in device_planes]}")
    print(f"# total device op time: {total_ps * scale:.1f} ms"
          + (f" ({total_ps * scale / div:.2f} ms/iter over {div} iters)"
             if iters else ""))
    if async_ps:
        print(f"# async DMA span time (overlaps compute, not in total): "
              f"{async_ps * scale:.1f} ms"
              + (f" ({async_ps * scale / div:.2f} ms/iter)" if iters else ""))

    groups = defaultdict(float)
    for op, (ps, _) in per_op.items():
        groups[bucket_of(op)] += ps
    print("\n## bucket totals")
    for g, ps in sorted(groups.items(), key=lambda kv: -kv[1]):
        line = f"{g:16s} {ps * scale:10.1f} ms  {100 * ps / max(total_ps, 1):5.1f}%"
        if iters:
            line += f"  {ps * scale / div:8.2f} ms/iter"
        print(line)
    if group:
        return

    print(f"\n## top {top} ops")
    for op, (ps, cnt) in rows[:top]:
        line = (f"{ps * scale:9.1f} ms {100 * ps / max(total_ps, 1):5.1f}% "
                f"x{cnt:<6d} {op[:110]}")
        if iters:
            line = f"{ps * scale / div:8.2f} ms/iter " + line
        print(line)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--iters", type=int, default=None,
                    help="timed iterations inside the trace (per-iter costs)")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--group", action="store_true")
    ap.add_argument("--match", default=None)
    args = ap.parse_args()
    summarize(args.trace_dir, args.iters, args.top, args.group, args.match)


if __name__ == "__main__":
    main()
