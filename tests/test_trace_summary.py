"""tools/trace_summary.py — xplane.pb wire-format parser + op attribution.

The reference has no profiler tooling at all (SURVEY.md §5.1); ours turns
`tools/benchmark.py --trace-dir` XPlane dumps into ranked per-op device
time. These tests feed a hand-encoded XSpace protobuf through the parser
so they are deterministic and need no profiler/TPU at test time.
"""
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from trace_summary import bucket_of, load_xspace, summarize  # noqa: E402


# -- minimal protobuf wire-format writer (mirror of the reader) ------------

def _varint(n):
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        out.append(b | (0x80 if n else 0))
        if not n:
            return bytes(out)


def _field(num, payload):
    if isinstance(payload, int):
        return _varint(num << 3) + _varint(payload)
    return _varint((num << 3) | 2) + _varint(len(payload)) + payload


def _event(meta_id, dur_ps):
    return _field(1, meta_id) + _field(3, dur_ps)


def _line(name, events):
    buf = _field(2, name.encode())
    for ev in events:
        buf += _field(4, ev)  # XLine.events = field 4
    return buf


def _meta_entry(key, name):
    meta = _field(2, name.encode())  # XEventMetadata.name
    return _field(1, key) + _field(2, meta)  # map key / value


def _plane(name, lines, meta):
    buf = _field(2, name.encode())
    for ln in lines:
        buf += _field(3, ln)
    for k, v in meta.items():
        buf += _field(4, _meta_entry(k, v))
    return buf


@pytest.fixture
def trace_dir(tmp_path):
    meta = {1: "%fusion.1 = f32[8,128] fusion(...)",
            2: "%copy.5 = f32[8,128] copy(...)",
            3: "%convolution.2 = f32[8,128] convolution(...)",
            9: "jit_forward(123)"}
    ops = _line("XLA Ops", [
        _event(1, 5_000_000),   # 5 us fusion
        _event(2, 2_000_000),   # 2 us copy
        _event(3, 3_000_000),   # 3 us conv
        _event(1, 5_000_000),   # fusion again
    ])
    modules = _line("XLA Modules", [_event(9, 15_000_000)])  # aggregate
    asyn = _line("Async XLA Ops", [_event(2, 7_000_000)])
    plane = _plane("/device:TPU:0", [ops, modules, asyn], meta)
    space = _field(1, plane)
    d = tmp_path / "plugins" / "profile" / "run1"
    d.mkdir(parents=True)
    (d / "host.xplane.pb").write_bytes(space)
    return str(tmp_path)


def test_load_xspace_roundtrip(trace_dir):
    import glob
    path = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                     recursive=True)[0]
    planes = load_xspace(path)
    assert len(planes) == 1
    name, lines, meta = planes[0]
    assert name == "/device:TPU:0"
    assert [ln for ln, _ in lines] == ["XLA Ops", "XLA Modules",
                                       "Async XLA Ops"]
    ops_events = dict()
    for mid, dur in lines[0][1]:
        ops_events.setdefault(mid, 0)
        ops_events[mid] += dur
    assert ops_events == {1: 10_000_000, 2: 2_000_000, 3: 3_000_000}
    assert meta[3].startswith("%convolution.2")


def test_summarize_attributes_ops_line_only(trace_dir, capsys):
    summarize(trace_dir, iters=2, top=10)
    out = capsys.readouterr().out
    # total = XLA Ops only (15 us), NOT the 15 us module aggregate on top
    assert "total device op time: 0.0 ms" in out  # 15 us rounds to 0.0
    assert "%fusion.1" in out and "%copy.5" in out
    assert "jit_forward" not in out.split("## top")[1]
    # async DMA reported separately
    assert "async DMA" in out


def test_bucket_of():
    assert bucket_of("%copy.5 = ...") == "copy"
    assert bucket_of("%convolution.2 = ...") == "conv"
    assert bucket_of("%fusion.1 = ...") == "fusion"
    assert bucket_of("%custom-call.3 = ... tpu_custom_call") == "pallas"
    assert bucket_of("%while.6 = ...") == "scan/while"
    assert bucket_of("%rsqrt.1 = ...") == "other"
