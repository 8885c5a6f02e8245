"""scripts/trace_summary.py — the dependency-free xplane decoder.

Builds a tiny XSpace protobuf by hand (wire format, same field numbers as
tensorflow/tsl's xplane.proto) and checks the decoder recovers planes,
lines, op names/durations, and the op-class grouping."""
import struct
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT / "scripts"))

from trace_summary import op_class, summarize  # noqa: E402


def _varint(v: int) -> bytes:
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += struct.pack("B", b | 0x80)
        else:
            return out + struct.pack("B", b)


def _field(num: int, wt: int, payload) -> bytes:
    key = _varint((num << 3) | wt)
    if wt == 0:
        return key + _varint(payload)
    return key + _varint(len(payload)) + payload


def _event_metadata(mid: int, name: str, display: str = "") -> bytes:
    meta = _field(1, 0, mid) + _field(2, 2, name.encode())
    if display:
        meta += _field(4, 2, display.encode())
    entry = _field(1, 0, mid) + _field(2, 2, meta)
    return _field(4, 2, entry)  # XPlane.event_metadata map entry


def _event(mid: int, dur_ps: int) -> bytes:
    ev = _field(1, 0, mid) + _field(3, 0, dur_ps)
    return _field(4, 2, ev)  # XLine.events


def _line(name: str, events: bytes) -> bytes:
    line = _field(2, 2, name.encode()) + events
    return _field(3, 2, line)  # XPlane.lines


def _plane(name: str, body: bytes) -> bytes:
    plane = _field(2, 2, name.encode()) + body
    return _field(1, 2, plane)  # XSpace.planes


def _write_space(path: Path) -> None:
    dev = _plane(
        "/device:TPU:0",
        _event_metadata(1, "%fusion.7 = f32[8,8] fusion(...)", "fusion.7")
        + _event_metadata(2, "%copy.3 = ...", "copy.3")
        + _line("XLA Ops",
                _event(1, 4_000_000) + _event(1, 2_000_000)
                + _event(2, 1_000_000))
        + _line("Steps", _event(2, 7_000_000)))
    host = _plane("/host:CPU", _event_metadata(9, "pyfunc")
                  + _line("python", _event(9, 5)))
    path.write_bytes(dev + host)


def test_decodes_device_plane_lines(tmp_path):
    pb = tmp_path / "x.xplane.pb"
    _write_space(pb)
    out = summarize(pb)
    assert ("/device:TPU:0", "XLA Ops") in out
    ops = out[("/device:TPU:0", "XLA Ops")]
    assert ops["fusion.7"] == (2, 6_000_000)
    assert ops["copy.3"] == (1, 1_000_000)
    # the Steps line is separate — no double counting into XLA Ops
    assert out[("/device:TPU:0", "Steps")]["copy.3"] == (1, 7_000_000)
    # host planes are excluded by default, included with device_only=False
    assert all(p != "/host:CPU" for p, _ in out)
    assert any(p == "/host:CPU" for p, _ in summarize(pb, device_only=False))


def test_long_names(tmp_path):
    pb = tmp_path / "x.xplane.pb"
    _write_space(pb)
    ops = summarize(pb, long_names=True)[("/device:TPU:0", "XLA Ops")]
    assert "%fusion.7 = f32[8,8] fusion(...)" in ops


def test_op_class_grouping():
    assert op_class("fusion.123") == "fusion"
    assert op_class("convert_reduce_fusion.5") == "convert_reduce_fusion"
    assert op_class("custom-call.42") == "custom-call"
    assert op_class("copy") == "copy"
