#!/usr/bin/env python
"""Summarize a jax.profiler device trace (.xplane.pb) into an op-time table.

jax.profiler.start_trace / profile_stages.py --trace write
`<dir>/plugins/profile/<ts>/<host>.xplane.pb` — an XSpace protobuf
(tensorflow/tsl profiler schema). TensorBoard's profile plugin is not
installed in this image, so this is a dependency-free wire-format decoder:
it walks XSpace -> XPlane (device planes only) -> XLine -> XEvent, sums
event durations by op name, and groups XLA fusion numbering (`fusion.123`)
into op classes. This is the tool the PROFILE.md op-class tables come from.

The reference has no profiler integration at all (SURVEY.md §5: wall-clock
batch timing only, src/trainutils.py:268,294-297).

Usage:
  python scripts/trace_summary.py TRACE_DIR_OR_PB [--top 30] [--by-class]
"""
from __future__ import annotations

import argparse
import gzip
import re
import sys
from collections import defaultdict
from pathlib import Path


def _varint(buf: bytes, i: int):
    shift = 0
    val = 0
    while True:
        b = buf[i]
        i += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, i
        shift += 7


def _fields(buf: bytes):
    """Yield (field_number, wire_type, value) for one message's bytes."""
    i = 0
    n = len(buf)
    while i < n:
        key, i = _varint(buf, i)
        fnum, wt = key >> 3, key & 7
        if wt == 0:  # varint
            val, i = _varint(buf, i)
        elif wt == 1:  # 64-bit
            val = int.from_bytes(buf[i:i + 8], "little")
            i += 8
        elif wt == 2:  # length-delimited
            ln, i = _varint(buf, i)
            val = buf[i:i + ln]
            i += ln
        elif wt == 5:  # 32-bit
            val = int.from_bytes(buf[i:i + 4], "little")
            i += 4
        else:  # group wire types: unsupported/absent in xplane
            raise ValueError(f"wire type {wt}")
        yield fnum, wt, val


def _parse_plane(buf: bytes, long_names: bool = False):
    """XPlane -> (name, {mid: op_name}, [(line_name, mid, dur_ps)])."""
    name = ""
    meta = {}
    events = []
    for fnum, wt, val in _fields(buf):
        if fnum == 2 and wt == 2:
            name = val.decode("utf-8", "replace")
        elif fnum == 4 and wt == 2:  # event_metadata map entry
            mid, mname, dname = None, "", ""
            for f2, w2, v2 in _fields(val):
                if f2 == 1 and w2 == 0:
                    mid = v2
                elif f2 == 2 and w2 == 2:  # XEventMetadata
                    for f3, w3, v3 in _fields(v2):
                        if f3 == 2 and w3 == 2:
                            mname = v3.decode("utf-8", "replace")
                        elif f3 == 4 and w3 == 2:
                            dname = v3.decode("utf-8", "replace")
            if mid is not None:
                # display_name is the short op name ("fusion.123");
                # name may be the full HLO instruction text
                meta[mid] = (mname or dname) if long_names \
                    else (dname or mname)
        elif fnum == 3 and wt == 2:  # XLine
            lname = ""
            levents = []
            for f2, w2, v2 in _fields(val):
                if f2 == 2 and w2 == 2 and not lname:
                    lname = v2.decode("utf-8", "replace")
                elif f2 == 11 and w2 == 2:
                    lname = v2.decode("utf-8", "replace")
                elif f2 == 4 and w2 == 2:  # XEvent
                    mid = dur = 0
                    for f3, w3, v3 in _fields(v2):
                        if f3 == 1 and w3 == 0:
                            mid = v3
                        elif f3 == 3 and w3 == 0:
                            dur = v3
                    levents.append((mid, dur))
            events.extend((lname, mid, dur) for mid, dur in levents)
    return name, meta, events


_CLASS_RE = re.compile(r"\.\d+$|_\d+$|\d+$")


def op_class(name: str) -> str:
    """fusion.123 / loop_convert_fusion.5 / custom-call.42 -> class name."""
    base = name.split("/")[-1]
    return _CLASS_RE.sub("", base) or base


def summarize(path: Path, device_only: bool = True,
              long_names: bool = False):
    """Return {(plane_name, line_name): {op_name: (count, total_ps)}}.

    Device planes hold several overlapping lines (per-step spans, module
    spans, the per-op "XLA Ops" line, async DMA streams) — summing across
    them double-counts, so each line gets its own table."""
    raw = path.read_bytes()
    if path.suffix == ".gz":
        raw = gzip.decompress(raw)
    out = {}
    for fnum, wt, val in _fields(raw):
        if fnum != 1 or wt != 2:
            continue
        name, meta, events = _parse_plane(val, long_names)
        low = name.lower()
        if device_only and not any(k in low for k in ("tpu", "gpu", "device")):
            continue
        per_line = defaultdict(lambda: defaultdict(lambda: [0, 0]))
        for lname, mid, dur in events:
            op = meta.get(mid, f"#{mid}")
            per_line[lname][op][0] += 1
            per_line[lname][op][1] += dur
        for lname, per in per_line.items():
            out[(name, lname)] = {k: tuple(v) for k, v in per.items()}
    return out


def find_xplane(path: Path) -> Path:
    if path.is_file():
        return path
    cands = sorted(path.rglob("*.xplane.pb"))
    if not cands:
        sys.exit(f"no .xplane.pb under {path}")
    return cands[-1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace", help="trace dir (from start_trace) or .xplane.pb")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--by-class", action="store_true",
                    help="group fusion numbering into op classes")
    ap.add_argument("--long", action="store_true",
                    help="full HLO instruction text (shapes) as op names")
    ap.add_argument("--all-planes", action="store_true",
                    help="include host/python planes, not just devices")
    args = ap.parse_args()

    pb = find_xplane(Path(args.trace))
    planes = summarize(pb, device_only=not args.all_planes,
                       long_names=args.long)
    if not planes:
        sys.exit("no device planes found (use --all-planes to inspect host)")
    for (pname, lname), ops in planes.items():
        rows = []
        if args.by_class:
            agg = defaultdict(lambda: [0, 0])
            for op, (cnt, ps) in ops.items():
                c = op_class(op)
                agg[c][0] += cnt
                agg[c][1] += ps
            rows = [(c, cnt, ps) for c, (cnt, ps) in agg.items()]
        else:
            rows = [(op, cnt, ps) for op, (cnt, ps) in ops.items()]
        rows.sort(key=lambda r: -r[2])
        total_ms = sum(r[2] for r in rows) / 1e9
        print(f"\n== {pname} :: {lname or '(unnamed line)'}"
              f"  (total {total_ms:.2f} ms)")
        print(f"{'op':<56}{'count':>7}{'ms':>10}{'%':>7}")
        width = 100 if args.long else 55
        for op, cnt, ps in rows[:args.top]:
            ms = ps / 1e9
            pct = 100.0 * ps / max(1, sum(r[2] for r in rows))
            print(f"{op[:width]:<{width + 1}}{cnt:>7}{ms:>10.3f}{pct:>6.1f}%")


if __name__ == "__main__":
    main()
