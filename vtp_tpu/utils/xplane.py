"""Dependency-free .xplane.pb trace parser for op-level timing.

``jax.profiler`` writes XSpace protobufs; the usual consumers
(xprof/tensorboard) are absent in minimal environments, so this module
decodes the wire format directly (generic varint/length-delimited
walker keyed on the XSpace/XPlane/XLine/XEvent field numbers) and
aggregates per-op device time.

The reference ships no profiling at all (SURVEY.md §5.1); this is the
TPU-native observability layer used to drive kernel optimization.

Usage:
    from vtp_tpu.utils.xplane import parse_xspace, op_summary
    space = parse_xspace(open(path, 'rb').read())
    for row in op_summary(space, top=30): print(row)
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterator, List, Optional, Tuple

# ---------------------------------------------------------------- wire


def _varint(buf: bytes, i: int) -> Tuple[int, int]:
    r = 0
    shift = 0
    while True:
        b = buf[i]
        i += 1
        r |= (b & 0x7F) << shift
        if not b & 0x80:
            return r, i
        shift += 7


def fields(buf: bytes) -> Iterator[Tuple[int, int, object]]:
    """Yield (field_number, wire_type, value) over a message buffer."""
    i = 0
    n = len(buf)
    while i < n:
        tag, i = _varint(buf, i)
        fnum, wt = tag >> 3, tag & 7
        if wt == 0:  # varint
            v, i = _varint(buf, i)
        elif wt == 1:  # 64-bit
            v = int.from_bytes(buf[i:i + 8], "little")
            i += 8
        elif wt == 2:  # length-delimited
            ln, i = _varint(buf, i)
            v = buf[i:i + ln]
            i += ln
        elif wt == 5:  # 32-bit
            v = int.from_bytes(buf[i:i + 4], "little")
            i += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield fnum, wt, v


def _zigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


# --------------------------------------------------------------- schema


@dataclasses.dataclass
class XEvent:
    metadata_id: int = 0
    offset_ps: int = 0
    duration_ps: int = 0
    num_occurrences: int = 1


@dataclasses.dataclass
class XLine:
    id: int = 0
    name: str = ""
    timestamp_ns: int = 0
    events: List[XEvent] = dataclasses.field(default_factory=list)


@dataclasses.dataclass
class XPlane:
    id: int = 0
    name: str = ""
    lines: List[XLine] = dataclasses.field(default_factory=list)
    event_metadata: Dict[int, str] = dataclasses.field(default_factory=dict)
    stat_metadata: Dict[int, str] = dataclasses.field(default_factory=dict)


def _parse_event(buf: bytes) -> XEvent:
    e = XEvent()
    for fnum, _, v in fields(buf):
        if fnum == 1:
            e.metadata_id = v
        elif fnum == 2:
            e.offset_ps = v
        elif fnum == 3:
            e.duration_ps = v
        elif fnum == 5:
            e.num_occurrences = v
    return e


def _parse_line(buf: bytes) -> XLine:
    ln = XLine()
    for fnum, _, v in fields(buf):
        if fnum == 1:
            ln.id = v
        elif fnum == 2:
            ln.name = v.decode("utf-8", "replace")
        elif fnum == 3:
            ln.timestamp_ns = v
        elif fnum == 4:
            ln.events.append(_parse_event(v))
    return ln


def _parse_named_metadata(buf: bytes) -> Tuple[int, str]:
    """Map entry {1: key varint, 2: XEventMetadata/XStatMetadata}."""
    key, name = 0, ""
    for fnum, _, v in fields(buf):
        if fnum == 1:
            key = v
        elif fnum == 2:
            for f2, _, v2 in fields(v):
                if f2 == 2:  # .name
                    name = v2.decode("utf-8", "replace")
    return key, name


def _parse_plane(buf: bytes) -> XPlane:
    p = XPlane()
    for fnum, _, v in fields(buf):
        if fnum == 1:
            p.id = v
        elif fnum == 2:
            p.name = v.decode("utf-8", "replace")
        elif fnum == 3:
            p.lines.append(_parse_line(v))
        elif fnum == 4:
            k, nm = _parse_named_metadata(v)
            p.event_metadata[k] = nm
        elif fnum == 5:
            k, nm = _parse_named_metadata(v)
            p.stat_metadata[k] = nm
    return p


def parse_xspace(buf: bytes) -> List[XPlane]:
    planes = []
    for fnum, _, v in fields(buf):
        if fnum == 1:
            planes.append(_parse_plane(v))
    return planes


# ------------------------------------------------------------- analysis


def device_planes(planes: List[XPlane]) -> List[XPlane]:
    """TPU/accelerator device planes (op timing lives here)."""
    return [
        p for p in planes
        if ("TPU" in p.name or "/device:" in p.name or "gpu" in p.name.lower())
        and "Host" not in p.name
    ]


def op_summary(
    planes: List[XPlane],
    top: Optional[int] = None,
    line_filter: Optional[str] = "XLA Ops",
) -> List[dict]:
    """Aggregate device time by op name, descending.

    Returns rows: {name, total_ms, count, mean_us}. ``line_filter``
    selects trace lines by substring (default the per-op line); pass
    None to aggregate every line.
    """
    acc: Dict[str, Tuple[float, int]] = {}
    for plane in device_planes(planes):
        for line in plane.lines:
            if line_filter and line_filter not in line.name:
                continue
            for ev in line.events:
                name = plane.event_metadata.get(ev.metadata_id, f"#{ev.metadata_id}")
                t, c = acc.get(name, (0.0, 0))
                acc[name] = (t + ev.duration_ps / 1e12 * 1e3, c + ev.num_occurrences)
    rows = [
        {"name": k, "total_ms": t, "count": c, "mean_us": (t * 1e3 / max(c, 1))}
        for k, (t, c) in acc.items()
    ]
    rows.sort(key=lambda r: -r["total_ms"])
    return rows[:top] if top else rows


def line_names(planes: List[XPlane]) -> List[Tuple[str, str, int]]:
    return [(p.name, ln.name, len(ln.events)) for p in planes for ln in p.lines]


def exclusive_op_summary(
    planes: List[XPlane],
    top: Optional[int] = None,
    line_filter: Optional[str] = "XLA Ops",
) -> List[dict]:
    """Aggregate device time by op name with nested children subtracted.

    ``op_summary`` double-counts control flow: a ``while`` event's
    duration includes every body op, and the body ops also appear as
    their own (nested) events on the same line. This walks each line's
    events as an interval forest (events sorted by start; an event is a
    child of the innermost still-open interval that contains it) and
    charges each op only its exclusive time.

    Unlike ``op_summary``, ``line_filter`` here is an EXACT line-name
    match: the default "XLA Ops" must not also sweep in the separate
    "Async XLA Ops" line, whose DMA windows overlap compute and would
    otherwise double-count the accounted time.
    """
    acc: Dict[str, Tuple[float, int]] = {}
    for plane in device_planes(planes):
        for line in plane.lines:
            if line_filter and line_filter != line.name:
                continue
            evs = sorted(line.events, key=lambda e: (e.offset_ps, -e.duration_ps))
            stack: List[Tuple[int, int, str, int]] = []  # (start, end, name, child_ps)

            def _pop(upto_ps: int) -> None:
                while stack and stack[-1][1] <= upto_ps:
                    s, e, name, child = stack.pop()
                    excl = max(e - s - child, 0)
                    if stack:
                        s2, e2, n2, c2 = stack[-1]
                        stack[-1] = (s2, e2, n2, c2 + (e - s))
                    t, c = acc.get(name, (0.0, 0))
                    acc[name] = (t + excl / 1e9, c + 1)

            for ev in evs:
                name = plane.event_metadata.get(ev.metadata_id, f"#{ev.metadata_id}")
                start, end = ev.offset_ps, ev.offset_ps + ev.duration_ps
                _pop(start)
                stack.append((start, end, name, 0))
            _pop(1 << 62)
    rows = [
        {"name": k, "total_ms": t, "count": c, "mean_us": (t * 1e3 / max(c, 1))}
        for k, (t, c) in acc.items()
    ]
    rows.sort(key=lambda r: -r["total_ms"])
    return rows[:top] if top else rows
