"""Minimal dependency-free reader for XLA profiler ``*.xplane.pb`` files.

The profile plugins in this image don't ship ``xplane_pb2``, so this is
a handwritten protobuf tag-walker for the handful of fields we need
(tsl/profiler/protobuf/xplane.proto):

    XSpace.planes = 1            (XPlane)
    XPlane.name = 2, .lines = 3, .event_metadata = 4 (map<i64, XEventMetadata>)
    XLine.name = 2, .events = 4  (XEvent)
    XEvent.metadata_id = 1, .duration_ps = 3
    XEventMetadata.id = 1, .name = 2

Unknown fields are skipped by wire type, so schema drift in fields we
don't read is harmless.
"""

from __future__ import annotations


def _varint(buf: bytes, i: int) -> tuple[int, int]:
    shift = 0
    val = 0
    while True:
        b = buf[i]
        i += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, i
        shift += 7


def fields(buf: bytes):
    """Yield (field_number, wire_type, value) over a message's bytes.
    value: int for varint/fixed, memoryview for length-delimited."""
    i, n = 0, len(buf)
    mv = memoryview(buf)
    while i < n:
        tag, i = _varint(buf, i)
        fnum, wt = tag >> 3, tag & 7
        if wt == 0:
            val, i = _varint(buf, i)
        elif wt == 2:
            ln, i = _varint(buf, i)
            val = mv[i : i + ln]
            i += ln
        elif wt == 5:
            val = int.from_bytes(mv[i : i + 4], "little")
            i += 4
        elif wt == 1:
            val = int.from_bytes(mv[i : i + 8], "little")
            i += 8
        else:  # groups (3/4) don't appear in xplane
            raise ValueError(f"unsupported wire type {wt}")
        yield fnum, wt, val


def _event(buf) -> tuple[int, int]:
    mid = dur = 0
    for fnum, _wt, val in fields(bytes(buf)):
        if fnum == 1:
            mid = val
        elif fnum == 3:
            dur = val
    return mid, dur


def _line(buf) -> tuple[str, list[tuple[int, int]]]:
    name = ""
    events = []
    for fnum, wt, val in fields(bytes(buf)):
        if fnum == 2 and wt == 2:
            name = bytes(val).decode("utf-8", "replace")
        elif fnum == 4 and wt == 2:
            events.append(_event(val))
    return name, events


def _stat(buf) -> tuple[int, object]:
    """XStat: metadata_id=1; value oneof double=2/uint64=3/int64=4/str=5."""
    mid = 0
    val = None
    for fnum, wt, v in fields(bytes(buf)):
        if fnum == 1 and wt == 0:
            mid = v
        elif fnum == 5 and wt == 2:
            val = bytes(v).decode("utf-8", "replace")
        elif fnum in (2, 3, 4):
            val = v
    return mid, val


def _event_metadata(buf, stat_names=None) -> tuple[int, str, dict]:
    mid = 0
    name = ""
    stats = {}
    for fnum, wt, val in fields(bytes(buf)):
        if fnum == 1 and wt == 0:
            mid = val
        elif fnum == 2 and wt == 2:
            name = bytes(val).decode("utf-8", "replace")
        elif fnum == 5 and wt == 2:
            sid, sval = _stat(val)
            key = stat_names.get(sid, sid) if stat_names else sid
            stats[key] = sval
    return mid, name, stats


def _map_entry(buf):
    key = 0
    val = b""
    for fnum, wt, v in fields(bytes(buf)):
        if fnum == 1 and wt == 0:
            key = v
        elif fnum == 2 and wt == 2:
            val = v
    return key, val


def _plane(buf):
    name = ""
    lines = []
    meta_raw = []
    stat_names: dict[int, str] = {}
    for fnum, wt, val in fields(bytes(buf)):
        if fnum == 2 and wt == 2:
            name = bytes(val).decode("utf-8", "replace")
        elif fnum == 3 and wt == 2:
            lines.append(_line(val))
        elif fnum == 4 and wt == 2:
            _k, v = _map_entry(val)
            meta_raw.append(v)
        elif fnum == 5 and wt == 2:
            _k, v = _map_entry(val)
            sid, sname, _ = _event_metadata(v)
            stat_names[sid] = sname
    meta: dict[int, tuple[str, dict]] = {}
    for v in meta_raw:
        mid, mname, stats = _event_metadata(v, stat_names)
        meta[mid] = (mname, stats)
    return name, lines, meta


def read_xspace(path: str):
    """Return [(plane_name, [(line_name, [(event_name, dur_ps, stats)])])].
    ``stats`` is the event metadata's stat dict (e.g. 'tf_op' = the JAX
    scope path, 'source_info'/29 = file:line)."""
    with open(path, "rb") as f:
        buf = f.read()
    planes = []
    for fnum, wt, val in fields(buf):
        if fnum == 1 and wt == 2:
            pname, lines, meta = _plane(val)
            out_lines = []
            for lname, events in lines:
                out_lines.append(
                    (
                        lname,
                        [
                            (*meta.get(mid, (f"#{mid}", {})), dur)
                            for mid, dur in events
                        ],
                    )
                )
            planes.append((pname, out_lines))
    return planes
