"""Independent classic-BGEO reader for validating io/bgeo.py output.

Implements the READ side of the classic Houdini binary geo format as
the public Disney partio library parses it (src/lib/io/BGEO.cpp):
5-byte magic 'BgeoV', big-endian int32 version 5, the two 4-int32
count headers, per-attribute dictionaries ([uint16 namelen][name]
[uint16 size][int32 houdiniType][size x 4-byte defaults]) with
houdiniType FLOAT=0 / INT=1 / VECTOR=5, then per-point homogeneous
position (4 f32) followed by the attribute payload in declaration
order.

This module was written from the partio reader's documented structure,
NOT from io/bgeo.py — it is the closest available stand-in for loading
the file with the real partio (not pip-installable in this image).
It is deliberately strict: unknown type codes, truncated payloads or
trailing garbage raise instead of being tolerated, so writer bugs
cannot hide.
"""

from __future__ import annotations

import struct

import numpy as np


class BgeoError(ValueError):
    pass


def read_bgeo(data: bytes) -> dict:
    """Parse a classic .bgeo byte string.

    Returns {"position": (n,3) f32, "w": (n,) f32, "attributes":
    {name: (n, size) array (f32 or i32 by type)}, "counts": {...}}.
    Raises BgeoError on any structural violation.
    """
    off = 0

    def take(n: int) -> bytes:
        nonlocal off
        if off + n > len(data):
            raise BgeoError(f"truncated at offset {off} (+{n})")
        b = data[off : off + n]
        off += n
        return b

    def be(fmt: str):
        vals = struct.unpack(">" + fmt, take(struct.calcsize(">" + fmt)))
        return vals if len(vals) > 1 else vals[0]

    if take(5) != b"BgeoV":
        raise BgeoError("bad magic (expected 'BgeoV')")
    version = be("i")
    if version != 5:
        raise BgeoError(f"unsupported version {version}")
    n_points, n_prims, n_point_groups, n_prim_groups = be("4i")
    n_point_attrib, n_vertex_attrib, n_prim_attrib, n_attrib = be("4i")
    if min(n_points, n_prims, n_point_attrib) < 0:
        raise BgeoError("negative counts")
    if n_vertex_attrib or n_prim_attrib or n_attrib:
        raise BgeoError("vertex/prim/detail attributes not supported")
    if n_prims or n_point_groups or n_prim_groups:
        raise BgeoError("primitives/groups not supported")

    attrs = []  # (name, size, houdini_type)
    for _ in range(n_point_attrib):
        name_len = be("H")
        name = take(name_len).decode()
        size = be("H")
        houdini_type = be("i")
        if houdini_type not in (0, 1, 5):  # FLOAT, INT, VECTOR
            raise BgeoError(f"unsupported attribute type {houdini_type}")
        take(4 * size)  # defaults (4-byte words regardless of type)
        attrs.append((name, size, houdini_type))

    row_words = 4 + sum(size for _, size, _ in attrs)
    payload = take(n_points * row_words * 4)
    mat = np.frombuffer(payload, dtype=">f4").reshape(n_points, row_words)

    out_attrs = {}
    col = 4
    for name, size, houdini_type in attrs:
        block = mat[:, col : col + size]
        if houdini_type == 1:  # INT: bit-pattern is big-endian int32
            block = block.view(">i4")
        out_attrs[name] = np.ascontiguousarray(block)
        col += size

    # partio's writer terminates the file with the two "extra" marker
    # bytes 0x00 0xff
    if take(2) != b"\x00\xff":
        raise BgeoError("missing 0x00 0xff end markers")
    if off != len(data):
        raise BgeoError(f"{len(data) - off} trailing bytes after end markers")

    return {
        "position": np.ascontiguousarray(mat[:, 0:3], dtype=np.float32),
        "w": np.ascontiguousarray(mat[:, 3], dtype=np.float32),
        "attributes": out_attrs,
        "counts": {
            "points": n_points,
            "prims": n_prims,
            "point_attribs": n_point_attrib,
        },
    }
