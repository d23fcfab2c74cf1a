"""Sketch protocol: the mergeable-UDAF state contract.

This is the engine's extension surface (the analogue of Miller's DSL UDF
hooks, reference ``pkg/dsl`` — see SURVEY.md §2.10): any object with
``update_batch / merge / to_bytes / from_bytes`` can be driven by the
:mod:`miller_ray.engine.udaf` harness over a ``ray.data.Dataset``.

Contract:
- ``update_batch`` accepts a numpy array / pyarrow Array and is a pure,
  deterministic function of (current state, value sequence).
- ``merge`` is associative and commutative up to the sketch's published
  equivalence (HLL/CMS/Bloom register-exact; KLL/t-digest equivalent
  within rank-error bounds, property-tested in tests/test_merge.py).
- ``to_bytes``/``from_bytes`` round-trip exactly (binary, versioned tag).
"""

from __future__ import annotations

import struct
from typing import Protocol, runtime_checkable

import numpy as np


@runtime_checkable
class Sketch(Protocol):
    def update_batch(self, values) -> None: ...

    def merge(self, other) -> "Sketch": ...

    def to_bytes(self) -> bytes: ...

    @classmethod
    def from_bytes(cls, data: bytes) -> "Sketch": ...


def pack_arrays(tag: bytes, scalars: list[float], arrays: list[np.ndarray]) -> bytes:
    """Tiny self-describing binary format shared by the sketch classes.

    layout: tag(4) | n_scalars(u32) | scalars(f64...) | n_arrays(u32) |
            per array: dtype_str_len(u8) dtype_str nbytes(u64) raw_bytes
    """
    out = [tag[:4].ljust(4, b"\0"), struct.pack("<I", len(scalars))]
    out.append(struct.pack(f"<{len(scalars)}d", *scalars))
    out.append(struct.pack("<I", len(arrays)))
    for a in arrays:
        a = np.ascontiguousarray(a)
        ds = a.dtype.str.encode()
        raw = a.tobytes()
        out.append(struct.pack("<B", len(ds)) + ds + struct.pack("<Q", len(raw)) + raw)
    return b"".join(out)


def unpack_arrays(data: bytes, expect_tag: bytes) -> tuple[list[float], list[np.ndarray]]:
    tag = data[:4].rstrip(b"\0")
    if tag != expect_tag[:4].rstrip(b"\0"):
        raise ValueError(f"sketch tag mismatch: {tag!r} != {expect_tag!r}")
    off = 4
    (ns,) = struct.unpack_from("<I", data, off)
    off += 4
    scalars = list(struct.unpack_from(f"<{ns}d", data, off))
    off += 8 * ns
    (na,) = struct.unpack_from("<I", data, off)
    off += 4
    arrays = []
    for _ in range(na):
        (dl,) = struct.unpack_from("<B", data, off)
        off += 1
        dt = np.dtype(data[off : off + dl].decode())
        off += dl
        (nb,) = struct.unpack_from("<Q", data, off)
        off += 8
        arrays.append(np.frombuffer(data, dtype=dt, count=nb // dt.itemsize, offset=off).copy())
        off += nb
    return scalars, arrays
