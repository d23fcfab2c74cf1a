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
import zlib
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
      per array: dtype_str_len(u8) dtype_str flag(u8) raw_nbytes(u64)
                 stored_nbytes(u64) payload

    flag 1 = zlib-compressed payload. Per-block partial sketches (CMS
    counts, Bloom bitmaps) are overwhelmingly zeros, so compression cuts
    the bytes a 10^6-block job moves through the object store by ~100x;
    fully-populated merged states fall back to raw (flag 0).
    """
    out = [tag[:4].ljust(4, b"\0"), struct.pack("<I", len(scalars))]
    out.append(struct.pack(f"<{len(scalars)}d", *scalars))
    out.append(struct.pack("<I", len(arrays)))
    for a in arrays:
        a = np.ascontiguousarray(a)
        logical = a.dtype
        # flag bit 2: 8-byte integer arrays whose values fit a narrower
        # int are STORED narrow (dtype_str below is the stored dtype;
        # the logical dtype follows the header). Partial-sketch counter
        # arrays (CMS rows, bounded-int hists) are int64 by contract
        # but per-block values are small — narrowing halves (or
        # quarters) the bytes zlib touches on BOTH ends of every merge.
        if logical.kind in "iu" and logical.itemsize == 8 and a.nbytes > 4096:
            lo = int(a.min()) if a.size else 0
            hi = int(a.max()) if a.size else 0
            cands = (np.uint8, np.uint16, np.uint32) if lo >= 0 else \
                (np.int8, np.int16, np.int32)
            for cand in cands:
                info = np.iinfo(cand)
                if info.min <= lo and hi <= info.max:
                    a = a.astype(cand)
                    break
        ds = a.dtype.str.encode()
        raw = a.tobytes()
        flag, payload = 0, raw
        if len(raw) > 4096:
            comp = zlib.compress(raw, 1)
            if len(comp) < 0.9 * len(raw):
                flag, payload = 1, comp
        hdr = struct.pack("<B", len(ds)) + ds \
            + struct.pack("<BQQ", flag | (2 if a.dtype != logical else 0),
                          len(raw), len(payload))
        if a.dtype != logical:
            lds = logical.str.encode()
            hdr += struct.pack("<B", len(lds)) + lds
        out.append(hdr + payload)
    return b"".join(out)


def unpack_arrays_ex(data: bytes, expect_tag: bytes,
                     offset: int = 0) -> tuple[list[float], list[np.ndarray], int]:
    """Like unpack_arrays but also returns the end offset (for blobs that
    concatenate several packed sections)."""
    tag = data[offset : offset + 4].rstrip(b"\0")
    if tag != expect_tag[:4].rstrip(b"\0"):
        raise ValueError(f"sketch tag mismatch: {tag!r} != {expect_tag!r}")
    off = offset + 4
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
        flag, raw_nb, stored_nb = struct.unpack_from("<BQQ", data, off)
        off += 17
        logical = None
        if flag & 2:  # stored narrow; restore the logical dtype
            (ll,) = struct.unpack_from("<B", data, off)
            off += 1
            logical = np.dtype(data[off : off + ll].decode())
            off += ll
        payload = data[off : off + stored_nb]
        off += stored_nb
        if flag & 1:
            payload = zlib.decompress(payload)
        arr = np.frombuffer(payload, dtype=dt, count=raw_nb // dt.itemsize)
        arrays.append(arr.astype(logical) if logical is not None
                      else arr.copy())
    return scalars, arrays, off


def unpack_arrays(data: bytes, expect_tag: bytes) -> tuple[list[float], list[np.ndarray]]:
    scalars, arrays, _ = unpack_arrays_ex(data, expect_tag)
    return scalars, arrays


def bincount_chunked(values: np.ndarray, minlength: int,
                     chunk: int = 1 << 20) -> np.ndarray:
    """np.bincount in bounded-size chunks.

    np.bincount silently casts non-intp input (e.g. int32 tokens) to
    int64 — for a 10M-element array that is a fresh ~80 MB allocation
    PER CALL, and concurrent page-zeroing of such allocations serializes
    workers in the kernel (measured 13x inflation at 8 procs). Chunking
    keeps the temporary at ~8 MB, which the allocator recycles without
    touching new pages.
    """
    v = np.asarray(values)
    if v.size <= chunk:
        return np.bincount(v, minlength=minlength)
    acc = np.bincount(v[:chunk], minlength=minlength)
    for s in range(chunk, v.size, chunk):
        c = np.bincount(v[s : s + chunk], minlength=minlength)
        if c.size > acc.size:
            c[: acc.size] += acc
            acc = c
        else:
            acc[: c.size] += c
    return acc
