"""Native sequence packer bindings (csrc/packer.cpp via ctypes).

Builds the shared library on first use (g++ -O3); falls back to a pure-numpy
implementation if the toolchain is unavailable. Packing concatenates
variable-length documents into fixed rows with segment ids (block-diagonal
attention) instead of the reference's pad-to-max_length per document
(``scripts/utils/dataloader.py:24-47``) — at seq 256 on C4 this recovers the
~40-50% of tokens the reference spends on padding.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_LIB_LOCK = threading.Lock()
_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc", "packer.cpp")


def _build_lib() -> Optional[ctypes.CDLL]:
    src = os.path.abspath(_SRC)
    if not os.path.exists(src):
        return None
    out = os.path.join(os.path.dirname(src), "libpacker.so")
    if not os.path.exists(out) or os.path.getmtime(out) < os.path.getmtime(src):
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", out],
                check=True,
                capture_output=True,
            )
        except (OSError, subprocess.CalledProcessError):
            return None
    try:
        lib = ctypes.CDLL(out)
    except OSError:
        return None
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.pack_sequences.restype = ctypes.c_int64
    lib.pack_sequences.argtypes = [
        i32p, i64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32, i32p, i32p, i32p,
    ]
    lib.pad_batch.restype = None
    lib.pad_batch.argtypes = [
        i32p, i64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int32, i32p, i32p,
    ]
    return lib


def _lib() -> Optional[ctypes.CDLL]:
    global _LIB
    with _LIB_LOCK:
        if _LIB is None:
            _LIB = _build_lib() or False  # type: ignore[assignment]
    return _LIB or None


def _as_i32(a):
    return np.ascontiguousarray(a, dtype=np.int32)


def pack_sequences(
    docs: Sequence[Sequence[int]],
    seq_len: int,
    n_rows: int,
    pad_id: int = 0,
    eos_id: int = -1,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """Greedy first-fit pack of ``docs`` into ``(n_rows, seq_len)``.

    Returns (tokens, segment_ids, positions, n_docs_consumed). segment_ids
    are 1-based per row, 0 = padding.
    """
    flat = np.concatenate([_as_i32(d) for d in docs]) if docs else np.zeros(0, np.int32)
    lens = np.asarray([len(d) for d in docs], dtype=np.int64)
    out_t = np.empty((n_rows, seq_len), np.int32)
    out_s = np.empty((n_rows, seq_len), np.int32)
    out_p = np.empty((n_rows, seq_len), np.int32)

    lib = _lib()
    if lib is not None:
        consumed = lib.pack_sequences(
            flat.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(docs), seq_len, n_rows, pad_id, eos_id,
            out_t.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            out_s.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            out_p.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        return out_t, out_s, out_p, int(consumed)

    # numpy fallback (same first-fit semantics)
    out_t.fill(pad_id)
    out_s.fill(0)
    out_p.fill(0)
    row_fill = [0] * n_rows
    row_seg = [0] * n_rows
    consumed = 0
    offset = 0
    for d, dlen in zip(docs, lens):
        need = int(min(dlen + (1 if eos_id >= 0 else 0), seq_len))
        body = int(min(dlen, seq_len - (1 if eos_id >= 0 else 0)))
        row = next((r for r in range(n_rows) if seq_len - row_fill[r] >= need), None)
        if row is None:
            break
        base = row_fill[row]
        out_t[row, base : base + body] = _as_i32(d)[:body]
        row_seg[row] += 1
        out_s[row, base : base + body] = row_seg[row]
        out_p[row, base : base + body] = np.arange(body)
        if eos_id >= 0 and body < need:
            out_t[row, base + body] = eos_id
            out_s[row, base + body] = row_seg[row]
            out_p[row, base + body] = body
        row_fill[row] += need
        consumed += 1
        offset += int(dlen)
    return out_t, out_s, out_p, consumed


def pad_batch(docs: Sequence[Sequence[int]], seq_len: int, pad_id: int = 0):
    """One doc per row, truncate + right-pad (reference scheme) — C++ fast
    path with numpy fallback. Returns (tokens, attention_mask)."""
    flat = np.concatenate([_as_i32(d) for d in docs]) if docs else np.zeros(0, np.int32)
    lens = np.asarray([len(d) for d in docs], dtype=np.int64)
    n = len(docs)
    out_t = np.empty((n, seq_len), np.int32)
    out_m = np.empty((n, seq_len), np.int32)
    lib = _lib()
    if lib is not None:
        lib.pad_batch(
            flat.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            n, seq_len, pad_id,
            out_t.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            out_m.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        return out_t, out_m
    out_t.fill(pad_id)
    out_m.fill(0)
    for i, d in enumerate(docs):
        ln = min(len(d), seq_len)
        out_t[i, :ln] = _as_i32(d)[:ln]
        out_m[i, :ln] = 1
    return out_t, out_m
