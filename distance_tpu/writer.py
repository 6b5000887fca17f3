"""Ordered TSV output with Rust-compatible formatting.

Reproduces the reference writer (/root/reference/src/lib.rs:598-644):

* header ``sequence1\\tsequence2\\tdistance``;
* integer measures print bare integers, float measures fixed 12 decimals
  (``{:.12}``), with Rust spellings ``NaN`` / ``inf`` / ``-inf`` and a
  preserved ``-0.000000000000``;
* results may arrive as out-of-order blocks — a reorder buffer flushes
  them in block-index order so output is deterministic and independent of
  tiling/threading (the ``gather_write`` HashMap analog, lib.rs:612-638);
* a broken pipe on the output stream exits 0 silently (lib.rs:598-608).
"""

from __future__ import annotations

import ctypes
import math
import sys
from typing import BinaryIO, Dict, List, Sequence

import numpy as np

from distance_tpu._native import get_lib

HEADER = b"sequence1\tsequence2\tdistance\n"


def format_float(v: float) -> str:
    """Rust ``{:.12}`` formatting for one f64."""
    if math.isnan(v):
        return "NaN"
    if math.isinf(v):
        return "inf" if v > 0 else "-inf"
    return f"{v:.12f}"


class TsvWriter:
    """Streaming TSV writer over a binary file object."""

    def __init__(self, out: BinaryIO, on_broken_pipe=None):
        self._out = out
        self._wrote_header = False
        # Invoked before the silent exit-0 on a broken pipe — used by the
        # engine to drop a now-inconsistent resume sidecar.
        self._on_broken_pipe = on_broken_pipe

    def _broken_pipe_exit(self) -> None:
        # /root/reference/src/lib.rs:598-608
        if self._on_broken_pipe is not None:
            try:
                self._on_broken_pipe()
            except Exception:
                pass
        try:
            sys.stderr.close()
        except Exception:
            pass
        import os

        os._exit(0)

    def _write(self, data: bytes) -> None:
        try:
            self._out.write(data)
        except BrokenPipeError:
            self._broken_pipe_exit()

    def header(self) -> None:
        if not self._wrote_header:
            self._write(HEADER)
            self._wrote_header = True

    def suppress_header(self) -> None:
        """Skip the header line (non-zero shards of a multi-host run —
        concatenation keeps the single header from shard 0)."""
        self._wrote_header = True

    def rows(
        self,
        ids1: Sequence[str],
        ids2: Sequence[str],
        pair_i: np.ndarray,
        pair_j: np.ndarray,
        values: np.ndarray,
    ) -> None:
        """Emit rows (ids1[pair_i[r]], ids2[pair_j[r]], values[r])."""
        self.header()
        data = _format_rows(ids1, ids2, pair_i, pair_j, values)
        self._write(data)

    def flush(self) -> None:
        try:
            self._out.flush()
        except BrokenPipeError:
            self._broken_pipe_exit()

    def tell(self) -> int:
        return self._out.tell()

    def close(self) -> None:
        self.flush()
        if self._out not in (getattr(sys.stdout, "buffer", None),):
            self._out.close()


def _id_blob(ids: Sequence[str]):
    enc = [s.encode() for s in ids]
    offs = np.zeros(len(enc) + 1, dtype=np.int64)
    np.cumsum([len(e) for e in enc], out=offs[1:])
    return b"".join(enc), offs


# Rows formatted per native call — bounds the worst-case scratch buffer
# (~360 B/row for extreme f64 values) to a few hundred MB.
_FORMAT_CHUNK_ROWS = 1 << 20


def _format_rows(
    ids1: Sequence[str],
    ids2: Sequence[str],
    pair_i: np.ndarray,
    pair_j: np.ndarray,
    values: np.ndarray,
) -> bytes:
    lib = get_lib()
    pair_i = np.ascontiguousarray(pair_i, dtype=np.int32)
    pair_j = np.ascontiguousarray(pair_j, dtype=np.int32)
    n = pair_i.shape[0]
    if lib is not None and n:
        blob1, off1 = _id_blob(ids1)
        blob2, off2 = _id_blob(ids2)
        max_id = int((off1[1:] - off1[:-1]).max(initial=0)) + int(
            (off2[1:] - off2[:-1]).max(initial=0)
        )
        p_i64 = ctypes.POINTER(ctypes.c_int64)
        p_i32 = ctypes.POINTER(ctypes.c_int32)
        id_args = [
            blob1, off1.ctypes.data_as(p_i64),
            blob2, off2.ctypes.data_as(p_i64),
        ]
        out = []
        ok = True
        for c0 in range(0, n, _FORMAT_CHUNK_ROWS):
            c1 = min(c0 + _FORMAT_CHUNK_ROWS, n)
            cn = c1 - c0
            pi = pair_i[c0:c1]
            pj = pair_j[c0:c1]
            if not pi.flags.c_contiguous:
                pi = np.ascontiguousarray(pi)
                pj = np.ascontiguousarray(pj)
            args = id_args + [
                pi.ctypes.data_as(p_i32), pj.ctypes.data_as(p_i32),
            ]
            # typical rows are short; retry with the f64 worst case (~360
            # chars) only if the tight buffer overflows
            w = -1
            for per_row in (64, 384):
                cap = cn * (max_id + per_row + 3) + 16
                buf = ctypes.create_string_buffer(cap)
                if values.dtype == np.float64:
                    vals = np.ascontiguousarray(values[c0:c1])
                    w = lib.dt_format_rows_f64(
                        *args,
                        vals.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                        cn, buf, cap,
                    )
                else:
                    vals = np.ascontiguousarray(values[c0:c1], dtype=np.int64)
                    w = lib.dt_format_rows_i64(
                        *args, vals.ctypes.data_as(p_i64), cn, buf, cap,
                    )
                if w >= 0:
                    break
            if w < 0:
                ok = False
                break
            out.append(ctypes.string_at(buf, w))
        if ok:
            return b"".join(out)
    # Python fallback
    parts: List[str] = []
    if values.dtype == np.float64:
        for r in range(n):
            parts.append(
                f"{ids1[pair_i[r]]}\t{ids2[pair_j[r]]}\t{format_float(values[r])}\n"
            )
    else:
        for r in range(n):
            parts.append(f"{ids1[pair_i[r]]}\t{ids2[pair_j[r]]}\t{int(values[r])}\n")
    return "".join(parts).encode()


class ReorderBuffer:
    """Flush out-of-order blocks in index order (gather_write analog)."""

    def __init__(self, emit) -> None:
        self._emit = emit
        self._pending: Dict[int, object] = {}
        self._counter = 0

    def add(self, idx: int, payload) -> None:
        self._pending[idx] = payload
        while self._counter in self._pending:
            self._emit(self._pending.pop(self._counter))
            self._counter += 1

    @property
    def outstanding(self) -> int:
        return len(self._pending)
