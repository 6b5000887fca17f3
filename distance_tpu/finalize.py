"""Exact f64 finalization of device counters into distances.

The TPU kernels produce exact integer counters per pair; this module
replays the reference's f64 closed forms (/root/reference/src/measures.rs)
over those counters.  The native path (C, glibc libm) is used when
available; the Python fallback calls ``math.log`` per element (also glibc).
Both are bit-for-bit identical to the Rust binary's arithmetic.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from distance_tpu import measures
from distance_tpu._native import get_lib

INT_MEASURES = ("n", "n_high")


def finalize_block(
    measure: str,
    counters: Dict[str, np.ndarray],
    q_counts: Optional[np.ndarray] = None,
    t_counts: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Finalize a flat block of pairs.

    Args:
      measure: one of the six measure names.
      counters: counter name -> (n_pairs,) int32 array.
      q_counts/t_counts: (n_pairs, 4) int64 (A,T,G,C) tallies, tn93 only.

    Returns:
      (n_pairs,) int64 for integer measures, float64 otherwise.
    """
    if measure in INT_MEASURES:
        return counters["diff"].astype(np.int64)

    n = next(iter(counters.values())).shape[0]
    out = np.empty(n, dtype=np.float64)
    lib = get_lib()
    if lib is not None:
        if n >= 2 * _PAR_CHUNK:
            _finalize_native_parallel(
                lib, measure, counters, q_counts, t_counts, out
            )
        else:
            _finalize_native(lib, measure, counters, q_counts, t_counts, out)
    else:
        _finalize_python(measure, counters, q_counts, t_counts, out)
    return out


# The C finalizers release the GIL (plain ctypes calls), so large blocks
# split across a small thread pool — the log/sqrt-heavy measures (jc69,
# k80, tn93) are otherwise a serial ~10 M pairs/s ceiling per core.
_PAR_CHUNK = 1 << 20
_pool = None


def _get_pool():
    global _pool
    if _pool is None:
        import os
        from concurrent.futures import ThreadPoolExecutor

        _pool = ThreadPoolExecutor(min(8, os.cpu_count() or 1))
    return _pool


def _finalize_native_parallel(lib, measure, counters, q_counts, t_counts,
                              out):
    n = out.shape[0]
    counters = {k: _as_i32(v) for k, v in counters.items()}
    if q_counts is not None:
        q_counts = np.ascontiguousarray(q_counts, dtype=np.int64)
        t_counts = np.ascontiguousarray(t_counts, dtype=np.int64)
    pool = _get_pool()

    def run(a, b):
        sub = {k: v[a:b] for k, v in counters.items()}
        qc = q_counts[a:b] if q_counts is not None else None
        tc = t_counts[a:b] if t_counts is not None else None
        _finalize_native(lib, measure, sub, qc, tc, out[a:b])

    futures = [
        pool.submit(run, a, min(a + _PAR_CHUNK, n))
        for a in range(0, n, _PAR_CHUNK)
    ]
    for f in futures:
        f.result()


def _as_i32(a: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(a, dtype=np.int32)


def _finalize_native(lib, measure, counters, q_counts, t_counts, out):
    import ctypes

    n = out.shape[0]
    p_d = out.ctypes.data_as(ctypes.POINTER(ctypes.c_double))

    def p32(name):
        arr = _as_i32(counters[name])
        counters[name] = arr  # keep alive
        return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))

    if measure == "raw":
        lib.dt_finalize_raw(p32("diff"), p32("same"), p_d, n)
    elif measure == "jc69":
        lib.dt_finalize_jc69(p32("diff"), p32("same"), p_d, n)
    elif measure == "k80":
        lib.dt_finalize_k80(p32("same"), p32("ts"), p32("tv"), p_d, n)
    elif measure == "tn93":
        qc = np.ascontiguousarray(q_counts, dtype=np.int64)
        tc = np.ascontiguousarray(t_counts, dtype=np.int64)
        lib.dt_finalize_tn93(
            p32("same"), p32("kk"), p32("p1"), p32("p2"),
            qc.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            tc.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            p_d, n,
        )
    else:
        raise ValueError(f"unknown measure {measure!r}")


def _finalize_python(measure, counters, q_counts, t_counts, out):
    n = out.shape[0]
    if measure == "raw":
        diff, same = counters["diff"], counters["same"]
        for i in range(n):
            out[i] = measures.finalize_raw(int(diff[i]), int(same[i]) + int(diff[i]))
    elif measure == "jc69":
        diff, same = counters["diff"], counters["same"]
        for i in range(n):
            out[i] = measures.finalize_jc69(int(diff[i]), int(same[i]) + int(diff[i]))
    elif measure == "k80":
        same, ts, tv = counters["same"], counters["ts"], counters["tv"]
        for i in range(n):
            out[i] = measures.finalize_k80(int(same[i]), int(ts[i]), int(tv[i]))
    elif measure == "tn93":
        same, kk = counters["same"], counters["kk"]
        p1, p2 = counters["p1"], counters["p2"]
        for i in range(n):
            out[i] = measures.finalize_tn93(
                int(same[i]), int(kk[i]), int(p1[i]), int(p2[i]),
                tuple(q_counts[i]), tuple(t_counts[i]),
            )
    else:
        raise ValueError(f"unknown measure {measure!r}")
