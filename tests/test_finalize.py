"""Native (C/glibc) and Python finalizers must agree bit-for-bit.

Guards against FMA contraction and libm drift: both paths must replay the
reference's exact f64 expressions (/root/reference/src/measures.rs).
"""

import numpy as np
import pytest

from distance_tpu._native import get_lib
from distance_tpu.finalize import _finalize_native, _finalize_python


needs_native = pytest.mark.skipif(get_lib() is None, reason="no C toolchain")


def bits_canonical_nan(a: np.ndarray) -> np.ndarray:
    """Bit patterns with NaNs canonicalized: hardware 0/0 yields -NaN
    (sign bit set) while Python's math.nan is +NaN; both print "NaN" and
    Rust matches the hardware, so NaN payloads are equivalence-classed."""
    bits = a.view(np.uint64).copy()
    bits[np.isnan(a)] = np.uint64(0x7FF8000000000000)
    return bits


def rand_counters(rng, n):
    width = 1000
    same = rng.integers(0, width, size=n).astype(np.int32)
    extra = (width - same).astype(np.int64)
    diff = (extra * rng.random(n)).astype(np.int32)
    ts = (diff * rng.random(n)).astype(np.int32)
    tv = (diff - ts) * (rng.random(n) < 0.8)
    tv = tv.astype(np.int32)
    kk = same + diff
    p1 = (ts * rng.random(n)).astype(np.int32)
    p2 = (ts - p1).astype(np.int32)
    return {
        "diff": diff, "same": same, "ts": ts, "tv": tv,
        "kk": kk.astype(np.int32), "p1": p1, "p2": p2,
    }


@needs_native
@pytest.mark.parametrize("measure", ["raw", "jc69", "k80", "tn93"])
def test_native_matches_python_bitwise(measure, rng):
    n = 4000
    counters = rand_counters(rng, n)
    if measure == "tn93":
        # distinct tally tables + non-trivial index arrays: exercises
        # the native gather against python-side indexed lookups
        bcq = rng.integers(0, 500, size=(97, 4)).astype(np.int32)
        bct = rng.integers(0, 500, size=(41, 4)).astype(np.int32)
        iq = rng.integers(0, 97, size=n).astype(np.int32)
        it = rng.integers(0, 41, size=n).astype(np.int32)
        bc = (bcq, iq, bct, it)
    else:
        bc = None
    out_c = np.empty(n, dtype=np.float64)
    out_py = np.empty(n, dtype=np.float64)
    _finalize_native(get_lib(), measure, dict(counters), bc, out_c)
    _finalize_python(measure, dict(counters), bc, out_py)
    assert np.array_equal(
        bits_canonical_nan(out_c), bits_canonical_nan(out_py)
    ), measure


@needs_native
def test_edge_cases_bitwise(rng):
    # saturation, zeros, identical pairs
    cases = {
        "diff": np.array([0, 3, 4, 0], dtype=np.int32),
        "same": np.array([4, 1, 0, 0], dtype=np.int32),
        "ts": np.array([0, 0, 2, 0], dtype=np.int32),
        "tv": np.array([0, 3, 2, 0], dtype=np.int32),
        "kk": np.array([4, 4, 4, 0], dtype=np.int32),
        "p1": np.array([0, 0, 1, 0], dtype=np.int32),
        "p2": np.array([0, 0, 1, 0], dtype=np.int32),
    }
    for measure in ("raw", "jc69", "k80", "tn93"):
        bcq = np.array([[1, 1, 1, 1]], dtype=np.int32)
        bct = np.array([[2, 0, 1, 1]], dtype=np.int32)
        zeros = np.zeros(4, dtype=np.int32)
        bc = (bcq, zeros, bct, zeros)
        out_c = np.empty(4, dtype=np.float64)
        out_py = np.empty(4, dtype=np.float64)
        _finalize_native(get_lib(), measure, dict(cases), bc, out_c)
        _finalize_python(measure, dict(cases), bc, out_py)
        assert np.array_equal(
            bits_canonical_nan(out_c), bits_canonical_nan(out_py)
        ), measure
