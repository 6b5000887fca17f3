"""Writer formatting: Rust parity, chunked native path, reorder buffer."""

import io

import numpy as np
import pytest

import distance_tpu.writer as writer_mod
from distance_tpu.writer import ReorderBuffer, TsvWriter, format_float


def test_format_float_specials():
    assert format_float(float("nan")) == "NaN"
    assert format_float(float("inf")) == "inf"
    assert format_float(float("-inf")) == "-inf"
    assert format_float(-0.0) == "-0.000000000000"
    assert format_float(0.0) == "0.000000000000"
    assert format_float(2.0 / 15.0) == "0.133333333333"


def rows_bytes(ids1, ids2, pi, pj, vals):
    out = io.BytesIO()
    w = TsvWriter(out)
    w.rows(ids1, ids2, np.asarray(pi), np.asarray(pj), np.asarray(vals))
    return out.getvalue()


def expected(ids1, ids2, pi, pj, vals):
    lines = ["sequence1\tsequence2\tdistance"]
    for i, j, v in zip(pi, pj, vals):
        s = format_float(v) if isinstance(v, float) else str(v)
        lines.append(f"{ids1[i]}\t{ids2[j]}\t{s}")
    return ("\n".join(lines) + "\n").encode()


def test_rows_float_and_int():
    ids = ["alpha", "b", "charlie_9"]
    pi, pj = [0, 1, 2], [2, 0, 1]
    fvals = [0.5, float("nan"), -0.0]
    assert rows_bytes(ids, ids, pi, pj, np.array(fvals)) == expected(
        ids, ids, pi, pj, fvals
    )
    ivals = [0, 123456789, 7]
    got = rows_bytes(ids, ids, pi, pj, np.array(ivals, dtype=np.int64))
    assert got == expected(ids, ids, pi, pj, ivals)


def test_rows_huge_values_trigger_retry():
    # 1e308 formats to ~321 chars — exceeds the tight per-row budget and
    # must retry with the worst-case buffer, not corrupt output
    ids = ["x", "y"]
    vals = np.array([1e308, -1e308])
    got = rows_bytes(ids, ids, [0, 1], [1, 0], vals)
    want = expected(ids, ids, [0, 1], [1, 0], list(vals))
    assert got == want


def test_rows_chunked(monkeypatch, rng):
    monkeypatch.setattr(writer_mod, "_FORMAT_CHUNK_ROWS", 7)
    ids = [f"s{i}" for i in range(30)]
    pi = rng.integers(0, 30, size=100)
    pj = rng.integers(0, 30, size=100)
    vals = rng.random(100)
    got = rows_bytes(ids, ids, pi, pj, vals)
    want = expected(ids, ids, list(pi), list(pj), list(vals))
    assert got == want


def test_python_fallback_matches_native(monkeypatch, rng):
    ids = [f"id{i}" for i in range(10)]
    pi = rng.integers(0, 10, size=40)
    pj = rng.integers(0, 10, size=40)
    vals = rng.random(40)
    native = rows_bytes(ids, ids, pi, pj, vals)
    monkeypatch.setattr(writer_mod, "get_lib", lambda: None)
    python = rows_bytes(ids, ids, pi, pj, vals)
    assert native == python


def test_reorder_buffer():
    seen = []
    rb = ReorderBuffer(seen.append)
    rb.add(2, "c")
    rb.add(0, "a")
    assert seen == ["a"]
    rb.add(1, "b")
    assert seen == ["a", "b", "c"]
    assert rb.outstanding == 0


def test_keyed_memo_formatting_matches_plain():
    """The sort-free memoized path (value keys from counters) emits the
    exact bytes of the plain per-row formatter, f64 and i64."""
    from distance_tpu.writer import _format_rows

    rng = np.random.default_rng(9)
    n = (1 << 16) + 1234
    ids = [f"s{i}" for i in range(300)]
    pi = rng.integers(0, 300, n).astype(np.int32)
    pj = rng.integers(0, 300, n).astype(np.int32)
    # f64 with specials (NaN, inf, -0.0) in the value table
    diff = rng.integers(0, 50, n)
    nons = rng.integers(0, 50, n)
    keys = (diff << 8 | nons).astype(np.int32)
    vals = np.where(
        diff == 0, -0.0, np.where(diff == 1, np.nan, diff / (nons + 1.0))
    )
    vals = np.where(diff == 2, np.inf, vals)
    # same key must give same value: recompute from key so it's a pure fn
    table = {}
    for k, v in zip(keys.tolist(), vals.tolist()):
        table.setdefault(k, v)
    vals = np.array([table[k] for k in keys.tolist()], dtype=np.float64)
    plain = _format_rows(ids, ids, pi, pj, vals)
    keyed = _format_rows(ids, ids, pi, pj, vals, keys, 1 << 16)
    assert plain == keyed
    # i64
    ivals = diff.astype(np.int64)
    plain = _format_rows(ids, ids, pi, pj, ivals)
    keyed = _format_rows(ids, ids, pi, pj, ivals, diff.astype(np.int32),
                         1 << 16)
    assert plain == keyed


def test_engine_value_keys_determine_values():
    from distance_tpu.engine import _value_keys

    rng = np.random.default_rng(4)
    W = 1000
    diff = rng.integers(0, 255, 5000).astype(np.int32)
    same = (W - diff - rng.integers(0, 200, 5000)).astype(np.int32)
    keys, ks = _value_keys("jc69", {"diff": diff, "same": same}, W)
    assert ks == 1 << 16 and keys.min() >= 0 and keys.max() < ks
    # equal keys -> equal (diff, same)
    order = np.argsort(keys, kind="stable")
    k, d, s = keys[order], diff[order], same[order]
    same_key = k[1:] == k[:-1]
    assert np.all(d[1:][same_key] == d[:-1][same_key])
    assert np.all(s[1:][same_key] == s[:-1][same_key])
    # too-large counters -> no keys
    big = diff + 300
    keys, ks = _value_keys("jc69", {"diff": big, "same": same}, W)
    assert keys is None


def test_async_emitter_orders_and_propagates():
    from distance_tpu.engine import _AsyncEmitter

    out = []
    em = _AsyncEmitter()
    import time as _t

    for k in range(16):
        em.submit(lambda k=k: (_t.sleep(0.001 * (16 - k)), out.append(k)))
    em.finish()
    assert out == list(range(16))

    # an exception re-raises on the submitting side; later closures skip
    em = _AsyncEmitter()
    ran = []
    em.submit(lambda: (_ for _ in ()).throw(RuntimeError("boom")))
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="boom"):
        em.finish()
    # a fresh emitter still works after an error
    em = _AsyncEmitter()
    em.submit(lambda: ran.append(1))
    em.finish()
    assert ran == [1]
