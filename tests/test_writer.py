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
    assert keys.min() >= 0 and keys.max() < ks
    # tight mixed-radix packing: keyspace tracks the actual maxima
    assert ks == (int(diff.max()) + 1) * (int((W - same - diff).max()) + 1)
    # equal keys -> equal (diff, same)
    order = np.argsort(keys, kind="stable")
    k, d, s = keys[order], diff[order], same[order]
    same_key = k[1:] == k[:-1]
    assert np.all(d[1:][same_key] == d[:-1][same_key])
    assert np.all(s[1:][same_key] == s[:-1][same_key])
    # realistic ambiguity loads (nonsame ~300 > the old 8-bit field) must
    # STILL produce keys — the static packing silently disabled the memo
    big_amb = (W - diff - rng.integers(250, 400, 5000)).astype(np.int32)
    keys, ks = _value_keys("jc69", {"diff": diff, "same": big_amb}, W)
    assert keys is not None and keys.max() < ks
    # negative nonsame (inconsistent counters) -> no keys
    keys, ks = _value_keys(
        "jc69", {"diff": diff, "same": (W - diff + 5)}, W
    )
    assert keys is None
    # keyspace blow-up past the cap -> no keys
    from distance_tpu.engine import _KEYSPACE_CAP

    huge = rng.integers(0, _KEYSPACE_CAP, 5000).astype(np.int32)
    keys, ks = _value_keys(
        "jc69", {"diff": huge, "same": np.zeros(5000, np.int32)},
        _KEYSPACE_CAP,
    )
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


def test_mmap_sink_matches_bytesio(tmp_path):
    """Keyed blocks to a seekable file go through the mmap window; the
    file bytes must equal the BytesIO (buffered) path exactly, across
    multiple blocks, with a correct final tell()."""
    import io as _io

    from distance_tpu.writer import TsvWriter, _MEMO_MIN_ROWS

    rng = np.random.default_rng(3)
    n = _MEMO_MIN_ROWS + 1234
    ids = [f"s{i}" for i in range(300)]
    pi = rng.integers(0, 300, n).astype(np.int32)
    pj = rng.integers(0, 300, n).astype(np.int32)
    keys = rng.integers(0, 37, n).astype(np.int32)
    table = rng.random(37)
    vals = table[keys]

    mem = _io.BytesIO()
    wm = TsvWriter(mem)
    p = tmp_path / "out.tsv"
    f = open(p, "wb")
    wf = TsvWriter(f)
    for _ in range(2):  # two blocks: append-after-mmap must line up
        wm.rows(ids, ids, pi, pj, vals, keys, 37)
        wf.rows(ids, ids, pi, pj, vals, keys, 37)
    # interleave a small unkeyed block (buffered write after a seek)
    wm.rows(ids, ids, pi[:10], pj[:10], vals[:10])
    wf.rows(ids, ids, pi[:10], pj[:10], vals[:10])
    wf.flush()
    assert wf.tell() == mem.tell()
    f.close()
    assert p.read_bytes() == mem.getvalue()


def test_deferred_finalize_called_with_reps_only(tmp_path):
    """A callable values with the memo engaged receives only the
    representative rows (finalize-by-key), and the emitted bytes match
    the eager path."""
    import io as _io

    from distance_tpu.writer import TsvWriter, _MEMO_MIN_ROWS

    rng = np.random.default_rng(5)
    n = _MEMO_MIN_ROWS + 7
    ids = [f"s{i}" for i in range(64)]
    pi = rng.integers(0, 64, n).astype(np.int32)
    pj = rng.integers(0, 64, n).astype(np.int32)
    keys = rng.integers(0, 11, n).astype(np.int32)
    table = rng.random(11)
    vals = table[keys]
    calls = []

    def lazy(first_rows):
        calls.append(first_rows)
        if first_rows is None:
            return vals
        return vals[first_rows]

    mem1, mem2 = _io.BytesIO(), _io.BytesIO()
    TsvWriter(mem1).rows(ids, ids, pi, pj, vals, keys, 11)
    TsvWriter(mem2).rows(ids, ids, pi, pj, lazy, keys, 11)
    assert mem1.getvalue() == mem2.getvalue()
    from distance_tpu._native import get_lib

    if get_lib() is not None:
        assert len(calls) == 1 and calls[0] is not None
        assert calls[0].shape[0] <= 11


def test_async_emitter_poisoned_stays_poisoned():
    """After a tail raises, every later submit/finish re-raises and the
    submitted work never runs (no silent post-error execution)."""
    import time as _t

    from distance_tpu.engine import _AsyncEmitter

    em = _AsyncEmitter()
    ran = []
    em.submit(lambda: (_ for _ in ()).throw(RuntimeError("boom")))
    _t.sleep(0.05)  # let the worker consume and poison
    with pytest.raises(RuntimeError, match="boom"):
        em.submit(lambda: ran.append(1))
    with pytest.raises(RuntimeError, match="boom"):
        em.submit(lambda: ran.append(2))
    with pytest.raises(RuntimeError, match="boom"):
        em.finish()
    assert ran == []


def test_mmap_window_preserves_appended_file(tmp_path):
    """An O_APPEND output fd over pre-existing content: tell() is not
    the append position, so the mmap fast path must decline (its
    ftruncate would destroy the prior bytes) and the buffered write
    must append correctly (round-5 review finding)."""
    import io as _io

    from distance_tpu.writer import TsvWriter, _MEMO_MIN_ROWS

    rng = np.random.default_rng(5)
    n = _MEMO_MIN_ROWS + 7
    ids = [f"s{i}" for i in range(100)]
    pi = rng.integers(0, 100, n).astype(np.int32)
    pj = rng.integers(0, 100, n).astype(np.int32)
    keys = rng.integers(0, 11, n).astype(np.int32)
    vals = rng.random(11)[keys]

    mem = _io.BytesIO()
    wm = TsvWriter(mem)
    wm.suppress_header()
    wm.rows(ids, ids, pi, pj, vals, keys, 11)

    p = tmp_path / "out.tsv"
    prior = b"PRE-EXISTING CONTENT\n"
    p.write_bytes(prior)
    f = open(p, "ab")  # O_APPEND: tell() == 0, size == len(prior)
    wf = TsvWriter(f)
    wf.suppress_header()
    wf.rows(ids, ids, pi, pj, vals, keys, 11)
    wf.flush()
    f.close()
    assert p.read_bytes() == prior + mem.getvalue()


def test_id_blob_cache_tracks_list_identity():
    """The per-writer id-blob memo must hit on the same list object and
    miss (recompute) when a DIFFERENT list arrives in the same slot —
    stream groups pass a fresh ids2 list per group."""
    import io as _io

    from distance_tpu.writer import TsvWriter, get_lib

    if get_lib() is None:
        import pytest

        pytest.skip("native lib unavailable")

    def emit(w, ids1, ids2):
        pi = np.zeros(1, dtype=np.int32)
        pj = np.zeros(1, dtype=np.int32)
        w.rows(ids1, ids2, pi, pj, np.array([1.5]))

    a = ["idA", "idB"]
    b = ["idX", "idY"]
    mem = _io.BytesIO()
    w = TsvWriter(mem)
    emit(w, a, b)
    blob_b = w._idblob[2][1]
    emit(w, a, b)
    assert w._idblob[2][1] is blob_b  # identity hit, no rebuild
    b2 = ["idZ", "idW"]
    emit(w, a, b2)
    assert w._idblob[2][0] is b2  # replaced on a new list
    lines = mem.getvalue().decode().splitlines()
    assert lines[1].startswith("idA\tidX")
    assert lines[-1].startswith("idA\tidZ")
