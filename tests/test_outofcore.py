"""Out-of-core (blocked) sweep parity: tiny forced budgets must produce
byte-identical output to the in-core path."""

import numpy as np
import pytest

import distance_tpu.engine as engine
from distance_tpu.measures import MEASURES
from tests.conftest import make_fasta, random_seqs
from tests.test_golden import expected_rect, expected_square, run_engine


@pytest.fixture
def tiny_budgets(monkeypatch):
    # force multiple X groups and Y super-rows on a small fixture
    monkeypatch.setattr(engine, "HBM_BUDGET_BYTES", 2000)
    monkeypatch.setattr(engine, "HOST_BUF_BUDGET", 40000)
    yield


@pytest.mark.parametrize("measure", MEASURES)
def test_blocked_square_parity(measure, tiny_budgets, rng):
    fasta = make_fasta(random_seqs(rng, 40, 90, amb_frac=0.2))
    got, _ = run_engine(measure, fasta, backend="xla", tile_i=8, tile_j=8)
    assert got == expected_square(measure, fasta)


def test_blocked_path_is_taken(tiny_budgets, rng, monkeypatch):
    called = {}
    orig = engine._sweep_square_blocked

    def spy(*a, **k):
        called["yes"] = True
        return orig(*a, **k)

    monkeypatch.setattr(engine, "_sweep_square_blocked", spy)
    fasta = make_fasta(random_seqs(rng, 40, 90, amb_frac=0.2))
    got, _ = run_engine("raw", fasta, backend="xla", tile_i=8, tile_j=8)
    assert called.get("yes")
    assert got == expected_square("raw", fasta)


def test_blocked_with_diverse_data_refetch(tiny_budgets):
    """Blocked sweep + narrow saturation (wide refetch) together."""
    rng = np.random.default_rng(55)
    width = 600
    base1 = rng.choice(list("AG"), size=width)
    base2 = rng.choice(list("CT"), size=width)
    recs = []
    for i in range(24):
        src = base1 if i % 2 == 0 else base2
        s = src.copy()
        for p in rng.choice(width, 5, replace=False):
            s[p] = rng.choice(list("ACGT"))
        recs.append((f"s{i}", "".join(s)))
    fasta = ("".join(f">{r}\n{s}\n" for r, s in recs)).encode()
    got, _ = run_engine("k80", fasta, backend="xla", tile_i=8, tile_j=8)
    assert got == expected_square("k80", fasta)


@pytest.mark.parametrize("tile", [(8, 16), (8, 32), (16, 32)])
def test_blocked_unaligned_tiles(tile, monkeypatch, rng):
    """ti < tj with group rows not a multiple of tj: a group's first
    block starts before its column origin — regression test for the
    negative-offset clip (which silently wrapped the buffer before)."""
    ti, tj = tile
    # HOST_BUF_BUDGET small enough that group_rows == ti < tj
    monkeypatch.setattr(engine, "HBM_BUDGET_BYTES", 2000)
    monkeypatch.setattr(engine, "HOST_BUF_BUDGET", 70 * 4 * 2 * (ti + 1))
    fasta = make_fasta(random_seqs(rng, 70, 90, amb_frac=0.2))
    got, _ = run_engine("raw", fasta, backend="xla", tile_i=ti, tile_j=tj)
    assert got == expected_square("raw", fasta)


def test_blocked_rel4_masks_self_pairs(tiny_budgets, monkeypatch):
    """Out-of-core rel4: self-pair cells (whose residual -2*d_i would
    saturate for records >3 diffs from the reference) must be masked via
    the staged row groups' GLOBAL offsets — every rel-family unpack
    succeeds, no refetch."""
    from tests.test_packing import _count_rel_unpacks

    rng = np.random.default_rng(66)
    width = 512
    ancestor = rng.choice(list("ACGT"), size=width)
    nxt = {"A": "C", "C": "G", "G": "T", "T": "A"}
    recs = []
    for i in range(24):
        s = ancestor.copy()
        # ~16 private mutations -> self-pair residual -32, saturating the
        # nibble but NOT the pairwise overlaps (private columns)
        for p in range(i * 16, (i + 1) * 16):
            s[p % width] = nxt[s[p % width]]
        recs.append((f"s{i}", "".join(s)))
    fasta = ("".join(f">{r}\n{q}\n" for r, q in recs)).encode()
    outcomes = _count_rel_unpacks(monkeypatch)
    got, _ = run_engine("raw", fasta, backend="xla", tile_i=8, tile_j=8)
    assert got == expected_square("raw", fasta)
    assert outcomes and all(outcomes)


@pytest.mark.parametrize("measure", MEASURES)
def test_blocked_rectangle_parity(measure, tiny_budgets, rng):
    """Two-file (rectangle) out-of-core staging: tiny budgets force
    multiple X groups AND Y super-rows; bytes must equal the in-core
    oracle (reference capability: lib.rs:551-596 bounds two-file mode by
    host RAM only)."""
    f1 = make_fasta(random_seqs(rng, 37, 90, amb_frac=0.2))
    f2 = make_fasta(random_seqs(rng, 23, 90, amb_frac=0.2))
    got, _ = run_engine(measure, f1, f2, backend="xla", tile_i=8, tile_j=8)
    assert got == expected_rect(measure, f1, f2)


def test_blocked_rectangle_path_is_taken(tiny_budgets, rng, monkeypatch):
    called = {}
    orig = engine._sweep_rectangle_blocked

    def spy(*a, **k):
        called["yes"] = True
        return orig(*a, **k)

    monkeypatch.setattr(engine, "_sweep_rectangle_blocked", spy)
    f1 = make_fasta(random_seqs(rng, 37, 90, amb_frac=0.2))
    f2 = make_fasta(random_seqs(rng, 23, 90, amb_frac=0.2))
    got, _ = run_engine("raw", f1, f2, backend="xla", tile_i=8, tile_j=8)
    assert called.get("yes")
    assert got == expected_rect("raw", f1, f2)


@pytest.mark.parametrize("tile", [(8, 16), (16, 8)])
def test_blocked_rectangle_mixed_tiles(tile, tiny_budgets, rng):
    ti, tj = tile
    f1 = make_fasta(random_seqs(rng, 37, 90, amb_frac=0.2))
    f2 = make_fasta(random_seqs(rng, 23, 90, amb_frac=0.2))
    got, _ = run_engine("jc69", f1, f2, backend="xla", tile_i=ti, tile_j=tj)
    assert got == expected_rect("jc69", f1, f2)


def test_blocked_rectangle_resume(tiny_budgets, rng, tmp_path, monkeypatch):
    """--resume across the blocked rectangle: interrupt after two strip
    checkpoints, resume must complete to byte-identical output."""
    import io

    from distance_tpu.engine import Setup, run
    from distance_tpu.fastaio import load_fastas
    from distance_tpu.progress import ProgressTracker
    from distance_tpu.writer import TsvWriter

    f1 = make_fasta(random_seqs(rng, 37, 90, amb_frac=0.2))
    f2 = make_fasta(random_seqs(rng, 23, 90, amb_frac=0.2))
    want = expected_rect("raw", f1, f2)
    out_path = tmp_path / "out.tsv"

    def make_setup(resume):
        loaded = load_fastas([io.BytesIO(f1), io.BytesIO(f2)])
        tracker = ProgressTracker(str(out_path))
        if resume and tracker.load():
            out = open(out_path, "r+b")
            out.truncate(tracker.byte_offset)
            out.seek(tracker.byte_offset)
        else:
            out = open(out_path, "wb")
        return Setup(
            loaded=loaded, streamed=None, writer=TsvWriter(out),
            measure="raw", n_threads=1, batchsize=1, backend="xla",
            consensus=None, tile_i=8, tile_j=8, progress=tracker,
        )

    class Boom(Exception):
        pass

    marks = {"n": 0}
    orig = engine._progress_mark

    def bomb(setup, units):
        orig(setup, units)
        marks["n"] += 1
        if marks["n"] >= 2:
            raise Boom()

    monkeypatch.setattr(engine, "_progress_mark", bomb)
    with pytest.raises(Boom):
        run(make_setup(False))
    monkeypatch.setattr(engine, "_progress_mark", orig)
    run(make_setup(True))
    assert out_path.read_bytes() == want


@pytest.mark.parametrize("measure", ["raw", "tn93", "n_high"])
def test_staged_stream_parity(measure, tiny_budgets, rng, monkeypatch):
    """Stream mode with a loaded side larger than the HBM budget: the
    loaded matrix stays host-resident and every dispatch group sweeps it
    in staged super-rows (reference memory model: lib.rs:269-365 bounds
    stream mode by host RAM only).  Bytes must equal the in-core path."""
    monkeypatch.setenv("DISTANCE_TPU_STREAM_GROUP", "4")
    called = {}
    orig = engine._dispatch_stream_staged

    def spy(*a, **k):
        called["yes"] = True
        return orig(*a, **k)

    monkeypatch.setattr(engine, "_dispatch_stream_staged", spy)
    f1 = make_fasta(random_seqs(rng, 33, 90, amb_frac=0.2))
    f2 = make_fasta(random_seqs(rng, 21, 90, amb_frac=0.2))
    want, _ = run_engine(measure, f1, stream=f2, backend="numpy")
    got, _ = run_engine(measure, f1, stream=f2, backend="xla", tile_i=8)
    assert called.get("yes"), "staged stream path never engaged"
    assert got == want


def test_staged_stream_batchsize_independence(tiny_budgets, rng, monkeypatch):
    f1 = make_fasta(random_seqs(rng, 33, 90, amb_frac=0.2))
    f2 = make_fasta(random_seqs(rng, 21, 90, amb_frac=0.2))
    monkeypatch.setenv("DISTANCE_TPU_STREAM_GROUP", "4")
    want, _ = run_engine("jc69", f1, stream=f2, backend="xla", tile_i=8)
    for b in (1, 3, 7):
        got, _ = run_engine("jc69", f1, stream=f2, backend="xla",
                            tile_i=8, batchsize=b)
        assert got == want


def test_rel4_patched_minus8_is_not_saturation():
    """A residual of exactly -8 travels in the sidecar; once patched the
    cell must not read as an unpatched sentinel."""
    from distance_tpu.engine import _unpack_rel_parts
    from distance_tpu.ops.packing import pack_device_rel4

    G, m, n = 2, 4, 8
    rb = np.zeros((G, m), np.int32)
    cb = np.zeros((G, n), np.int32)
    cc = np.zeros(G, np.int32)
    c = np.zeros((G, m, n), np.int32)
    c[1, 2, 3] = -8
    lanes, exc_idx, exc_val = pack_device_rel4(c, rb, cb, cc, np)
    rb_cc = np.concatenate([rb, cc[:, None]], axis=1)
    counters, was4 = _unpack_rel_parts(
        None, (lanes, cb, rb_cc, exc_idx, exc_val), m, n
    )
    assert was4
    assert counters is not None and np.array_equal(counters, c)


def test_stream_group_env_rounds_to_even(monkeypatch):
    """Odd DISTANCE_TPU_STREAM_GROUP values round up: rel4 nibble lanes
    pack the streamed axis two per byte."""
    from distance_tpu.engine import _stream_group_rows

    monkeypatch.setenv("DISTANCE_TPU_STREAM_GROUP", "501")
    assert _stream_group_rows(100) == 502
    monkeypatch.setenv("DISTANCE_TPU_STREAM_GROUP", "1")
    assert _stream_group_rows(100) == 2


def _interrupted_run(make_setup, monkeypatch, marks_before_boom=2):
    """Run, raise after N progress marks, then resume to completion."""
    from distance_tpu.engine import run

    class Boom(Exception):
        pass

    marks = {"n": 0}
    orig = engine._progress_mark

    def bomb(setup, units):
        orig(setup, units)
        marks["n"] += 1
        if marks["n"] >= marks_before_boom:
            raise Boom()

    monkeypatch.setattr(engine, "_progress_mark", bomb)
    with pytest.raises(Boom):
        run(make_setup(False))
    monkeypatch.setattr(engine, "_progress_mark", orig)
    run(make_setup(True))


def test_blocked_rectangle_resume_misaligned_tiles(
    tiny_budgets, rng, tmp_path, monkeypatch
):
    """Resume with ti > tj through the blocked rectangle: group_rows
    must stay ti-aligned or the strip ordinals (abs_i0 - row_lo) // ti
    collide across groups and --resume silently SKIPS never-emitted
    strips (regression: group_rows used tj-aligned sr_rows, so ti=16 /
    tj=8 under a tiny HBM budget produced 8-row groups that all mapped
    to the same ordinal)."""
    import io

    from distance_tpu.engine import Setup
    from distance_tpu.fastaio import load_fastas
    from distance_tpu.progress import ProgressTracker
    from distance_tpu.writer import TsvWriter

    f1 = make_fasta(random_seqs(rng, 37, 90, amb_frac=0.2))
    f2 = make_fasta(random_seqs(rng, 23, 90, amb_frac=0.2))
    want = expected_rect("raw", f1, f2)
    out_path = tmp_path / "out.tsv"

    def make_setup(resume):
        loaded = load_fastas([io.BytesIO(f1), io.BytesIO(f2)])
        tracker = ProgressTracker(str(out_path))
        if resume and tracker.load():
            out = open(out_path, "r+b")
            out.truncate(tracker.byte_offset)
            out.seek(tracker.byte_offset)
        else:
            out = open(out_path, "wb")
        return Setup(
            loaded=loaded, streamed=None, writer=TsvWriter(out),
            measure="raw", n_threads=1, batchsize=1, backend="xla",
            consensus=None, tile_i=16, tile_j=8, progress=tracker,
        )

    # single-device: the 8-virtual-device conftest mesh makes
    # _choose_tiles round tj up to a multiple of ti, which masks the
    # misalignment — production single-chip runs don't get that rounding
    import jax

    monkeypatch.setattr(jax, "device_count", lambda *a, **k: 1)
    # interrupt at the FIRST mark: pre-fix, resume (done=1) then skips
    # the second 8-row group whose ordinal also floored to 0 — rows
    # 8..15 vanished from the output
    _interrupted_run(make_setup, monkeypatch, marks_before_boom=1)
    assert out_path.read_bytes() == want


def test_blocked_square_resume_misaligned_tiles(
    tiny_budgets, rng, tmp_path, monkeypatch
):
    """Same ordinal-alignment property through the blocked SQUARE sweep
    (ti != tj happens there too: auto tiles differ when n1 >> n2, and
    Setup.tile_i/tile_j are independently settable)."""
    import io

    from distance_tpu.engine import Setup
    from distance_tpu.fastaio import load_fastas
    from distance_tpu.progress import ProgressTracker
    from distance_tpu.writer import TsvWriter

    fasta = make_fasta(random_seqs(rng, 52, 90, amb_frac=0.2))
    want = expected_square("raw", fasta)
    out_path = tmp_path / "out.tsv"

    def make_setup(resume):
        loaded = load_fastas([io.BytesIO(fasta)])
        tracker = ProgressTracker(str(out_path))
        if resume and tracker.load():
            out = open(out_path, "r+b")
            out.truncate(tracker.byte_offset)
            out.seek(tracker.byte_offset)
        else:
            out = open(out_path, "wb")
        return Setup(
            loaded=loaded, streamed=None, writer=TsvWriter(out),
            measure="raw", n_threads=1, batchsize=1, backend="xla",
            consensus=None, tile_i=16, tile_j=8, progress=tracker,
        )

    import jax

    monkeypatch.setattr(jax, "device_count", lambda *a, **k: 1)
    _interrupted_run(make_setup, monkeypatch, marks_before_boom=1)
    assert out_path.read_bytes() == want


def test_staged_stream_group_rows_bounded_by_host_budget(rng, monkeypatch):
    """Staged groups assemble (C, n1, bn) int32 host buffers; bn must be
    capped so one buffer fits HOST_BUF_BUDGET (a loaded side big enough
    to trigger staging would otherwise hold tens of GB across the
    in-flight groups)."""
    monkeypatch.setattr(engine, "HBM_BUDGET_BYTES", 2000)
    # raw has 2 counters: bytes_per_col = 4 * 2 * n1 = 264 at n1=33;
    # group buffers get HALF the budget (the other half is the
    # _StagedSide memo cap): cap_rows = floor(2000/264) down to even = 6
    monkeypatch.setattr(engine, "HOST_BUF_BUDGET", 4000)
    # the production 256-row floor would swallow the 14-row budget cap
    # (and exceed the 40 streamed rows entirely, making any assertion
    # vacuous); drop it so HOST_BUF_BUDGET is the binding constraint
    monkeypatch.setattr(engine, "STAGED_ROWS_FLOOR", 2)
    monkeypatch.delenv("DISTANCE_TPU_STREAM_GROUP", raising=False)
    seen = []
    orig = engine._dispatch_stream_staged

    def spy(eng, lside, padded, rows_pad, mode, bn, n1, ti, sr_rows):
        seen.append(bn)
        return orig(eng, lside, padded, rows_pad, mode, bn, n1, ti,
                    sr_rows)

    monkeypatch.setattr(engine, "_dispatch_stream_staged", spy)
    f1 = make_fasta(random_seqs(rng, 33, 90, amb_frac=0.2))
    f2 = make_fasta(random_seqs(rng, 40, 90, amb_frac=0.2))
    want, _ = run_engine("raw", f1, stream=f2, backend="numpy")
    got, _ = run_engine("raw", f1, stream=f2, backend="xla", tile_i=8)
    assert got == want
    assert seen, "staged path never engaged"
    n1 = 33
    # engine formula: half the budget for buffers, rounded down to even
    cap_rows = 4000 // 2 // (4 * 2 * n1) // 2 * 2  # = 6 < 40 streamed rows
    assert cap_rows == 6
    assert all(bn <= cap_rows for bn in seen), (seen, cap_rows)


def test_staged_side_cross_group_reuse(rng, monkeypatch):
    """The round-5 item: staged super-rows must reuse work across X
    groups — the host diff encoding computes once per super-row ever,
    and the serpentine boundary super-row is a device hit (no prepare
    at all)."""
    monkeypatch.setattr(engine, "HBM_BUDGET_BYTES", 2000)
    import distance_tpu.ops.diffup as diffup

    gets = []
    orig_get = engine._StagedSide.get

    def spy_get(self, q0, q1):
        gets.append((q0, q1, self._key == (q0, q1)))
        return orig_get(self, q0, q1)

    # per-prepare bookkeeping: was a memo provided, and did it already
    # hold an encoding (=> the host encode passes must be skipped)?
    prepares = []
    orig_prepare = engine._BlockEngine.prepare

    def spy_prepare(self, matrix, *a, **kw):
        memo = kw.get("h2d_memo")
        prepares.append((memo is not None, memo is not None and "enc" in memo))
        return orig_prepare(self, matrix, *a, **kw)

    encodes = []
    orig_enc = diffup.DiffUploader.encode

    def spy_enc(self, padded, n_real=None):
        encodes.append(padded.shape)
        return orig_enc(self, padded, n_real=n_real)

    monkeypatch.setattr(engine._StagedSide, "get", spy_get)
    monkeypatch.setattr(engine._BlockEngine, "prepare", spy_prepare)
    monkeypatch.setattr(diffup.DiffUploader, "encode", spy_enc)
    # force the encoding to always win so the memo path is the one
    # under test
    monkeypatch.setenv("DISTANCE_TPU_DIFF_UPLOAD", "force")
    fasta = make_fasta(random_seqs(rng, 40, 90, amb_frac=0.2))
    got, _ = run_engine("raw", fasta, backend="xla", tile_i=8, tile_j=8)
    assert got == expected_square("raw", fasta)
    assert len(gets) > len(set(g[:2] for g in gets)), (
        "fixture never re-staged a super-row", gets,
    )
    assert any(hit for *_s, hit in gets), (
        "serpentine boundary super-row was never a device hit", gets,
    )
    # every re-staging that missed the device cache must still skip the
    # host encode: y-side encodes (prepares given a memo WITHOUT a
    # cached encoding) == distinct spans, and total encodes == that
    # plus the memo-less X-group prepares
    distinct = len(set(g[:2] for g in gets))
    y_first = sum(1 for has_memo, had in prepares if has_memo and not had)
    x_prepares = sum(1 for has_memo, _h in prepares if not has_memo)
    assert y_first == distinct, (prepares, gets)
    assert len(encodes) == distinct + x_prepares, (encodes, prepares)
