"""Native C FASTA parser must match the Python parser exactly —
alignments, ids, descriptions, and error messages."""

import io

import numpy as np
import pytest

import distance_tpu.fastaio as fio
from distance_tpu._native import get_lib
from distance_tpu.fastaio import DistanceError

needs_native = pytest.mark.skipif(get_lib() is None, reason="no C toolchain")


def both_paths(data: bytes):
    py = fio._load_fasta_python(data)
    nat = fio._load_fasta_native(data)
    return py, nat


def assert_equal_alignments(a, b):
    assert a.ids == b.ids
    assert a.descriptions == b.descriptions
    assert np.array_equal(a.matrix, b.matrix)


@needs_native
@pytest.mark.parametrize("data", [
    b">a\nACGT\n>b\nTTTT\n",
    b">a desc here\nACGT\n>b  two  words\nacgt\n",
    b">a\nAC\nGT\n>b\nACGT\n",                       # multi-line
    b">a\r\nACGT\r\n>b\r\nNRYK\r\n",                 # CRLF
    b">a\nACGT \n>b\nACGT\n",                        # trailing blank
    b">lone\nACGTRMWSKYVHDBN-?\n",                   # all codes
    b">a\nACGT",                                      # no trailing newline
    b">a\n\nAC\n\nGT\n>b\nACGT\n\n",                 # blank lines
    # header tokenization must mirror str.split(maxsplit=1): leading
    # whitespace after '>' is skipped, the id ends at ANY ASCII
    # whitespace, and desc keeps its trailing spaces (round-5 review
    # finding: the native id came out '' for '> seq1 desc')
    b"> seq1 some desc\nACGT\n>b\nTTTT\n",           # leading space
    b">a\x0bx desc\nACGT\n>b\nTTTT\n",               # \v splits the id
    b">\t lead\nACGT\n>b\nTTTT\n",                   # tab+space lead
    b">  \nACGT\n>b\nTTTT\n",                        # whitespace-only hdr
    b">id\tdesc with\ttabs  \nACGT\n>b\nTTTT\n",     # desc keeps tail ws
    b">id \x0c x\nACGT\n>b\nTTTT\n",                 # \f in the ws run
    b">id\x1cdesc\nACGT\n>b\nTTTT\n",                # \x1c splits the id
    b">a\x1e b\x1fc\nACGT\n>b\nTTTT\n",              # 0x1c-0x1f are ws
])
def test_paths_agree(data):
    py, nat = both_paths(data)
    assert_equal_alignments(py, nat)


@needs_native
def test_large_random_agrees(rng):
    from tests.conftest import make_fasta, random_seqs

    data = make_fasta(random_seqs(rng, 200, 311, amb_frac=0.3))
    py, nat = both_paths(data)
    assert_equal_alignments(py, nat)


@needs_native
@pytest.mark.parametrize("data,msg", [
    (b">a\nACGZ\n", "Invalid nucleotide character in record 'a': 'Z'"),
    (b">a\nACGT\n>b\nACG\n",
     "Different length sequences in alignment(s): 3 vs 4"),
    (b">a\nACGT\n>b\nACGTA\n",
     "Different length sequences in alignment(s): 5 vs 4"),
])
def test_error_messages_agree(data, msg):
    with pytest.raises(DistanceError) as e1:
        fio._load_fasta_python(data)
    with pytest.raises(DistanceError) as e2:
        fio._load_fasta_native(data)
    assert str(e1.value) == msg
    assert str(e2.value) == msg


@needs_native
def test_native_used_for_large_files(monkeypatch, rng):
    from tests.conftest import make_fasta, random_seqs

    monkeypatch.setattr(fio, "NATIVE_PARSE_MIN_BYTES", 10)
    called = {}
    orig = fio._load_fasta_native

    def spy(data):
        called["yes"] = True
        return orig(data)

    monkeypatch.setattr(fio, "_load_fasta_native", spy)
    data = make_fasta(random_seqs(rng, 5, 50))
    aln = fio.load_fasta(io.BytesIO(data))
    assert called.get("yes")
    assert aln.n == 5


@needs_native
def test_parallel_stream_parse_order_and_parity(rng, monkeypatch):
    """Pieces parse concurrently but records must yield in exact stream
    order, with tallies, across many tiny pieces."""
    from tests.conftest import make_fasta, random_seqs

    recs = random_seqs(rng, 120, 64, amb_frac=0.2)
    data = make_fasta(recs)
    monkeypatch.setattr(fio, "STREAM_READ_BYTES", 128)  # many pieces
    monkeypatch.setenv("DISTANCE_TPU_STREAM_PARSE_WORKERS", "4")
    par = list(fio._stream_records_native(io.BytesIO(data), 64, True))
    monkeypatch.setenv("DISTANCE_TPU_STREAM_PARSE_WORKERS", "1")
    ser = list(fio._stream_records_native(io.BytesIO(data), 64, True))
    assert [r[0] for r in par] == [r[0] for r in ser] == [
        r for r, _s in recs
    ]
    for (ia, ma, ta), (ib, mb, tb) in zip(par, ser):
        assert np.array_equal(ma, mb)
        assert np.array_equal(ta, tb)


@needs_native
def test_parallel_stream_parse_midstream_error_order(rng, monkeypatch):
    """A bad record in a late piece must surface only after every
    earlier record has been yielded (reference semantics: batches sent
    before the reader failed are all emitted, lib.rs:322-341)."""
    from tests.conftest import make_fasta, random_seqs

    good = random_seqs(rng, 40, 64, amb_frac=0.2)
    data = make_fasta(good) + b">bad\n" + b"Z" * 64 + b"\n"
    monkeypatch.setattr(fio, "STREAM_READ_BYTES", 128)
    monkeypatch.setenv("DISTANCE_TPU_STREAM_PARSE_WORKERS", "4")
    seen = []
    with pytest.raises(DistanceError) as e:
        for rid, _m, _t in fio._stream_records_native(
            io.BytesIO(data), 64, False
        ):
            seen.append(rid)
    assert str(e.value) == (
        "Invalid nucleotide character in record 'bad': 'Z'"
    )
    assert seen == [r for r, _s in good]


@needs_native
def test_parallel_stream_parse_reader_failure_drains_parsed(
    rng, monkeypatch
):
    """A reader I/O failure (handle.read raising mid-stream) must not
    drop pieces that were already fully read and parsed: the serial
    loop emits each piece before the next read, so the parallel path
    has to drain its in-flight pieces before re-raising."""
    from tests.conftest import make_fasta, random_seqs

    good = random_seqs(rng, 60, 64, amb_frac=0.2)
    data = make_fasta(good)

    class BoomAfter:
        """Serves the whole FASTA, then raises instead of EOF."""

        def __init__(self, payload: bytes):
            self._buf = io.BytesIO(payload)

        def read(self, n: int = -1) -> bytes:
            chunk = self._buf.read(n)
            if not chunk:
                raise OSError("reader died")
            return chunk

    monkeypatch.setattr(fio, "STREAM_READ_BYTES", 128)  # many pieces

    def drive(workers: str) -> list:
        monkeypatch.setenv("DISTANCE_TPU_STREAM_PARSE_WORKERS", workers)
        seen = []
        with pytest.raises(OSError, match="reader died"):
            for rid, _m, _t in fio._stream_records_native(
                BoomAfter(data), 64, False
            ):
                seen.append(rid)
        return seen

    ser = drive("1")
    par = drive("4")
    # serial emits each piece before the next read, so everything except
    # _read_pieces' final carry surfaces; parallel must match exactly
    assert len(ser) >= 50
    assert par == ser


@needs_native
def test_parallel_parse_error_yields_no_later_records(rng, monkeypatch):
    """A bad record in an EARLY piece: records from LATER pieces must
    never be yielded (the serial path stops at the bad record; the
    reader-failure drain must not apply to emit-side errors)."""
    from tests.conftest import make_fasta, random_seqs

    head = random_seqs(rng, 3, 64, amb_frac=0.2)
    tail = [(f"g{i}", s) for i, (_r, s) in
            enumerate(random_seqs(rng, 40, 64, amb_frac=0.2))]
    data = (
        make_fasta(head)
        + b">bad\n" + b"Z" * 64 + b"\n"
        + make_fasta(tail)
    )
    monkeypatch.setattr(fio, "STREAM_READ_BYTES", 128)

    def drive(workers: str) -> list:
        monkeypatch.setenv("DISTANCE_TPU_STREAM_PARSE_WORKERS", workers)
        seen = []
        with pytest.raises(DistanceError, match="record 'bad'"):
            for rid, _m, _t in fio._stream_records_native(
                io.BytesIO(data), 64, False
            ):
                seen.append(rid)
        return seen

    ser = drive("1")
    par = drive("4")
    assert par == ser
    assert not any(r.startswith("g") for r in par), par


@needs_native
def test_native_junk_file_error_matches_python():
    """A file with no '>' at all must raise the same precise error on
    the native path as the Python path (it raised Empty FASTA before)."""
    junk = b"this is not fasta\nat all\n"
    for fn in (fio._load_fasta_python, fio._load_fasta_native):
        with pytest.raises(DistanceError, match="Expected '>'"):
            fn(junk)


# ------------------------------------------------------------------ #
# Batch-aligned reader + zero-copy batch assembly (round 5)           #
# ------------------------------------------------------------------ #


@needs_native
def test_aligned_reader_piece_record_multiples(rng, monkeypatch):
    """With batch_rows > 0 every piece (except the last) holds an exact
    multiple of batch_rows records, cut at true record boundaries."""
    from tests.conftest import make_fasta, random_seqs

    recs = random_seqs(rng, 57, 32, amb_frac=0.1)
    data = make_fasta(recs)
    monkeypatch.setattr(fio, "STREAM_READ_BYTES", 256)  # several reads
    pieces = list(fio._read_pieces(io.BytesIO(data), 10))
    assert b"".join(p for p, _n in pieces) == data
    for p, n in pieces[:-1]:
        assert n % 10 == 0 and n > 0
        assert p.startswith(b">") or p is pieces[0][0]
        # n matches the parser's record-boundary rule exactly
        assert n == p.count(b"\n>") + (1 if p.startswith(b">") else 0)
    assert sum(n for _p, n in pieces) == 57


@needs_native
def test_aligned_reader_legacy_shape_when_unbatched(rng, monkeypatch):
    """batch_rows=0 keeps the legacy ~STREAM_READ_BYTES byte-cut pieces
    (the piece-semantics tests above rely on this shape)."""
    from tests.conftest import make_fasta, random_seqs

    data = make_fasta(random_seqs(rng, 40, 64))
    monkeypatch.setattr(fio, "STREAM_READ_BYTES", 300)
    pieces = list(fio._read_pieces(io.BytesIO(data), 0))
    assert b"".join(p for p, _n in pieces) == data
    assert len(pieces) > 5  # many small pieces, not one aligned slab


@needs_native
def test_stream_batches_are_zero_copy_views(rng, monkeypatch):
    """Production stream batches must assemble as views of one parsed
    piece (no per-batch copy) and stay byte-identical to the serial
    Python assembly."""
    from tests.conftest import make_fasta, random_seqs

    recs = random_seqs(rng, 60, 48, amb_frac=0.2)
    data = make_fasta(recs)
    monkeypatch.setenv("DISTANCE_TPU_STREAM_PARSE_WORKERS", "2")
    batches = list(
        fio.stream_fasta(io.BytesIO(data), 48, "tn93", None, 12)
    )
    assert sum(len(b.ids) for b in batches) == 60
    assert any(b.matrix.base is not None for b in batches)
    monkeypatch.setenv("DISTANCE_TPU_NO_NATIVE", "1")
    ser = list(
        fio.stream_fasta(io.BytesIO(data), 48, "tn93", None, 12)
    )
    assert [b.ids for b in batches] == [b.ids for b in ser]
    for a, b in zip(batches, ser):
        assert np.array_equal(a.matrix, b.matrix)
        assert np.array_equal(a.base_counts, b.base_counts)


@needs_native
def test_aligned_reader_error_parity_through_stream(rng, monkeypatch):
    """Mid-stream errors through the production (batch-aligned) path
    surface with the exact message after the exact prefix, matching the
    pure-Python path."""
    from tests.conftest import make_fasta, random_seqs

    good = random_seqs(rng, 25, 32, amb_frac=0.1)
    data = make_fasta(good) + b">bad\n" + b"J" * 32 + b"\n"

    def drive(no_native):
        if no_native:
            monkeypatch.setenv("DISTANCE_TPU_NO_NATIVE", "1")
        else:
            monkeypatch.delenv("DISTANCE_TPU_NO_NATIVE", raising=False)
        seen = []
        with pytest.raises(DistanceError) as e:
            for b in fio.stream_fasta(io.BytesIO(data), 32, "raw",
                                      None, 7):
                seen.extend(b.ids)
        return seen, str(e.value)

    nat = drive(False)
    py = drive(True)
    assert nat == py
    assert "record 'bad'" in nat[1]


@needs_native
def test_assemble_rows_mixed_sources(rng):
    """_assemble_rows: runs from a piece matrix, lone rows, and
    non-contiguous views all assemble to the vstack result."""
    base = rng.integers(1, 255, size=(10, 16), dtype=np.uint8)
    rows = [base[2], base[3], base[4],          # run
            rng.integers(1, 255, size=16, dtype=np.uint8),  # lone
            base[9], base[1],                    # non-contiguous views
            base[6], base[7]]                    # second run
    out = fio._assemble_rows(rows, 16)
    assert np.array_equal(out, np.vstack(rows))
    # single full run returns a view, not a copy
    v = fio._assemble_rows([base[4], base[5], base[6]], 16)
    assert v.base is base and np.array_equal(v, base[4:7])
