"""FASTA I/O parity: encode, load, errors, consensus, differences, stream.

Mirrors the reference's fastaio tests (/root/reference/src/fastaio.rs:338-485)
plus the error paths the reference leaves uncovered.
"""

import io

import numpy as np
import pytest

from distance_tpu.fastaio import (
    Alignment,
    DistanceError,
    consensus,
    encode_seq,
    load_fasta,
    load_fastas,
    stream_fasta,
)

FASTA = b">target\nATGATGATGATGCCC\n"
OTHER = b">target\nATTATTATGATGCCC\n"


def load1(data: bytes) -> Alignment:
    return load_fasta(io.BytesIO(data))


def test_encode_exact_bytes():
    # fastaio.rs:380-389
    aln = load1(FASTA)
    expected = [136, 24, 72, 136, 24, 72, 136, 24, 72, 136, 24, 72, 40, 40, 40]
    assert aln.matrix[0].tolist() == expected


def test_encode_lowercase():
    a = encode_seq("x", b"acgt")
    b = encode_seq("x", b"ACGT")
    assert np.array_equal(a, b)


def test_invalid_nucleotide_message():
    with pytest.raises(DistanceError) as e:
        encode_seq("recX", b"ATGZTT")
    assert str(e.value) == "Invalid nucleotide character in record 'recX': 'Z'"


def test_invalid_reports_first_bad_char():
    with pytest.raises(DistanceError) as e:
        encode_seq("r", b"AXZB")
    assert "'X'" in str(e.value)


def test_count_bases():
    # fastaio.rs:359-367
    aln = load1(FASTA)
    aln.count_bases()
    a, t, g, c = aln.base_counts[0]
    assert (a, t, g, c) == (4, 4, 4, 3)


def test_count_bases_counts_lowercase():
    aln = load1(b">x\natgc\n")
    aln.count_bases()
    assert aln.base_counts[0].tolist() == [1, 1, 1, 1]


def _reference_differences(row, cons):
    """Reference fastaio.rs:67-75 semantics (local oracle): sorted
    indices differing from the consensus, excluding self codes >= 240
    (N, -, ?).  The engine keeps no per-record lists — its invariant-
    column pruning generalizes this sparsification — so the semantics
    are pinned here as documentation of why that is sound."""
    import numpy as _np

    mask = (row < 240) & (row != cons)
    return _np.flatnonzero(mask)


def test_reference_difference_semantics():
    # fastaio.rs:370-377
    rec = load1(FASTA)
    oth = load1(OTHER)
    assert _reference_differences(rec.matrix[0], oth.matrix[0]).tolist() == [2, 5]


def test_reference_differences_skip_n_gap_q():
    rec = load1(b">x\nNT-C?\n")
    cons = encode_seq("c", b"AAAAA")
    # N (240), - (244), ? (242) are self codes >= 240 -> excluded
    assert _reference_differences(rec.matrix[0], cons).tolist() == [1, 3]


def test_load_ragged_widths():
    data = b">a\nACGT\n>b\nACG\n"
    with pytest.raises(DistanceError) as e:
        load1(data)
    assert str(e.value) == "Different length sequences in alignment(s): 3 vs 4"


def test_load_empty():
    with pytest.raises(DistanceError) as e:
        load1(b"")
    assert str(e.value) == "Empty FASTA file"


def test_load_fastas_cross_width():
    with pytest.raises(DistanceError) as e:
        load_fastas([io.BytesIO(b">a\nACGT\n"), io.BytesIO(b">b\nACGTA\n")])
    assert str(e.value) == "Different length sequences in alignment(s): 4 vs 5"


def test_multiline_records_and_description():
    aln = load1(b">id1 some description here\nACG\nT\n>id2\nAAAA\n")
    assert aln.ids == ["id1", "id2"]
    assert aln.descriptions[0] == "some description here"
    assert aln.width == 4


def test_consensus_reference_vectors():
    # fastaio.rs:425-454
    rec = load1(FASTA)
    oth = load1(OTHER)
    both = Alignment(
        ids=["a", "b"],
        descriptions=["", ""],
        matrix=np.vstack([rec.matrix, oth.matrix]),
    )
    c = consensus([both])
    assert c.tolist() == [136, 24, 72, 136, 24, 72, 136, 24, 72, 136, 24, 72, 40, 40, 40]

    only_other = Alignment(
        ids=["a", "b"],
        descriptions=["", ""],
        matrix=np.vstack([oth.matrix, oth.matrix]),
    )
    c = consensus([only_other])
    assert c.tolist() == [136, 24, 24, 136, 24, 24, 136, 24, 72, 136, 24, 72, 40, 40, 40]


def test_consensus_tie_priority():
    # strict > keeps the first max in order A > G > C > T
    # (fastaio.rs:320-330); non-ACGT codes tally as A (298-302).
    aln = load1(b">a\nGT\n>b\nTG\n")
    c = consensus([aln])
    assert c.tolist() == [72, 72]  # G beats T on ties
    aln2 = load1(b">a\nNC\n>b\nCN\n")
    # N tallies as A; tie between A and C -> A wins
    c2 = consensus([aln2])
    assert c2.tolist() == [136, 136]


def test_stream_batches_and_order():
    data = b">r1\nACGT\n>r2\nACGA\n>r3\nACGC\n"
    batches = list(stream_fasta(io.BytesIO(data), 4, "raw", None, 2))
    assert [b.idx for b in batches] == [0, 1]
    assert batches[0].ids == ["r1", "r2"]
    assert batches[1].ids == ["r3"]
    assert batches[0].matrix.shape == (2, 4)


def test_stream_width_check():
    data = b">r1\nACG\n"
    with pytest.raises(DistanceError) as e:
        list(stream_fasta(io.BytesIO(data), 4, "raw", None, 1))
    assert str(e.value) == "Different length sequences in alignment(s): 3 vs 4"


def test_stream_empty():
    with pytest.raises(DistanceError) as e:
        list(stream_fasta(io.BytesIO(b""), 4, "raw", None, 1))
    assert str(e.value) == "Empty FASTA file"


def test_stream_n_requires_consensus():
    # fastaio.rs:233-240
    with pytest.raises(DistanceError) as e:
        list(stream_fasta(io.BytesIO(b">r\nACGT\n"), 4, "n", None, 1))
    assert "consensus" in str(e.value)


def test_stream_tn93_uppercase_only_quirk():
    # The reference's streamed tn93 path counts raw upper-case chars only
    # (fastaio.rs:124-142) unlike the loaded path — reproduced verbatim.
    data = b">r\nacgtACGT\n"
    [batch] = list(stream_fasta(io.BytesIO(data), 8, "tn93", None, 1))
    assert batch.base_counts[0].tolist() == [1, 1, 1, 1]


# ---------------------------------------------------------------------------
# Whitespace trim semantics (rust-bio trim_end parity across both parsers)
# ---------------------------------------------------------------------------

def _native_or_skip():
    from distance_tpu._native import get_lib

    if get_lib() is None:
        pytest.skip("native library unavailable")


def _load_native(data: bytes):
    from distance_tpu.fastaio import _load_fasta_native

    return _load_fasta_native(data)


def test_trailing_whitespace_trimmed_both_paths():
    # rust-bio trim_end removes trailing space/tab/CR/VT/FF
    data = b">a\nACGT \t\x0b\x0c\r\n>b\nAC\nGT\t \n"
    a1 = load1(data)
    assert a1.width == 4 and a1.n == 2
    _native_or_skip()
    a2 = _load_native(data)
    assert np.array_equal(a1.matrix, a2.matrix)
    assert a1.ids == a2.ids


@pytest.mark.parametrize(
    "data,badchar",
    [
        (b">a\n ACGT\n", " "),        # leading space reaches the encoder
        (b">a\n\x0bACGT\n", "\x0b"),  # leading VT
        (b">a\nAC GT\n", " "),        # embedded space
    ],
)
def test_nonend_whitespace_is_invalid_both_paths(data, badchar):
    with pytest.raises(DistanceError) as e1:
        load1(data)
    assert f"'{badchar}'" in str(e1.value)
    _native_or_skip()
    with pytest.raises(DistanceError) as e2:
        _load_native(data)
    assert str(e1.value) == str(e2.value)


def test_native_stream_reader_tiny_chunks(monkeypatch):
    """The chunked native reader must split records correctly when the
    read granularity is smaller than one record (carry across reads),
    and match the Python reader batch-for-batch."""
    import io

    import distance_tpu.fastaio as fio

    rng = np.random.default_rng(12)
    from tests.conftest import make_fasta, random_seqs

    fasta = make_fasta(random_seqs(rng, 25, 70, amb_frac=0.2))
    monkeypatch.setattr(fio, "STREAM_READ_BYTES", 17)
    native = list(fio.stream_fasta(io.BytesIO(fasta), 70, "raw", None, 3))
    monkeypatch.setenv("DISTANCE_TPU_NO_NATIVE", "1")
    python = list(fio.stream_fasta(io.BytesIO(fasta), 70, "raw", None, 3))
    assert len(native) == len(python)
    for a, b in zip(native, python):
        assert a.ids == b.ids and a.idx == b.idx
        assert np.array_equal(a.matrix, b.matrix)


def test_native_stream_reader_error_order(monkeypatch):
    """A streamed record that is both ragged and contains an invalid
    byte reports the WIDTH error (checked before encoding,
    fastaio.rs:246-254), on the native path too."""
    import io

    import distance_tpu.fastaio as fio

    fasta = b">a\nACGT\n>bad\nACZ\n>c\nACGT\n"
    it = fio.stream_fasta(io.BytesIO(fasta), 4, "raw", None, 1)
    first = next(it)
    assert first.ids == ["a"]
    with pytest.raises(fio.DistanceError) as e:
        list(it)
    assert "Different length sequences" in str(e.value)


def test_count_bases_native_matches_numpy(monkeypatch):
    """The GIL-released native tally equals the numpy spelling on
    ambiguity-rich data, across odd shapes and the threaded split."""
    import distance_tpu.fastaio as fio
    from distance_tpu.encoding import ALL_CODES, A, C, G, T

    rng = np.random.default_rng(5)
    for shape in [(1, 7), (3, 1), (257, 129), (9000, 33)]:
        m = rng.choice(ALL_CODES, size=shape).astype(np.uint8)
        want = np.stack(
            [(m == v).sum(axis=1) for v in (A, T, G, C)], axis=1
        ).astype(np.int32)
        assert np.array_equal(fio._count_bases_host(m), want), shape
    # non-contiguous input falls back to the numpy path, same values
    m = rng.choice(ALL_CODES, size=(64, 64)).astype(np.uint8)[:, ::2]
    assert not m.flags["C_CONTIGUOUS"]
    want = np.stack(
        [(m == v).sum(axis=1) for v in (A, T, G, C)], axis=1
    ).astype(np.int32)
    assert np.array_equal(fio._count_bases_host(m), want)
