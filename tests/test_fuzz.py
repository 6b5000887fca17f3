"""Robustness fuzzing: the parsers must never crash with anything but
DistanceError, and both parse paths must agree on accept/reject."""

import io

import numpy as np
import pytest

import distance_tpu.fastaio as fio
from distance_tpu._native import get_lib
from distance_tpu.fastaio import DistanceError


def random_soup(rng, n):
    # biased toward FASTA-ish structure
    pieces = [b">", b"\n", b"\r\n", b"ACGT", b"acgtn", b"R-?", b" ",
              b"id1 desc", b"\t", b"NNN", b"Z", b"\x00\xff", b">rec"]
    return b"".join(
        pieces[rng.integers(0, len(pieces))] for _ in range(n)
    )


def outcome(fn, data):
    try:
        a = fn(data)
        return ("ok", a.ids, a.matrix.tobytes())
    except DistanceError as e:
        return ("err", str(e))


@pytest.mark.parametrize("seed", range(30))
def test_fuzz_python_parser_never_crashes(seed):
    rng = np.random.default_rng(seed)
    data = random_soup(rng, rng.integers(1, 120))
    outcome(fio._load_fasta_python, data)  # DistanceError or success only


@pytest.mark.skipif(get_lib() is None, reason="no C toolchain")
@pytest.mark.parametrize("seed", range(30))
def test_fuzz_paths_agree(seed):
    rng = np.random.default_rng(1000 + seed)
    data = random_soup(rng, rng.integers(1, 120))
    py = outcome(fio._load_fasta_python, data)
    nat = outcome(fio._load_fasta_native, data)
    assert py == nat, data


def test_stream_error_after_partial_output():
    """A mid-stream invalid record errors after earlier batches were
    already written (reference behavior: the writer thread has consumed
    earlier Distances)."""
    import distance_tpu.engine as engine
    from distance_tpu.engine import Setup, run
    from distance_tpu.fastaio import load_fastas
    from distance_tpu.writer import TsvWriter

    loaded = load_fastas([io.BytesIO(b">a\nACGT\n>b\nACGA\n")])
    stream = b">s1\nACGT\n>s2\nACGZ\n"
    out = io.BytesIO()
    setup = Setup(
        loaded=loaded, streamed=io.BytesIO(stream),
        writer=TsvWriter(out), measure="n_high",
        n_threads=1, batchsize=1, backend="numpy",
    )
    with pytest.raises(DistanceError, match="Invalid nucleotide"):
        run(setup)
    text = out.getvalue().decode()
    # batch for s1 was emitted before the error surfaced
    assert "a\ts1\t0" in text
    assert "s2" not in text


def stream_outcome(data, width, chunk=None, monkeypatch=None):
    if chunk is not None:
        monkeypatch.setattr(fio, "STREAM_READ_BYTES", chunk)
    try:
        batches = list(fio.stream_fasta(io.BytesIO(data), width, "raw",
                                        None, 2))
        return ("ok",
                [b.ids for b in batches],
                [b.matrix.tobytes() for b in batches])
    except DistanceError as e:
        return ("err", str(e))


@pytest.mark.skipif(get_lib() is None, reason="no C toolchain")
@pytest.mark.parametrize("seed", range(30))
def test_fuzz_stream_paths_agree(seed, monkeypatch):
    """Native chunked stream reader == Python reader on random soup,
    including at pathological read granularities (carry handling)."""
    rng = np.random.default_rng(2000 + seed)
    data = random_soup(rng, rng.integers(1, 120))
    width = int(rng.integers(1, 8))
    monkeypatch.delenv("DISTANCE_TPU_NO_NATIVE", raising=False)
    nat = stream_outcome(data, width, chunk=int(rng.integers(3, 40)),
                         monkeypatch=monkeypatch)
    monkeypatch.setenv("DISTANCE_TPU_NO_NATIVE", "1")
    py = stream_outcome(data, width)
    assert py == nat, data
