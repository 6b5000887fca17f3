"""End-to-end golden TSV parity.

The oracle is a serial per-pair evaluation with reference semantics (the
same determinism oracle the reference uses, SURVEY.md section 4): engine
output must be byte-identical across backends, tile sizes, and modes.
"""

import io

import numpy as np
import pytest

from distance_tpu.engine import Setup, run
from distance_tpu.fastaio import consensus as consensus_fn, load_fastas
from distance_tpu.measures import MEASURES
from distance_tpu.writer import TsvWriter
from tests.conftest import make_fasta, oracle_tsv, random_seqs


def run_engine(
    measure,
    fasta1,
    fasta2=None,
    stream=None,
    backend="numpy",
    tile_i=8,
    tile_j=8,
    batchsize=1,
):
    handles = [io.BytesIO(fasta1)]
    if fasta2 is not None:
        handles.append(io.BytesIO(fasta2))
    loaded = load_fastas(handles)
    cons = consensus_fn(loaded) if measure == "n" else None
    if measure == "tn93":
        for a in loaded:
            a.count_bases()
    out = io.BytesIO()
    setup = Setup(
        loaded=loaded,
        streamed=io.BytesIO(stream) if stream is not None else None,
        writer=TsvWriter(out),
        measure=measure,
        n_threads=1,
        batchsize=batchsize,
        backend=backend,
        consensus=cons,
        tile_i=tile_i,
        tile_j=tile_j,
    )
    run(setup)
    return out.getvalue(), loaded


def expected_square(measure, fasta):
    loaded = load_fastas([io.BytesIO(fasta)])
    if measure == "tn93":
        loaded[0].count_bases()
    return oracle_tsv(measure, loaded[0])


def expected_rect(measure, fasta1, fasta2):
    loaded = load_fastas([io.BytesIO(fasta1), io.BytesIO(fasta2)])
    if measure == "tn93":
        for a in loaded:
            a.count_bases()
    return oracle_tsv(measure, loaded[0], loaded[1])


@pytest.fixture(scope="module")
def small_fastas():
    rng = np.random.default_rng(42)
    f1 = make_fasta(random_seqs(rng, 13, 61, amb_frac=0.2))
    f2 = make_fasta(random_seqs(rng, 7, 61, amb_frac=0.2))
    return f1, f2


@pytest.mark.parametrize("measure", MEASURES)
@pytest.mark.parametrize("backend", ["numpy", "xla"])
def test_square_parity(measure, backend, small_fastas):
    f1, _ = small_fastas
    got, _ = run_engine(measure, f1, backend=backend)
    assert got == expected_square(measure, f1)


@pytest.mark.parametrize("measure", MEASURES)
@pytest.mark.parametrize("backend", ["numpy", "xla"])
def test_rectangle_parity(measure, backend, small_fastas):
    f1, f2 = small_fastas
    got, _ = run_engine(measure, f1, fasta2=f2, backend=backend)
    assert got == expected_rect(measure, f1, f2)


@pytest.mark.parametrize("tile", [(8, 8), (8, 16), (16, 8), (64, 64)])
def test_tile_size_independence(tile, small_fastas):
    f1, _ = small_fastas
    ti, tj = tile
    got, _ = run_engine("k80", f1, backend="xla", tile_i=ti, tile_j=tj)
    assert got == expected_square("k80", f1)


def test_reversed_input_order(small_fastas):
    # lib.rs:1134-1153: swapping the two inputs swaps rows/columns
    f1, f2 = small_fastas
    got, _ = run_engine("n_high", f2, fasta2=f1, backend="numpy")
    assert got == expected_rect("n_high", f2, f1)


def test_two_seq_minimal():
    fasta = b">seq1\nATGATG\n>seq2\nATGATC\n"
    got, _ = run_engine("n", fasta, backend="numpy")
    assert got == b"sequence1\tsequence2\tdistance\nseq1\tseq2\t1\n"


def test_single_record_square_header_only():
    got, _ = run_engine("raw", b">only\nACGT\n", backend="numpy")
    assert got == b"sequence1\tsequence2\tdistance\n"


@pytest.mark.parametrize("measure", MEASURES)
def test_stream_parity(measure, small_fastas):
    f1, f2 = small_fastas
    loaded = load_fastas([io.BytesIO(f1)])
    streamed_aln = load_fastas([io.BytesIO(f2)])[0]
    if measure == "tn93":
        loaded[0].count_bases()
        # The streamed path counts raw upper-case 'A','T','G','C' bytes
        # only (reference quirk, fastaio.rs:124-142) — build the oracle's
        # streamed-side counts the same way.
        import re

        recs = re.findall(rb">(\S+)[^\n]*\n([^>]*)", f2)
        counts = []
        for _rid, block in recs:
            seq = block.replace(b"\n", b"")
            counts.append(
                [seq.count(ch) for ch in (b"A", b"T", b"G", b"C")]
            )
        streamed_aln.base_counts = np.array(counts, dtype=np.int64)
    want = oracle_tsv(
        measure, loaded[0], streamed_aln, stream_ids=streamed_aln.ids
    )
    got, _ = run_engine(measure, f1, stream=f2, backend="numpy")
    assert got == want


def test_stream_batchsize_independence(small_fastas):
    f1, f2 = small_fastas
    outs = set()
    for b in (1, 2, 5):
        got, _ = run_engine("jc69", f1, stream=f2, backend="numpy", batchsize=b)
        outs.add(got)
    assert len(outs) == 1


def test_float_formatting_specials():
    # saturated jc69 -> inf; identical -> -0.000000000000
    fasta = b">a\nAAAG\n>b\nCCCG\n>c\nAAAG\n"
    got, _ = run_engine("jc69", fasta, backend="numpy")
    lines = got.decode().strip().split("\n")
    assert lines[1] == "a\tb\tinf"
    assert lines[2] == "a\tc\t-0.000000000000"
    # all-N pair -> NaN
    fasta2 = b">a\nNNNN\n>b\nNNNN\n"
    got2, _ = run_engine("raw", fasta2, backend="numpy")
    assert got2.decode().strip().split("\n")[1] == "a\tb\tNaN"


@pytest.mark.parametrize("backend", ["xla"])
def test_float_specials_through_device_path(backend):
    """NaN (all-ambiguous, narrow saturation -> wide refetch) and inf
    (jc69 saturation) must survive the packed device pipeline."""
    fasta = (
        b">n1\n" + b"N" * 16 + b"\n"
        b">n2\n" + b"N" * 16 + b"\n"
        b">s1\n" + b"AAAG" * 4 + b"\n"
        b">s2\n" + b"CCCG" * 4 + b"\n"
    )
    got, _ = run_engine("raw", fasta, backend=backend, tile_i=8, tile_j=8)
    assert got == expected_square("raw", fasta)
    assert b"NaN" in got
    got2, _ = run_engine("jc69", fasta, backend=backend, tile_i=8, tile_j=8)
    assert got2 == expected_square("jc69", fasta)


def test_combined_mesh_outofcore_shard(monkeypatch, rng):
    """8-device mesh + out-of-core budgets + sharding, all at once."""
    import distance_tpu.engine as engine
    from tests.test_sharding import run_shard

    monkeypatch.setattr(engine, "HBM_BUDGET_BYTES", 2500)
    monkeypatch.setattr(engine, "HOST_BUF_BUDGET", 60000)
    fasta = make_fasta(random_seqs(rng, 45, 100, amb_frac=0.25))
    parts = [run_shard("tn93", fasta, None, (k, 3), tile=8) for k in range(3)]
    assert b"".join(parts) == expected_square("tn93", fasta)
