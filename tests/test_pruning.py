"""Invariant-column pruning must be output-invariant (exact offsets)."""

import numpy as np
import pytest

from distance_tpu import engine
from distance_tpu.engine import _prune_invariant_columns
from distance_tpu.measures import MEASURES
from tests.test_golden import expected_rect, expected_square, run_engine


def low_diversity_fasta(rng, n, width, nmut=4):
    bases = list("ACGT")
    anc = rng.choice(bases, width)
    recs = []
    for i in range(n):
        s = anc.copy()
        for p in rng.choice(width, nmut, replace=False):
            s[p] = rng.choice(bases + ["N", "-", "R", "Y"])
        recs.append((f"q{i}", "".join(s)))
    return ("".join(f">{r}\n{s}\n" for r, s in recs)).encode()


@pytest.fixture(scope="module")
def fixtures():
    rng = np.random.default_rng(31)
    f1 = low_diversity_fasta(rng, 14, 300)
    f2 = low_diversity_fasta(rng, 6, 300)
    return f1, f2


def test_pruning_engages(fixtures):
    f1, _ = fixtures
    import io

    from distance_tpu.fastaio import load_fastas

    aln = load_fastas([io.BytesIO(f1)])[0]
    res = _prune_invariant_columns([aln.matrix])
    assert res is not None
    _, off, w = res
    assert w < aln.width
    assert off > 0


@pytest.mark.parametrize("measure", MEASURES)
@pytest.mark.parametrize("backend", ["numpy", "xla"])
def test_square_parity_with_pruning(measure, backend, fixtures):
    f1, _ = fixtures
    got, _ = run_engine(measure, f1, backend=backend)
    assert got == expected_square(measure, f1)


@pytest.mark.parametrize("measure", ["raw", "k80", "tn93"])
def test_rectangle_parity_with_pruning(measure, fixtures):
    f1, f2 = fixtures
    got, _ = run_engine(measure, f1, fasta2=f2, backend="xla")
    assert got == expected_rect(measure, f1, f2)


@pytest.mark.parametrize("measure", MEASURES)
def test_identical_sequences_full_prune(measure):
    # every column invariant -> pruned width 0
    fasta = b">a\nACGTACGT\n>b\nACGTACGT\n>c\nACGTACGT\n"
    got, _ = run_engine(measure, fasta, backend="xla")
    assert got == expected_square(measure, fasta)


def test_all_ambiguous_invariant_columns():
    # invariant columns of N contribute nothing (not +1 to same)
    fasta = b">a\nNNNNACGT\n>b\nNNNNACGA\n"
    for measure in MEASURES:
        got, _ = run_engine(measure, fasta, backend="xla")
        assert got == expected_square(measure, fasta), measure
