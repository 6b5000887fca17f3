"""Stream-mode variant/invariant column split (engine._StreamSplit).

The split sweeps only variant columns on-device and restores each
streamed record's invariant contribution from a per-record code-pair
histogram; output must be byte-identical to the unsplit path for every
measure (the same oracle the reference uses, SURVEY.md section 4).
"""

import io

import numpy as np
import pytest

from distance_tpu.engine import PRUNE_MIN_FRACTION, _StreamSplit
from distance_tpu.fastaio import load_fastas
from distance_tpu.measures import MEASURES
from distance_tpu.ops.features import get_plan
from tests.conftest import make_fasta, random_seqs
from tests.test_golden import run_engine


def low_diversity_fastas(seed=7, n1=11, n2=9, width=240, nmut=6):
    """Alignments sharing an ancestor with few mutated sites, so most
    columns of the loaded alignment are invariant and the split engages.
    """
    rng = np.random.default_rng(seed)
    amb = "RMWSKYVHDBN-?"
    ancestor = rng.choice(list("ACGT"), size=width)

    def mutate(n, tag):
        recs = []
        for i in range(n):
            s = ancestor.copy()
            pos = rng.choice(width, size=nmut, replace=False)
            for p in pos:
                s[p] = rng.choice(list("ACGTacgt" + amb))
            recs.append((f"{tag}{i}", "".join(s)))
        return recs

    return make_fasta(mutate(n1, "l")), make_fasta(mutate(n2, "s"))


def test_split_triggers_on_low_diversity():
    f1, _ = low_diversity_fastas()
    aln = load_fastas([io.BytesIO(f1)])[0]
    split = _StreamSplit(aln.matrix, get_plan("raw"))
    assert split.frac >= PRUNE_MIN_FRACTION
    assert split.keep.sum() < aln.matrix.shape[1]


@pytest.mark.parametrize("measure", MEASURES)
def test_stream_split_parity(measure, monkeypatch):
    f1, f2 = low_diversity_fastas()
    monkeypatch.delenv("DISTANCE_TPU_NO_STREAM_SPLIT", raising=False)
    got = run_engine(measure, f1, stream=f2, backend="numpy")[0]
    monkeypatch.setenv("DISTANCE_TPU_NO_STREAM_SPLIT", "1")
    want = run_engine(measure, f1, stream=f2, backend="numpy")[0]
    assert got == want


@pytest.mark.parametrize("measure", ["raw", "tn93", "n"])
def test_stream_split_parity_xla(measure, monkeypatch):
    f1, f2 = low_diversity_fastas(seed=11)
    monkeypatch.delenv("DISTANCE_TPU_NO_STREAM_SPLIT", raising=False)
    got = run_engine(measure, f1, stream=f2, backend="xla", batchsize=3)[0]
    monkeypatch.setenv("DISTANCE_TPU_NO_STREAM_SPLIT", "1")
    want = run_engine(measure, f1, stream=f2, backend="xla", batchsize=3)[0]
    assert got == want


def test_offsets_native_matches_numpy(monkeypatch):
    f1, f2 = low_diversity_fastas(seed=3)
    loaded = load_fastas([io.BytesIO(f1)])[0]
    streamed = load_fastas([io.BytesIO(f2)])[0]
    split = _StreamSplit(loaded.matrix, get_plan("tn93"))
    native = split.offsets(streamed.matrix)

    import distance_tpu._native as _native

    monkeypatch.setattr(_native, "get_lib", lambda: None)
    fallback = split.offsets(streamed.matrix)
    assert set(native) == set(fallback)
    for k in native:
        np.testing.assert_array_equal(native[k], fallback[k])


def test_offsets_brute_force():
    # offsets must equal the counter evaluated on the invariant columns
    # alone, for every (loaded row, streamed row) pair
    f1, f2 = low_diversity_fastas(seed=5, n1=6, n2=4, width=90, nmut=4)
    loaded = load_fastas([io.BytesIO(f1)])[0]
    streamed = load_fastas([io.BytesIO(f2)])[0]
    plan = get_plan("k80")
    split = _StreamSplit(loaded.matrix, plan)
    offs = split.offsets(streamed.matrix)

    from distance_tpu.ops.features import reference_counter_matrix

    inv_cols = ~split.keep
    a = loaded.matrix[0][inv_cols].astype(np.intp)
    for name in plan.counters:
        w = reference_counter_matrix(name)
        for r in range(streamed.matrix.shape[0]):
            b = streamed.matrix[r][inv_cols].astype(np.intp)
            assert offs[name][r] == w[a, b].sum(), (name, r)


def test_all_invariant_loaded_rows(monkeypatch):
    # identical loaded rows: split keeps one on-device column and the
    # output still matches the unsplit path
    f1 = make_fasta([(f"l{i}", "ACGTACGTACGT") for i in range(5)])
    rng = np.random.default_rng(0)
    f2 = make_fasta(random_seqs(rng, 4, 12, amb_frac=0.3))
    for measure in ("raw", "n_high", "tn93"):
        monkeypatch.delenv("DISTANCE_TPU_NO_STREAM_SPLIT", raising=False)
        got = run_engine(measure, f1, stream=f2, backend="numpy")[0]
        monkeypatch.setenv("DISTANCE_TPU_NO_STREAM_SPLIT", "1")
        want = run_engine(measure, f1, stream=f2, backend="numpy")[0]
        assert got == want
