"""Measure-value parity with the reference's unit tests
(/root/reference/src/measures.rs:195-309) and formula edge cases."""

import io
import math

import numpy as np
import pytest

from distance_tpu import measures
from distance_tpu.fastaio import load_fasta

TARGET = b">target\nATGATGATGATGCCC\n"
QUERY = b">query\nATTATTATGATGCCC\n"


def pair():
    t = load_fasta(io.BytesIO(TARGET))
    q = load_fasta(io.BytesIO(QUERY))
    return q, t


def test_snp():
    q, t = pair()
    assert measures.snp(t.matrix[0], q.matrix[0]) == 2


def test_sparse_consensus_scan_equals_snp():
    """Reference measures.rs:28-53 (local oracle): the sparse scan over
    consensus-difference unions returns the same value as the dense
    certainly-different count.  The engine implements only the dense
    counter (plus invariant-column pruning as the matrix-form
    sparsification); this pins why that is exact."""
    q, t = pair()
    from distance_tpu.fastaio import consensus, Alignment
    from tests.test_fastaio import _reference_differences

    both = Alignment(
        ids=["t", "q"], descriptions=["", ""],
        matrix=np.vstack([t.matrix, q.matrix]),
    )
    c = consensus([both])
    a, b = both.matrix[0].astype(np.int32), both.matrix[1].astype(np.int32)
    da = _reference_differences(both.matrix[0], c)
    db = _reference_differences(both.matrix[1], c)
    d = int(np.count_nonzero((a[da] & b[da]) < 16))
    rest = np.setdiff1d(db, da, assume_unique=True)
    d += int(np.count_nonzero((a[rest] & b[rest]) < 16))
    assert d == measures.snp(both.matrix[0], both.matrix[1]) == 2


def test_raw():
    q, t = pair()
    assert measures.raw(q.matrix[0], t.matrix[0]) == 2.0 / 15.0


def test_jc69():
    q, t = pair()
    expected = -0.75 * math.log(1.0 - (4.0 / 3.0) * (2.0 / 15.0))
    assert measures.jc69(q.matrix[0], t.matrix[0]) == expected


def test_k80():
    q, t = pair()
    P = 0.0 / 15.0
    Q = 2.0 / 15.0
    expected = -0.5 * math.log((1.0 - 2.0 * P - Q) * math.sqrt(1.0 - 2.0 * Q))
    assert measures.k80(q.matrix[0], t.matrix[0]) == expected


def test_tn93():
    q, t = pair()
    q_aln, t_aln = q, t
    q_aln.count_bases()
    t_aln.count_bases()
    got = measures.tn93(
        q.matrix[0], t.matrix[0],
        tuple(q_aln.base_counts[0]), tuple(t_aln.base_counts[0]),
    )
    # re-derive per measures.rs:272-307 (counts: target A4 T4 G4 C3,
    # query A4 T6 G2 C3)
    g_A = 8.0 / 30.0
    g_T = 10.0 / 30.0
    g_C = 6.0 / 30.0
    g_G = 6.0 / 30.0
    g_R = (8.0 + 6.0) / 30.0
    g_Y = (7.0 + 9.0) / 30.0
    k1 = 2.0 * g_A * g_G / g_R
    k2 = 2.0 * g_T * g_C / g_Y
    k3 = 2.0 * (g_R * g_Y - g_A * g_G * g_Y / g_R - g_T * g_C * g_R / g_Y)
    P1 = 0.0 / 15.0
    P2 = 0.0 / 15.0
    Q = (2.0 - (0.0 + 0.0)) / 15.0
    w1 = 1.0 - P1 / k1 - Q / (2.0 * g_R)
    w2 = 1.0 - P2 / k2 - Q / (2.0 * g_Y)
    w3 = 1.0 - Q / (2.0 * g_R * g_Y)
    expected = -k1 * math.log(w1) - k2 * math.log(w2) - k3 * math.log(w3)
    assert got == expected


# --- edge semantics the reference leaves untested -------------------------

def enc(s: bytes):
    return load_fasta(io.BytesIO(b">x\n" + s + b"\n")).matrix[0]


def test_identical_pair_signed_zero():
    a = enc(b"ACGT")
    assert math.copysign(1.0, measures.jc69(a, a)) == -1.0  # -0.0
    assert math.copysign(1.0, measures.k80(a, a)) == -1.0
    aln = load_fasta(io.BytesIO(b">x\nACGT\n"))
    aln.count_bases()
    v = measures.tn93(a, a, tuple(aln.base_counts[0]), tuple(aln.base_counts[0]))
    assert v == 0.0 and math.copysign(1.0, v) == 1.0  # normalized +0.0


def test_raw_all_ambiguous_nan():
    a = enc(b"NNNN")
    assert math.isnan(measures.raw(a, a))


def test_jc69_saturation():
    # p = 0.75 exactly -> ln(0) = -inf -> +inf distance
    a = enc(b"AAAG")
    b = enc(b"CCCG")
    assert measures.raw(a, b) == 0.75
    assert measures.jc69(a, b) == math.inf
    # p > 0.75 -> ln(negative) = NaN
    a2 = enc(b"AAAA")
    b2 = enc(b"CCCC")
    assert math.isnan(measures.jc69(a2, b2))


def test_k80_drops_unclassifiable_diffs():
    # W (A|T) vs S (G|C): certainly different but neither both-purine,
    # both-pyrimidine, nor purine x pyrimidine -> dropped entirely
    # (measures.rs:91-105).
    a = enc(b"WAAA")
    b = enc(b"SAAA")
    c = measures.pair_counters(a, b)
    assert c["diff"] == 1
    assert c["ts"] == 0 and c["tv"] == 0
    assert c["same"] == 3


def test_k80_classifies_ambiguity_transversions():
    # R (purine set) vs Y (pyrimidine set): certainly different, one of
    # each set -> transversion (measures.rs:99-104).
    a = enc(b"RAAA")
    b = enc(b"YAAA")
    c = measures.pair_counters(a, b)
    assert c["tv"] == 1 and c["ts"] == 0


def test_tn93_requires_both_known():
    # R vs C is certainly different but R is not exactly known -> excluded
    # from tn93's counts (measures.rs:160-163).
    a = enc(b"RAAA")
    b = enc(b"CAAA")
    c = measures.pair_counters(a, b)
    assert c["kk"] == 3
    assert c["kk"] - c["same"] == 0


def test_counters_match_oracle_on_random_pairs(rng):
    from tests.conftest import random_seqs

    recs = random_seqs(rng, 12, 73, amb_frac=0.3)
    mats = [enc(s.encode()) for _, s in recs]
    for i in range(0, 12, 3):
        for j in range(1, 12, 4):
            c = measures.pair_counters(mats[i], mats[j])
            # cross-check against direct byte predicates
            q = mats[i].astype(np.int32)
            t = mats[j].astype(np.int32)
            assert c["diff"] == int(((q & t) < 16).sum())
            assert c["same"] == int(((q == t) & ((q & 8) == 8)).sum())
