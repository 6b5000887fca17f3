"""tn93 keyed-memo emission (round-4): tally-rank keys.

tn93's value depends on (kk, kk-same, p1, p2) and the pair's tally sum
(measures.rs:116-193), so it was excluded from the keyed writer.  Round
4 ranks distinct (A,T,G,C) tally rows once per side and keys the memo on
(counter key, rank_q, rank_t) whenever the product space fits
_KEYSPACE_CAP — engaging on duplicate-heavy data (identical records =>
identical tallies) and disengaging safely on maximal-diversity data.
"""

import io

import numpy as np
import pytest

import distance_tpu.engine as engine
from distance_tpu.measures import tn93 as tn93_oracle
from tests.conftest import make_fasta, random_seqs
from tests.test_golden import expected_rect, expected_square, run_engine


def dup_heavy_fasta(rng, n=36, width=120, lineages=5):
    """Records sampled from a few distinct sequences (duplicate-heavy,
    like real outbreak data): distinct tallies ~= lineages."""
    bases = list("ACGT")
    founders = []
    anc = rng.choice(bases, size=width)
    for k in range(lineages):
        s = anc.copy()
        for p in rng.choice(width, 6, replace=False):
            s[p] = rng.choice(bases)
        founders.append("".join(s))
    recs = [(f"s{i}", founders[int(rng.integers(lineages))])
            for i in range(n)]
    return make_fasta(recs)


@pytest.fixture
def spies(monkeypatch):
    out = {"engaged": 0, "tried": 0, "disengaged": 0}
    orig = engine._tn93_value_keys

    def spy(*a, **k):
        out["tried"] += 1
        keys, keyspace = orig(*a, **k)
        if keys is not None:
            out["engaged"] += 1
        else:
            out["disengaged"] += 1
        return keys, keyspace

    monkeypatch.setattr(engine, "_tn93_value_keys", spy)
    return out


@pytest.mark.parametrize("backend", ["numpy", "xla"])
def test_square_parity_keyed(backend, spies, rng):
    fasta = dup_heavy_fasta(rng)
    got, _ = run_engine("tn93", fasta, backend=backend)
    assert spies["engaged"] > 0, "tn93 memo never engaged"
    assert got == expected_square("tn93", fasta)


def test_rect_parity_keyed(spies, rng):
    f1 = dup_heavy_fasta(rng, n=21)
    f2 = dup_heavy_fasta(rng, n=13)
    got, _ = run_engine("tn93", f1, f2, backend="xla")
    assert spies["engaged"] > 0
    assert got == expected_rect("tn93", f1, f2)


def test_stream_parity_keyed(spies, rng):
    f1 = dup_heavy_fasta(rng, n=19)
    f2 = dup_heavy_fasta(rng, n=11)
    want, _ = run_engine("tn93", f1, stream=f2, backend="numpy")
    spies["engaged"] = 0
    got, _ = run_engine("tn93", f1, stream=f2, backend="xla")
    assert spies["engaged"] > 0
    assert got == want


def test_hash_path_parity(spies, rng, monkeypatch):
    """Dense product space disabled (cap=1): the hash-rank path must
    carry the memo with byte-identical output."""
    from distance_tpu._native import get_lib

    if get_lib() is None:
        pytest.skip("no native lib")
    monkeypatch.setattr(engine, "_KEYSPACE_CAP", 1)
    fasta = dup_heavy_fasta(rng)
    got, _ = run_engine("tn93", fasta, backend="xla")
    assert spies["engaged"] > 0, "hash path never engaged"
    assert got == expected_square("tn93", fasta)


def test_diverse_data_bails(spies, rng, monkeypatch):
    """Maximal-diversity tallies (every record's tally unique): dense
    never fits a tiny cap and the hash pass must BAIL on batches whose
    distinct keys exceed its budget — bytes identical via the unkeyed
    fallback.  (Small tail batches may still engage; that is fine.)"""
    monkeypatch.setattr(engine, "_KEYSPACE_CAP", 64)
    fasta = make_fasta(random_seqs(rng, 160, 90, amb_frac=0.2))
    got, _ = run_engine("tn93", fasta, backend="numpy")
    assert spies["tried"] > 0 and spies["disengaged"] > 0, spies
    assert got == expected_square("tn93", fasta)


def test_nonfinite_values_through_keyed_path(spies):
    """Saturated distances (inf/NaN spellings) must survive the
    representative finalize: duplicates of maximally-divergent records
    drive w-terms nonpositive."""
    recs = []
    for i in range(6):
        recs.append((f"a{i}", "AAAAAAAAAAAA"))
        recs.append((f"g{i}", "GGGGGGGGGGGG"))
    fasta = make_fasta(recs)
    got, _ = run_engine("tn93", fasta, backend="xla")
    assert spies["engaged"] > 0
    assert got == expected_square("tn93", fasta)


def test_keys_rank2_native_matches_numpy(rng):
    from distance_tpu._native import get_lib

    lib = get_lib()
    if lib is None:
        pytest.skip("no native lib")
    import ctypes

    n = 1000
    keyc = rng.integers(0, 7, n).astype(np.int32)
    rank_q = rng.integers(0, 4, 50).astype(np.int32)
    rank_t = rng.integers(0, 3, 40).astype(np.int32)
    pi = rng.integers(0, 50, n).astype(np.int32)
    pj = rng.integers(0, 40, n).astype(np.int32)
    out = np.empty(n, dtype=np.int32)
    p32 = ctypes.POINTER(ctypes.c_int32)
    lib.dt_keys_rank2(
        keyc.ctypes.data_as(p32), pi.ctypes.data_as(p32),
        pj.ctypes.data_as(p32), rank_q.ctypes.data_as(p32),
        rank_t.ctypes.data_as(p32), n, 4, 3, out.ctypes.data_as(p32),
    )
    want = keyc * 12 + rank_q[pi] * 3 + rank_t[pj]
    assert np.array_equal(out, want)


def test_key_equivalence_is_exact(rng):
    """The memo's correctness contract, against the scalar oracle:
    within one emission batch, equal (counter tuple, rank_q, rank_t)
    keys must map to ONE bit-identical value — and the duplicate-heavy
    fixture must actually produce multi-pair groups (the memo wins)."""
    from distance_tpu.fastaio import load_fastas
    from distance_tpu.measures import pair_counters

    fasta = dup_heavy_fasta(rng, n=16, width=60, lineages=3)
    aln = load_fastas([io.BytesIO(fasta)])[0]
    aln.count_bases()
    ranks, _ = aln.tally_ranks()
    groups = {}
    for i in range(aln.n):
        for j in range(i + 1, aln.n):
            c = pair_counters(aln.matrix[i], aln.matrix[j])
            v = tn93_oracle(
                aln.matrix[i], aln.matrix[j],
                tuple(aln.base_counts[i]), tuple(aln.base_counts[j]),
            )
            key = (c["kk"], c["kk"] - c["same"], c["p1"], c["p2"],
                   ranks[i], ranks[j])
            groups.setdefault(key, set()).add(repr(v))
    assert all(len(s) == 1 for s in groups.values()), (
        "a key mapped to more than one distinct value"
    )
    n_pairs = aln.n * (aln.n - 1) // 2
    assert len(groups) < n_pairs, "fixture produced no duplicate keys"


def test_hashrank_parallel_deterministic(rng):
    """The parallel hash-rank (dt_keys_hashrank_slots, round-4 follow-up
    to the measured 5.2 s serial keys tail) must produce IDENTICAL keys
    regardless of pool width: ranks are assigned in ascending-key order
    from the final table, not in racy insertion order.  Grouping must
    match the numpy combined-key oracle exactly."""
    from concurrent.futures import ThreadPoolExecutor

    import distance_tpu.finalize as fin
    from distance_tpu._native import get_lib

    if get_lib() is None:
        pytest.skip("no native lib")
    n, lineages, n1 = 200_000, 23, 95
    rank_q = np.ascontiguousarray(
        rng.integers(0, lineages, n1).astype(np.int32))
    rank_t = np.ascontiguousarray(
        rng.integers(0, lineages, n1).astype(np.int32))
    pair_i = rng.integers(0, n1, n).astype(np.int32)
    pair_j = rng.integers(0, n1, n).astype(np.int32)
    base = {
        name: rng.integers(lo, hi, size=(lineages, lineages)).astype(np.int32)
        for name, (lo, hi) in (
            ("kk", (100, 120)), ("same", (80, 100)),
            ("p1", (0, 9)), ("p2", (0, 5)),
        )
    }
    counters = {
        k: np.ascontiguousarray(v[rank_q[pair_i], rank_t[pair_j]])
        for k, v in base.items()
    }
    # force the hash path: shrink the dense cap below any product space
    import distance_tpu.engine as eng

    old_cap = eng._KEYSPACE_CAP
    eng._KEYSPACE_CAP = 1
    old_pool = fin._pool
    try:
        results = []
        for workers in (1, 2, None):
            if workers is None:
                fin._pool = old_pool
            else:
                p = ThreadPoolExecutor(workers)
                fin._pool = p
            keys, nd = eng._tn93_value_keys(
                {k: v.copy() for k, v in counters.items()},
                (rank_q, lineages), pair_i, (rank_t, lineages), pair_j,
            )
            assert keys is not None
            results.append((keys.copy(), nd))
    finally:
        eng._KEYSPACE_CAP = old_cap
        fin._pool = old_pool
    (k1, n1_), (k2, n2_), (k3, n3_) = results
    assert n1_ == n2_ == n3_
    assert np.array_equal(k1, k2) and np.array_equal(k2, k3)
    # grouping oracle: a lexicographic combined key per row, same field
    # order as the engine's mixed-radix key — ascending-key rank
    # assignment makes the engine's dense ranks EQUAL np.unique's
    # inverse, not merely a permutation of it
    comb = (
        counters["kk"].astype(np.int64) * (1 << 40)
        + (counters["kk"] - counters["same"]).astype(np.int64) * (1 << 28)
        + counters["p1"].astype(np.int64) * (1 << 16)
        + counters["p2"].astype(np.int64) * (lineages * lineages)
        + rank_q[pair_i].astype(np.int64) * lineages
        + rank_t[pair_j]
    )
    uniq, want_inv = np.unique(comb, return_inverse=True)
    assert np.array_equal(want_inv, k1)
    assert int(nd) == len(uniq)


def test_hash_path_bails_on_int32_counter_overflow(rng):
    """Counter spreads whose mixed-radix product exceeds 2^31 MUST
    disable the memo: keyc is built into an int32 buffer by
    dt_keys_lin3, so a wider product would truncate and collide DISTINCT
    counter tuples onto one memo key — silently wrong tn93 values
    (reproduced pre-fix: kk=0/same=0 and kk=1/same=1 shared a key at
    p1m=p2m=2^16).  Equal keys must imply equal values; when that cannot
    be guaranteed the function's contract is to return (None, 0)."""
    from distance_tpu._native import get_lib

    if get_lib() is None:
        pytest.skip("no native lib")
    n, n1 = 64, 8
    mk = lambda a: np.ascontiguousarray(np.asarray(a, dtype=np.int32))
    kk = mk(rng.integers(0, 2, n))
    same = mk(kk)  # d = 0 everywhere: dm = 1
    p1 = mk(rng.choice([0, (1 << 16) - 1], n))
    p2 = mk(rng.choice([0, (1 << 16) - 1], n))
    # cspace = 2 * 1 * 2^16 * 2^16 = 2^33 > 2^31: int32 keyc would wrap
    pair_i = mk(rng.integers(0, n1, n))
    pair_j = mk(rng.integers(0, n1, n))
    rank = mk(np.arange(n1))
    keys, nd = engine._tn93_value_keys(
        {"kk": kk, "same": same, "p1": p1, "p2": p2},
        (rank, n1), pair_i, (rank, n1), pair_j,
    )
    assert keys is None and nd == 0
