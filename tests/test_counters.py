"""Kernel counters (NumPy and XLA paths) must match the per-pair oracle
exactly on ambiguity-rich random data."""

import numpy as np
import pytest

from distance_tpu import measures
from distance_tpu.engine import _counters_numpy
from distance_tpu.fastaio import encode_seq
from distance_tpu.measures import MEASURES
from distance_tpu.ops.features import get_plan
from tests.conftest import random_seqs


def encode_all(recs):
    return np.vstack([encode_seq(rid, seq.encode()) for rid, seq in recs])


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(7)
    x = encode_all(random_seqs(rng, 9, 150, amb_frac=0.25))
    y = encode_all(random_seqs(rng, 7, 150, amb_frac=0.25))
    return x, y


def oracle_counters(measure, x, y):
    plan = get_plan(measure)
    out = np.zeros((len(plan.counters), x.shape[0], y.shape[0]), np.int32)
    for i in range(x.shape[0]):
        for j in range(y.shape[0]):
            c = measures.pair_counters(x[i], y[j])
            for k, name in enumerate(plan.counters):
                out[k, i, j] = c[name]
    return out


@pytest.mark.parametrize("measure", MEASURES)
def test_numpy_counters_match_oracle(measure, data):
    x, y = data
    got = _counters_numpy(x, y, get_plan(measure))
    want = oracle_counters(measure, x, y)
    assert np.array_equal(got, want)


@pytest.mark.parametrize("measure", MEASURES)
def test_xla_counters_match_oracle(measure, data):
    import jax.numpy as jnp

    from distance_tpu.ops.pairwise_xla import counters_xla

    x, y = data
    got = np.asarray(counters_xla(jnp.asarray(x), jnp.asarray(y), get_plan(measure)))
    want = oracle_counters(measure, x, y)
    assert np.array_equal(got, want)


def test_padded_rows_and_sites_are_inert():
    rng = np.random.default_rng(3)
    x = encode_all(random_seqs(rng, 4, 100, amb_frac=0.2))
    plan = get_plan("raw")
    base = _counters_numpy(x, x, plan)
    xp = np.zeros((6, 160), dtype=np.uint8)
    xp[:4, :100] = x
    padded = _counters_numpy(xp, xp, plan)
    assert np.array_equal(padded[:, :4, :4], base)
    # pad rows produce zero counters
    assert (padded[:, 4:, :] == 0).all()
    assert (padded[:, :, 4:] == 0).all()


def test_base_counts_device():
    import jax.numpy as jnp

    from distance_tpu.ops.pairwise_xla import base_counts_device

    x = encode_all([("a", "ACGTacgtNN-"), ("b", "AAAAAAAAAAA")])
    got = np.asarray(base_counts_device(jnp.asarray(x)))
    assert got[0].tolist() == [2, 2, 2, 2]
    assert got[1].tolist() == [11, 0, 0, 0]


def test_count_bases_device_matches_host(monkeypatch):
    """The wired device-side tn93 precompute equals the host tally."""
    import distance_tpu.engine as engine
    from distance_tpu.encoding import ALL_CODES
    from distance_tpu.fastaio import Alignment

    rng = np.random.default_rng(5)
    mat = rng.choice(ALL_CODES, size=(37, 200)).astype(np.uint8)
    aln = Alignment(ids=[], descriptions=[], matrix=mat)
    host = aln.count_bases().copy()
    # small chunk size forces the chunked path
    monkeypatch.setattr(engine, "H2D_CHUNK_BYTES", 2000)
    dev = engine._count_bases_device(mat)
    assert np.array_equal(host, dev)
    monkeypatch.setattr(engine, "BASE_COUNT_DEVICE_MIN_BYTES", 0)
    aln2 = Alignment(ids=[], descriptions=[], matrix=mat)
    engine._count_bases_maybe_device(aln2, "xla")
    assert np.array_equal(aln2.base_counts, host)
