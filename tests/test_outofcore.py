"""Out-of-core (blocked) sweep parity: tiny forced budgets must produce
byte-identical output to the in-core path."""

import numpy as np
import pytest

import distance_tpu.engine as engine
from distance_tpu.measures import MEASURES
from tests.conftest import make_fasta, random_seqs
from tests.test_golden import expected_square, run_engine


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
