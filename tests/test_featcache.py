"""Cached-feature block path: byte parity + engagement.

The g-side feature cache (engine._jit_block_fn_feat) only runs on
unsharded engines, and the default test mesh has 8 virtual devices — so
tiles divisible by 8 take the GSPMD path and these tests pin the cached
path explicitly with an 8-indivisible tile_j.  The oracle is the numpy
backend's bytes (itself golden-tested against the serial oracle).
"""

import io

import numpy as np
import pytest

import distance_tpu.engine as engine
from distance_tpu.engine import Setup, run
from distance_tpu.fastaio import consensus as consensus_fn, load_fastas
from distance_tpu.measures import MEASURES
from distance_tpu.writer import TsvWriter
from tests.conftest import make_fasta, random_seqs


def _run(measure, fasta1, fasta2=None, backend="numpy", tile_i=8,
         tile_j=12):
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
        loaded=loaded, streamed=None, writer=TsvWriter(out),
        measure=measure, n_threads=1, batchsize=1, backend=backend,
        consensus=cons, tile_i=tile_i, tile_j=tile_j,
    )
    run(setup)
    return out.getvalue()


@pytest.fixture(autouse=True)
def single_device(monkeypatch):
    """Simulate the single-chip case: the cached path only runs
    unsharded, and the 8-virtual-device mesh would shard every engine
    (tile rounding forces mesh divisibility)."""
    monkeypatch.setattr(engine, "_device_mesh", lambda n: None)


@pytest.fixture()
def count_block_feat(monkeypatch):
    """Counts cached-path block dispatches (proof the cache engaged)."""
    calls = {"n": 0}
    orig = engine._BlockEngine.block_feat

    def spy(self, *a, **kw):
        calls["n"] += 1
        return orig(self, *a, **kw)

    monkeypatch.setattr(engine._BlockEngine, "block_feat", spy)
    return calls


@pytest.fixture(scope="module")
def fastas():
    rng = np.random.default_rng(7)
    f1 = make_fasta(random_seqs(rng, 13, 61, amb_frac=0.2))
    f2 = make_fasta(random_seqs(rng, 7, 61, amb_frac=0.2))
    return f1, f2


@pytest.mark.parametrize("measure", MEASURES)
def test_square_parity_cached(measure, fastas, count_block_feat):
    f1, _ = fastas
    want = _run(measure, f1, backend="numpy")
    got = _run(measure, f1, backend="xla")
    assert got == want
    assert count_block_feat["n"] > 0, "feature cache never engaged"


def test_rect_parity_cached(fastas, count_block_feat):
    f1, f2 = fastas
    want = _run("tn93", f1, f2, backend="numpy")
    got = _run("tn93", f1, f2, backend="xla")
    assert got == want
    assert count_block_feat["n"] > 0


def test_outofcore_parity_cached(fastas, count_block_feat, monkeypatch):
    f1, _ = fastas
    monkeypatch.setattr(engine, "HBM_BUDGET_BYTES", 2000)
    monkeypatch.setattr(engine, "HOST_BUF_BUDGET", 40000)
    want = _run("jc69", f1, backend="numpy")
    got = _run("jc69", f1, backend="xla")
    assert got == want
    assert count_block_feat["n"] > 0


def test_budget_zero_disables(fastas, count_block_feat, monkeypatch):
    f1, _ = fastas
    monkeypatch.setattr(engine, "FEATCACHE_BUDGET", 0)
    want = _run("raw", f1, backend="numpy")
    got = _run("raw", f1, backend="xla")
    assert got == want
    assert count_block_feat["n"] == 0


def test_saturation_escalation_cached(count_block_feat):
    """Diverse rows saturate the rel4/rel residual lanes; the wide
    refetch (redispatch) must route through the cached path too."""
    rng = np.random.default_rng(11)
    recs = random_seqs(rng, 6, 80)
    # fully random tail rows: residuals far beyond the 4-bit/8-bit lanes
    wild = ["".join(rng.choice(list("ACGT"), size=80)) for _ in range(6)]
    recs += [(f"w{i}", s) for i, s in enumerate(wild)]
    fasta = make_fasta(recs)
    want = _run("n_high", fasta, backend="numpy")
    got = _run("n_high", fasta, backend="xla")
    assert got == want
    assert count_block_feat["n"] > 0
