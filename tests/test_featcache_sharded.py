"""GSPMD (sharded) g-side feature cache: byte parity + engagement.

Round-3 left sharded engines on the recomputing path; round 4 carries
the cache through GSPMD with a block-partitioned (R, nb, tj, l_pad)
layout (engine._jit_feat_builder_blocked).  These tests run on the
8-virtual-device CPU mesh (conftest) with mesh-divisible tiles so the
engines ARE sharded, and assert the cached path both engages and
produces the numpy oracle's exact bytes.
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


def _run(measure, fasta1, fasta2=None, backend="numpy", tile_i=16,
         tile_j=16):
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


@pytest.fixture()
def spies(monkeypatch):
    """Counts cached-path dispatches and sharded engine creation."""
    calls = {"feat": 0, "sharded": 0}
    orig_feat = engine._BlockEngine.block_feat
    orig_init = engine._BlockEngine.__init__

    def spy_feat(self, *a, **kw):
        calls["feat"] += 1
        return orig_feat(self, *a, **kw)

    def spy_init(self, *a, **kw):
        orig_init(self, *a, **kw)
        if self.sharded:
            calls["sharded"] += 1

    monkeypatch.setattr(engine._BlockEngine, "block_feat", spy_feat)
    monkeypatch.setattr(engine._BlockEngine, "__init__", spy_init)
    return calls


@pytest.fixture(scope="module")
def fastas():
    rng = np.random.default_rng(7)
    f1 = make_fasta(random_seqs(rng, 21, 61, amb_frac=0.2))
    f2 = make_fasta(random_seqs(rng, 9, 61, amb_frac=0.2))
    return f1, f2


def _assert_sharded_mesh():
    import jax

    if jax.device_count() < 2:
        pytest.skip("needs a multi-device mesh")


@pytest.mark.parametrize("measure", MEASURES)
def test_square_parity_sharded_cached(measure, fastas, spies):
    _assert_sharded_mesh()
    f1, _ = fastas
    want = _run(measure, f1, backend="numpy")
    got = _run(measure, f1, backend="xla")
    assert got == want
    assert spies["sharded"] > 0, "engine was not sharded"
    assert spies["feat"] > 0, "sharded feature cache never engaged"


def test_rect_parity_sharded_cached(fastas, spies):
    _assert_sharded_mesh()
    f1, f2 = fastas
    want = _run("tn93", f1, f2, backend="numpy")
    got = _run("tn93", f1, f2, backend="xla")
    assert got == want
    assert spies["sharded"] > 0
    assert spies["feat"] > 0


def test_outofcore_parity_sharded_cached(fastas, spies, monkeypatch):
    _assert_sharded_mesh()
    f1, _ = fastas
    monkeypatch.setattr(engine, "HBM_BUDGET_BYTES", 2000)
    monkeypatch.setattr(engine, "HOST_BUF_BUDGET", 40000)
    want = _run("jc69", f1, backend="numpy")
    got = _run("jc69", f1, backend="xla")
    assert got == want
    assert spies["sharded"] > 0
    assert spies["feat"] > 0


def test_misaligned_strips_fall_back(fastas, spies):
    """tile_i=8 < tile_j=16 leaves odd strips' column starts 16-
    misaligned: those strips must take the recomputing path (the
    blocked cache can't serve them) and bytes must still match."""
    _assert_sharded_mesh()
    f1, _ = fastas
    want = _run("raw", f1, backend="numpy", tile_i=8, tile_j=16)
    got = _run("raw", f1, backend="xla", tile_i=8, tile_j=16)
    assert got == want


def test_sharded_matches_unsharded_bytes(fastas):
    """Device-count independence: the sharded cached sweep's bytes equal
    the single-device cached sweep's (the determinism oracle)."""
    _assert_sharded_mesh()
    f1, f2 = fastas
    sharded = _run("k80", f1, f2, backend="xla")
    try:
        real_mesh = engine._device_mesh
        engine._device_mesh = lambda n: None
        single = _run("k80", f1, f2, backend="xla")
    finally:
        engine._device_mesh = real_mesh
    assert sharded == single


def test_saturation_escalation_sharded(spies):
    """Diverse rows saturate rel lanes under GSPMD; the wide refetch
    must route through the sharded cached path too."""
    _assert_sharded_mesh()
    rng = np.random.default_rng(11)
    recs = random_seqs(rng, 10, 80)
    wild = ["".join(rng.choice(list("ACGT"), size=80)) for _ in range(8)]
    recs += [(f"w{i}", s) for i, s in enumerate(wild)]
    fasta = make_fasta(recs)
    want = _run("n_high", fasta, backend="numpy")
    got = _run("n_high", fasta, backend="xla")
    assert got == want
    assert spies["feat"] > 0
