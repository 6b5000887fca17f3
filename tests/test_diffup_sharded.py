"""Diff-encoded uploads under GSPMD sharding: byte parity + engagement.

Round-4 left diff uploads disabled when the engine was sharded
(engine.prepare gated on ``not self.sharded``), so multi-chip runs paid
dense H2D for every prepare and stream group — exactly the transfers
diff encoding cut ~12x single-chip.  Round 5 routes the (idx, code)
scatter rebuild through pjit with a mesh-replicated output (the dense
sharded upload's placement).  These tests run on the 8-virtual-device
CPU mesh with mesh-divisible tiles so the engines ARE sharded, force
the encoding on, and assert (a) byte parity with the numpy oracle and
(b) that the sharded scatter-build path actually engaged.
"""

import io

import numpy as np
import pytest

import distance_tpu.engine as engine
import distance_tpu.ops.diffup as diffup
from distance_tpu.engine import Setup, run
from distance_tpu.fastaio import load_fastas
from distance_tpu.writer import TsvWriter
from tests.conftest import make_fasta, random_seqs


def _assert_mesh():
    import jax

    if jax.device_count() < 2:
        pytest.skip("needs a multi-device mesh")


@pytest.fixture()
def spies(monkeypatch):
    """Record every _build_fn key (rows_pad, l_pad, cap, sharded) and
    sharded-engine creation; force diff encoding to always win."""
    monkeypatch.setenv("DISTANCE_TPU_DIFF_UPLOAD", "force")
    calls = {"build": [], "sharded_engines": 0}
    orig_build = diffup._build_fn
    orig_init = engine._BlockEngine.__init__

    def spy_build(rows_pad, l_pad, cap, sharded=False):
        calls["build"].append((rows_pad, l_pad, cap, sharded))
        return orig_build(rows_pad, l_pad, cap, sharded)

    def spy_init(self, *a, **kw):
        orig_init(self, *a, **kw)
        if self.sharded:
            calls["sharded_engines"] += 1

    monkeypatch.setattr(diffup, "_build_fn", spy_build)
    monkeypatch.setattr(engine._BlockEngine, "__init__", spy_init)
    return calls


@pytest.fixture(scope="module")
def fastas():
    rng = np.random.default_rng(23)
    f1 = make_fasta(random_seqs(rng, 37, 70, amb_frac=0.2))
    f2 = make_fasta(random_seqs(rng, 24, 70, amb_frac=0.2))
    return f1, f2


def _run(measure, fasta1, backend, stream=None, tile=16):
    handles = [io.BytesIO(fasta1)]
    loaded = load_fastas(handles)
    if measure == "tn93":
        for a in loaded:
            a.count_bases()
    out = io.BytesIO()
    setup = Setup(
        loaded=loaded,
        streamed=io.BytesIO(stream) if stream is not None else None,
        writer=TsvWriter(out), measure=measure, n_threads=1,
        batchsize=1, backend=backend, tile_i=tile, tile_j=tile,
    )
    run(setup)
    return out.getvalue()


@pytest.mark.parametrize("measure", ["raw", "tn93"])
def test_square_parity_sharded_diffup(measure, fastas, spies):
    _assert_mesh()
    f1, _ = fastas
    want = _run(measure, f1, "numpy")
    got = _run(measure, f1, "xla")
    assert got == want
    assert spies["sharded_engines"] > 0, "engine was not sharded"
    assert any(s for *_k, s in spies["build"]), (
        "sharded scatter build never engaged", spies["build"],
    )


@pytest.mark.parametrize("measure", ["raw", "k80"])
def test_stream_parity_sharded_diffup(measure, fastas, spies,
                                      monkeypatch):
    _assert_mesh()
    # group rows must divide the 8-device mesh for the stream engine to
    # shard (tj == grows); 16 does
    monkeypatch.setenv("DISTANCE_TPU_STREAM_GROUP", "16")
    f1, f2 = fastas
    want = _run(measure, f1, "numpy", stream=f2)
    got = _run(measure, f1, "xla", stream=f2)
    assert got == want
    assert spies["sharded_engines"] > 0, "stream engine was not sharded"
    assert any(s for *_k, s in spies["build"]), (
        "sharded scatter build never engaged", spies["build"],
    )


def test_sharded_diffup_wire_matches_unsharded(fastas, spies):
    """The whole point: the encoding (idx count = wire bytes) must be
    identical sharded vs unsharded — only the rebuild placement
    differs.  Compare the encode output directly."""
    _assert_mesh()
    f1, _ = fastas
    aln = load_fastas([io.BytesIO(f1)])[0]
    l_pad = -(-aln.matrix.shape[1] // 128) * 128
    padded = np.zeros((aln.matrix.shape[0], l_pad), dtype=np.uint8)
    padded[:, : aln.matrix.shape[1]] = aln.matrix
    ref = np.zeros(l_pad, dtype=np.uint8)
    ref[: aln.matrix.shape[1]] = diffup.mode_row(aln.matrix)
    enc_u = diffup.DiffUploader(ref).encode(padded)
    enc_s = diffup.DiffUploader(ref, sharded=True).encode(padded)
    assert enc_u is not None and enc_s is not None
    np.testing.assert_array_equal(enc_u[0], enc_s[0])
    np.testing.assert_array_equal(enc_u[1], enc_s[1])
    # and the sharded rebuild is byte-identical to the dense upload
    up = diffup.DiffUploader(ref, sharded=True)
    dev = up.upload(padded)
    np.testing.assert_array_equal(np.asarray(dev), padded)
