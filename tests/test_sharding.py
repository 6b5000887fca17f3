"""Multi-host sharding: concatenated shard outputs must be byte-identical
to the single-host file, including through the out-of-core path."""

import io

import numpy as np
import pytest

import distance_tpu.engine as engine
from distance_tpu.engine import Setup, _split_strips, run
from distance_tpu.fastaio import load_fastas
from distance_tpu.writer import TsvWriter
from tests.conftest import make_fasta, random_seqs
from tests.test_golden import expected_rect, expected_square


def run_shard(measure, fasta1, fasta2, shard, tile=8):
    handles = [io.BytesIO(fasta1)]
    if fasta2 is not None:
        handles.append(io.BytesIO(fasta2))
    loaded = load_fastas(handles)
    if measure == "tn93":
        for a in loaded:
            a.count_bases()
    out = io.BytesIO()
    setup = Setup(
        loaded=loaded,
        streamed=None,
        writer=TsvWriter(out),
        measure=measure,
        n_threads=1,
        batchsize=1,
        backend="xla",
        tile_i=tile,
        tile_j=tile,
        shard=shard,
    )
    run(setup)
    return out.getvalue()


@pytest.fixture(scope="module")
def fastas():
    rng = np.random.default_rng(17)
    f1 = make_fasta(random_seqs(rng, 37, 70, amb_frac=0.2))
    f2 = make_fasta(random_seqs(rng, 11, 70, amb_frac=0.2))
    return f1, f2


@pytest.mark.parametrize("nshards", [2, 3, 5])
@pytest.mark.parametrize("measure", ["n", "raw", "tn93"])
def test_square_shards_concatenate(measure, nshards, fastas):
    f1, _ = fastas
    parts = [
        run_shard(measure, f1, None, (k, nshards)) for k in range(nshards)
    ]
    assert b"".join(parts) == expected_square(measure, f1)


@pytest.mark.parametrize("nshards", [2, 4])
def test_rectangle_shards_concatenate(nshards, fastas):
    f1, f2 = fastas
    parts = [
        run_shard("k80", f1, f2, (k, nshards)) for k in range(nshards)
    ]
    assert b"".join(parts) == expected_rect("k80", f1, f2)


def test_sharded_outofcore(monkeypatch, fastas):
    f1, _ = fastas
    monkeypatch.setattr(engine, "HBM_BUDGET_BYTES", 1500)
    monkeypatch.setattr(engine, "HOST_BUF_BUDGET", 30000)
    parts = [run_shard("jc69", f1, None, (k, 3)) for k in range(3)]
    assert b"".join(parts) == expected_square("jc69", f1)


def test_split_strips_balance():
    weights = [100, 90, 80, 70, 60, 50, 40, 30, 20, 10]
    ranges = [_split_strips(weights, (k, 3)) for k in range(3)]
    # cover everything exactly once, in order
    assert ranges[0][0] == 0 and ranges[-1][1] == len(weights)
    for (a1, b1), (a2, b2) in zip(ranges, ranges[1:]):
        assert b1 == a2
    # roughly balanced by weight
    totals = [sum(weights[a:b]) for a, b in ranges]
    assert max(totals) <= 2 * min(t for t in totals if t)


def test_cli_shard_flag(tmp_path, fastas):
    import subprocess
    import sys

    f1, _ = fastas
    fp = tmp_path / "a.fasta"
    fp.write_bytes(f1)
    outs = []
    for k in range(2):
        o = tmp_path / f"out{k}.tsv"
        r = subprocess.run(
            [sys.executable, "-m", "distance_tpu.cli", str(fp), "-m", "n",
             "--shard", f"{k}/2", "--backend", "numpy", "-o", str(o)],
            capture_output=True,
        )
        assert r.returncode == 0, r.stderr
        outs.append(o.read_bytes())
    assert b"".join(outs) == expected_square("n", f1)


@pytest.mark.parametrize("bad", ["bogus", "2/2", "-1/2", "0/0"])
def test_shard_errors(tmp_path, bad):
    import re

    from distance_tpu.cli import build_parser
    from distance_tpu.engine import set_up
    from distance_tpu.fastaio import DistanceError

    fp = tmp_path / "a.fasta"
    fp.write_bytes(b">a\nACGT\n>b\nACGT\n")
    args = build_parser().parse_args([str(fp), "-m", "n", f"--shard={bad}"])
    with pytest.raises(DistanceError, match=re.escape(f"--shard '{bad}'")):
        set_up(args)


def test_tile_autoadjust_multidevice(capfd):
    """A tile_j that does not divide the device count is rounded up (with
    a note) instead of silently dropping to one device."""
    import jax

    from distance_tpu.engine import _choose_tiles

    nd = jax.device_count()
    if nd <= 1:
        pytest.skip("single device")
    setup = Setup(
        loaded=[], streamed=None, writer=None, measure="raw",
        n_threads=1, batchsize=1, tile_i=8, tile_j=nd * 12 + 1,
    )
    ti, tj = _choose_tiles(500, 500, setup, "xla")
    assert tj % nd == 0 and tj >= nd * 12 + 1
    assert "tile_j" in capfd.readouterr().err


def test_xla_nondivisible_tile_parity(fastas):
    """Full-run byte parity when the requested tile needed adjustment."""
    f1, _ = fastas
    got = run_shard("raw", f1, None, None, tile=10)
    assert got == expected_square("raw", f1)
