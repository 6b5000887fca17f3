"""Checkpoint/resume: interrupted runs continue to a byte-identical file."""

import io
import subprocess
import sys

import numpy as np
import pytest

import distance_tpu.engine as engine
from distance_tpu.engine import Setup, run
from distance_tpu.fastaio import load_fastas
from distance_tpu.progress import ProgressTracker
from distance_tpu.writer import TsvWriter
from tests.conftest import make_fasta, random_seqs
from tests.test_golden import expected_square


class _Boom(Exception):
    pass


def make_setup(fasta, out_path, measure="raw", tile=8, resume=False):
    loaded = load_fastas([io.BytesIO(fasta)])
    if measure == "tn93":
        loaded[0].count_bases()
    tracker = ProgressTracker(str(out_path))
    if resume and tracker.load():
        out = open(out_path, "r+b")
        out.truncate(tracker.byte_offset)
        out.seek(tracker.byte_offset)
    else:
        out = open(out_path, "wb")
    return Setup(
        loaded=loaded,
        streamed=None,
        writer=TsvWriter(out),
        measure=measure,
        n_threads=1,
        batchsize=1,
        backend="numpy",
        tile_i=tile,
        tile_j=tile,
        progress=tracker,
    )


@pytest.fixture
def fasta(rng):
    return make_fasta(random_seqs(rng, 33, 60, amb_frac=0.2))


def test_interrupt_and_resume(tmp_path, fasta, monkeypatch):
    out = tmp_path / "d.tsv"
    # interrupt after 2 checkpoints
    orig = engine._progress_mark
    calls = {"n": 0}

    def bomb(setup, units):
        orig(setup, units)
        calls["n"] += 1
        if calls["n"] >= 2:
            raise _Boom()

    monkeypatch.setattr(engine, "_progress_mark", bomb)
    with pytest.raises(_Boom):
        run(make_setup(fasta, out))
    monkeypatch.setattr(engine, "_progress_mark", orig)

    assert (tmp_path / "d.tsv.progress").exists()
    run(make_setup(fasta, out, resume=True))
    assert out.read_bytes() == expected_square("raw", fasta)
    # sidecar cleared on success
    assert not (tmp_path / "d.tsv.progress").exists()


def test_resume_config_mismatch(tmp_path, fasta, monkeypatch):
    out = tmp_path / "d.tsv"
    orig = engine._progress_mark
    calls = {"n": 0}

    def bomb(setup, units):
        orig(setup, units)
        calls["n"] += 1
        if calls["n"] >= 1:
            raise _Boom()

    monkeypatch.setattr(engine, "_progress_mark", bomb)
    with pytest.raises(_Boom):
        run(make_setup(fasta, out, measure="raw"))
    monkeypatch.setattr(engine, "_progress_mark", orig)

    from distance_tpu.fastaio import DistanceError

    with pytest.raises(DistanceError, match="Cannot resume"):
        run(make_setup(fasta, out, measure="jc69", resume=True))


def test_cli_resume_fresh_run(tmp_path, fasta):
    fp = tmp_path / "a.fasta"
    fp.write_bytes(fasta)
    o = tmp_path / "out.tsv"
    r = subprocess.run(
        [sys.executable, "-m", "distance_tpu.cli", str(fp), "-m", "n",
         "--resume", "--backend", "numpy", "-o", str(o)],
        capture_output=True,
    )
    assert r.returncode == 0, r.stderr
    assert o.read_bytes() == expected_square("n", fasta)


def test_cli_resume_requires_output(tmp_path, fasta):
    fp = tmp_path / "a.fasta"
    fp.write_bytes(fasta)
    r = subprocess.run(
        [sys.executable, "-m", "distance_tpu.cli", str(fp), "--resume",
         "--backend", "numpy"],
        capture_output=True,
    )
    assert r.returncode == 1
    assert b"--resume requires -o" in r.stderr


def test_resume_refuses_swapped_input(tmp_path, fasta, monkeypatch):
    """The sidecar records input fingerprints; resuming against a changed
    input file is an error, not silent corruption."""
    from distance_tpu.cli import build_parser
    from distance_tpu.fastaio import DistanceError

    fp = tmp_path / "a.fasta"
    fp.write_bytes(fasta)
    out = tmp_path / "d.tsv"
    argv = [str(fp), "-m", "raw", "--backend", "numpy", "-o", str(out),
            "--resume"]
    setup = engine.set_up(build_parser().parse_args(argv))
    assert setup.input_fp and setup.input_fp[0]["size"] == len(fasta)

    orig = engine._progress_mark

    def bomb(s, units):
        orig(s, units)
        raise _Boom()

    monkeypatch.setattr(engine, "_progress_mark", bomb)
    with pytest.raises(_Boom):
        run(setup)
    monkeypatch.setattr(engine, "_progress_mark", orig)
    assert (tmp_path / "d.tsv.progress").exists()

    # swap the input: same width, one extra record
    fp.write_bytes(fasta + b">zz\n" + b"A" * 60 + b"\n")
    setup2 = engine.set_up(build_parser().parse_args(argv))
    with pytest.raises(DistanceError, match="Cannot resume"):
        run(setup2)


def test_auto_tiles_resolved_before_config_recorded(tmp_path, fasta):
    """Auto (0) tiles must be pinned to concrete values in the resume
    sidecar: the strip grid defines resume units, so recording the auto
    marker would let a later run resolve a DIFFERENT grid (other host
    RAM / device kind) and silently mis-skip strips."""
    out_path = tmp_path / "o.tsv"
    setup = make_setup(fasta, out_path, tile=8)
    setup.tile_i = 0
    setup.tile_j = 0
    run(setup)
    setup.writer.close()
    cfg = setup.progress.config
    assert cfg["tile_i"] > 0 and cfg["tile_j"] > 0
