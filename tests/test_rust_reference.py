"""Golden parity against the actual Rust reference binary.

Everything else in the suite checks against an in-repo oracle that
mirrors /root/reference/src/measures.rs semantics.  This module closes
the loop on machines that have a Rust toolchain: it cargo-builds the
reference and byte-compares stdout/stderr/exit codes across measures,
modes, and special-value inputs.

Gated: requires ``DISTANCE_TPU_TEST_RUST=1`` and ``cargo`` on PATH
(the build needs crates.io access on first run); skipped otherwise.
"""

import os
import shutil
import subprocess
import sys

import numpy as np
import pytest

from tests.conftest import make_fasta, random_seqs

REFERENCE = os.environ.get("DISTANCE_TPU_REFERENCE", "/root/reference")

pytestmark = pytest.mark.skipif(
    not (
        os.environ.get("DISTANCE_TPU_TEST_RUST") == "1"
        and shutil.which("cargo")
        and os.path.exists(os.path.join(REFERENCE, "Cargo.toml"))
    ),
    reason="rust-binary parity needs DISTANCE_TPU_TEST_RUST=1 + cargo"
    " + the reference checkout",
)


@pytest.fixture(scope="module")
def rust_binary(tmp_path_factory):
    target = str(tmp_path_factory.mktemp("cargo_target"))
    env = dict(os.environ, CARGO_TARGET_DIR=target)
    r = subprocess.run(
        ["cargo", "build", "--release"],
        cwd=REFERENCE, env=env, capture_output=True, timeout=1800,
    )
    assert r.returncode == 0, r.stderr.decode()
    return os.path.join(target, "release", "distance")


def both(rust_binary, args, stdin: bytes = None):
    ours = subprocess.run(
        [sys.executable, "-m", "distance_tpu.cli"] + args + [
            "--backend", "numpy",
        ],
        input=stdin, capture_output=True,
    )
    theirs = subprocess.run(
        [rust_binary] + args, input=stdin, capture_output=True,
    )
    return ours, theirs


@pytest.fixture(scope="module")
def fixtures(tmp_path_factory):
    d = tmp_path_factory.mktemp("fixtures")
    rng = np.random.default_rng(99)
    a = d / "a.fasta"
    b = d / "b.fasta"
    a.write_bytes(make_fasta(random_seqs(rng, 23, 90, amb_frac=0.25)))
    b.write_bytes(make_fasta(random_seqs(rng, 9, 90, amb_frac=0.25)))
    # special values: identical pair (raw 0 / jc69 -0.0), saturated
    # jc69 (p >= 3/4 -> inf/NaN), all-ambiguous (0/0 -> NaN), lower-case
    s = d / "special.fasta"
    s.write_bytes(
        b">same1\nACGTACGT\n>same2\nACGTACGT\n"
        b">far\nTGCATGCA\n>amb\nNNNNNNNN\n"
        b">low\nacgtacgt\n"
    )
    return str(a), str(b), str(s)


@pytest.mark.parametrize(
    "measure", ["n", "n_high", "raw", "jc69", "k80", "tn93"]
)
def test_square_stdout_identical(rust_binary, fixtures, measure):
    a, _b, _s = fixtures
    ours, theirs = both(rust_binary, [a, "-m", measure])
    assert ours.returncode == theirs.returncode == 0
    assert ours.stdout == theirs.stdout


@pytest.mark.parametrize("measure", ["n", "raw", "jc69", "k80", "tn93"])
def test_specials_identical(rust_binary, fixtures, measure):
    _a, _b, s = fixtures
    ours, theirs = both(rust_binary, [s, "-m", measure])
    assert ours.returncode == theirs.returncode == 0
    assert ours.stdout == theirs.stdout


@pytest.mark.parametrize("measure", ["n", "raw", "tn93"])
def test_rectangle_identical(rust_binary, fixtures, measure):
    a, b, _s = fixtures
    ours, theirs = both(rust_binary, [a, b, "-m", measure])
    assert ours.returncode == theirs.returncode == 0
    assert ours.stdout == theirs.stdout


@pytest.mark.parametrize("batch", [1, 3])
@pytest.mark.parametrize("measure", ["n", "raw", "tn93"])
def test_stream_identical(rust_binary, fixtures, measure, batch):
    a, b, _s = fixtures
    ours, theirs = both(
        rust_binary, ["-i", a, "-s", b, "-m", measure, "-b", str(batch)]
    )
    assert ours.returncode == theirs.returncode == 0
    assert ours.stdout == theirs.stdout


def test_stdin_identical(rust_binary, fixtures):
    a, _b, _s = fixtures
    data = open(a, "rb").read()
    ours, theirs = both(rust_binary, ["-m", "jc69"], stdin=data)
    assert ours.returncode == theirs.returncode == 0
    assert ours.stdout == theirs.stdout


@pytest.mark.parametrize(
    "content",
    [
        b">x\nACGT\n>y\nACXT\n",      # invalid nucleotide
        b">x\nACGT\n>y\nACG\n",       # ragged
        b"",                           # empty
    ],
)
def test_errors_identical(rust_binary, tmp_path, content):
    f = tmp_path / "bad.fasta"
    f.write_bytes(content)
    ours, theirs = both(rust_binary, [str(f), "-m", "raw"])
    assert ours.returncode == theirs.returncode == 1
    assert ours.stderr == theirs.stderr


def test_help_reference_section_identical(rust_binary):
    """Our -h reproduces clap 4.5's rendering of the reference options;
    everything above the engine-extensions section must match the Rust
    binary's --help byte-for-byte."""
    ours = subprocess.run(
        [sys.executable, "-m", "distance_tpu.cli", "--help"],
        capture_output=True,
    )
    theirs = subprocess.run([rust_binary, "--help"], capture_output=True)
    assert ours.returncode == theirs.returncode == 0
    prefix = ours.stdout.split(b"\nEngine extensions", 1)[0]
    assert theirs.stdout.rstrip(b"\n").endswith(b"Print version")
    assert theirs.stdout.startswith(prefix), (
        prefix.decode(), theirs.stdout.decode()
    )
