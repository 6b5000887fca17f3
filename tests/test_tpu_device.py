"""Opt-in real-device tests (DISTANCE_TPU_TEST_DEVICE=1).

The default suite forces the CPU backend; these run the same exactness
checks on whatever accelerator the ambient JAX config provides (the
manual checks from round-1 verification, codified).  Run with:

    DISTANCE_TPU_TEST_DEVICE=1 python -m pytest tests/test_tpu_device.py -q
"""

import os

import numpy as np
import pytest

if not os.environ.get("DISTANCE_TPU_TEST_DEVICE"):
    pytest.skip("device tests are opt-in", allow_module_level=True)


@pytest.fixture(scope="module")
def device_data():
    from distance_tpu.encoding import ALL_CODES

    rng = np.random.default_rng(0)
    x = rng.choice(ALL_CODES, size=(128, 1024)).astype(np.uint8)
    y = rng.choice(ALL_CODES, size=(256, 1024)).astype(np.uint8)
    return x, y


@pytest.mark.parametrize("measure", ["n_high", "raw", "k80", "tn93"])
def test_xla_counters_exact_on_device(measure, device_data):
    import jax.numpy as jnp

    from distance_tpu.engine import _counters_numpy
    from distance_tpu.ops.features import get_plan
    from distance_tpu.ops.pairwise_xla import counters_xla

    x, y = device_data
    plan = get_plan(measure)
    got = np.asarray(counters_xla(jnp.asarray(x), jnp.asarray(y), plan))
    assert np.array_equal(got, _counters_numpy(x, y, plan))


@pytest.mark.parametrize("measure", ["k80", "tn93"])  # fast Mosaic compiles
def test_pallas_counters_exact_on_device(measure, device_data):
    import jax.numpy as jnp

    from distance_tpu.engine import _counters_numpy
    from distance_tpu.ops.features import get_plan
    from distance_tpu.ops.pairwise_pallas import counters_pallas

    x, y = device_data
    plan = get_plan(measure)
    got = np.asarray(
        counters_pallas(jnp.asarray(x), jnp.asarray(y), plan, interpret=False)
    )
    assert np.array_equal(got, _counters_numpy(x, y, plan))


def test_engine_device_backend_matches_numpy(tmp_path):
    from tests.conftest import make_fasta, random_seqs
    from tests.test_golden import expected_square, run_engine

    rng = np.random.default_rng(3)
    fasta = make_fasta(random_seqs(rng, 40, 200, amb_frac=0.25))
    got, _ = run_engine("tn93", fasta, backend="xla", tile_i=8, tile_j=16)
    assert got == expected_square("tn93", fasta)


@pytest.mark.parametrize("measure", ["jc69", "tn93"])
def test_cli_production_defaults_match_numpy(tmp_path, measure):
    """Full product path on the real device at DEFAULT tile/pack
    settings: `python -m distance_tpu.cli` subprocess (device backend)
    byte-compared against the numpy-backend CLI on a bench-shaped
    low-diversity alignment (shared ancestor + point mutations + N/gap
    sprinkle), exercising the rel-pack ladder and the ordered writer
    end to end — the codified version of the round-2 on-chip smoke
    (400x29904 k80/tn93 byte-identical)."""
    import subprocess
    import sys

    from distance_tpu.encoding import A, C, G, T, N, GAP

    rng = np.random.default_rng(11)
    n, width = 256, 4096
    bases = np.array([A, C, G, T], dtype=np.uint8)
    mat = np.tile(rng.choice(bases, size=width), (n, 1))
    rows = np.repeat(np.arange(n), 20)
    mat[rows, rng.integers(0, width, size=n * 20)] = rng.choice(
        bases, size=n * 20
    )
    amb = rng.integers(0, n * width, size=n * width // 200)
    mat.reshape(-1)[amb] = np.where(
        rng.random(amb.size) < 0.8, N, GAP
    ).astype(np.uint8)
    inv = {A: "A", G: "G", C: "C", T: "T", N: "N", GAP: "-"}
    fp = tmp_path / "aln.fasta"
    with open(fp, "w") as f:
        for i, row in enumerate(mat):
            f.write(f">s{i}\n" + "".join(inv[b] for b in row) + "\n")

    def run_cli(backend, out):
        subprocess.run(
            [sys.executable, "-m", "distance_tpu.cli", str(fp),
             "-m", measure, "--backend", backend, "-o", str(out)],
            check=True, timeout=1200,
        )

    dev_out = tmp_path / "dev.tsv"
    np_out = tmp_path / "np.tsv"
    run_cli("xla", dev_out)
    run_cli("numpy", np_out)
    assert dev_out.read_bytes() == np_out.read_bytes()
