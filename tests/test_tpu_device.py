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
