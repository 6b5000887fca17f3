"""Pallas kernel parity (interpreter mode on CPU)."""

import numpy as np
import pytest

from distance_tpu.engine import _counters_numpy
from distance_tpu.fastaio import encode_seq
from distance_tpu.measures import MEASURES
from distance_tpu.ops.features import get_plan
from tests.conftest import random_seqs


def encode_padded(recs, rows, width):
    mat = np.zeros((rows, width), dtype=np.uint8)
    for i, (rid, seq) in enumerate(recs):
        mat[i, : len(seq)] = encode_seq(rid, seq.encode())
    return mat


@pytest.mark.parametrize("measure", MEASURES)
def test_pallas_matches_numpy(measure):
    import jax.numpy as jnp

    from distance_tpu.ops.pairwise_pallas import counters_pallas

    rng = np.random.default_rng(11)
    x = encode_padded(random_seqs(rng, 14, 200, amb_frac=0.3), 16, 256)
    y = encode_padded(random_seqs(rng, 7, 200, amb_frac=0.3), 8, 256)
    plan = get_plan(measure)
    got = np.asarray(
        counters_pallas(jnp.asarray(x), jnp.asarray(y), plan, interpret=True)
    )
    want = _counters_numpy(x, y, plan)
    assert np.array_equal(got, want), measure


def test_pallas_multi_site_tiles():
    import jax.numpy as jnp

    from distance_tpu.ops.pairwise_pallas import counters_pallas

    rng = np.random.default_rng(13)
    # L_pad = 384 -> site tile 128, 3 grid steps (accumulation path)
    x = encode_padded(random_seqs(rng, 8, 380, amb_frac=0.2), 8, 384)
    plan = get_plan("raw")
    got = np.asarray(
        counters_pallas(jnp.asarray(x), jnp.asarray(x), plan, interpret=True)
    )
    want = _counters_numpy(x, x, plan)
    assert np.array_equal(got, want)
