"""Counter packing round trips losslessly for every measure."""

import numpy as np
import pytest

from distance_tpu.measures import MEASURES
from distance_tpu.ops.features import get_plan
from distance_tpu.ops.packing import PACK_LIMIT, pack_device, unpack_host


@pytest.mark.parametrize("measure", MEASURES)
def test_roundtrip_numpy(measure, rng):
    plan = get_plan(measure)
    g = len(plan.counters)
    c = rng.integers(0, PACK_LIMIT, size=(g, 5, 7)).astype(np.int32)

    packed = pack_device(measure, c, np)
    assert packed.dtype in (np.int16, np.int32)
    out = unpack_host(measure, np.asarray(packed))
    assert np.array_equal(out, c)


@pytest.mark.parametrize("measure", MEASURES)
def test_roundtrip_jax(measure, rng):
    import jax.numpy as jnp

    plan = get_plan(measure)
    g = len(plan.counters)
    c = rng.integers(0, PACK_LIMIT, size=(g, 4, 6)).astype(np.int32)
    packed = pack_device(measure, jnp.asarray(c), jnp)
    out = unpack_host(measure, np.asarray(packed))
    assert np.array_equal(out, c)


def test_engine_packed_blocks_match_unpacked():
    """XLA backend with packing produces the same TSV as numpy backend."""
    import io

    from distance_tpu.fastaio import load_fastas
    from tests.conftest import make_fasta, random_seqs
    from tests.test_golden import run_engine, expected_square

    rng = np.random.default_rng(77)
    fasta = make_fasta(random_seqs(rng, 20, 80, amb_frac=0.25))
    for measure in MEASURES:
        got, _ = run_engine(measure, fasta, backend="xla", tile_i=8, tile_j=16)
        assert got == expected_square(measure, fasta), measure
