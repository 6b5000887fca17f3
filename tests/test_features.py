"""The bilinear decompositions must reproduce the byte predicates exactly
over every pair of valid codes, and the device feature builder must agree
with the host LUTs for every byte."""

import numpy as np
import pytest

from distance_tpu.encoding import ALL_CODES
from distance_tpu.measures import MEASURE_COUNTERS, MEASURES
from distance_tpu.ops.features import (
    COUNTER_CHANNELS,
    counter_luts,
    features_device,
    get_plan,
    reference_counter_matrix,
)


def predicate_tables():
    a = ALL_CODES.astype(np.int32)
    X, Y = np.meshgrid(a, a, indexing="ij")
    diffb = (X & Y) < 16
    known = ((X & 8) == 8) & ((Y & 8) == 8)
    pur_x, pur_y = (X & 55) == 0, (Y & 55) == 0
    pyr_x, pyr_y = (X & 199) == 0, (Y & 199) == 0
    return a, {
        "diff": diffb,
        "same": (X == Y) & ((X & 8) == 8),
        "ts": diffb & ((pur_x & pur_y) | (pyr_x & pyr_y)),
        "tv": diffb & ((pur_x & pyr_y) | (pyr_x & pur_y)),
        "kk": known,
        "p1": diffb & known & ((X | Y) == 200),
        "p2": diffb & known & ((X | Y) == 56),
    }


@pytest.mark.parametrize("name", sorted(COUNTER_CHANNELS))
def test_decomposition_exact(name):
    codes, preds = predicate_tables()
    got = reference_counter_matrix(name)[np.ix_(codes, codes)]
    want = preds[name].astype(np.int32)
    assert np.array_equal(got, want)


def test_padding_code_contributes_zero():
    # code 0 (padding) must produce zero features in every channel so
    # padded sites/rows never affect any counter.
    for name in COUNTER_CHANNELS:
        f, g = counter_luts(name)
        assert (f[:, 0] == 0).all(), name
        assert (g[:, 0] == 0).all(), name


@pytest.mark.parametrize("measure", MEASURES)
def test_plan_slices(measure):
    plan = get_plan(measure)
    assert plan.counters == MEASURE_COUNTERS[measure]
    assert plan.f_luts.shape == (plan.total_channels, 256)
    if plan.mix_num is not None:
        # shared-channel plan: one weight row per counter, exact mixes
        assert plan.slices == ()
        assert plan.mix_num.shape == (
            len(plan.counters), plan.total_channels,
        )
        assert plan.mix_den.shape == (len(plan.counters),)
        assert (plan.mix_den > 0).all()
    else:
        total = sum(hi - lo for _, lo, hi in plan.slices)
        assert total == plan.total_channels


def test_shared_plans_match_counter_matrices():
    """Shared-channel plans (k80: 6 channels, tn93: 5) must reproduce each
    counter's exact 256x256 weight matrix: (mix_num . f^T g) / mix_den ==
    the canonical per-counter decomposition, for every byte pair."""
    from distance_tpu.ops.features import SHARED_MEASURE_CHANNELS

    for measure, (channels, _) in SHARED_MEASURE_CHANNELS.items():
        plan = get_plan(measure)
        assert plan.mix_num is not None
        assert plan.total_channels == len(channels)
        o = np.einsum(
            "rx,ry->rxy",
            plan.f_luts.astype(np.int64),
            plan.g_luts.astype(np.int64),
        )
        mixed = np.tensordot(plan.mix_num, o, axes=([1], [0]))
        # numerators must be exactly divisible (per byte pair)
        assert (mixed % plan.mix_den[:, None, None] == 0).all(), measure
        mixed = mixed // plan.mix_den[:, None, None]
        for g, name in enumerate(plan.counters):
            assert np.array_equal(
                mixed[g], reference_counter_matrix(name).astype(np.int64)
            ), (measure, name)


def test_shared_plan_channel_counts_and_bounds():
    """k80 = 6 shared channels, tn93 = 5 (both proven minimal — see the
    features.py docstring); factors stay in {-1, 0, 1} over every byte
    the encoder can produce (the 17 valid codes plus padding 0)."""
    assert get_plan("k80").total_channels == 6
    assert get_plan("tn93").total_channels == 5
    cols = np.concatenate([[0], ALL_CODES]).astype(np.int64)
    for measure in ("k80", "tn93"):
        plan = get_plan(measure)
        assert set(np.unique(plan.f_luts[:, cols])) <= {-1, 0, 1}
        assert set(np.unique(plan.g_luts[:, cols])) <= {-1, 0, 1}


@pytest.mark.parametrize("measure", MEASURES)
def test_device_features_match_luts_numpy(measure):
    plan = get_plan(measure)
    codes = np.arange(256, dtype=np.uint8).reshape(2, 128)
    for side, luts in (("f", plan.f_luts), ("g", plan.g_luts)):
        feats = features_device(codes, plan, side, np, np.int32)
        want = luts[:, codes.reshape(-1).astype(np.int32)].reshape(
            plan.total_channels, 2, 128
        )
        assert np.array_equal(feats, want.astype(np.int32)), (measure, side)


@pytest.mark.parametrize("measure", MEASURES)
def test_device_features_match_luts_jax(measure):
    import jax.numpy as jnp

    plan = get_plan(measure)
    codes = np.arange(256, dtype=np.uint8).reshape(2, 128)
    for side, luts in (("f", plan.f_luts), ("g", plan.g_luts)):
        feats = np.asarray(
            features_device(jnp.asarray(codes), plan, side, jnp, "int8")
        )
        want = luts[:, codes.reshape(-1).astype(np.int32)].reshape(
            plan.total_channels, 2, 128
        )
        assert np.array_equal(feats, want), (measure, side)


def test_diff_decomposition_is_rank_minimal():
    """The disjointness predicate has bilinear rank exactly 14 (nibble 15
    intersects everything; nibbles 1..14 give an invertible matrix), and
    the diff counter uses exactly that many channels."""
    from distance_tpu.ops.features import COUNTER_CHANNELS

    assert len(COUNTER_CHANNELS["diff"]) == 14
    m = np.zeros((16, 16), dtype=np.int64)
    for x in range(16):
        for y in range(16):
            m[x, y] = 1 if (x & y) == 0 else 0
    sub = m[1:15, 1:15]
    assert np.linalg.matrix_rank(sub) == 14  # no further reduction exists
    assert not m[15, 1:].any() and not m[1:, 15].any()
