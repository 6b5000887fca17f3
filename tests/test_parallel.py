"""Multi-device sharding parity on the 8-way virtual CPU mesh."""

import numpy as np
import pytest

from distance_tpu.engine import _counters_numpy
from distance_tpu.fastaio import encode_seq
from distance_tpu.ops.features import get_plan
from tests.conftest import random_seqs


def encode_padded(recs, rows, width):
    mat = np.zeros((rows, width), dtype=np.uint8)
    for i, (rid, seq) in enumerate(recs):
        mat[i, : len(seq)] = encode_seq(rid, seq.encode())
    return mat


@pytest.fixture(scope="module")
def mesh8():
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from distance_tpu.parallel.mesh import make_mesh

    return make_mesh(8, sp=2)


@pytest.mark.parametrize("measure", ["n_high", "raw", "k80", "tn93"])
def test_sharded_counters_exact(measure, mesh8):
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from distance_tpu.parallel.mesh import sharded_counters_fn

    rng = np.random.default_rng(5)
    # dp=4, sp=2: y rows divisible by 4, width by 2*128
    x = encode_padded(random_seqs(rng, 14, 250, amb_frac=0.25), 16, 256)
    y = encode_padded(random_seqs(rng, 15, 250, amb_frac=0.25), 16, 256)
    want = _counters_numpy(x, y, get_plan(measure))

    xs = jax.device_put(x, NamedSharding(mesh8, P(None, "sp")))
    ys = jax.device_put(y, NamedSharding(mesh8, P("dp", "sp")))
    fn = sharded_counters_fn(measure, mesh8)
    got = np.asarray(fn(xs, ys))
    assert np.array_equal(got, want)


def test_engine_auto_shards_over_devices():
    """With 8 virtual devices and tj % ndev == 0, the engine's xla
    backend partitions blocks across the mesh and output bytes are
    unchanged."""
    import jax

    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    from distance_tpu.engine import _BlockEngine
    from tests.conftest import make_fasta, random_seqs
    from tests.test_golden import expected_square, run_engine

    eng = _BlockEngine("raw", "xla", 8, 16, 100)
    assert eng.sharded
    rng = np.random.default_rng(9)
    fasta = make_fasta(random_seqs(rng, 30, 120, amb_frac=0.2))
    got, _ = run_engine("raw", fasta, backend="xla", tile_i=8, tile_j=16)
    assert got == expected_square("raw", fasta)


def test_graft_dryrun():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_graft_entry_compiles():
    import jax

    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[0] == 2


def test_engine_stream_shards_over_devices(monkeypatch):
    """Stream mode with the xla backend on the 8-device mesh (fused
    group dispatch, sharded columns) emits the exact single-device
    bytes."""
    import jax

    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    from tests.conftest import make_fasta, random_seqs
    from tests.test_golden import run_engine

    monkeypatch.setenv("DISTANCE_TPU_STREAM_GROUP", "16")
    rng = np.random.default_rng(21)
    f1 = make_fasta(random_seqs(rng, 18, 120, amb_frac=0.2))
    f2 = make_fasta(random_seqs(rng, 37, 120, amb_frac=0.2))
    for measure in ("n_high", "tn93"):
        got, _ = run_engine(measure, f1, stream=f2, backend="xla")
        want, _ = run_engine(measure, f1, stream=f2, backend="numpy")
        assert got == want, measure


def test_tile_rounding_keeps_rel4_shardable(monkeypatch):
    """A tile_j that divides the mesh but whose HALF does not (40 on 8
    devices) would silently lose the rel4 packing rung under GSPMD;
    _choose_tiles must round it to a multiple of 2*ndev and the engine
    must keep rel4 usable — with byte parity."""
    import jax

    if jax.device_count() != 8:
        pytest.skip("needs 8 virtual devices")
    import distance_tpu.engine as engine
    from tests.conftest import make_fasta
    from tests.test_golden import expected_square, run_engine

    setup = engine.Setup.__new__(engine.Setup)
    setup.tile_i, setup.tile_j = 8, 40
    ti, tj = engine._choose_tiles(64, 64, setup, backend="xla")
    assert tj == 48 and (tj // 2) % 8 == 0

    eng = engine._BlockEngine("raw", "xla", 8, 48, 120)
    assert eng.sharded and eng._rel4_shard_ok

    # end-to-end: low-diversity fixture so the ladder actually picks
    # rel4; user tile 40 rounds up and bytes still match the oracle
    rng = np.random.default_rng(77)
    anc = rng.choice(list("ACGT"), size=120)
    recs = []
    for i in range(30):
        s = anc.copy()
        for p in rng.choice(120, 2, replace=False):
            s[p] = "ACGT"[(("ACGT".index(s[p])) + 1) % 4]
        recs.append((f"s{i}", "".join(s)))
    fasta = make_fasta(recs)
    got, _ = run_engine("raw", fasta, backend="xla", tile_i=8, tile_j=40)
    assert got == expected_square("raw", fasta)


def test_tile_rounding_stays_on_ti_grid_nonpow2_devices(monkeypatch):
    """On a non-power-of-two device count, rounding tile_j to the mesh
    alone would take it off the tile_i grid; block column starts would
    then exceed prepare()'s row padding and dynamic_slice would CLAMP —
    silently shifting the block's columns.  tile_j must round to a
    multiple of lcm(2*ndev, tile_i)."""
    import jax

    import distance_tpu.engine as engine

    monkeypatch.setattr(jax, "device_count", lambda: 6)
    setup = engine.Setup.__new__(engine.Setup)
    setup.tile_i, setup.tile_j = 1024, 4096
    ti, tj = engine._choose_tiles(10_000, 10_000, setup, backend="xla")
    assert tj % ti == 0 and (tj // 2) % 6 == 0, (ti, tj)
    # the padding invariant the fix restores: every block column start
    # (a multiple of ti) plus tj fits in prepare()'s padded rows
    n = 10_000
    n_strips = -(-n // ti)
    n_pad = (n_strips - 1) * ti + max(tj, ti)
    worst_start = ((n - 1) // ti) * ti
    assert worst_start + tj <= n_pad


def test_tile_i_capped_against_int32_pair_positions():
    """_tri_indices builds int32 position arithmetic over one strip's
    pairs; _choose_tiles must shrink tile_i so ti * n stays below 2^31
    (a wrap would silently corrupt emission indices)."""
    import distance_tpu.engine as engine

    setup = engine.Setup.__new__(engine.Setup)
    setup.tile_i, setup.tile_j = 1024, 4096
    ti, _ = engine._choose_tiles(3_000_000, 3_000_000, setup,
                                 backend="numpy")
    assert ti * 3_000_000 < (1 << 31) and ti >= 8, ti
