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


@pytest.mark.parametrize("measure", MEASURES)
def test_narrow_roundtrip(measure, rng):
    from distance_tpu.ops.packing import pack_device_narrow, unpack_host_narrow

    plan = get_plan(measure)
    g = len(plan.counters)
    width = 1000
    # construct consistent small counters: same ~ width, others < 255
    same = width - rng.integers(0, 200, size=(4, 6)).astype(np.int32)
    small = rng.integers(0, 100, size=(g, 4, 6)).astype(np.int32)
    c = small.copy()
    if measure in ("raw", "jc69"):
        c[1] = width - c[0] - rng.integers(0, 100, size=(4, 6))
    elif measure == "k80":
        c[0] = width - c[1] - c[2] - rng.integers(0, 50, size=(4, 6))
    elif measure == "tn93":
        c[1] = width - rng.integers(0, 100, size=(4, 6))  # kk
        c[0] = c[1] - rng.integers(0, 100, size=(4, 6))  # same
    packed = pack_device_narrow(measure, c, width, np)
    assert packed.dtype == np.int8
    out = unpack_host_narrow(measure, packed, width)
    assert out is not None
    assert np.array_equal(out, c)


def test_narrow_detects_saturation():
    from distance_tpu.ops.packing import pack_device_narrow, unpack_host_narrow

    width = 1000
    c = np.array([[[300]], [[650]]], dtype=np.int32)  # diff=300 saturates
    packed = pack_device_narrow("raw", c, width, np)
    assert unpack_host_narrow("raw", packed, width) is None


def test_engine_wide_refetch_on_diverse_data():
    """Sequences differing at >255 sites force the wide refetch path."""
    from tests.test_golden import run_engine, expected_square

    rng = np.random.default_rng(123)
    width = 600
    # two clusters differing everywhere -> diff counts ~ width > 255
    base1 = rng.choice(list("AG"), size=width)
    base2 = rng.choice(list("CT"), size=width)
    recs = []
    for i in range(6):
        src = base1 if i % 2 == 0 else base2
        s = src.copy()
        for p in rng.choice(width, 5, replace=False):
            s[p] = rng.choice(list("ACGT"))
        recs.append((f"s{i}", "".join(s)))
    fasta = ("".join(f">{r}\n{s}\n" for r, s in recs)).encode()
    for measure in MEASURES:
        got, _ = run_engine(measure, fasta, backend="xla", tile_i=8, tile_j=8)
        assert got == expected_square(measure, fasta), measure


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


def test_sticky_escalation_ladder():
    """With a reference row the ladder is rel4 -> rel -> narrow/wide;
    without one it is the historical narrow -> wide.  A clean fetch
    resets each streak."""
    from distance_tpu.engine import NARROW_STICKY_LIMIT, _BlockEngine

    # tile_j 16: rel4's halved lane axis must divide the 8-device mesh
    eng = _BlockEngine("raw", "xla", 8, 16, width=600)
    # no reference row: narrow -> (saturations) -> wide
    assert eng.packed and eng.pack_mode == "narrow"
    for _ in range(NARROW_STICKY_LIMIT - 1):
        eng.note_narrow(True)
    assert eng.pack_mode == "narrow"
    eng.note_narrow(False)  # one clean fetch resets
    assert eng.pack_mode == "narrow"
    for _ in range(NARROW_STICKY_LIMIT):
        eng.note_narrow(True)
    assert eng.pack_mode == "wide"
    # reference row present: rel4 first (half bytes), then rel, then the
    # narrow/wide rung the streaks already selected
    eng.rel_ref = object()  # any device ref
    assert eng.pack_mode == "rel4"
    assert eng.stream_pack_mode == "rel4"
    for _ in range(NARROW_STICKY_LIMIT - 1):
        eng.note_rel4(True)
    assert eng.pack_mode == "rel4"
    eng.note_rel4(False)  # clean fetch resets
    assert eng.pack_mode == "rel4"
    for _ in range(NARROW_STICKY_LIMIT):
        eng.note_rel4(True)
    assert eng.pack_mode == "rel"
    assert eng.stream_pack_mode == "rel"
    for _ in range(NARROW_STICKY_LIMIT):
        eng.note_rel(True)
    assert eng.pack_mode == "wide"
    assert eng.stream_pack_mode == "wide"


def test_rel4_pack_roundtrip_and_saturation():
    from distance_tpu.ops.packing import (
        REL4_EXC_CAP, REL4_SAT, finish_host_rel4, pack_device_rel4,
        unpack_rel4_nibbles,
    )

    rng = np.random.default_rng(9)
    G, m, n = 4, 5, 8  # even column axis (device blocks are tile-padded)
    rb = rng.integers(0, 500, (G, m)).astype(np.int32)
    cb = rng.integers(0, 500, (G, n)).astype(np.int32)
    cc = rng.integers(0, 500, G).astype(np.int32)
    res = rng.integers(-7, 8, (G, m, n)).astype(np.int32)
    c = res + rb[:, :, None] + cb[:, None, :] - cc[:, None, None]
    lanes, exc_idx, exc_val = pack_device_rel4(c, rb, cb, cc, np)
    assert lanes.dtype == np.int8 and lanes.shape == (G, m, n // 2)
    assert exc_idx.shape == (REL4_EXC_CAP,) and (exc_idx == -1).all()
    got = finish_host_rel4(unpack_rel4_nibbles(lanes), rb, cb, cc)
    assert np.array_equal(got, c)
    # odd crop: expanding then cropping drops the padding nibble
    crop = unpack_rel4_nibbles(lanes)[:, :, : n - 1]
    got = finish_host_rel4(crop, rb, cb[:, : n - 1], cc)
    assert np.array_equal(got, c[:, :, : n - 1])
    # out-of-range residuals ship in the exception sidecar
    c[1, 2, 3] += 50
    lanes, exc_idx, exc_val = pack_device_rel4(c, rb, cb, cc, np)
    res2 = unpack_rel4_nibbles(lanes)
    assert res2[1, 2, 3] == REL4_SAT
    flat_pos = (1 * m + 2) * n + 3
    sel = exc_idx >= 0
    assert flat_pos in exc_idx[sel]
    res2.reshape(-1)[exc_idx[sel]] = exc_val[sel]
    got = finish_host_rel4(res2, rb, cb, cc)
    assert np.array_equal(got, c)
    # an unpatched sentinel (sidecar overflow) still returns None
    res3 = unpack_rel4_nibbles(lanes)
    assert finish_host_rel4(res3, rb, cb, cc) is None
    # masked cells (square-sweep diagonal / padding) are zeroed — they
    # neither saturate nor consume sidecar slots
    mask = np.zeros((m, n), dtype=bool)
    mask[2, 3] = True
    lanes, exc_idx, _ = pack_device_rel4(c, rb, cb, cc, np, mask)
    assert unpack_rel4_nibbles(lanes)[1, 2, 3] == 0
    assert (exc_idx == -1).all()


def test_rel4_segment_overflow_leaves_sentinel():
    """>= 3 outliers in one extraction segment: first/last patch, the
    middle one stays -8 -> finish returns None (wide refetch)."""
    from distance_tpu.ops.packing import (
        REL4_SEGMENTS, finish_host_rel4, pack_device_rel4,
        unpack_rel4_nibbles,
    )

    G, m, n = 1, 130, 128  # n_flat > REL4_SEGMENTS -> seg_len >= 2
    assert G * m * n > REL4_SEGMENTS
    rb = np.zeros((G, m), np.int32)
    cb = np.zeros((G, n), np.int32)
    cc = np.zeros(G, np.int32)
    c = np.zeros((G, m, n), np.int32)
    c[0, 0, 0], c[0, 0, 1], c[0, 0, 2] = 100, 101, 102  # one segment
    lanes, exc_idx, exc_val = pack_device_rel4(c, rb, cb, cc, np)
    res = unpack_rel4_nibbles(lanes)
    sel = exc_idx >= 0
    res.reshape(-1)[exc_idx[sel]] = exc_val[sel]
    assert finish_host_rel4(res, rb, cb, cc) is None
    # with only two outliers in the segment, both patch and it succeeds
    c[0, 0, 1] = 0
    lanes, exc_idx, exc_val = pack_device_rel4(c, rb, cb, cc, np)
    res = unpack_rel4_nibbles(lanes)
    sel = exc_idx >= 0
    res.reshape(-1)[exc_idx[sel]] = exc_val[sel]
    assert np.array_equal(finish_host_rel4(res, rb, cb, cc), c)


def test_rel4_jax_pack_matches_numpy():
    import jax.numpy as jnp

    from distance_tpu.ops.packing import pack_device_rel4

    rng = np.random.default_rng(10)
    G, m, n = 2, 6, 8
    rb = rng.integers(0, 300, (G, m)).astype(np.int32)
    cb = rng.integers(0, 300, (G, n)).astype(np.int32)
    cc = rng.integers(0, 300, G).astype(np.int32)
    res = rng.integers(-9, 10, (G, m, n)).astype(np.int32)  # some outliers
    c = res + rb[:, :, None] + cb[:, None, :] - cc[:, None, None]
    l_np, i_np, v_np = pack_device_rel4(c, rb, cb, cc, np)
    l_j, i_j, v_j = pack_device_rel4(
        jnp.asarray(c), jnp.asarray(rb), jnp.asarray(cb), jnp.asarray(cc),
        jnp,
    )
    assert np.array_equal(l_np, np.asarray(l_j))
    assert np.array_equal(i_np, np.asarray(i_j))
    assert np.array_equal(v_np, np.asarray(v_j))


def test_rel_pack_roundtrip_and_saturation():
    from distance_tpu.ops.packing import (
        REL_SAT, pack_device_rel, unpack_host_rel,
    )

    rng = np.random.default_rng(8)
    G, m, n = 3, 5, 7
    rb = rng.integers(0, 500, (G, m)).astype(np.int32)
    cb = rng.integers(0, 500, (G, n)).astype(np.int32)
    cc = rng.integers(0, 500, G).astype(np.int32)
    res = rng.integers(-127, 128, (G, m, n)).astype(np.int32)
    c = res + rb[:, :, None] + cb[:, None, :] - cc[:, None, None]
    lanes = pack_device_rel(c, rb, cb, cc, np)
    assert lanes.dtype == np.int8
    out = unpack_host_rel(lanes, rb, cb, cc)
    assert np.array_equal(out, c)
    # one out-of-range residual -> sentinel -> None
    c[1, 2, 3] += 4000
    lanes = pack_device_rel(c, rb, cb, cc, np)
    assert lanes[1, 2, 3] == REL_SAT
    assert unpack_host_rel(lanes, rb, cb, cc) is None


def test_engine_square_rel_pack_exact(monkeypatch):
    """Force the square sweep onto rel packing (single device via an
    indivisible tile_j, narrow streak pre-saturated) — bytes must match
    the oracle on diverse data."""
    import distance_tpu.engine as engine
    from tests.test_golden import expected_square, run_engine

    monkeypatch.setattr(engine, "NARROW_STICKY_LIMIT", 1)
    rng = np.random.default_rng(55)
    width = 600
    base1 = rng.choice(list("AG"), size=width)
    base2 = rng.choice(list("CT"), size=width)
    recs = []
    for i in range(9):
        src = base1 if i % 2 == 0 else base2
        s = src.copy()
        for p in rng.choice(width, 5, replace=False):
            s[p] = rng.choice(list("ACGTN"))
        recs.append((f"s{i}", "".join(s)))
    fasta = ("".join(f">{r}\n{s}\n" for r, s in recs)).encode()
    for measure in MEASURES:
        got, _ = run_engine(measure, fasta, backend="xla",
                            tile_i=4, tile_j=6)
        assert got == expected_square(measure, fasta), measure


def test_engine_rect_rel_pack_exact(monkeypatch):
    """Rectangle sweep through the rel ladder (both matrices prepared
    on one engine; the shared reference row is exact for any ref)."""
    import distance_tpu.engine as engine
    from tests.conftest import make_fasta, random_seqs
    from tests.test_golden import expected_rect, run_engine

    monkeypatch.setattr(engine, "NARROW_STICKY_LIMIT", 1)
    rng = np.random.default_rng(56)
    f1 = make_fasta(random_seqs(rng, 9, 300, amb_frac=0.15))
    f2 = make_fasta(random_seqs(rng, 7, 300, amb_frac=0.15))
    for measure in ("raw", "k80", "tn93"):
        got, _ = run_engine(measure, f1, fasta2=f2, backend="xla",
                            tile_i=4, tile_j=6)
        assert got == expected_rect(measure, f1, f2), measure


def test_unpacked_width_ladder_is_rel_then_none():
    """At widths >= PACK_LIMIT there are no narrow/wide rungs; the
    ladder is rel4 -> rel (when a reference exists) -> none (raw
    int32)."""
    from distance_tpu.engine import NARROW_STICKY_LIMIT, _BlockEngine

    # tile_j 16: on the test mesh (8 virtual devices) the halved rel4
    # lane axis must still divide the device count
    eng = _BlockEngine("raw", "xla", 8, 16, width=PACK_LIMIT + 100)
    assert not eng.packed
    assert eng.pack_mode == "none"  # no reference row yet
    eng.rel_ref = object()
    assert eng.pack_mode == "rel4"
    for _ in range(NARROW_STICKY_LIMIT):
        eng.note_rel4(True)
    assert eng.pack_mode == "rel"
    assert eng.stream_pack_mode == "rel"
    for _ in range(NARROW_STICKY_LIMIT):
        eng.note_rel(True)
    assert eng.pack_mode == "none"
    assert eng.stream_pack_mode == "none"


def _wide_private_fasta(n, per_record):
    """Alignment whose VARIANT width (what the engine sweeps after
    invariant-column pruning) is n*per_record: each record mutates its
    own private column block of a shared ancestor.  Pairwise divergence
    overlaps are empty, so rel residuals are exactly representable."""
    rng = np.random.default_rng(57)
    width = n * per_record + 96
    ancestor = rng.choice(list("ACGT"), size=width)
    nxt = {"A": "C", "C": "G", "G": "T", "T": "A"}
    recs = []
    for i in range(n):
        s = ancestor.copy()
        for p in range(i * per_record, (i + 1) * per_record):
            s[p] = nxt[s[p]]
        recs.append((f"s{i}", "".join(s)))
    return ("".join(f">{r}\n{q}\n" for r, q in recs)).encode()


def _count_rel_unpacks(monkeypatch):
    """Record every rel-family unpack outcome (True = lanes held)."""
    import distance_tpu.engine as engine
    from distance_tpu.ops import packing

    outcomes = []
    real8 = packing.unpack_host_rel
    real4 = packing.finish_host_rel4
    real4n = engine._rel4_finish_native

    def counting8(*a, **kw):
        out = real8(*a, **kw)
        outcomes.append(out is not None)
        return out

    def counting4(*a, **kw):
        out = real4(*a, **kw)
        outcomes.append(out is not None)
        return out

    def counting4n(*a, **kw):
        out = real4n(*a, **kw)
        outcomes.append(out is not None)
        return out

    monkeypatch.setattr(packing, "unpack_host_rel", counting8)
    monkeypatch.setattr(packing, "finish_host_rel4", counting4)
    monkeypatch.setattr(engine, "_rel4_finish_native", counting4n)
    return outcomes


def test_engine_square_rel_pack_unpacked_width(monkeypatch):
    """Rel packing at an unpacked VARIANT width (>= 2^16 sweep columns,
    where narrow/wide lanes can't hold the counters): prepare() installs
    a reference row, blocks travel as int8 residual lanes (asserted via
    a counting unpack wrapper), and bytes match the oracle."""
    from distance_tpu.engine import _BlockEngine
    from tests.test_golden import expected_square, run_engine

    n, per_record = 24, 2800
    f1 = _wide_private_fasta(n, per_record)  # 67200 variant columns

    eng = _BlockEngine("raw", "xla", 4, 16, width=n * per_record)
    assert not eng.packed
    eng.prepare(np.zeros((n, n * per_record), np.uint8), max_block=16)
    assert eng.rel_ref is not None
    assert eng.pack_mode == "rel4"

    outcomes = _count_rel_unpacks(monkeypatch)
    for measure in ("n_high", "raw", "tn93"):
        got, _ = run_engine(measure, f1, backend="xla", tile_i=4, tile_j=6)
        assert got == expected_square(measure, f1), measure
    assert outcomes and all(outcomes)


def test_engine_square_rel_saturation_unpacked_width(monkeypatch):
    """Fully random records overlap the reference divergences on far
    more than 127 columns at this width, so rel blocks saturate; the
    refetch rung at unpacked widths is raw int32 ("none") and bytes
    still match the oracle.

    The rel4 exception sidecar is shrunk for the test: at full size
    (16k entries) it legitimately patches every outlier of a tiny
    4x16 block and rel4 *succeeds* — the production-size analog of a
    saturating block is one with more outliers than sidecar slots."""
    from distance_tpu.ops import packing
    from tests.test_golden import expected_square, run_engine

    monkeypatch.setattr(packing, "REL4_SEGMENTS", 4)
    rng = np.random.default_rng(58)
    width = PACK_LIMIT + 2048
    recs = []
    for i in range(5):  # uniform random: variant width stays >= PACK_LIMIT
        s = "".join(rng.choice(list("ACGT"), size=width))
        recs.append(f">s{i}\n{s}\n")
    f1 = "".join(recs).encode()

    outcomes = _count_rel_unpacks(monkeypatch)
    got, _ = run_engine("raw", f1, backend="xla", tile_i=4, tile_j=6)
    assert got == expected_square("raw", f1)
    assert outcomes and not any(outcomes)


@pytest.mark.parametrize("with_exc", [False, True])
@pytest.mark.parametrize("exc_shape", ["flat", "stacked"])
def test_sidecar_bundle_roundtrip(with_exc, exc_shape):
    """bundle_sidecars/unbundle_sidecars must be a lossless pair for
    both the plain-rel (no exceptions) and rel4 layouts."""
    from distance_tpu.ops.packing import bundle_sidecars, unbundle_sidecars

    rng = np.random.default_rng(3)
    g, ti, span, cap = 2, 5, 12, 6
    cb = rng.integers(-1000, 1000, size=(g, span)).astype(np.int32)
    rb_cc = rng.integers(-1000, 1000, size=(g, ti + 1)).astype(np.int32)
    if with_exc:
        b = 3 if exc_shape == "stacked" else 1
        ei = rng.integers(-1, 50, size=(b, cap)).astype(np.int32)
        ev = rng.integers(-200, 200, size=(b, cap)).astype(np.int32)
        flat = bundle_sidecars(
            np, cb, rb_cc,
            ei[0] if exc_shape == "flat" else ei,
            ev[0] if exc_shape == "flat" else ev,
        )
        cb2, rb2, ei2, ev2 = unbundle_sidecars(flat)
        np.testing.assert_array_equal(ei2, ei)
        np.testing.assert_array_equal(ev2, ev)
    else:
        flat = bundle_sidecars(np, cb, rb_cc)
        cb2, rb2, ei2, ev2 = unbundle_sidecars(flat)
        assert ei2 is None and ev2 is None
    assert flat.ndim == 1 and flat.dtype == np.int32
    np.testing.assert_array_equal(cb2, cb)
    np.testing.assert_array_equal(rb2, rb_cc)


@pytest.mark.parametrize("layout", ["stream", "strip"])
@pytest.mark.parametrize("saturate", [False, True])
def test_rel4_finish_native_matches_numpy(layout, saturate):
    """engine._rel4_finish_native must reproduce the numpy finish
    (nibble expand + exception patch + baseline add) bit-for-bit,
    including the saturation -> None outcome."""
    import distance_tpu._native as native_mod
    import distance_tpu.engine as engine

    lib = native_mod.get_lib()
    assert lib is not None
    rng = np.random.default_rng(11)
    g_n, rows, cols = 3, 40, 64
    vr, vc = 37, 61
    res = rng.integers(-6, 7, size=(g_n, rows, cols)).astype(np.int32)
    # outliers beyond nibble range (the exception sidecar path)
    n_out = 5
    pos = rng.choice(g_n * rows * cols, size=n_out, replace=False)
    res.reshape(-1)[pos] = rng.choice([-30, 25, -8, 100], size=n_out)
    if saturate:
        # >= 3 outliers in one 8192-segment region: with this tensor
        # smaller than one segment, three outliers anywhere saturate
        res.reshape(-1)[:3] = 99
    rb = rng.integers(0, 50, size=(g_n, rows)).astype(np.int32)
    cb = rng.integers(0, 50, size=(g_n, cols)).astype(np.int32)
    cc = rng.integers(0, 50, size=g_n).astype(np.int32)
    c = res + rb[:, :, None] + cb[:, None, :] - cc[:, None, None]
    from distance_tpu.ops.packing import pack_device_rel4

    lanes, ei, ev = pack_device_rel4(c, rb, cb, cc, np)
    if layout == "strip":
        # two blocks stacked: re-dispatch each half as its own block
        tj = cols // 2
        parts = [
            pack_device_rel4(
                np.ascontiguousarray(c[:, :, b * tj:(b + 1) * tj]),
                rb,
                np.ascontiguousarray(cb[:, b * tj:(b + 1) * tj]),
                cc, np,
            )
            for b in range(2)
        ]
        lanes = np.concatenate([p[0] for p in parts], axis=-1)
        ei = np.stack([p[1] for p in parts])
        ev = np.stack([p[2] for p in parts])

    rb_cc = np.concatenate([rb, cc[:, None]], axis=1)
    eng = object()  # _unpack_rel_parts ignores eng for rel4
    got, was4 = engine._unpack_rel_parts(
        eng, (lanes, cb, rb_cc, ei, ev), vr, vc
    )
    import distance_tpu._native as nm

    real = nm.get_lib
    nm.get_lib = lambda: None
    try:
        want, _ = engine._unpack_rel_parts(
            eng, (lanes, cb, rb_cc, ei, ev), vr, vc
        )
    finally:
        nm.get_lib = real
    assert was4
    if want is None or got is None:
        assert want is None and got is None
        assert saturate
    else:
        np.testing.assert_array_equal(got, want)
        np.testing.assert_array_equal(got, c[:, :vr, :vc])
