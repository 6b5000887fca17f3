"""Diff-encoded host-to-device uploads (ops/diffup.py).

The rebuilt device matrix must match the dense upload on every real row
(pad rows hold the reference row instead of zeros — never read by real
pairs), and end-to-end output must be byte-identical with diff uploads
forced on.
"""

import io

import numpy as np
import pytest

from distance_tpu.encoding import ALL_CODES
from distance_tpu.ops.diffup import DiffUploader, mode_row
from tests.conftest import make_fasta
from tests.test_golden import run_engine
from tests.test_stream_split import low_diversity_fastas


def _rand_codes(rng, rows, width):
    return rng.choice(ALL_CODES, size=(rows, width)).astype(np.uint8)


@pytest.mark.parametrize("n_diffs", [0, 1, 7, 4096, 4097])
def test_rebuild_matches_dense(n_diffs, monkeypatch):
    monkeypatch.setenv("DISTANCE_TPU_DIFF_UPLOAD", "force")
    rng = np.random.default_rng(n_diffs)
    rows, l_pad = 8, 256
    ref = _rand_codes(rng, 1, l_pad)[0]
    padded = np.tile(ref, (rows, 1))
    # mutate n_diffs random positions to a different code
    flat = rng.choice(rows * l_pad, size=min(n_diffs, rows * l_pad),
                      replace=False)
    for f in flat:
        r, c = divmod(int(f), l_pad)
        cur = padded[r, c]
        padded[r, c] = next(x for x in ALL_CODES if x != cur)
    up = DiffUploader(ref)
    got = np.asarray(up.upload(padded.copy()))
    np.testing.assert_array_equal(got, padded)


def test_pad_rows_become_ref(monkeypatch):
    monkeypatch.setenv("DISTANCE_TPU_DIFF_UPLOAD", "force")
    rng = np.random.default_rng(0)
    l_pad = 128
    ref = _rand_codes(rng, 1, l_pad)[0]
    padded = np.zeros((6, l_pad), dtype=np.uint8)
    padded[:3] = _rand_codes(rng, 3, l_pad)  # rows 3..5 are padding
    got = np.asarray(DiffUploader(ref).upload(padded.copy()))
    np.testing.assert_array_equal(got[:3], padded[:3])
    np.testing.assert_array_equal(got[3:], np.tile(ref, (3, 1)))


@pytest.mark.parametrize("n_real", [512, 513, 1000])
@pytest.mark.parametrize("pass_n_real", [True, False])
def test_native_encode_matches_numpy(n_real, pass_n_real, monkeypatch):
    # the native (C, threaded) extraction must produce bit-identical
    # (idx, vals) to the numpy compare+flatnonzero path
    import distance_tpu._native as native_mod
    import distance_tpu.ops.diffup as diffup

    assert native_mod.get_lib() is not None, "native lib must build here"
    rng = np.random.default_rng(n_real)
    rows_pad, l_pad = ((n_real + 63) // 64) * 64, 384
    ref = _rand_codes(rng, 1, l_pad)[0]
    padded = np.zeros((rows_pad, l_pad), dtype=np.uint8)
    padded[:n_real] = np.tile(ref, (n_real, 1))
    flat = rng.choice(n_real * l_pad, size=2000, replace=False)
    for f in flat:
        r, c = divmod(int(f), l_pad)
        cur = padded[r, c]
        padded[r, c] = next(x for x in ALL_CODES if x != cur)
    monkeypatch.setenv("DISTANCE_TPU_DIFF_UPLOAD", "force")
    kw = {"n_real": n_real} if pass_n_real else {}
    got = DiffUploader(ref).encode(padded, **kw)
    monkeypatch.setattr(native_mod, "get_lib", lambda: None)
    want = DiffUploader(ref).encode(padded, **kw)
    assert got is not None and want is not None
    np.testing.assert_array_equal(got[0], want[0])
    np.testing.assert_array_equal(got[1], want[1])


def test_dense_fallback_on_diverse_batch():
    # no force: a batch with ~every byte differing must take the dense
    # path and still match exactly
    rng = np.random.default_rng(1)
    l_pad = 128
    ref = _rand_codes(rng, 1, l_pad)[0]
    padded = _rand_codes(rng, 8, l_pad)
    up = DiffUploader(ref)
    assert up._min_win > 0
    got = np.asarray(up.upload(padded.copy()))
    np.testing.assert_array_equal(got, padded)


def test_mode_row():
    from distance_tpu.encoding import A, C, G

    mat = np.array(
        [[A, C, C], [A, C, G], [G, C, G], [A, G, G]], dtype=np.uint8
    )
    ref = mode_row(mat)
    assert ref[0] == A and ref[1] == C and ref[2] == G


@pytest.mark.parametrize("measure", ["raw", "tn93", "n"])
def test_square_end_to_end_forced(measure, monkeypatch):
    f1, _ = low_diversity_fastas(seed=21)
    monkeypatch.setenv("DISTANCE_TPU_DIFF_UPLOAD", "force")
    got = run_engine(measure, f1, backend="xla")[0]
    monkeypatch.delenv("DISTANCE_TPU_DIFF_UPLOAD")
    monkeypatch.setenv("DISTANCE_TPU_NO_DIFF_UPLOAD", "1")
    want = run_engine(measure, f1, backend="xla")[0]
    assert got == want


def test_rectangle_end_to_end_forced(monkeypatch):
    f1, f2 = low_diversity_fastas(seed=22)
    monkeypatch.setenv("DISTANCE_TPU_DIFF_UPLOAD", "force")
    got = run_engine("k80", f1, fasta2=f2, backend="xla")[0]
    monkeypatch.delenv("DISTANCE_TPU_DIFF_UPLOAD")
    monkeypatch.setenv("DISTANCE_TPU_NO_DIFF_UPLOAD", "1")
    want = run_engine("k80", f1, fasta2=f2, backend="xla")[0]
    assert got == want


@pytest.mark.parametrize("measure", ["jc69", "tn93"])
def test_stream_end_to_end_forced(measure, monkeypatch):
    f1, f2 = low_diversity_fastas(seed=23)
    # a group size that does not divide the 8-device test mesh keeps the
    # engine single-device, which is what enables diff uploads (sharded
    # runs replicate the matrix instead)
    monkeypatch.setenv("DISTANCE_TPU_STREAM_GROUP", "12")
    monkeypatch.setenv("DISTANCE_TPU_DIFF_UPLOAD", "force")
    got = run_engine(measure, f1, stream=f2, backend="xla", batchsize=4)[0]
    monkeypatch.delenv("DISTANCE_TPU_DIFF_UPLOAD")
    monkeypatch.setenv("DISTANCE_TPU_NO_DIFF_UPLOAD", "1")
    want = run_engine(measure, f1, stream=f2, backend="xla", batchsize=4)[0]
    assert got == want


@pytest.mark.parametrize("measure", ["n_high", "raw", "k80", "tn93"])
def test_stream_rel_pack_diverse(measure, monkeypatch):
    """rel packing end-to-end on DIVERSE data (narrow would saturate
    every lane): single-device stream with a reference row, byte-equal
    to the numpy backend."""
    from tests.conftest import make_fasta, random_seqs

    rng = np.random.default_rng(31)
    # fully random sequences: pair diffs ~ 3/4 of width >> 255
    f1 = make_fasta(random_seqs(rng, 10, 400, amb_frac=0.1))
    f2 = make_fasta(random_seqs(rng, 23, 400, amb_frac=0.1))
    monkeypatch.setenv("DISTANCE_TPU_STREAM_GROUP", "12")
    got = run_engine(measure, f1, stream=f2, backend="xla")[0]
    want = run_engine(measure, f1, stream=f2, backend="numpy")[0]
    assert got == want


def test_stream_rel_pack_saturation_refetch(monkeypatch):
    """A reference row that is garbage for half the batch drives rel
    residuals past int8 -> the wide refetch path must keep exactness."""
    import distance_tpu.ops.diffup as diffup
    from tests.conftest import make_fasta, random_seqs

    rng = np.random.default_rng(32)
    f1 = make_fasta(random_seqs(rng, 8, 600, amb_frac=0.1))
    f2 = make_fasta(random_seqs(rng, 17, 600, amb_frac=0.1))
    # an adversarial reference: all-A, so residuals track full pair
    # diversity and saturate
    monkeypatch.setenv("DISTANCE_TPU_STREAM_GROUP", "12")
    monkeypatch.setattr(
        diffup, "mode_row",
        lambda m: np.full(m.shape[1], 136, dtype=np.uint8),
    )
    got = run_engine("raw", f1, stream=f2, backend="xla")[0]
    want = run_engine("raw", f1, stream=f2, backend="numpy")[0]
    assert got == want


def test_outofcore_forced(monkeypatch, tmp_path):
    # tiny HBM budget forces the blocked sweep; diff uploads on
    import distance_tpu.engine as engine

    monkeypatch.setattr(engine, "HBM_BUDGET_BYTES", 2000)
    monkeypatch.setenv("DISTANCE_TPU_DIFF_UPLOAD", "force")
    f1, _ = low_diversity_fastas(seed=24, n1=40, width=120, nmut=4)
    got = run_engine("raw", f1, backend="xla", tile_i=8, tile_j=8)[0]
    monkeypatch.delenv("DISTANCE_TPU_DIFF_UPLOAD")
    monkeypatch.setenv("DISTANCE_TPU_NO_DIFF_UPLOAD", "1")
    want = run_engine("raw", f1, backend="xla", tile_i=8, tile_j=8)[0]
    assert got == want


@pytest.mark.parametrize("measure", ["n_high", "tn93"])
def test_stream_ref_retarget_two_lineages(measure, monkeypatch):
    """Streamed records from a DIFFERENT lineage than the loaded set:
    the loaded-side diff reference rejects every batch, so the engine
    retargets the reference once to the first batch's own mode row and
    later batches diff-encode against it — byte parity throughout."""
    import distance_tpu.engine as engine
    from distance_tpu.ops import diffup

    rng = np.random.default_rng(41)
    width = 384
    anc1 = rng.choice(list("ACGT"), size=width)
    anc2 = rng.choice(list("ACGT"), size=width)  # unrelated lineage
    nxt = {"A": "C", "C": "G", "G": "T", "T": "A"}

    def lineage(anc, n, tag):
        recs = []
        for i in range(n):
            s = anc.copy()
            for p in rng.choice(width, 4, replace=False):
                s[p] = nxt[s[p]]
            recs.append((f"{tag}{i}", "".join(s)))
        return recs

    f1 = make_fasta(lineage(anc1, 9, "a"))
    f2 = make_fasta(lineage(anc2, 25, "b"))
    monkeypatch.setenv("DISTANCE_TPU_STREAM_GROUP", "6")
    # count encode wins: after the retarget, later groups must encode
    wins = []
    real = diffup.DiffUploader.encode

    def spy(self, padded, n_real=None):
        out = real(self, padded, n_real)
        wins.append(out is not None)
        return out

    monkeypatch.setattr(diffup.DiffUploader, "encode", spy)
    got = run_engine(measure, f1, stream=f2, backend="xla", batchsize=3)[0]
    monkeypatch.setenv("DISTANCE_TPU_NO_DIFF_UPLOAD", "1")
    want = run_engine(measure, f1, stream=f2, backend="xla", batchsize=3)[0]
    assert got == want
    # somewhere a loaded-ref reject happens (the lineages differ), and
    # after the retarget every later encode wins (the first True after
    # the reject is the retarget candidate itself)
    assert False in wins, wins
    rej = wins.index(False)
    assert all(wins[rej + 1:]), wins


def test_stream_ref_retarget_drifting_lineages(monkeypatch):
    """A stream that SWITCHES lineage mid-way: the first retargeted
    reference goes stale, and the engine must retarget again (periodic,
    not one-shot) so later groups keep diff-encoding — byte parity
    throughout."""
    from distance_tpu.ops import diffup

    rng = np.random.default_rng(43)
    width = 384
    ancs = [rng.choice(list("ACGT"), size=width) for _ in range(3)]
    nxt = {"A": "C", "C": "G", "G": "T", "T": "A"}

    def lineage(anc, n, tag):
        recs = []
        for i in range(n):
            s = anc.copy()
            for p in rng.choice(width, 4, replace=False):
                s[p] = nxt[s[p]]
            recs.append((f"{tag}{i}", "".join(s)))
        return recs

    f1 = make_fasta(lineage(ancs[0], 9, "a"))
    # stream: two groups of lineage b, then two groups of lineage c
    f2 = make_fasta(lineage(ancs[1], 12, "b") + lineage(ancs[2], 12, "c"))
    monkeypatch.setenv("DISTANCE_TPU_STREAM_GROUP", "6")
    wins = []
    real = diffup.DiffUploader.encode

    def spy(self, padded, n_real=None):
        out = real(self, padded, n_real)
        wins.append(out is not None)
        return out

    monkeypatch.setattr(diffup.DiffUploader, "encode", spy)
    got = run_engine("n_high", f1, stream=f2, backend="xla", batchsize=3)[0]
    monkeypatch.setenv("DISTANCE_TPU_NO_DIFF_UPLOAD", "1")
    want = run_engine("n_high", f1, stream=f2, backend="xla", batchsize=3)[0]
    assert got == want
    # two rejects (one per lineage switch), each followed by a winning
    # retarget candidate; every group ends up diff-encoded
    assert wins.count(False) == 2, wins
    assert wins[-1] is True and len(wins) >= 6, wins


def test_stream_retarget_gives_up_on_diverse_stream(monkeypatch):
    """A genuinely diverse stream: every retarget candidate also fails,
    so probing stops after RETARGET_FAIL_LIMIT consecutive failures
    (no per-group mode_row cost forever) and output stays exact."""
    import distance_tpu.engine as engine
    from distance_tpu.ops import diffup
    from tests.conftest import make_fasta as mf, random_seqs

    rng = np.random.default_rng(44)
    f1 = mf(random_seqs(rng, 6, 400, amb_frac=0.05))
    f2 = mf(random_seqs(rng, 30, 400, amb_frac=0.05))
    monkeypatch.setenv("DISTANCE_TPU_STREAM_GROUP", "6")
    calls = []
    real = diffup.sampled_mode_row

    def spy(matrix, cap=4096):
        calls.append(matrix.shape)
        return real(matrix, cap)

    monkeypatch.setattr(diffup, "sampled_mode_row", spy)
    got = run_engine("raw", f1, stream=f2, backend="xla", batchsize=3)[0]
    monkeypatch.setenv("DISTANCE_TPU_NO_DIFF_UPLOAD", "1")
    want = run_engine("raw", f1, stream=f2, backend="xla", batchsize=3)[0]
    assert got == want
    # 1 call for the loaded-side reference + at most RETARGET_FAIL_LIMIT
    # failed retarget probes across 5 groups
    assert len(calls) <= 1 + engine.RETARGET_FAIL_LIMIT, calls
