"""Same-window chip A/B: cross-group staged-upload reuse (out-of-core
rectangle) vs the round-4 re-stage-everything behavior — VERDICT
round-4 item 4's "Done" criterion.

The round-4 at-scale rectangle row (8k x 8k tn93, forced 300 MB budget)
spent 109.7 s of 128 s re-encoding and re-uploading every file2
super-row once per X group.  Round 5 adds _StagedSide: each super-row's
diff encoding memoizes on first staging (re-stagings skip the host
pad/compare/extract and upload only cached diffs), and the serpentine
sweep keeps the boundary super-row device-resident across X groups.

Variants (one process, shared window; outputs byte-compared):
  reuse    — production (_StagedSide memos + serpentine)
  no_reuse — _StagedSide.get forced to always miss with a fresh memo,
             serpentine disabled (ascending order every group): the
             round-4 behavior

Deterministic metrics: prepare() calls given an h2d_memo (device
stagings), encode host passes, and their cumulative seconds.

Run: python scripts/staged_reuse_ab.py [N1] [N2] [WIDTH]
  (env SPIKE_BUDGET_MB forces the HBM budget, default 40)
"""

import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    n1 = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    n2 = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    width = int(sys.argv[3]) if len(sys.argv) > 3 else 29904
    budget = int(float(os.environ.get("SPIKE_BUDGET_MB", 40)) * 1e6)

    import distance_tpu.engine as engine
    import distance_tpu.ops.diffup as diffup
    from distance_tpu.encoding import CODE_TO_CHAR
    from distance_tpu.engine import Setup, run
    from distance_tpu.fastaio import load_fastas
    from distance_tpu.writer import TsvWriter
    from bench import make_alignment

    engine.HBM_BUDGET_BYTES = budget

    table = np.zeros(256, dtype=np.uint8)
    for code, ch in CODE_TO_CHAR.items():
        table[code] = ord(ch)
    m1 = make_alignment(n1, width, seed=5)
    m2 = make_alignment(n2, width, seed=6)
    fa1 = b"".join(
        b">a%d\n%s\n" % (i, table[m1[i]].tobytes()) for i in range(n1)
    )
    fa2 = b"".join(
        b">b%d\n%s\n" % (i, table[m2[i]].tobytes()) for i in range(n2)
    )

    stats = {"stagings": 0, "encodes": 0, "encode_s": 0.0,
             "prepare_s": 0.0}
    get_orig = engine._StagedSide.get
    serp_orig = engine._StagedSide.serpentine
    prep_orig = engine._BlockEngine.prepare
    enc_orig = diffup.DiffUploader.encode

    def get_nocache(self, q0, q1):
        self.drop()
        self._memos.pop((q0, q1), None)
        return get_orig(self, q0, q1)

    def serp_off(self, spans):
        return list(spans)

    def prep_spy(self, matrix, *a, **kw):
        t0 = time.perf_counter()
        if kw.get("h2d_memo") is not None:
            stats["stagings"] += 1
        try:
            return prep_orig(self, matrix, *a, **kw)
        finally:
            stats["prepare_s"] += time.perf_counter() - t0

    def enc_spy(self, padded, n_real=None):
        t0 = time.perf_counter()
        stats["encodes"] += 1
        try:
            return enc_orig(self, padded, n_real=n_real)
        finally:
            stats["encode_s"] += time.perf_counter() - t0

    engine._BlockEngine.prepare = prep_spy
    diffup.DiffUploader.encode = enc_spy

    results = {}
    outs = {}
    for label in ("warmup", "reuse", "no_reuse", "reuse2"):
        no = label == "no_reuse"
        engine._StagedSide.get = get_nocache if no else get_orig
        engine._StagedSide.serpentine = serp_off if no else serp_orig
        for k in stats:
            stats[k] = 0 if isinstance(stats[k], int) else 0.0
        out = io.BytesIO()
        t0 = time.perf_counter()
        run(Setup(
            loaded=load_fastas([io.BytesIO(fa1), io.BytesIO(fa2)]),
            streamed=None, writer=TsvWriter(out), measure="n_high",
            n_threads=1, batchsize=1, backend="xla", consensus=None,
        ))
        dt = time.perf_counter() - t0
        results[label] = dict(wall_s=round(dt, 2),
                              stagings=stats["stagings"],
                              encodes=stats["encodes"],
                              encode_s=round(stats["encode_s"], 2),
                              prepare_s=round(stats["prepare_s"], 2))
        outs[label] = out.getvalue()
        print(f"{label}: {results[label]}", file=sys.stderr)
    engine._StagedSide.get = get_orig
    engine._StagedSide.serpentine = serp_orig
    engine._BlockEngine.prepare = prep_orig
    diffup.DiffUploader.encode = enc_orig
    assert outs["reuse"] == outs["no_reuse"] == outs["reuse2"], \
        "A/B outputs differ"
    c = min(results["reuse"]["wall_s"], results["reuse2"]["wall_s"])
    print(json.dumps({
        "n1": n1, "n2": n2, "width": width,
        "hbm_budget_mb": round(budget / 1e6, 1),
        "reuse": results["reuse"], "reuse2": results["reuse2"],
        "no_reuse": results["no_reuse"],
        "speedup": round(results["no_reuse"]["wall_s"] / max(c, 1e-9), 3),
    }))


if __name__ == "__main__":
    main()
