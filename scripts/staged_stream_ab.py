"""Same-window A/B: staged-stream group encode/H2D once per group
(h2d_cache) vs once per loaded super-row (the pre-fix behavior).

Staged stream mode (loaded side > HBM budget) sweeps every dispatch
group against n1/sr_rows loaded super-rows; before the fix each
super-row dispatch re-ran DiffUploader.encode over the whole padded
group (a host pass over ~60-250 MB) and re-uploaded the result.  This
script forces staging with a small DISTANCE_TPU_HBM_BUDGET and times
the same sweep with the cache on (production) and off (pre-fix
emulation, h2d_cache=None), in one process so the window is shared.

Run: python scripts/staged_stream_ab.py [N_LOADED] [N_STREAM] [WIDTH]
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

    import distance_tpu.engine as engine
    from distance_tpu.encoding import CODE_TO_CHAR
    from distance_tpu.engine import Setup, run
    from distance_tpu.fastaio import load_fastas
    from distance_tpu.writer import TsvWriter
    from bench import make_alignment

    # force staging: loaded codes alone exceed the budget -> several
    # super-rows per group
    engine.HBM_BUDGET_BYTES = max(1 << 20, n1 * width // 3)

    table = np.zeros(256, dtype=np.uint8)
    for code, ch in CODE_TO_CHAR.items():
        table[code] = ord(ch)
    loaded_mat = make_alignment(n1, width, seed=1)
    stream_mat = make_alignment(n2, width, seed=2)
    loaded_fa = b"".join(
        b">s%d\n%s\n" % (i, table[loaded_mat[i]].tobytes())
        for i in range(n1)
    )
    stream_fa = b"".join(
        b">q%d\n%s\n" % (i, table[stream_mat[i]].tobytes())
        for i in range(n2)
    )

    orig = engine._BlockEngine.dispatch_stream

    def no_cache(self, m1, padded, rows_pad, mode=None, nv=None,
                 h2d_cache=None):
        return orig(self, m1, padded, rows_pad, mode, nv, None)

    # the wall clock on this relay swings 3-6x between runs, so the
    # PRIMARY metric is deterministic: how many whole-group encode host
    # passes ran, and their cumulative seconds
    from distance_tpu.ops.diffup import DiffUploader

    enc_orig = DiffUploader.encode
    enc_stats = {"calls": 0, "s": 0.0}

    def enc_timed(self, padded, n_real=None):
        t0 = time.perf_counter()
        try:
            return enc_orig(self, padded, n_real=n_real)
        finally:
            enc_stats["calls"] += 1
            enc_stats["s"] += time.perf_counter() - t0

    DiffUploader.encode = enc_timed

    results = {}
    outs = {}
    encs = {}
    for label in ("warmup", "cached", "per_super_row", "cached2"):
        engine._BlockEngine.dispatch_stream = (
            no_cache if label == "per_super_row" else orig
        )
        out = io.BytesIO()
        t0 = time.perf_counter()
        run(Setup(
            loaded=load_fastas([io.BytesIO(loaded_fa)]),
            streamed=io.BytesIO(stream_fa),
            writer=TsvWriter(out), measure="n_high", n_threads=1,
            batchsize=1, backend="xla", consensus=None,
        ))
        dt = time.perf_counter() - t0
        results[label] = dt
        outs[label] = out.getvalue()
        encs[label] = (enc_stats["calls"], enc_stats["s"])
        enc_stats["calls"], enc_stats["s"] = 0, 0.0
        print(f"{label}: {dt:.2f}s  encodes={encs[label][0]}"
              f" ({encs[label][1]:.2f}s)", file=sys.stderr)
    engine._BlockEngine.dispatch_stream = orig
    DiffUploader.encode = enc_orig
    assert outs["cached"] == outs["per_super_row"] == outs["cached2"], \
        "A/B outputs differ"
    c = min(results["cached"], results["cached2"])
    p = results["per_super_row"]
    print(json.dumps({
        "n_loaded": n1, "n_streamed": n2, "width": width,
        "hbm_budget_mb": round(engine.HBM_BUDGET_BYTES / 1e6, 1),
        "cached_s": round(c, 2), "per_super_row_s": round(p, 2),
        "speedup": round(p / c, 3),
        "cached_encodes": encs["cached"][0],
        "cached_encode_s": round(encs["cached"][1], 2),
        "per_super_row_encodes": encs["per_super_row"][0],
        "per_super_row_encode_s": round(encs["per_super_row"][1], 2),
    }))


if __name__ == "__main__":
    main()
