"""Tile-shape A/B for the cached-feature sweep dispatch.

Times the PRODUCTION dispatch (engine._jit_block_fn_feat with rel4
packing, device-resident results, scalar fence) for several (ti, tj)
shapes.  Shapes run sequentially (each holds a multi-GB g-feature cache,
so they cannot coexist in HBM); the first shape is re-measured at the
end as a window-stability bracket — if the two bracket numbers diverge,
the run is untrustworthy and says so.

Run: python scripts/tile_ab.py  (AB_N, AB_L, AB_MEASURE, AB_SHAPES)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def measure_shape(mat, n, width, measure, ti, tj):
    import distance_tpu.engine as engine

    eng = engine._BlockEngine(measure, "xla", ti, tj, width)
    dev = eng.prepare(mat, max(ti, tj))
    assert eng.gfeat_of(dev) is not None, "cache must engage"
    gyf = eng.gfeat_of(dev)
    blocks = []
    pairs = 0
    for i0 in range(0, n - 1, ti):
        cols = [j0 for j0 in range(i0, n, tj)]
        blocks.append((i0, cols))
        pairs += ti * sum(min(tj, n - j0) for j0 in cols)

    def sweep():
        accs = []
        for i0, cols in blocks:
            fx = eng.fx_strip(dev, i0, ti)
            for j0 in cols:
                h = eng.block_feat(fx, gyf, i0, j0, ti, tj, "rel4",
                                   (n, n), 0)
                accs.append(h[0])  # lanes
        return float(np.asarray(accs[-1][:1, :1, :1]).sum())

    sweep()  # compile + warm
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        sweep()
        times.append(time.perf_counter() - t0)
    eng.release(dev)
    dt = sorted(times)[1]
    return dt, pairs


def main():
    from bench import make_alignment

    n = int(os.environ.get("AB_N", 8192))
    width = int(os.environ.get("AB_L", 29904))
    measure = os.environ.get("AB_MEASURE", "raw")
    shapes = [
        tuple(int(v) for v in s.split("x"))
        for s in os.environ.get(
            "AB_SHAPES", "1024x4096,2048x4096,2048x2048,4096x4096"
        ).split(",")
    ]
    mat = make_alignment(n, width, seed=3)

    bracket = []
    for ti, tj in shapes + [shapes[0]]:
        dt, pairs = measure_shape(mat, n, width, measure, ti, tj)
        rate = pairs / dt
        print(json.dumps({
            "shape": f"{ti}x{tj}", "sec_per_sweep": round(dt, 4),
            "pairs_per_s": round(rate),
        }))
        if (ti, tj) == shapes[0]:
            bracket.append(rate)
    if len(bracket) == 2:
        drift = max(bracket) / min(bracket) - 1
        print(json.dumps({"bracket_drift": round(drift, 3),
                          "window_stable": drift < 0.1}))


if __name__ == "__main__":
    main()
