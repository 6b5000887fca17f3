"""Same-process A/B of the tn93 hash-rank keys pass: serial-equivalent
(1-worker pool) vs parallel (full pool).

The round-4 tally-rank memo's hash path was a single serial C pass
(measured 5.2 s at 401 M rows in the composed bench); this spike times
the replacement three-phase parallel pass against a 1-worker run of the
same code on identical inputs, in one process (the host's throughput
swings 3-5x between runs, so only same-window pairs are trustworthy).

Run: python scripts/hashrank_ab.py [N_ROWS] [LINEAGES]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200 << 20
    lineages = int(sys.argv[2]) if len(sys.argv) > 2 else 500

    import distance_tpu.engine as eng
    import distance_tpu.finalize as fin

    rng = np.random.default_rng(3)
    # duplicate-heavy fixture: every record belongs to a lineage, and a
    # pair's counters AND tally ranks are pure functions of its lineage
    # pair — distinct combined keys ~ lineage-pair space (the structure
    # the memo exploits on outbreak-surveillance data)
    n1 = lineages * 4  # records per side
    rank_q = np.ascontiguousarray(
        rng.integers(0, lineages, size=n1).astype(np.int32))
    rank_t = np.ascontiguousarray(
        rng.integers(0, lineages, size=n1).astype(np.int32))
    pair_i = rng.integers(0, n1, size=n).astype(np.int32)
    pair_j = rng.integers(0, n1, size=n).astype(np.int32)
    lin_i, lin_j = rank_q[pair_i], rank_t[pair_j]
    base = {
        name: rng.poisson(lam, size=(lineages, lineages)).astype(np.int32)
        for name, lam in (("kk", 29000), ("same", 28900), ("p1", 18),
                          ("p2", 7))
    }
    counters = {k: np.ascontiguousarray(v[lin_i, lin_j])
                for k, v in base.items()}
    rq = (rank_q, lineages)
    rt = (rank_t, lineages)

    results = {}
    for label, workers in (("warmup", None), ("serial_1worker", 1),
                           ("parallel", None)):
        from concurrent.futures import ThreadPoolExecutor

        old = fin._pool
        if workers is not None:
            pool = ThreadPoolExecutor(workers)
            pool._max_workers = workers
            fin._pool = pool
        t0 = time.perf_counter()
        keys, nd = eng._tn93_value_keys(
            {k: v.copy() for k, v in counters.items()}, rq, pair_i, rt,
            pair_j,
        )
        dt = time.perf_counter() - t0
        if workers is not None:
            fin._pool = old
        assert keys is not None, "hash path did not engage"
        results[label] = (dt, int(nd), keys)
        print(f"{label}: {dt:.3f}s  nd={nd}  "
              f"({n / dt / 1e6:.1f} M rows/s)", file=sys.stderr)

    # cross-check: serial and parallel keys must be IDENTICAL (ranks
    # are assigned in ascending-key order, so pool width cannot matter)
    assert np.array_equal(
        results["serial_1worker"][2], results["parallel"][2]
    ), "serial and parallel hash-rank keys differ"
    assert results["serial_1worker"][1] == results["parallel"][1]
    import json

    s, p = results["serial_1worker"][0], results["parallel"][0]
    print(json.dumps({
        "rows": n, "lineages": lineages,
        "serial_1worker_s": round(s, 3), "parallel_s": round(p, 3),
        "speedup": round(s / p, 2),
        "nd": results["parallel"][1],
    }))


if __name__ == "__main__":
    main()
