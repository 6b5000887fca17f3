"""Composed host-emission benchmark: the full finalize->format->write
pipeline at 100k-seq scale, counters pre-staged (device out of the loop).

The round-2 verdict: the >=10x end-to-end north star rested on an
emitter MICRObenchmark (~26 M rows/s); this script measures the real
composed tail instead — the exact production code path a sweep strip
takes after its counters land on host:

    _gather_strip_triangle -> _tri_indices -> _emit_pairs
        (= finalize_block f64 + _value_keys + TsvWriter.rows with the
           keyed memo + ordered _AsyncEmitter thread + disk write)

against a same-run implied 64-core CPU baseline (the reference's byte
loop x64; it also formats+writes TSV, so including our write is fair).

Counters are synthesized with SARS-CoV-2-like statistics (Poisson
mutations + ambiguity overlap) so the keyed-memo formatter sees a
realistic value distribution.

Run: python scripts/emit_compose_bench.py
Env: EMIT_N (default 100000), EMIT_TI (2048), EMIT_STRIPS (2),
     EMIT_MEASURES (n_high,jc69), EMIT_OUT (default ./emit_bench_out.tsv)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def synth_counters(measure, ti, n, width, rng):
    """(G, ti, n) int32 counter strip with realistic repetition."""
    # ~40 mutations/seq vs a shared ancestor -> pair diff ~ Poisson(2*40
    # * (1 - overlap)), clipped small; ~150 ambiguity sites/record knock
    # sites out of the denominator.
    diff = rng.poisson(25.0, size=(ti, n)).astype(np.int32)
    amb = rng.poisson(300.0, size=(ti, n)).astype(np.int32)
    if measure in ("n", "n_high"):
        return np.stack([diff])
    if measure in ("raw", "jc69"):
        same = width - diff - amb
        return np.stack([diff, same])
    if measure == "k80":
        ts = rng.poisson(18.0, size=(ti, n)).astype(np.int32)
        tv = rng.poisson(7.0, size=(ti, n)).astype(np.int32)
        same = width - ts - tv - amb
        return np.stack([same, ts, tv])
    raise SystemExit(f"unsupported measure for this bench: {measure}")


def synth_tn93(n, width, rng, lineages):
    """Duplicate-heavy tn93 fixture: records sampled from `lineages`
    distinct sequences (outbreak-surveillance-like), so counters AND
    tallies repeat per lineage pair — the structure the round-4 tally-
    rank memo exploits.  Returns (lin (n,), tallies (L, 4) int32,
    lineage-pair counter tables dict name -> (L, L) int32)."""
    L = lineages
    lin = rng.integers(0, L, size=n).astype(np.int32)
    base = width // 4
    tallies = (base + rng.integers(-30, 31, size=(L, 4))).astype(np.int32)
    dd = rng.poisson(12.0, size=(L, L)).astype(np.int32)
    p1 = np.minimum(rng.poisson(5.0, size=(L, L)).astype(np.int32), dd)
    p2 = np.minimum(rng.poisson(3.0, size=(L, L)).astype(np.int32),
                    dd - p1)
    amb = rng.poisson(150.0, size=(L, L)).astype(np.int32)
    kk = (width - amb).astype(np.int32)
    same = (kk - dd).astype(np.int32)
    return lin, tallies, {"same": same, "kk": kk, "p1": p1, "p2": p2}


def expand_tn93_strip(tables, lin, i0, ti, n):
    rows = lin[i0 : i0 + ti]
    cols = lin[:n]
    return np.stack([
        np.ascontiguousarray(tables[name][rows][:, cols])
        for name in ("same", "kk", "p1", "p2")
    ])


def main():
    from distance_tpu.engine import (
        Setup, _AsyncEmitter, _ScratchPool, _emit_pairs, _gather_emit,
    )
    from distance_tpu.fastaio import Alignment
    from distance_tpu.ops.features import get_plan
    from distance_tpu.writer import TsvWriter
    from bench import cpu_baseline_pairs_per_s, make_alignment

    n = int(os.environ.get("EMIT_N", 100_000))
    ti = int(os.environ.get("EMIT_TI", 2048))
    n_strips = int(os.environ.get("EMIT_STRIPS", 2))
    width = 29904
    measures = os.environ.get("EMIT_MEASURES", "n_high,jc69").split(",")
    out_path = os.environ.get("EMIT_OUT", "emit_bench_out.tsv")

    # Same-run baseline: single-core reference byte loop x 64.
    small = make_alignment(512, width, seed=1)
    baseline = cpu_baseline_pairs_per_s(small, width)

    # _emit_pairs needs only ids + width (tn93 would need base_counts);
    # a 1-row matrix of the right width carries the .width property.
    aln = Alignment(
        ids=[f"seq{i}" for i in range(n)],
        descriptions=[""] * n,
        matrix=np.zeros((1, width), dtype=np.uint8),
    )
    rng = np.random.default_rng(0)

    lineages = int(os.environ.get("EMIT_LINEAGES", 500))
    for measure in measures:
        plan = get_plan(measure)
        if measure == "tn93":
            lin, tallies, tables = synth_tn93(n, width, rng, lineages)
            aln.base_counts = np.ascontiguousarray(tallies[lin])
            strips = [
                expand_tn93_strip(tables, lin, s * ti, ti, n)
                for s in range(n_strips)
            ]
        else:
            strips = []
            for s in range(n_strips):
                strips.append(synth_counters(measure, ti, n, width, rng))

        out = open(out_path, "wb")
        setup = Setup(
            loaded=[aln], streamed=None, writer=TsvWriter(out),
            measure=measure, n_threads=4, batchsize=1, backend="numpy",
        )
        setup.writer.header()
        emitter = _AsyncEmitter()
        pool = _ScratchPool()

        from distance_tpu.utils import timing
        timing.reset()

        total_rows = 0
        t0 = time.perf_counter()
        for s, strip in enumerate(strips):
            i0 = s * ti
            si = ti
            lease = []
            with timing.phase_timer("tri+gather"):
                gathered = _gather_emit(strip, si, i0, n, 0, pool, lease)
                assert gathered is not None
                rows_c, pair_i, col_idx = gathered
                counters = {
                    name: rows_c[k]
                    for k, name in enumerate(plan.counters)
                }
            _emit_pairs(setup, aln, aln, pair_i, col_idx, counters,
                        emitter=emitter, pool=pool, lease=lease)
            total_rows += pair_i.shape[0]
        emitter.finish()
        out.flush()
        os.fsync(out.fileno())
        dt = time.perf_counter() - t0
        size = out.tell()
        out.close()
        n_checks = int(os.environ.get("EMIT_VALIDATE", "200"))
        bad = _validate(out_path, measure, strips, aln, ti, n, width,
                        n_checks)
        os.unlink(out_path)
        rate = total_rows / dt
        print(json.dumps({
            "measure": measure,
            "rows": total_rows,
            "seconds": round(dt, 2),
            "rows_per_s": round(rate),
            "tsv_mb": round(size / 1e6, 1),
            "mb_per_s": round(size / 1e6 / dt, 1),
            "implied_64core_baseline": round(baseline) if baseline else None,
            "x_baseline": round(rate / baseline, 2) if baseline else None,
            "phases_s": {k: round(v, 2) for k, v in timing.totals().items()},
            "spot_checks": n_checks,
            "spot_check_failures": bad,
        }))
        assert bad == 0, f"{bad} spot-check mismatches"


def _validate(path, measure, strips, aln, ti, n, width, n_checks):
    """Recompute ``n_checks`` random output lines from the staged
    counters through the serial finalizer and string-compare them."""
    from distance_tpu.finalize import finalize_block
    from distance_tpu.ops.features import get_plan
    from distance_tpu.writer import format_float

    plan = get_plan(measure)
    rng = np.random.default_rng(123)
    # global row index -> (strip s, row li, col j): strip s covers rows
    # s*ti..s*ti+ti-1; row i emits cols i+1..n-1
    per_row = [n - 1 - (s * ti + li) for s in range(len(strips))
               for li in range(ti)]
    bounds = np.zeros(len(per_row) + 1, dtype=np.int64)
    np.cumsum(per_row, out=bounds[1:])
    total = int(bounds[-1])
    targets = np.sort(rng.integers(0, total, n_checks))
    want = {}
    for t in targets.tolist():
        flat = int(np.searchsorted(bounds, t, side="right")) - 1
        s, li = divmod(flat, ti)
        i = s * ti + li
        j = i + 1 + (t - int(bounds[flat]))
        counters = {
            name: strips[s][k, li, j : j + 1]
            for k, name in enumerate(plan.counters)
        }
        bc = None
        if measure == "tn93":
            one = np.array([0], dtype=np.int32)
            bc = (aln.base_counts[i : i + 1], one,
                  aln.base_counts[j : j + 1], one)
        v = finalize_block(measure, counters, bc)[0]
        vs = format_float(v) if v.dtype.kind == "f" else str(int(v))
        want[t] = f"{aln.ids[i]}\t{aln.ids[j]}\t{vs}".encode()
    bad = 0
    with open(path, "rb") as f:
        f.readline()  # header
        ln = 0
        it = iter(sorted(want))
        nxt = next(it, None)
        for line in f:
            if nxt is None:
                break
            if ln == nxt:
                if line.rstrip(b"\n") != want[ln]:
                    bad += 1
                    print("MISMATCH line", ln, line[:80], want[ln][:80])
                nxt = next(it, None)
            ln += 1
    return bad


if __name__ == "__main__":
    main()
