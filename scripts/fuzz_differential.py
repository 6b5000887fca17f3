"""Randomized differential fuzz of the full engine config space.

Each iteration derives a random configuration (measure x mode x shapes x
tiles x batchsize x budget knobs x packing/diff-upload toggles x parse
workers) from a seed, runs the device (xla) path on the 8-virtual-device
CPU mesh, and byte-compares its TSV against the numpy path and (for
square/rect) the serial per-pair oracle from tests/conftest.py — the
same determinism contract the golden tests pin (SURVEY.md section 4),
swept over a far wider config lattice than any hand-written battery.

Usage:
    python scripts/fuzz_differential.py [--seconds 600 | --iters N]
                                        [--seed-base 0] [--batch 100]

On a mismatch it prints the failing seed + full config, writes the
repro FASTA(s) to /tmp/fuzz_repro_<seed>/, and exits 1.  Re-run a
single seed with --iters 1 --seed-base <seed>.

--seconds mode runs BATCHES of seeds in subprocesses (--batch each):
after a few hundred configs in one process the XLA:CPU host platform
can abort with a collective "rendezvous timeout" (all-gather over the
8 virtual devices with only 7 participant threads scheduled on the
4-core host — an in-process resource artifact of the forced-host
platform, measured at ~200 configs; every seed of a crashed batch
passes in isolation).  A crashed batch is automatically re-driven
seed-by-seed so real failures are still attributed to their seed.
"""

from __future__ import annotations

import argparse
import io
import os
import sys
import time

# hermetic CPU mesh, same as tests/conftest.py
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import distance_tpu.engine as engine  # noqa: E402
import distance_tpu.fastaio as fio  # noqa: E402
from distance_tpu.engine import Setup, run  # noqa: E402
from distance_tpu.fastaio import consensus as consensus_fn  # noqa: E402
from distance_tpu.fastaio import load_fastas  # noqa: E402
from distance_tpu.writer import TsvWriter  # noqa: E402
from tests.conftest import make_fasta, oracle_tsv, random_seqs  # noqa: E402

MEASURES = ["n", "n_high", "raw", "jc69", "k80", "tn93"]
# modest tile palette: bounds compile-cache growth while still crossing
# the interesting boundaries (ti == tj, ti < tj, ti > tj, mesh-divisible
# and not, tiles larger than n)
TILES = [2, 4, 8, 16, 32]
WIDTHS = [1, 3, 17, 64, 96, 127, 128, 129, 200, 256, 310]

DEFAULTS = dict(
    HBM_BUDGET_BYTES=engine.HBM_BUDGET_BYTES,
    HOST_BUF_BUDGET=engine.HOST_BUF_BUDGET,
    FEATCACHE_BUDGET=engine.FEATCACHE_BUDGET,
    STAGED_ROWS_FLOOR=engine.STAGED_ROWS_FLOOR,
)
STREAM_READ_DEFAULT = fio.STREAM_READ_BYTES


def one_config(seed: int) -> dict:
    rng = np.random.default_rng(seed)
    mode = rng.choice(["square", "rect", "stream"], p=[0.4, 0.3, 0.3])
    cfg = dict(
        seed=seed,
        mode=str(mode),
        measure=str(rng.choice(MEASURES)),
        n1=int(rng.integers(2, 70)),
        n2=int(rng.integers(1, 50)),
        width=int(rng.choice(WIDTHS)),
        amb=float(rng.choice([0.0, 0.1, 0.3, 0.5])),
        ti=int(rng.choice(TILES)),
        tj=int(rng.choice(TILES)),
        batchsize=int(rng.integers(1, 7)),
        # tiny budgets force out-of-core / staged paths; huge = in-core
        hbm=int(rng.choice([5_000, 30_000, 200_000, DEFAULTS["HBM_BUDGET_BYTES"]])),
        hostbuf=int(rng.choice([4_000, 50_000, DEFAULTS["HOST_BUF_BUDGET"]])),
        staged_floor=int(rng.choice([2, 16, DEFAULTS["STAGED_ROWS_FLOOR"]])),
        featcache=int(rng.choice([0, DEFAULTS["FEATCACHE_BUDGET"]])),
        no_diffup=bool(rng.random() < 0.3),
        no_relpack=bool(rng.random() < 0.3),
        parse_workers=int(rng.choice([1, 3])),
        read_bytes=int(rng.choice([96, 512, STREAM_READ_DEFAULT])),
    )
    return cfg


def run_once(cfg: dict, backend: str, f1: bytes, f2: bytes) -> bytes:
    handles = [io.BytesIO(f1)]
    stream = None
    if cfg["mode"] == "rect":
        handles.append(io.BytesIO(f2))
    elif cfg["mode"] == "stream":
        stream = io.BytesIO(f2)
    loaded = load_fastas(handles)
    cons = consensus_fn(loaded) if cfg["measure"] == "n" else None
    if cfg["measure"] == "tn93":
        for a in loaded:
            a.count_bases()
    out = io.BytesIO()
    setup = Setup(
        loaded=loaded,
        streamed=stream,
        writer=TsvWriter(out),
        measure=cfg["measure"],
        n_threads=1,
        batchsize=cfg["batchsize"],
        backend=backend,
        consensus=cons,
        tile_i=cfg["ti"],
        tile_j=cfg["tj"],
    )
    run(setup)
    return out.getvalue()


def apply_knobs(cfg: dict) -> None:
    engine.HBM_BUDGET_BYTES = cfg["hbm"]
    engine.HOST_BUF_BUDGET = cfg["hostbuf"]
    engine.STAGED_ROWS_FLOOR = cfg["staged_floor"]
    engine.FEATCACHE_BUDGET = cfg["featcache"]
    fio.STREAM_READ_BYTES = cfg["read_bytes"]
    for k, v in (
        ("DISTANCE_TPU_NO_DIFF_UPLOAD", cfg["no_diffup"]),
        ("DISTANCE_TPU_NO_REL_PACK", cfg["no_relpack"]),
    ):
        if v:
            os.environ[k] = "1"
        else:
            os.environ.pop(k, None)
    os.environ["DISTANCE_TPU_STREAM_PARSE_WORKERS"] = str(
        cfg["parse_workers"]
    )


def restore_knobs() -> None:
    engine.HBM_BUDGET_BYTES = DEFAULTS["HBM_BUDGET_BYTES"]
    engine.HOST_BUF_BUDGET = DEFAULTS["HOST_BUF_BUDGET"]
    engine.STAGED_ROWS_FLOOR = DEFAULTS["STAGED_ROWS_FLOOR"]
    engine.FEATCACHE_BUDGET = DEFAULTS["FEATCACHE_BUDGET"]
    fio.STREAM_READ_BYTES = STREAM_READ_DEFAULT
    for k in ("DISTANCE_TPU_NO_DIFF_UPLOAD", "DISTANCE_TPU_NO_REL_PACK",
              "DISTANCE_TPU_STREAM_PARSE_WORKERS"):
        os.environ.pop(k, None)


def fuzz_one(seed: int) -> tuple:
    """Returns (ok: bool, cfg, detail)."""
    cfg = one_config(seed)
    rng = np.random.default_rng(seed + 10_000_000)
    f1 = make_fasta(
        random_seqs(rng, cfg["n1"], cfg["width"], amb_frac=cfg["amb"])
    )
    recs2 = [
        (f"t{i}", s)
        for i, (_r, s) in enumerate(
            random_seqs(rng, cfg["n2"], cfg["width"], amb_frac=cfg["amb"])
        )
    ]
    f2 = make_fasta(recs2)
    try:
        apply_knobs(cfg)
        got = run_once(cfg, "xla", f1, f2)
        # numpy path ignores the device knobs; restore first so the
        # reference side always runs the plain configuration
        restore_knobs()
        want = run_once(cfg, "numpy", f1, f2)
        if got != want:
            return False, cfg, "xla != numpy"
        # serial oracle for the in-memory modes (stream order is
        # batch-grouped; numpy-path parity covers it above)
        if cfg["mode"] in ("square", "rect"):
            handles = [io.BytesIO(f1)]
            if cfg["mode"] == "rect":
                handles.append(io.BytesIO(f2))
            loaded = load_fastas(handles)
            if cfg["measure"] == "tn93":
                for a in loaded:
                    a.count_bases()
            ora = oracle_tsv(
                cfg["measure"], loaded[0],
                loaded[1] if cfg["mode"] == "rect" else None,
            )
            if want != ora:
                return False, cfg, "numpy != oracle"
        return True, cfg, ""
    finally:
        restore_knobs()


def _drive_batches(args) -> int:
    """--seconds mode: subprocess batches (see module docstring)."""
    import subprocess

    t0 = time.time()
    seed = args.seed_base
    total = 0
    while time.time() - t0 < args.seconds:
        cmd = [
            sys.executable, os.path.abspath(__file__),
            "--iters", str(args.batch), "--seed-base", str(seed),
        ]
        r = subprocess.run(cmd)
        if r.returncode == 0:
            total += args.batch
        elif r.returncode == 1:
            return 1  # a real mismatch: the child printed the seed
        else:
            # runtime abort (e.g. the XLA:CPU rendezvous artifact):
            # re-drive the batch seed-by-seed to attribute any real
            # failure; isolated crashes on a single seed also surface
            print(
                f"[fuzz] batch at seed {seed} died rc={r.returncode};"
                " re-driving seed-by-seed", flush=True,
            )
            for s in range(seed, seed + args.batch):
                r1 = subprocess.run(cmd[:-3] + ["1", "--seed-base", str(s)])
                if r1.returncode == 1:
                    return 1
                if r1.returncode not in (0,):
                    print(
                        f"[fuzz] seed {s} crashed rc={r1.returncode}"
                        " IN ISOLATION — investigate", flush=True,
                    )
                    return 2
            print(
                f"[fuzz] all {args.batch} seeds pass in isolation —"
                " in-process platform artifact, continuing", flush=True,
            )
            total += args.batch
        seed += args.batch
    print(
        f"[fuzz] PASS: {total} random configs byte-identical"
        f" (xla vs numpy vs oracle) in {time.time() - t0:.0f}s"
    )
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=0.0)
    ap.add_argument("--iters", type=int, default=0)
    ap.add_argument("--seed-base", type=int, default=0)
    ap.add_argument("--batch", type=int, default=100)
    args = ap.parse_args()
    if not args.seconds and not args.iters:
        args.seconds = 300.0
    if args.seconds:
        return _drive_batches(args)

    t0 = time.time()
    n = 0
    seed = args.seed_base
    by_mode = {"square": 0, "rect": 0, "stream": 0}
    while True:
        if args.iters and n >= args.iters:
            break
        if args.seconds and time.time() - t0 > args.seconds:
            break
        ok, cfg, detail = fuzz_one(seed)
        by_mode[cfg["mode"]] += 1
        if not ok:
            print(f"\nFAIL seed={seed}: {detail}\nconfig: {cfg}")
            rng = np.random.default_rng(seed + 10_000_000)
            d = f"/tmp/fuzz_repro_{seed}"
            os.makedirs(d, exist_ok=True)
            with open(f"{d}/a.fasta", "wb") as f:
                f.write(make_fasta(random_seqs(
                    rng, cfg["n1"], cfg["width"], amb_frac=cfg["amb"]
                )))
            print(f"repro inputs in {d} (b side regenerates from seed)")
            return 1
        n += 1
        seed += 1
        if n % 25 == 0:
            print(
                f"[fuzz] {n} configs ok in {time.time() - t0:.0f}s"
                f" (square {by_mode['square']} / rect {by_mode['rect']}"
                f" / stream {by_mode['stream']})",
                flush=True,
            )
    print(
        f"[fuzz] PASS: {n} random configs byte-identical"
        f" (xla vs numpy vs oracle) in {time.time() - t0:.0f}s"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
