"""Two-file (rectangle) scale run on real hardware.

Runs the full product path for file1 x file2 — FASTA on disk -> CLI ->
rectangle sweep -> TSV — optionally forcing the round-4 out-of-core
rectangle staging with a small HBM budget, and spot-checks random output
rows against the scalar oracle.  Reference capability being validated:
two-file mode bounded by host RAM only (lib.rs:551-596).

    python scripts/rect_scale_run.py [N1] [N2] [WIDTH] [HBM_BUDGET_BYTES]

Defaults: 8000 x 8000 x 29904 with a 300 MB budget (two ~240 MB packed
matrices + staging > budget => blocked path).  Env: RECT_MEASURE
(default tn93), RECT_DIR, RECT_CHECKS (default 40).
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from scale_run import _oracle, peak_rss_gb, write_fasta  # noqa: E402


def main():
    n1 = int(sys.argv[1]) if len(sys.argv) > 1 else 8000
    n2 = int(sys.argv[2]) if len(sys.argv) > 2 else 8000
    width = int(sys.argv[3]) if len(sys.argv) > 3 else 29_904
    budget = int(sys.argv[4]) if len(sys.argv) > 4 else 300_000_000
    measure = os.environ.get("RECT_MEASURE", "tn93")
    work = os.environ.get("RECT_DIR", "/tmp/rect_scale_run")
    n_checks = int(os.environ.get("RECT_CHECKS", 40))
    os.makedirs(work, exist_ok=True)
    f1, f2 = os.path.join(work, "a.fasta"), os.path.join(work, "b.fasta")
    out = os.path.join(work, "out.tsv")
    mat1 = write_fasta(f1, n1, width)
    # different seed content: shift the second file's generator stream
    from bench import make_alignment
    from distance_tpu.encoding import CODE_TO_CHAR

    mat2 = make_alignment(n2, width, seed=7)
    table = np.zeros(256, dtype=np.uint8)
    for code, ch in CODE_TO_CHAR.items():
        table[code] = ord(ch)
    with open(f2, "wb") as fh:
        for i in range(n2):
            fh.write(b">t%d\n" % i)
            fh.write(table[mat2[i]].tobytes())
            fh.write(b"\n")

    env = dict(os.environ, DISTANCE_TPU_HBM_BUDGET=str(budget),
               DISTANCE_TPU_TRACE="1")
    argv = [sys.executable, "-m", "distance_tpu.cli", f1, f2, "-m",
            measure, "--backend", "xla", "-o", out]
    t0 = time.time()
    child = subprocess.Popen(argv, env=env)
    peak = 0.0
    while child.poll() is None:
        time.sleep(2)
        peak = max(peak, peak_rss_gb(child.pid))
    dt = time.time() - t0
    assert child.returncode == 0, child.returncode
    pairs = n1 * n2

    # spot checks: rect row (i, j) is line 1 + i*n2 + j (after header)
    oracle = _oracle(measure)
    rng = np.random.default_rng(99)
    targets = sorted(
        (int(rng.integers(n1)), int(rng.integers(n2)))
        for _ in range(n_checks)
    )
    lines = {1 + i * n2 + j: (i, j) for i, j in targets}
    bad = 0
    with open(out, "rb") as fh:
        for ln, line in enumerate(fh):
            ij = lines.get(ln)
            if ij is None:
                continue
            i, j = ij
            want = f"s{i}\tt{j}\t{oracle(mat1[i], mat2[j])}".encode()
            if line.rstrip(b"\n") != want:
                bad += 1
                print("MISMATCH", ln, line[:80], want[:80])
    size = os.path.getsize(out)
    print(json.dumps({
        "mode": "rectangle", "measure": measure, "n1": n1, "n2": n2,
        "width": width, "hbm_budget": budget,
        "pairs": pairs, "seconds": round(dt, 1),
        "pairs_per_s": round(pairs / dt),
        "tsv_gb": round(size / 1e9, 2), "peak_rss_gb": round(peak, 1),
        "spot_checks": len(lines), "spot_check_failures": bad,
    }))
    assert bad == 0
    for p in (f1, f2, out):
        os.unlink(p)


if __name__ == "__main__":
    main()
