"""Bounded stream-mode slice: measure sustained end-to-end pairs/s.

Complements scripts/stream_scale_run.py (the full 1M-seq kill/resume
validation run): this harness measures a clean completion-to-completion
rate on a smaller slice, gated on relay health, with no mid-run kill —
the number BASELINE.md records for the diff-encoded upload + fused
group dispatch stream path.

    python scripts/stream_slice_run.py [N_LOADED] [N_STREAM] [WIDTH]

The device relay in this container degrades for stretches (see
BASELINE.md "Relay pathology"); the run is preceded by an in-process
probe child that loops tiny transfers until two consecutive settles come
in under PROBE_OK_S (never killed — killing a client mid-transfer
poisons the relay queue for everyone).  If the relay stays degraded past
PROBE_MAX_S the run proceeds anyway and the JSON records the health.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

PROBE_OK_S = float(os.environ.get("SLICE_PROBE_OK_S", 5.0))
PROBE_MAX_S = float(os.environ.get("SLICE_PROBE_MAX_S", 2400))

_PROBE_SRC = r"""
import sys, time
import numpy as np
import jax.numpy as jnp
ok_s = float(sys.argv[1]); max_s = float(sys.argv[2])
x = np.zeros((1024, 2048), dtype=np.int8)  # 2 MB
t_start = time.time(); streak = 0
while time.time() - t_start < max_s:
    t0 = time.time()
    v = np.asarray(jnp.sum(jnp.asarray(x).astype(jnp.int32)))
    dt = time.time() - t0
    print(f"[probe] settle {dt:.1f}s", file=sys.stderr, flush=True)
    streak = streak + 1 if dt < ok_s else 0
    if streak >= 2:
        sys.exit(0)
    time.sleep(min(30, max(5, dt)))
sys.exit(2)
"""


def probe_relay() -> bool:
    """True when the relay looks healthy.  Runs in a child so the probe
    client closes cleanly before the measured run opens its own."""
    r = subprocess.run(
        [sys.executable, "-c", _PROBE_SRC, str(PROBE_OK_S),
         str(PROBE_MAX_S)],
    )
    return r.returncode == 0


def main():
    n1 = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000
    n2 = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    width = int(sys.argv[3]) if len(sys.argv) > 3 else 29_904
    measure = os.environ.get("SLICE_MEASURE", "n_high")
    work = os.environ.get("SLICE_DIR", "/tmp/stream_slice")
    os.makedirs(work, exist_ok=True)
    loaded_fa = os.path.join(work, "loaded.fasta")
    stream_fa = os.path.join(work, "slice.fasta")
    out = os.path.join(work, "out.tsv")

    import numpy as np

    from bench import make_alignment
    from distance_tpu.encoding import A, C, G, T
    from scripts.stream_scale_run import (
        _char_table, streamed_record, write_stream_fasta,
    )

    loaded_mat = make_alignment(n1, width, seed=1)
    rng = np.random.default_rng(999)
    ancestor = rng.choice(
        np.array([A, C, G, T], dtype=np.uint8), size=width
    )
    table = _char_table()
    with open(loaded_fa, "wb") as f:
        for i in range(n1):
            f.write(b">s%d\n%s\n" % (i, table[loaded_mat[i]].tobytes()))
    if not os.path.exists(stream_fa) or os.environ.get("SLICE_REGEN"):
        write_stream_fasta(stream_fa, n2, width, ancestor)

    backend = os.environ.get("SLICE_BACKEND", "xla")
    healthy = probe_relay() if backend == "xla" else True
    print(f"[slice] relay healthy: {healthy}", file=sys.stderr, flush=True)

    argv = [sys.executable, "-m", "distance_tpu.cli", "-i", loaded_fa,
            "-s", stream_fa, "-m", measure, "--backend", backend,
            "-o", out]
    env = dict(os.environ, DISTANCE_TPU_TRACE="1")
    t0 = time.time()
    samples = []
    child = subprocess.Popen(argv, env=env)
    while child.poll() is None:
        time.sleep(2)
        try:
            samples.append((time.time() - t0, os.path.getsize(out)))
        except OSError:
            pass
    wall = time.time() - t0
    assert child.returncode == 0, f"run failed rc={child.returncode}"

    total_pairs = n1 * n2
    total_bytes = os.path.getsize(out)
    # steady-state window: drop the first/last 10% of output growth
    lo, hi = total_bytes * 0.1, total_bytes * 0.9
    win = [(t, b) for t, b in samples if lo <= b <= hi]
    bytes_per_row = total_bytes / (total_pairs + 1)
    if len(win) >= 2:
        (ta, ba), (tb, bb) = win[0], win[-1]
        sustained = (bb - ba) / bytes_per_row / (tb - ta)
    else:
        sustained = total_pairs / wall

    # validation: exact line count + random value spot checks
    import mmap
    import random as _random

    from scripts.scale_run import _oracle

    value_of = _oracle(measure)
    with open(out, "rb") as f:
        mm = mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)
        lines = 0
        CH = 1 << 26
        for off in range(0, len(mm), CH):
            lines += mm[off:off + CH].count(b"\n")
        rnd = _random.Random(3)
        checked = 0
        for _ in range(40):
            off = rnd.randrange(0, len(mm) - 2)
            pos = mm.find(b"\n", off) + 1
            end = mm.find(b"\n", pos)
            if pos == 0 or end < 0 or not mm[pos:pos + 1] == b"s":
                continue
            sid1, sid2, val = mm[pos:end].decode().split("\t")
            i, r = int(sid1[1:]), int(sid2[1:])
            want = value_of(
                loaded_mat[i], streamed_record(r, width, ancestor)
            )
            assert val == want, (i, r, val, want)
            checked += 1
        mm.close()
    assert lines == total_pairs + 1, (lines, total_pairs + 1)

    print(json.dumps({
        "n_loaded": n1, "n_streamed": n2, "width": width,
        "measure": measure, "total_pairs": total_pairs,
        "wall_s": round(wall, 1),
        "e2e_pairs_per_s": round(total_pairs / wall, 1),
        "sustained_pairs_per_s": round(sustained, 1),
        "output_gb": round(total_bytes / 1e9, 2),
        "relay_healthy": healthy, "spot_checks": checked,
    }), flush=True)
    if not os.environ.get("SLICE_KEEP"):
        for p in (loaded_fa, stream_fa, out):
            try:
                os.remove(p)
            except OSError:
                pass


if __name__ == "__main__":
    main()
