"""Same-window chip A/B: diff-encoded uploads under a forced 1-device
GSPMD mesh vs unsharded — VERDICT round-4 item 3's "Done" criterion.

Round 4 disabled diff uploads whenever the engine was sharded
(engine.prepare gated on ``not self.sharded``), so multi-chip runs paid
dense H2D per prepare and per stream group.  Round 5 routes the
(idx, code) scatter rebuild through pjit with a mesh-replicated output.
This harness has ONE chip, so multi-device byte parity lives in
tests/test_diffup_sharded.py (8-virtual-device CPU mesh); what the chip
pins is that at a forced 1-device mesh the SHARDED path ships the same
(small) wire bytes as the unsharded diff path — not the dense matrix.

Primary metric (deterministic, window-independent): H2D bytes as
accounted from the chosen encodings — diff bytes = 5 x n_diffs +
ref row; dense bytes = rows_pad x l_pad.  Wall time is reported but the
relay window swings 3-6x between runs.

Run: python scripts/diffup_sharded_ab.py  (env: SPIKE_N/SPIKE_L/SPIKE_MEASURE)
"""

import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    n = int(os.environ.get("SPIKE_N", 2048))
    width = int(os.environ.get("SPIKE_L", 29904))
    measure = os.environ.get("SPIKE_MEASURE", "raw")

    import jax

    import distance_tpu.engine as engine
    import distance_tpu.ops.diffup as diffup
    from distance_tpu.encoding import CODE_TO_CHAR
    from distance_tpu.engine import Setup, run
    from distance_tpu.fastaio import load_fastas
    from distance_tpu.writer import TsvWriter
    from bench import make_alignment

    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}",
          file=sys.stderr)

    table = np.zeros(256, dtype=np.uint8)
    for code, ch in CODE_TO_CHAR.items():
        table[code] = ord(ch)
    mat = make_alignment(n, width, seed=3)
    fasta = b"".join(
        b">s%d\n%s\n" % (i, table[mat[i]].tobytes()) for i in range(n)
    )

    # deterministic wire accounting at the encode decision point
    # (prepare() uploads straight from the encoding, so the encode
    # result determines the wire: diffs+ref when it wins, dense else)
    wire = {"diff_bytes": 0, "dense_bytes": 0, "encodes": 0}
    enc_orig = diffup.DiffUploader.encode

    def enc_spy(self, padded, n_real=None):
        wire["encodes"] += 1
        enc = enc_orig(self, padded, n_real=n_real)
        if enc is None:
            wire["dense_bytes"] += padded.nbytes
        else:
            wire["diff_bytes"] += (
                enc[0].nbytes + enc[1].nbytes + self.l_pad
            )
        return enc

    diffup.DiffUploader.encode = enc_spy

    real_mesh_fn = engine._device_mesh

    def one_dev_mesh(n_blocks):
        return jax.sharding.Mesh(np.array(jax.devices()[:1]), ("dp",))

    results = {}
    outs = {}
    for variant in ("unsharded", "sharded_1dev"):
        engine._device_mesh = (
            real_mesh_fn if variant == "unsharded" else one_dev_mesh
        )
        wire.update(diff_bytes=0, dense_bytes=0, encodes=0)
        out = io.BytesIO()
        t0 = time.perf_counter()
        run(Setup(
            loaded=load_fastas([io.BytesIO(fasta)]),
            streamed=None, writer=TsvWriter(out), measure=measure,
            n_threads=1, batchsize=1, backend="xla", consensus=None,
        ))
        dt = time.perf_counter() - t0
        results[variant] = dict(
            wall_s=round(dt, 2), **{k: int(v) for k, v in wire.items()}
        )
        outs[variant] = out.getvalue()
        print(f"{variant}: {results[variant]}", file=sys.stderr)
    engine._device_mesh = real_mesh_fn
    diffup.DiffUploader.encode = enc_orig
    assert outs["unsharded"] == outs["sharded_1dev"], "A/B bytes differ"
    print(json.dumps({
        "n": n, "width": width, "measure": measure,
        "unsharded": results["unsharded"],
        "sharded_1dev": results["sharded_1dev"],
        "sharded_used_diff":
            results["sharded_1dev"]["diff_bytes"] > 0
            and results["sharded_1dev"]["dense_bytes"] == 0,
        "bytes_match_unsharded":
            results["sharded_1dev"]["diff_bytes"]
            == results["unsharded"]["diff_bytes"],
    }))


if __name__ == "__main__":
    main()
