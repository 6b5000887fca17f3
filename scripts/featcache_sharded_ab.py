"""Same-window A/B: 1-device-mesh (GSPMD) cached sweep vs unsharded.

Round-4 carries the g-side feature cache through GSPMD with the
block-partitioned (R, nb, tj, l_pad) layout (engine._jit_feat_builder_blocked).
This harness has ONE real chip, so the multi-device byte-parity evidence
lives in tests/test_featcache_sharded.py (8-virtual-device CPU mesh); what
the chip can pin is that the sharded code path — mesh-annotated builders,
blocked g layout, dynamic_index_in_dim block lookup, out_shardings on the
block fn — costs nothing vs the plain cached path when the mesh has one
device.  VERDICT round-3 item 1's "Done" criterion.

Two variants, same window, same matrix, production engine methods:

  unsharded — _BlockEngine as bench.py builds it (cached g + f path)
  sharded_1dev — engine._device_mesh monkeypatched to a 1-device mesh so
      _BlockEngine.sharded=True and every dispatch routes through the
      blocked cache layout

Each variant sweeps the full i<j block triangle via eng.fx_strip +
eng.block_feat (mode="none" and mode="rel4" both timed), fenced by a
scalar D2H per sweep.  Also does one tiny end-to-end CLI-equivalent run
per variant and asserts byte-identical TSV output on the real chip.

Run: python scripts/featcache_sharded_ab.py  (SPIKE_N/L/TI/TJ/MEASURE)
"""

import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def tiny_e2e(measure: str) -> bytes:
    """One small real-chip run through the production engine, returning
    the TSV bytes (uses whatever engine._device_mesh currently says)."""
    from distance_tpu.encoding import CODE_TO_CHAR
    from distance_tpu.engine import Setup, run
    from distance_tpu.fastaio import consensus as consensus_fn, load_fastas
    from distance_tpu.writer import TsvWriter
    from bench import make_alignment

    mat = make_alignment(96, 257, seed=11)
    lut = np.zeros(256, dtype=np.uint8)
    for code, ch in CODE_TO_CHAR.items():
        lut[code] = ord(ch)
    buf = io.BytesIO()
    for i, row in enumerate(mat):
        buf.write(b">s%d\n" % i)
        buf.write(lut[row].tobytes() + b"\n")
    buf.seek(0)
    loaded = load_fastas([buf])
    cons = consensus_fn(loaded) if measure == "n" else None
    if measure == "tn93":
        for a in loaded:
            a.count_bases()
    out = io.BytesIO()
    setup = Setup(
        loaded=loaded, streamed=None, writer=TsvWriter(out),
        measure=measure, n_threads=1, batchsize=1, backend="xla",
        consensus=cons, tile_i=32, tile_j=32,
    )
    run(setup)
    return out.getvalue()


def main():
    import jax
    import jax.numpy as jnp

    import distance_tpu.engine as engine
    from bench import make_alignment

    n = int(os.environ.get("SPIKE_N", 8192))
    width = int(os.environ.get("SPIKE_L", 29904))
    measure = os.environ.get("SPIKE_MEASURE", "raw")
    ti = int(os.environ.get("SPIKE_TI", 2048))
    tj = int(os.environ.get("SPIKE_TJ", 2048))
    l_pad = (width + 127) // 128 * 128
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}"
          f"  n={n} L={width} ti={ti} tj={tj} measure={measure}",
          file=sys.stderr)

    mat = make_alignment(n, width, seed=3)
    src = np.ascontiguousarray(
        np.concatenate(
            [mat, np.zeros((n, l_pad - width), dtype=np.uint8)], axis=1
        )
    )

    strips = []
    pairs = 0
    for i0 in range(0, n - 1, ti):
        cols = list(range((i0 // tj) * tj, n, tj))
        strips.append((i0, cols))
        pairs += min(ti, n - i0) * sum(min(tj, n - j0) for j0 in cols)

    real_mesh_fn = engine._device_mesh

    def one_dev_mesh(n_blocks):
        return jax.sharding.Mesh(np.array(jax.devices()[:1]), ("dp",))

    results = {}
    tsv = {}
    for variant in ("unsharded", "sharded_1dev", "sharded_recompute"):
        engine._device_mesh = (
            real_mesh_fn if variant == "unsharded" else one_dev_mesh
        )
        try:
            if variant != "sharded_recompute":
                tsv[variant] = tiny_e2e(measure)
            eng = engine._BlockEngine(measure, "xla", ti, tj, width)
            if variant == "sharded_recompute":
                eng.feat_cache_on = False  # round-3 sharded state
            m = eng.prepare(src, max(ti, tj),
                            diff_ref=eng.diff_ref_for(src))
            assert eng.sharded == (variant != "unsharded"), eng.sharded
            gyf = eng.gfeat_of(m)
            assert (gyf is not None) == (variant != "sharded_recompute")

            for mode in ("none", "rel4"):
                def sweep():
                    acc = None
                    for i0, cols in strips:
                        if gyf is not None:
                            fx = eng.fx_strip(m, i0, ti)
                        for j0 in cols:
                            if gyf is not None:
                                out = eng.block_feat(
                                    fx, gyf, i0, j0, ti, tj, mode,
                                    nv=(n, n), diag_off=0,
                                )
                            else:
                                out = eng.block(
                                    m, m, i0, j0, ti, tj, mode,
                                    nv=(n, n), diag_off=0,
                                )
                            acc = out[0] if isinstance(out, tuple) else out
                    # fence: tiny real D2H (block_until_ready is not a
                    # reliable fence through the device tunnel)
                    return float(np.asarray(jnp.sum(acc[..., :1])))

                sweep()  # warm (compile)
                times = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    sweep()
                    times.append(time.perf_counter() - t0)
                dt = sorted(times)[1]
                results[(variant, mode)] = dt
                print(json.dumps({
                    "variant": variant, "mode": mode,
                    "sec_per_sweep": round(dt, 4),
                    "pairs_per_s": round(pairs / dt),
                }))
            eng.release(m)
        finally:
            engine._device_mesh = real_mesh_fn

    assert tsv["unsharded"] == tsv["sharded_1dev"], (
        "sharded-vs-unsharded TSV bytes differ on chip"
    )
    summary = {
        "e2e_bytes_identical": True,
        "sharded_over_unsharded_none": round(
            results[("sharded_1dev", "none")] / results[("unsharded", "none")],
            4,
        ),
        "sharded_over_unsharded_rel4": round(
            results[("sharded_1dev", "rel4")] / results[("unsharded", "rel4")],
            4,
        ),
        "cached_over_recompute_sharded_none": round(
            results[("sharded_1dev", "none")]
            / results[("sharded_recompute", "none")], 4,
        ),
        "cached_over_recompute_sharded_rel4": round(
            results[("sharded_1dev", "rel4")]
            / results[("sharded_recompute", "rel4")], 4,
        ),
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
