"""Spike: cost of rel4 packing components at sweep tiles, and whether a
cheaper exception extraction buys device rate.

Measured (featcache_spike.py): rel4 packing adds 12-19% on top of the
cached-feature block at production tiles.  Components: residual compute
(elementwise int32), nibble pack (shift/or), and the segmented exception
extraction — today a per-segment sum + argmax + argmax-over-REVERSED
(the reverse materializes a copy of the sat tensor).  Candidate: replace
first/last extraction with masked min/max index reductions (no reversed
copy, XLA can fuse both reductions over one operand).

Variants, all over prebuilt cached features (the production config):
  1. cached_nopack    — contraction only (floor)
  2. cached_rel4      — current pack_device_rel4
  3. cached_rel4_mm   — min/max-index exception extraction
  4. cached_rel4_noexc— nibble lanes without ANY exception extraction
                        (lower bound of what extraction costs)

Run: python scripts/relpack_spike.py  (SPIKE_N, SPIKE_L, SPIKE_TI/TJ)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from bench import make_alignment
    from distance_tpu.ops.features import features_device, get_plan
    from distance_tpu.ops.packing import (
        REL4_SAT, REL4_SEGMENTS, _bitcast, pack_device_rel4,
    )
    from distance_tpu.ops.pairwise_xla import contract_features

    n = int(os.environ.get("SPIKE_N", 8192))
    width = int(os.environ.get("SPIKE_L", 29904))
    measure = os.environ.get("SPIKE_MEASURE", "raw")
    ti = int(os.environ.get("SPIKE_TI", 2048))
    tj = int(os.environ.get("SPIKE_TJ", 2048))
    l_pad = (width + 127) // 128 * 128
    mat = make_alignment(n, width, seed=3)
    pad = np.zeros((n, l_pad - width), dtype=np.uint8)
    codes = jnp.asarray(np.concatenate([mat, pad], axis=1))
    plan = get_plan(measure)
    r = plan.total_channels

    fx_full = jax.block_until_ready(jax.jit(
        lambda c: features_device(c, plan, "f", jnp, jnp.int8))(codes))
    gy_full = jax.block_until_ready(jax.jit(
        lambda c: features_device(c, plan, "g", jnp, jnp.int8))(codes))
    ref = jnp.asarray(
        np.concatenate([np.asarray(mat[0]),
                        np.zeros(l_pad - width, np.uint8)])[None, :]
    )
    f_ref = jax.block_until_ready(jax.jit(
        lambda c: features_device(c, plan, "f", jnp, jnp.int8))(ref))
    g_ref = jax.block_until_ready(jax.jit(
        lambda c: features_device(c, plan, "g", jnp, jnp.int8))(ref))

    def residuals(fxf, gyf, i0, j0):
        fx = jax.lax.dynamic_slice(fxf, (0, i0, 0), (r, ti, fxf.shape[2]))
        gy = jax.lax.dynamic_slice(gyf, (0, j0, 0), (r, tj, gyf.shape[2]))
        c = contract_features(fx, gy, plan)
        rb = contract_features(fx, g_ref, plan)[:, :, 0]
        cb = contract_features(f_ref, gy, plan)[:, 0, :]
        cc = contract_features(f_ref, g_ref, plan)[:, 0, 0]
        return c, rb, cb, cc

    def pack_mm(c, rb, cb, cc):
        """min/max-index exception extraction (no reversed copy)."""
        res = c - rb[:, :, None] - cb[:, None, :] + cc[:, None, None]
        sat = jnp.abs(res) > 7
        nib = jnp.where(sat, REL4_SAT, res) & 0xF
        u = nib.astype(jnp.uint8)
        lanes = _bitcast(u[..., 0::2] | (u[..., 1::2] << 4), jnp.int8, jnp)
        n_flat = int(np.prod(res.shape))
        seg_len = -(-n_flat // REL4_SEGMENTS)
        padn = REL4_SEGMENTS * seg_len - n_flat
        flat_sat = jnp.concatenate(
            [sat.reshape(-1), jnp.zeros(padn, dtype=sat.dtype)]
        ).reshape(REL4_SEGMENTS, seg_len)
        pos = jnp.arange(seg_len, dtype=jnp.int32)[None, :]
        count = flat_sat.sum(axis=1)
        first = jnp.min(jnp.where(flat_sat, pos, seg_len), axis=1)
        last = jnp.max(jnp.where(flat_sat, pos, -1), axis=1)
        base = jnp.arange(REL4_SEGMENTS, dtype=jnp.int32) * np.int32(seg_len)
        idx1 = jnp.where(count >= 1, base + first, -1)
        idx2 = jnp.where(count >= 2, base + last, -1)
        exc_idx = jnp.concatenate([idx1, idx2]).astype(jnp.int32)
        flat_res = res.reshape(-1)
        safe = jnp.clip(exc_idx, 0, n_flat - 1)
        exc_val = jnp.where(exc_idx >= 0, flat_res[safe], 0).astype(jnp.int32)
        return lanes, exc_idx, exc_val

    def pack_noexc(c, rb, cb, cc):
        res = c - rb[:, :, None] - cb[:, None, :] + cc[:, None, None]
        sat = jnp.abs(res) > 7
        nib = jnp.where(sat, REL4_SAT, res) & 0xF
        u = nib.astype(jnp.uint8)
        return (_bitcast(u[..., 0::2] | (u[..., 1::2] << 4), jnp.int8, jnp),)

    variants = {
        "cached_nopack": lambda fxf, gyf, i0, j0: (
            residuals(fxf, gyf, i0, j0)[0],),
        "cached_rel4": lambda fxf, gyf, i0, j0: pack_device_rel4(
            *residuals(fxf, gyf, i0, j0), jnp),
        "cached_rel4_mm": lambda fxf, gyf, i0, j0: pack_mm(
            *residuals(fxf, gyf, i0, j0)),
        "cached_rel4_noexc": lambda fxf, gyf, i0, j0: pack_noexc(
            *residuals(fxf, gyf, i0, j0)),
    }

    blocks = []
    pairs = 0
    for i0 in range(0, n - 1, ti):
        for j0 in range(i0, n, tj):
            blocks.append((i0, j0))
            pairs += ti * min(tj, n - j0)

    results = {}
    for name, fn in variants.items():
        def body(fxf, gyf, i0, j0, fn=fn):
            outs = fn(fxf, gyf, i0, j0)
            return sum(jnp.sum((o * o).astype(jnp.int32)) for o in outs)

        f = jax.jit(body)
        jax.block_until_ready(f(fx_full, gy_full, 0, 0))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            accs = [f(fx_full, gy_full, i0, j0) for i0, j0 in blocks]
            float(np.asarray(accs[-1]))
            times.append(time.perf_counter() - t0)
        dt = sorted(times)[1]
        results[name] = dt
        print(json.dumps({"variant": name, "sec_per_sweep": round(dt, 4),
                          "pairs_per_s": round(pairs / dt)}))

    base = results.get("cached_nopack")
    cur = results.get("cached_rel4")
    if base and cur:
        print(json.dumps({
            "rel4_pack_overhead": round(cur / base - 1, 3),
            "mm_vs_current": round(cur / results["cached_rel4_mm"], 3),
            "exc_extraction_share": round(
                (cur - results["cached_rel4_noexc"]) / cur, 3),
        }))


if __name__ == "__main__":
    main()
