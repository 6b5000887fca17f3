"""Spike: fuse rel4 packing into the GEMM by contracting DIFFED operands.

Round-3 measured (relpack_spike.py): rel4 packing costs 23% of block time
at sweep tiles, and the cost is the residual elementwise combine over the
(G, ti, tj) int32 counter tensor plus the rb/cb baseline GEMMs — not the
exception extraction.  Round-4 candidate: every counter is bilinear in
the per-channel feature tensors (ops/features.py), so the rel residual

    res = c(i,j) - c(i,ref) - c(ref,j) + c(ref,ref)

is EXACTLY the contraction of diffed operands,

    res = contract(fx - f_ref, gy - g_ref)

(in exact integer arithmetic; shared-plan mixes stay even per site, so
the // den division remains exact — each mix.O term is a genuine
code-pair evaluation, hence even, and differences of evens are even).
The big counter tensor c is then never materialized: the GEMM's output
IS the residual, the nibble clamp/pack fuses into its consumer, and the
baselines come from thin GEMMs on the same diffed tensors:

    rb = contract(fx_d, g_ref) + cc,   cb = contract(f_ref, gy_d) + cc.

Variants (all over cached g-side features, per-strip f features, the
production config):
  1. cached_nopack  — contraction only (floor)
  2. cached_rel4    — current production path (combine + pack)
  3. fused_rel4     — diffed operands prediffed ONCE per matrix/strip
  4. fused_rel4_bd  — diffed per BLOCK from plain cached features
                      (no extra HBM for a diffed g-cache copy)

Prints one JSON line per variant + a summary, and asserts the fused
path's unpacked counters equal the current path's on one block.

Run: python scripts/relpack_fuse_spike.py  (SPIKE_N/L/TI/TJ/MEASURE)
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
    # Prediffed g cache (variant 3).  Values in {-2..2}: still int8.
    gy_d = jax.block_until_ready(jax.jit(lambda g: g - g_ref)(gy_full))

    fx_strip = jax.jit(lambda c, i0: features_device(
        jax.lax.dynamic_slice(c, (i0, 0), (ti, c.shape[1])),
        plan, "f", jnp, jnp.int8))
    fx_diff = jax.jit(lambda fx: fx - f_ref)

    def slice_g(gyf, j0):
        return jax.lax.dynamic_slice(gyf, (0, j0, 0), (r, tj, gyf.shape[2]))

    def extract(res, sat):
        n_flat = int(np.prod(res.shape))
        seg_len = -(-n_flat // REL4_SEGMENTS)
        padn = REL4_SEGMENTS * seg_len - n_flat
        flat_sat = jnp.concatenate(
            [sat.reshape(-1), jnp.zeros(padn, dtype=sat.dtype)]
        ).reshape(REL4_SEGMENTS, seg_len)
        count = flat_sat.sum(axis=1)
        first = jnp.argmax(flat_sat, axis=1)
        last = seg_len - 1 - jnp.argmax(flat_sat[:, ::-1], axis=1)
        base = jnp.arange(REL4_SEGMENTS, dtype=jnp.int32) * np.int32(seg_len)
        idx1 = jnp.where(count >= 1, base + first.astype(jnp.int32), -1)
        idx2 = jnp.where(count >= 2, base + last.astype(jnp.int32), -1)
        exc_idx = jnp.concatenate([idx1, idx2]).astype(jnp.int32)
        flat_res = res.reshape(-1)
        safe = jnp.clip(exc_idx, 0, n_flat - 1)
        exc_val = jnp.where(exc_idx >= 0, flat_res[safe], 0).astype(jnp.int32)
        return exc_idx, exc_val

    def pack_pre(res):
        """Nibble-pack precomputed residuals (no combine)."""
        sat = jnp.abs(res) > 7
        nib = jnp.where(sat, REL4_SAT, res) & 0xF
        u = nib.astype(jnp.uint8)
        lanes = _bitcast(u[..., 0::2] | (u[..., 1::2] << 4), jnp.int8, jnp)
        exc_idx, exc_val = extract(res, sat)
        return lanes, exc_idx, exc_val

    def current(fx, gyf, i0, j0):
        gy = slice_g(gyf, j0)
        c = contract_features(fx, gy, plan)
        rb = contract_features(fx, g_ref, plan)[:, :, 0]
        cb = contract_features(f_ref, gy, plan)[:, 0, :]
        cc = contract_features(f_ref, g_ref, plan)[:, 0, 0]
        return pack_device_rel4(c, rb, cb, cc, jnp) + (cb, rb, cc)

    def fused(fx_d, gydf, i0, j0):
        gy_dd = slice_g(gydf, j0)
        res = contract_features(fx_d, gy_dd, plan)
        cc = contract_features(f_ref, g_ref, plan)[:, 0, 0]
        rb = contract_features(fx_d, g_ref, plan)[:, :, 0] + cc[:, None]
        cb = contract_features(f_ref, gy_dd, plan)[:, 0, :] + cc[:, None]
        return pack_pre(res) + (cb, rb, cc)

    def fused_bd(fx, gyf, i0, j0):
        # block-diffed: plain cached features, diff in-graph per block
        fx_d = fx - f_ref
        gy_dd = slice_g(gyf, j0) - g_ref
        res = contract_features(fx_d, gy_dd, plan)
        cc = contract_features(f_ref, g_ref, plan)[:, 0, 0]
        rb = contract_features(fx_d, g_ref, plan)[:, :, 0] + cc[:, None]
        cb = contract_features(f_ref, gy_dd, plan)[:, 0, :] + cc[:, None]
        return pack_pre(res) + (cb, rb, cc)

    def nopack(fx, gyf, i0, j0):
        return (contract_features(fx, slice_g(gyf, j0), plan),)

    # --- exactness check on one block ------------------------------------
    from distance_tpu.ops.packing import unpack_rel4_nibbles

    fx0 = jax.block_until_ready(fx_strip(codes, 0))
    fx0d = jax.block_until_ready(fx_diff(fx0))
    a = jax.jit(current)(fx0, gy_full, 0, 0)
    b = jax.jit(fused)(fx0d, gy_d, 0, 0)
    c_ = jax.jit(fused_bd)(fx0, gy_full, 0, 0)
    for got, name in ((b, "fused"), (c_, "fused_bd")):
        for k, part in enumerate(("lanes", "exc_idx", "exc_val",
                                  "cb", "rb", "cc")):
            av, gv = np.asarray(a[k]), np.asarray(got[k])
            assert np.array_equal(av, gv), (
                f"{name} {part} mismatch: {np.abs(av.astype(np.int64) - gv.astype(np.int64)).max()}"
            )
    # unpacked residual sanity: lanes decode to res
    res_np = unpack_rel4_nibbles(np.asarray(a[0]))
    print(json.dumps({"exactness": "fused == current (all parts equal)",
                      "sat_cells": int((res_np == REL4_SAT).sum())}))

    variants = {
        "cached_nopack": (nopack, False),
        "cached_rel4": (current, False),
        "fused_rel4": (fused, True),
        "fused_rel4_bd": (fused_bd, False),
    }

    strips = []
    pairs = 0
    for i0 in range(0, n - 1, ti):
        cols = list(range(i0, n, tj))
        strips.append((i0, cols))
        pairs += ti * sum(min(tj, n - j0) for j0 in cols)

    results = {}
    for name, (fn, want_diff) in variants.items():
        gsrc = gy_d if want_diff else gy_full

        # the g tensor travels as an ARGUMENT (a closure would inline
        # 4.4 GB of device constants into the executable)
        def body(fx, gyf, i0, j0, fn=fn):
            outs = fn(fx, gyf, i0, j0)
            return sum(jnp.sum((o.astype(jnp.int32)) ** 2) for o in outs)

        f = jax.jit(body)
        jax.block_until_ready(f(fx0d if want_diff else fx0, gsrc, 0, 0))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            acc = None
            for i0, cols in strips:
                fx = fx_strip(codes, i0)
                if want_diff:
                    fx = fx_diff(fx)
                for j0 in cols:
                    acc = f(fx, gsrc, i0, j0)
            float(np.asarray(acc))
            times.append(time.perf_counter() - t0)
        dt = sorted(times)[1]
        results[name] = dt
        print(json.dumps({"variant": name, "sec_per_sweep": round(dt, 4),
                          "pairs_per_s": round(pairs / dt)}))

    base = results["cached_nopack"]
    cur = results["cached_rel4"]
    print(json.dumps({
        "rel4_pack_overhead_current": round(cur / base - 1, 3),
        "rel4_pack_overhead_fused": round(results["fused_rel4"] / base - 1, 3),
        "rel4_pack_overhead_fused_bd": round(
            results["fused_rel4_bd"] / base - 1, 3),
        "fused_vs_current": round(cur / results["fused_rel4"], 3),
    }))


if __name__ == "__main__":
    main()
