"""Spike: how much device rate does feature caching buy at sweep tiles?

VERDICT round-2 top item: the production sweep rebuilds the target-side
int8 feature tensor (R x tj x L) inside every strip's block dispatch, so
the whole matrix's g-features are rematerialized n/ti times per run, and
BASELINE.md attributes the ~25% gap to int8-MXU peak to "feature
materialization + packing".  Before restructuring the engine, measure on
the real chip what each part actually costs at the production tile shape
(ti=1024 strips x tj=4096 blocks, raw plan, 18 channels):

  1. block_now      — production compute: slice codes, build f/g features
                      in-graph, contract (no packing)
  2. gy_cached      — g-features prebuilt once for the whole matrix;
                      the block builds only the x-side features
  3. both_cached    — f- and g-features both prebuilt; block = slice+GEMM
  4. block_now_rel4 — production block incl. rb/cb/cc baselines + rel4
                      nibble packing (what the real sweep dispatches)
  5. cached_rel4    — (3) plus rel4 packing from prebuilt ref features

Each variant sweeps the same 16-block triangle (8 strips x 2 column
blocks at n=8192) inside one jit per block, fenced by a scalar
sum-of-squares D2H per sweep (block_until_ready does not reliably
synchronize through this harness's device tunnel).  Prints one JSON line
per variant and a share breakdown.

Run: python scripts/featcache_spike.py  (SPIKE_N, SPIKE_L, SPIKE_MEASURE)
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
    from distance_tpu.ops.packing import pack_device_rel4

    n = int(os.environ.get("SPIKE_N", 8192))
    width = int(os.environ.get("SPIKE_L", 29904))
    measure = os.environ.get("SPIKE_MEASURE", "raw")
    ti = int(os.environ.get("SPIKE_TI", 1024))
    tj = int(os.environ.get("SPIKE_TJ", 4096))
    l_pad = (width + 127) // 128 * 128
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}"
          f"  n={n} L={width} ti={ti} tj={tj} measure={measure}",
          file=sys.stderr)

    mat = make_alignment(n, width, seed=3)
    pad = np.zeros((n, l_pad - width), dtype=np.uint8)
    codes = jax.block_until_ready(
        jnp.asarray(np.concatenate([mat, pad], axis=1)))
    plan = get_plan(measure)
    r = plan.total_channels

    def contract(fx, gy):
        if plan.mix_num is not None:
            o = jax.lax.dot_general(
                fx, gy, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.int32)
            num = jnp.asarray(plan.mix_num)
            den = jnp.asarray(plan.mix_den)[:, None, None]
            return jnp.tensordot(num, o, axes=([1], [0])) // den
        outs = []
        for name in plan.counters:
            lo, hi = plan.slice_of(name)
            outs.append(jax.lax.dot_general(
                fx[lo:hi], gy[lo:hi],
                dimension_numbers=(((0, 2), (0, 2)), ((), ())),
                preferred_element_type=jnp.int32))
        return jnp.stack(outs)

    # Prebuilt feature tensors (the cache candidates).
    fx_full = jax.block_until_ready(jax.jit(
        lambda c: features_device(c, plan, "f", jnp, jnp.int8))(codes))
    gy_full = jax.block_until_ready(jax.jit(
        lambda c: features_device(c, plan, "g", jnp, jnp.int8))(codes))
    ref_np = np.zeros((1, l_pad), dtype=np.uint8)
    ref_np[0, :width] = np.asarray(mat[0])
    ref = jnp.asarray(ref_np)
    f_ref = jax.block_until_ready(jax.jit(
        lambda c: features_device(c, plan, "f", jnp, jnp.int8))(ref))
    g_ref = jax.block_until_ready(jax.jit(
        lambda c: features_device(c, plan, "g", jnp, jnp.int8))(ref))

    # --- block variants --------------------------------------------------
    def blk_now(m, i0, j0):
        x = jax.lax.dynamic_slice(m, (i0, 0), (ti, m.shape[1]))
        y = jax.lax.dynamic_slice(m, (j0, 0), (tj, m.shape[1]))
        fx = features_device(x, plan, "f", jnp, jnp.int8)
        gy = features_device(y, plan, "g", jnp, jnp.int8)
        return (contract(fx, gy),)

    def blk_gy_cached(m, gyf, i0, j0):
        x = jax.lax.dynamic_slice(m, (i0, 0), (ti, m.shape[1]))
        fx = features_device(x, plan, "f", jnp, jnp.int8)
        gy = jax.lax.dynamic_slice(gyf, (0, j0, 0), (r, tj, gyf.shape[2]))
        return (contract(fx, gy),)

    def blk_both_cached(fxf, gyf, i0, j0):
        fx = jax.lax.dynamic_slice(fxf, (0, i0, 0), (r, ti, fxf.shape[2]))
        gy = jax.lax.dynamic_slice(gyf, (0, j0, 0), (r, tj, gyf.shape[2]))
        return (contract(fx, gy),)

    def blk_now_rel4(m, i0, j0, rf):
        x = jax.lax.dynamic_slice(m, (i0, 0), (ti, m.shape[1]))
        y = jax.lax.dynamic_slice(m, (j0, 0), (tj, m.shape[1]))
        fx = features_device(x, plan, "f", jnp, jnp.int8)
        gy = features_device(y, plan, "g", jnp, jnp.int8)
        fr = features_device(rf, plan, "f", jnp, jnp.int8)
        gr = features_device(rf, plan, "g", jnp, jnp.int8)
        c = contract(fx, gy)
        rb = contract(fx, gr)[:, :, 0]
        cb = contract(fr, gy)[:, 0, :]
        cc = contract(fr, gr)[:, 0, 0]
        ri = jnp.arange(ti) + i0
        cj = jnp.arange(tj) + j0
        mask = ri[:, None] == cj[None, :]
        lanes, exc_idx, exc_val = pack_device_rel4(c, rb, cb, cc, jnp, mask)
        return lanes, cb, rb, exc_idx, exc_val

    def blk_cached_rel4(fxf, gyf, i0, j0, fr, gr):
        fx = jax.lax.dynamic_slice(fxf, (0, i0, 0), (r, ti, fxf.shape[2]))
        gy = jax.lax.dynamic_slice(gyf, (0, j0, 0), (r, tj, gyf.shape[2]))
        c = contract(fx, gy)
        rb = contract(fx, gr)[:, :, 0]
        cb = contract(fr, gy)[:, 0, :]
        cc = contract(fr, gr)[:, 0, 0]
        ri = jnp.arange(ti) + i0
        cj = jnp.arange(tj) + j0
        mask = ri[:, None] == cj[None, :]
        lanes, exc_idx, exc_val = pack_device_rel4(c, rb, cb, cc, jnp, mask)
        return lanes, cb, rb, exc_idx, exc_val

    # --- timed triangle sweep -------------------------------------------
    blocks = []
    pairs = 0
    for i0 in range(0, n - 1, ti):
        for j0 in range(i0, n, tj):
            blocks.append((i0, j0))
            pairs += ti * min(tj, n - j0)

    def timed(name, fn, args_of):
        def body(*a):
            outs = fn(*a)
            return sum(jnp.sum((o * o).astype(jnp.int32)) for o in outs)

        f = jax.jit(body)
        try:
            jax.block_until_ready(f(*args_of(0, 0)))
        except Exception as e:
            print(json.dumps({"variant": name, "ok": False,
                              "error": str(e)[:300]}))
            return None
        # fence: tiny scalar fetch after the full sweep
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            accs = [f(*args_of(i0, j0)) for (i0, j0) in blocks]
            tot = sum(float(np.asarray(a)) for a in accs[-1:])
            _ = tot
            times.append(time.perf_counter() - t0)
        dt = sorted(times)[1]
        out = {"variant": name, "ok": True, "sec_per_sweep": round(dt, 4),
               "pairs_per_s": round(pairs / dt),
               "tops_equiv": round(r * l_pad * pairs / dt / 1e12, 1)}
        print(json.dumps(out))
        return dt

    t_now = timed("block_now", blk_now,
                  lambda i0, j0: (codes, i0, j0))
    t_gy = timed("gy_cached", blk_gy_cached,
                 lambda i0, j0: (codes, gy_full, i0, j0))
    t_both = timed("both_cached", blk_both_cached,
                   lambda i0, j0: (fx_full, gy_full, i0, j0))
    t_rel4 = timed("block_now_rel4", blk_now_rel4,
                   lambda i0, j0: (codes, i0, j0, ref))
    t_crel4 = timed("cached_rel4", blk_cached_rel4,
                    lambda i0, j0: (fx_full, gy_full, i0, j0, f_ref, g_ref))

    if t_now and t_both:
        print(json.dumps({
            "feature_share_of_block": round(1 - t_both / t_now, 3),
            "gy_share": round(1 - t_gy / t_now, 3) if t_gy else None,
            "rel4_pack_overhead": (round(t_rel4 / t_now - 1, 3)
                                   if t_rel4 else None),
            "cached_rel4_vs_now_rel4": (round(t_rel4 / t_crel4, 3)
                                        if t_rel4 and t_crel4 else None),
        }))


if __name__ == "__main__":
    main()
