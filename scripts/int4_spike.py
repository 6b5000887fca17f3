"""Spike: does an int4 feature GEMM beat the int8 path on this chip?

TODO.md round-3 candidate: the counter GEMM's channel counts are provably
minimal, so the only way past the measured 69-76%-of-int8-peak ceiling is
a higher-throughput MXU mode.  All feature values live in {-1, 0, 1},
which int4 represents exactly, so IF the hardware runs int4 matmul at 2x
the int8 rate (v6e does; v5e is believed int8-native) the same contraction
gets 2x for free.

This script measures, on the real attached chip:
  1. the production int8xint8->int32 contraction (raw plan, 18 channels)
  2. the identical contraction with both operands cast to int4
  3. (diagnostic) bf16xbf16->f32 for scale

and prints one JSON line per variant plus a verdict.  Exactness of the
int4 variant vs int8 is probed on a 256-row block and REPORTED as its
own JSON line (a probe failure prints an error line rather than
blocking the timing verdict).

Run: python scripts/int4_spike.py   (BENCH-style env: SPIKE_M, SPIKE_L)
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

    m = int(os.environ.get("SPIKE_M", 4096))
    width = int(os.environ.get("SPIKE_L", 29904))
    l_pad = (width + 127) // 128 * 128
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}",
          file=sys.stderr)

    mat = make_alignment(m, width, seed=3)
    pad = np.zeros((m, l_pad - width), dtype=np.uint8)
    codes = jnp.asarray(np.concatenate([mat, pad], axis=1))
    plan = get_plan("raw")
    r = plan.total_channels

    # Materialize features once (production does this per block); the
    # spike times ONLY the contraction, which is where the int4 question
    # lives.
    fx = jax.jit(lambda c: features_device(c, plan, "f", jnp, jnp.int8))(codes)
    gy = jax.jit(lambda c: features_device(c, plan, "g", jnp, jnp.int8))(codes)
    fx = jax.block_until_ready(fx.reshape(r * 1, m, l_pad))
    gy = jax.block_until_ready(gy)

    def contract(a, b, prefer):
        return jax.lax.dot_general(
            a, b,
            dimension_numbers=(((0, 2), (0, 2)), ((), ())),
            preferred_element_type=prefer,
        )

    variants = {}

    def timed(name, fn, a, b):
        # The checksum (sum of squares) forces the full (m, m) dot to
        # materialize — a plain full-matrix return was observed finishing
        # "instantly" through this device tunnel (either lazy transfer or
        # compiler elision), so the scalar round-trip is the only timing
        # this harness can trust.  int32 overflow in the square is fine:
        # the value is discarded, it only has to depend on every element.
        def body(a, b):
            o = fn(a, b)
            return jnp.sum(o * o)

        f = jax.jit(body)
        try:
            out = jax.block_until_ready(f(a, b))  # compile + sanity
        except Exception as e:  # lowering/compile failure IS the result
            variants[name] = {"ok": False, "error": str(e)[:300]}
            print(json.dumps({"variant": name, "ok": False,
                              "error": str(e)[:300]}))
            return None
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = float(np.asarray(f(a, b)))
            times.append(time.perf_counter() - t0)
        dt = sorted(times)[1]
        pairs = m * m
        # MACs over the true alignment width; the 128-padded tail is
        # zero features (real work the MXU does, but not useful work —
        # report both so BASELINE.md numbers aren't inflated)
        macs = r * width * pairs
        macs_pad = r * l_pad * pairs
        variants[name] = {"ok": True, "s": dt, "pairs_per_s": pairs / dt,
                          "tops": macs / dt / 1e12}
        print(json.dumps({"variant": name, "ok": True,
                          "sec_per_block": round(dt, 4),
                          "pairs_per_s": round(pairs / dt),
                          "tops_equiv": round(macs / dt / 1e12, 1),
                          "tops_incl_pad": round(macs_pad / dt / 1e12, 1)}))
        return out

    timed("int8", lambda a, b: contract(a, b, jnp.int32), fx, gy)

    # int4 variants cast ON DEVICE inside the jit: shipping S4 arrays
    # through the axon client hits a recursive-jit bug, and production
    # would cast in-graph anyway (features are built on device).
    timed("int4",
          lambda a, b: contract(a.astype(jnp.int4), b.astype(jnp.int4),
                                jnp.int32), fx, gy)
    timed("int4xint8",
          lambda a, b: contract(a.astype(jnp.int4), b, jnp.int32), fx, gy)
    timed("bf16",
          lambda a, b: contract(a.astype(jnp.bfloat16),
                                b.astype(jnp.bfloat16), jnp.float32),
          fx, gy)

    # Exactness probe on a small block (full matrix fetched, int8-safe).
    try:
        small_f = jax.jit(
            lambda a, b: contract(a.astype(jnp.int4), b.astype(jnp.int4),
                                  jnp.int32).astype(jnp.int32))
        ref_f = jax.jit(lambda a, b: contract(a, b, jnp.int32))
        sa, sb = fx[:, :256, :], gy[:, :256, :]
        exact = bool(np.array_equal(np.asarray(small_f(sa, sb)),
                                    np.asarray(ref_f(sa, sb))))
        print(json.dumps({"int4_exact_vs_int8_256block": exact}))
    except Exception as e:
        print(json.dumps({"int4_exact_probe_error": str(e)[:200]}))

    i8 = variants.get("int8", {})
    i4 = variants.get("int4", {})
    if i8.get("ok") and i4.get("ok"):
        speedup = i8["s"] / i4["s"]
        verdict = ("WIN" if speedup > 1.1 else
                   "PARITY" if speedup > 0.9 else "LOSS")
        print(json.dumps({"verdict": verdict,
                          "int4_over_int8": round(speedup, 3)}))
    elif i8.get("ok"):
        print(json.dumps({"verdict": "UNSUPPORTED",
                          "detail": i4.get("error", "int4 path failed")}))


if __name__ == "__main__":
    main()
