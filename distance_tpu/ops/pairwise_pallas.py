"""Fused Pallas TPU kernel for the pairwise counter sweep.

One kernel computes all counter groups for a (TILE_I x TILE_J) block of
sequence pairs: the uint8 code tiles are read from HBM once, the feature
channels are built in-register with VPU bit ops (no gathers, no
materialized (R x L) feature tensors in HBM — the XLA path's main memory
overhead), and each counter group is contracted on the MXU with int32
accumulation across site tiles.

Grid: (i_tiles, j_tiles, site_tiles) with the site dimension innermost so
each output block accumulates in VMEM across the site sweep.

Why this is NOT the default backend (measured on v5e): with the site
dimension innermost, both sides' feature channels are rebuilt on the VPU
at every grid step — ~3*R ops per input byte against R*TILE MACs on the
MXU, which leaves the kernel VPU-bound at VMEM-sized tiles (181 vs the
XLA path's 290 TOPS-equivalent).  Reusing features across the j axis
in-kernel would need j-innermost iteration with non-consecutive output
revisits, which Mosaic handles poorly; materializing features once per
large block in HBM — exactly what the XLA path does — is the better
trade on this hardware (74% of int8 peak at 8192^2 blocks).  The kernel
stays as a selectable backend (`--backend pallas`) and is kept exact and
tested.

Exactness matches the XLA path: features are in {-1, 0, 1} int8 with
int32 accumulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from distance_tpu.ops.features import CounterPlan

# Site-tile width; the engine pads L to a multiple of 128.  Capped at 512
# to keep the per-channel feature tiles comfortably inside VMEM.
_SITE_TILES = (512, 256, 128)


def _eval_prim_i32(prim, v32):
    """Evaluate one feature primitive over an int32 code tile (VPU ops)."""
    kind, arg = prim
    shifts = {0: 7, 1: 6, 2: 5, 3: 4}
    if kind == "bits":
        if arg == 0:
            return (v32 != 0).astype(jnp.int32)
        out = None
        for b in range(4):
            if (arg >> b) & 1:
                bit = (v32 >> shifts[b]) & 1
                out = bit if out is None else out * bit
        return out
    if kind == "exact":
        return ((v32 >> shifts[arg]) & 1) * ((v32 >> 3) & 1)
    if kind == "pur":
        return (
            (v32 != 0).astype(jnp.int32)
            * (1 - ((v32 >> 5) & 1))
            * (1 - ((v32 >> 4) & 1))
        )
    if kind == "pyr":
        return (
            (v32 != 0).astype(jnp.int32)
            * (1 - ((v32 >> 7) & 1))
            * (1 - ((v32 >> 6) & 1))
        )
    if kind == "known":
        return (v32 >> 3) & 1
    if kind == "hieq":
        return ((v32 >> 4) == arg).astype(jnp.int32)
    if kind == "disj":
        return (((v32 >> 4) & arg) == 0).astype(jnp.int32) * (
            v32 != 0
        ).astype(jnp.int32)
    if kind == "esum":
        b1, b2, s = arg
        return _eval_prim_i32(("exact", b1), v32) + s * _eval_prim_i32(
            ("exact", b2), v32
        )
    if kind == "ppsum":
        return _eval_prim_i32(("pur", 0), v32) + arg * _eval_prim_i32(
            ("pyr", 0), v32
        )
    raise ValueError(f"unknown primitive {kind!r}")


def _features(v: jnp.ndarray, plan: CounterPlan, side: str,
              dtype=jnp.bfloat16) -> list:
    """Per-channel feature tiles for one code tile (TI, TS)."""
    v32 = v.astype(jnp.int32)
    feats = []
    for sign, f_prim, g_prim in plan.channels:
        prim = f_prim if side == "f" else g_prim
        feat = _eval_prim_i32(prim, v32)
        if side == "f" and sign < 0:
            feat = -feat
        feats.append(feat.astype(dtype))
    return feats


# Channels concatenated per dot: balances Mosaic compile time (many tiny
# dots) against VMEM pressure (one giant concatenated operand).
_CONCAT_CHANNELS = 4


def _kernel(x_ref, y_ref, *out_refs, plan: CounterPlan, dtype, prefer):
    s = pl.program_id(2)
    fx = _features(x_ref[:], plan, "f", dtype)  # list of (TI, TS)
    gy = _features(y_ref[:], plan, "g", dtype)  # list of (TJ, TS)
    if plan.mix_num is not None:
        # Shared-channel plan: per-channel dots, then the integer mix.
        # Numerators accumulate across site tiles; the exact // happens
        # outside the kernel (counters_pallas).
        dots = [
            jax.lax.dot_general(
                a, b,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=prefer,
            )
            for a, b in zip(fx, gy)
        ]
        for gi in range(len(plan.counters)):
            acc = None
            for k, d in enumerate(dots):
                w = int(plan.mix_num[gi, k])
                if w == 0:
                    continue
                term = d if w == 1 else (-d if w == -1 else w * d)
                acc = term if acc is None else acc + term
            out_ref = out_refs[gi]

            @pl.when(s == 0)
            def _init(acc=acc, out_ref=out_ref):
                out_ref[:] = acc

            @pl.when(s != 0)
            def _accum(acc=acc, out_ref=out_ref):
                out_ref[:] = out_ref[:] + acc
        return
    for gi, name in enumerate(plan.counters):
        lo, hi = plan.slice_of(name)
        acc = None
        for k0 in range(lo, hi, _CONCAT_CHANNELS):
            k1 = min(k0 + _CONCAT_CHANNELS, hi)
            if k1 - k0 > 1:
                a = jnp.concatenate(fx[k0:k1], axis=1)
                b = jnp.concatenate(gy[k0:k1], axis=1)
            else:
                a, b = fx[k0], gy[k0]
            d = jax.lax.dot_general(
                a,
                b,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=prefer,
            )
            acc = d if acc is None else acc + d
        out_ref = out_refs[gi]

        @pl.when(s == 0)
        def _init(acc=acc, out_ref=out_ref):
            out_ref[:] = acc

        @pl.when(s != 0)
        def _accum(acc=acc, out_ref=out_ref):
            out_ref[:] = out_ref[:] + acc


def _pick_site_tile(l_pad: int) -> int:
    for ts in _SITE_TILES:
        if l_pad % ts == 0:
            return ts
    raise ValueError(f"alignment width {l_pad} not a multiple of 128")


@functools.partial(jax.jit, static_argnames=("plan", "interpret", "dtype"))
def counters_pallas(
    x_codes: jnp.ndarray,
    y_codes: jnp.ndarray,
    plan: CounterPlan,
    interpret: bool | None = None,
    dtype=jnp.int8,
) -> jnp.ndarray:
    """Counters for every (x, y) pair via the fused Pallas kernel.

    Args/returns as counters_xla: (m, L) x (n, L) uint8 -> (G, m, n) int32.
    m, n must be multiples of 8 and L a multiple of 128 (the engine pads).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    m, l_pad = x_codes.shape
    n, _ = y_codes.shape
    if not interpret and (m % 8 or n % 128 or l_pad % 128):
        # Sub-hardware-tile shapes (lane dim < 128) are not worth a Mosaic
        # kernel — and can stall its compiler.  The XLA path is exact.
        from distance_tpu.ops.pairwise_xla import counters_xla

        return counters_xla(x_codes, y_codes, plan)
    ts = _pick_site_tile(l_pad)
    # Kernel-internal pair tiles (the engine's blocks are usually larger).
    ti = 128 if m % 128 == 0 else m
    tj = 256 if n % 256 == 0 else n
    grid = (m // ti, n // tj, l_pad // ts)

    prefer = jnp.int32 if dtype == jnp.int8 else jnp.float32
    if prefer == jnp.float32:
        # Same exactness bound as counters_xla: f32 partial sums must
        # stay below 2^24 (products in {-1, 0, 1}, summed over
        # channels * sites per counter).
        if plan.max_group_channels * l_pad >= 1 << 24:
            raise ValueError(
                "float accumulation would lose integer exactness for "
                f"width {l_pad} x {plan.max_group_channels} channels;"
                " use the default int8 dtype"
            )
    kernel = functools.partial(_kernel, plan=plan, dtype=dtype, prefer=prefer)
    out_shapes = tuple(
        jax.ShapeDtypeStruct((m, n), prefer) for _ in plan.counters
    )
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((ti, ts), lambda i, j, s: (i, s)),
            pl.BlockSpec((tj, ts), lambda i, j, s: (j, s)),
        ],
        out_specs=tuple(
            pl.BlockSpec((ti, tj), lambda i, j, s: (i, j))
            for _ in plan.counters
        ),
        out_shape=out_shapes,
        interpret=interpret,
    )(x_codes, y_codes)
    c = jnp.stack(outs).astype(jnp.int32)
    if plan.mix_num is not None:
        # shared-channel plans accumulate mix numerators in-kernel;
        # the division is exact (numerators are even per site)
        c = c // jnp.asarray(plan.mix_den)[:, None, None]
    return c
