"""Device-side counter packing to minimize device->host traffic.

Counters are bounded by the alignment width L, so for L < 2^16 every
counter fits in 16 bits and a measure's counter set packs into one or two
uint32 lanes per pair:

    n, n_high : [diff]                    -> uint16         (2 B/pair)
    raw, jc69 : [diff<<16 | same]         -> 1 x uint32     (4 B/pair)
    k80       : [same<<16 | ts, tv]       -> uint32+uint16  (6 B/pair)
    tn93      : [same<<16 | kk, p1<<16|p2]-> 2 x uint32     (8 B/pair)

Packing happens in-graph on device (jnp); unpacking is vectorized NumPy
on host.  Lossless by construction — tests assert round trips on the full
counter range.  For L >= 2^16 the engine transfers raw int32 counters.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

PACK_LIMIT = 1 << 16  # alignment width must be < 2^16 to pack


def _bitcast(a, dtype, xp):
    if xp is np:
        return np.ascontiguousarray(a).view(dtype)
    import jax

    return jax.lax.bitcast_convert_type(a, dtype)


def pack_device(measure: str, counters, xp):
    """(G, m, n) int32 array (numpy or jax) -> packed array (P, m, n).

    Returns int16 for the single-counter measures, int32 otherwise — the
    packed words are bit patterns (signed on the wire because some
    device transports cannot move unsigned arrays); unpack_host views
    them back as unsigned.
    """
    c = counters
    if measure in ("n", "n_high"):
        return _bitcast(c[0].astype(xp.uint16), xp.int16, xp)
    if measure in ("raw", "jc69"):
        w0 = (c[0].astype(xp.uint32) << 16) | c[1].astype(xp.uint32)
        return _bitcast(w0, xp.int32, xp)[None]
    if measure == "k80":
        w0 = (c[0].astype(xp.uint32) << 16) | c[1].astype(xp.uint32)
        return xp.stack([_bitcast(w0, xp.int32, xp), c[2]])
    if measure == "tn93":
        w0 = (c[0].astype(xp.uint32) << 16) | c[1].astype(xp.uint32)
        w1 = (c[2].astype(xp.uint32) << 16) | c[3].astype(xp.uint32)
        return xp.stack(
            [_bitcast(w0, xp.int32, xp), _bitcast(w1, xp.int32, xp)]
        )
    raise ValueError(measure)


def unpack_host(measure: str, packed: np.ndarray) -> np.ndarray:
    """Packed host array -> (G, ...) int32 counters (same order as the
    measure's CounterPlan)."""
    if measure in ("n", "n_high"):
        return packed.view(np.uint16).astype(np.int32)[None]
    p = packed.view(np.uint32)
    hi0 = (p[0] >> 16).astype(np.int32)
    lo0 = (p[0] & 0xFFFF).astype(np.int32)
    if measure in ("raw", "jc69"):
        return np.stack([hi0, lo0])
    if measure == "k80":
        return np.stack([hi0, lo0, p[1].astype(np.int32)])
    if measure == "tn93":
        hi1 = (p[1] >> 16).astype(np.int32)
        lo1 = (p[1] & 0xFFFF).astype(np.int32)
        return np.stack([hi0, lo0, hi1, lo1])
    raise ValueError(measure)
