"""Bilinear decomposition of the per-site distance predicates.

This is the core TPU-native idea of the engine.  Every integer counter that
the six measures consume is a sum over alignment sites of a 0/1 predicate
P(x_i, y_i) of the two Paradis codes.  Each predicate here is decomposed as

    P(x, y) = sum_k f_k(x) * g_k(y)

with per-code feature values f_k, g_k in {-1, 0, 1}.  Stacking the features
over sites turns the whole pairwise sweep into a GEMM:

    counter[s, t] = sum_i P(x_si, y_ti)
                  = sum_{i,k} F[s, i, k] * G[t, i, k]
                  = (F reshaped (n, L*r)) @ (G reshaped (n, L*r)).T

which runs on the MXU.  Features are exactly representable in bfloat16 and
partial sums stay below 2^24 for any realistic alignment width, so the f32
MXU accumulation yields **exact** integers — bit-for-bit parity with the
reference's byte loop (/root/reference/src/measures.rs) by construction.

Counter decompositions (bA/bG/bC/bT = candidacy bits, kn = known bit,
eX = exact-base indicator = bX & kn, valid = code != 0):

* ``diff``  [(a & b) < 16, measures.rs:17]: candidacy sets disjoint.
  The 16-term inclusion-exclusion over subsets of {A,G,C,T} is rank
  deficient: nibble 15 (N, -, ?) intersects every candidacy set, so its
  row/column of the disjointness matrix is zero, and the matrix
  restricted to nibbles 1..14 is invertible — rank exactly 14.  The
  minimal factorization is the one-hot/table form
      [S cap T = empty] = sum_{n=1..14} [hi(x) = n] * [n & hi(y) = 0]
  with a ``valid`` gate on the y side so padded sites (code 0)
  contribute nothing — 14 channels, all features in {0, 1}.
* ``same``  [a == b && a & 8 == 8, measures.rs:60]: sum of eX(x) * eX(y)
  over the four bases — 4 channels.
* ``ts``    (k80 transitions, measures.rs:91-98): within a
  certainly-different pair, both-purine-set forces ({A},{G}) and
  both-pyrimidine-set forces ({C},{T}), so
      ts = eA@eG + eG@eA + eC@eT + eT@eC       — 4 channels.
* ``tv``    (k80 transversions, measures.rs:99-104): purine-set x
  pyrimidine-set pairs are automatically disjoint, so
      tv = pur@pyr + pyr@pur                    — 2 channels,
  with pur = valid & !bC & !bT, pyr = valid & !bA & !bG.
* ``kk``    (tn93 count_L, measures.rs:157-163): both bases exactly known:
      kk = kn@kn                                — 1 channel.
  (count_d = kk - same, since both-known sites are same xor diff.)
* ``p1``/``p2`` (tn93 transitions, measures.rs:167-173): the both-known
  gate reduces (a|b)==200 to {A,G} and (a|b)==56 to {C,T}:
      p1 = eA@eG + eG@eA,  p2 = eC@eT + eT@eC   — 2 channels each.

Each channel is specified as a (sign, primitive) pair, evaluated either
over ``np.arange(256)`` to produce host LUTs or symbolically over a device
array of codes (bitwise VPU ops — no gathers on the TPU hot path).  Both
evaluations share one definition, so they agree by construction.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Tuple

import numpy as np

from distance_tpu.measures import MEASURE_COUNTERS

# A primitive is ("bits", candidacy_mask) — product of the selected
# candidacy bits (A=bit0 ... T=bit3 of the mask) — or one of the named
# forms below.  Channel = (sign, primitive).
Prim = Tuple[str, int]

_BIT_SHIFT = {0: 7, 1: 6, 2: 5, 3: 4}  # A, G, C, T candidacy bit positions


def eval_prim(prim: Prim, v, xp=np):
    """Evaluate a primitive over an array of uint8 codes -> int8 features.

    Works for numpy and jax.numpy alike (only >>, &, *, ==, astype used).
    """
    kind, arg = prim
    if kind == "bits":
        if arg == 0:
            # "valid": any candidacy bit set <=> code != 0 for real codes.
            out = (v != 0)
        else:
            out = None
            for b in range(4):
                if (arg >> b) & 1:
                    bit = (v >> _BIT_SHIFT[b]) & 1
                    out = bit if out is None else out * bit
    elif kind == "exact":
        # exact-base indicator: candidacy bit AND known bit
        out = ((v >> _BIT_SHIFT[arg]) & 1) * ((v >> 3) & 1)
    elif kind == "pur":
        out = (v != 0) * (1 - ((v >> 5) & 1)) * (1 - ((v >> 4) & 1))
    elif kind == "pyr":
        out = (v != 0) * (1 - ((v >> 7) & 1)) * (1 - ((v >> 6) & 1))
    elif kind == "known":
        out = (v >> 3) & 1
    elif kind == "hieq":
        # one-hot on the candidacy nibble: [hi(v) == arg]
        out = (v >> 4) == arg
    elif kind == "disj":
        # disjointness table row: [hi(v) & arg == 0], gated on valid
        out = (((v >> 4) & arg) == 0) * (v != 0)
    else:
        raise ValueError(f"unknown primitive {kind!r}")
    if xp is np:
        return out.astype(np.int8)
    return out.astype("int8")


def _popcount4(m: int) -> int:
    return bin(m & 0xF).count("1")


# (sign_on_f_side, f_prim, g_prim) per channel, per counter.
Channel = Tuple[int, Prim, Prim]

_EA, _EG, _EC, _ET = ("exact", 0), ("exact", 1), ("exact", 2), ("exact", 3)

COUNTER_CHANNELS: Dict[str, List[Channel]] = {
    "diff": [
        (1, ("hieq", n), ("disj", n)) for n in range(1, 15)
    ],
    "same": [(1, _EA, _EA), (1, _EG, _EG), (1, _EC, _EC), (1, _ET, _ET)],
    "ts": [(1, _EA, _EG), (1, _EG, _EA), (1, _EC, _ET), (1, _ET, _EC)],
    "tv": [(1, ("pur", 0), ("pyr", 0)), (1, ("pyr", 0), ("pur", 0))],
    "kk": [(1, ("known", 0), ("known", 0))],
    "p1": [(1, _EA, _EG), (1, _EG, _EA)],
    "p2": [(1, _EC, _ET), (1, _ET, _EC)],
}


def counter_luts(name: str) -> Tuple[np.ndarray, np.ndarray]:
    """(r, 256) int8 LUT pair (f_luts, g_luts) for one counter."""
    v = np.arange(256, dtype=np.uint8)
    f_rows, g_rows = [], []
    for sign, f_prim, g_prim in COUNTER_CHANNELS[name]:
        f_rows.append((sign * eval_prim(f_prim, v).astype(np.int16)).astype(np.int8))
        g_rows.append(eval_prim(g_prim, v))
    return np.stack(f_rows), np.stack(g_rows)


@dataclass(frozen=True, eq=False)  # id-hashable: plans are interned singletons
class CounterPlan:
    """Stacked feature channels for one measure's counter set.

    ``channels`` lists every (sign, f_prim, g_prim) in order; ``slices``
    maps counter name -> (start, stop) channel range.  ``f_luts``/
    ``g_luts`` are the (R, 256) int8 host tables for the LUT path.
    """

    measure: str
    counters: Tuple[str, ...]
    channels: Tuple[Channel, ...]
    f_luts: np.ndarray
    g_luts: np.ndarray
    slices: Tuple[Tuple[str, int, int], ...]

    @property
    def total_channels(self) -> int:
        return len(self.channels)

    def slice_of(self, name: str) -> Tuple[int, int]:
        for n, lo, hi in self.slices:
            if n == name:
                return lo, hi
        raise KeyError(name)


_PLAN_CACHE: Dict[str, CounterPlan] = {}


def get_plan(measure: str) -> CounterPlan:
    if measure not in _PLAN_CACHE:
        counters = MEASURE_COUNTERS[measure]
        channels: List[Channel] = []
        f_parts, g_parts = [], []
        slices = []
        pos = 0
        for name in counters:
            chans = COUNTER_CHANNELS[name]
            channels.extend(chans)
            f, g = counter_luts(name)
            f_parts.append(f)
            g_parts.append(g)
            slices.append((name, pos, pos + len(chans)))
            pos += len(chans)
        _PLAN_CACHE[measure] = CounterPlan(
            measure=measure,
            counters=counters,
            channels=tuple(channels),
            f_luts=np.concatenate(f_parts, axis=0),
            g_luts=np.concatenate(g_parts, axis=0),
            slices=tuple(slices),
        )
    return _PLAN_CACHE[measure]


def features_device(codes, plan: CounterPlan, side: str, xp, dtype):
    """Arithmetic (gather-free) feature build for device arrays.

    codes: (m, L) uint8 array (numpy or jax). Returns (R, m, L) ``dtype``.
    """
    feats = []
    for sign, f_prim, g_prim in plan.channels:
        prim = f_prim if side == "f" else g_prim
        feat = eval_prim(prim, codes, xp).astype(dtype)
        if side == "f" and sign < 0:
            feat = -feat
        feats.append(feat)
    return xp.stack(feats)


def reference_counter_matrix(name: str) -> np.ndarray:
    """(256, 256) predicate truth table implied by the decomposition —
    used by tests to verify against the measures.rs byte predicates."""
    f, g = counter_luts(name)
    return (f.astype(np.int32).T @ g.astype(np.int32)).astype(np.int32)
