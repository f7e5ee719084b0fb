"""Pallas TPU kernel for fused int8 descriptor matching (top-2 + argmax).

The XLA matcher (``features/matching.py``) materializes the (N1, N2) f32
dot matrix in HBM and re-reads it four times (max / argmax / masked-second,
twice for the cross check) — ~1.3 GB of HBM traffic per 8192x8192 pair and
an f32 MXU contraction.  This kernel:

  * runs the contraction in int8 x int8 -> int32 (the v5e MXU's fastest
    mode) on the signed decomposition ``u8 = s8 + 128``.  Along the
    candidate axis the expansion
        dot_u8[i, j] = s_dot[i, j] + 128 rs1[i] + 128 rs2[j] + 128^3
    differs from ``s_dot[i, j] + 128 rs2[j]`` by a per-row constant, so
    ranking (and therefore top-2 + argmax) is computed on
    ``w = s_dot + 128 rs2[j]`` and the true dots are reconstructed on the
    2 surviving candidates per row afterwards;
  * keeps the running (best, second, argmax) state in VMEM registers and
    streams the candidate tiles through the MXU — the dot matrix never
    exists in HBM;
  * folds the candidate validity mask into the per-column bias (invalid
    columns get ``-2^26``, dominating every real ``w``).

The cross-check direction used to be the same kernel with the operands
swapped (a second full pass over the same tiles).  ``top2_scores_bidir``
produces BOTH directions from one tile stream: from the same int8
contraction ``s_dot`` the row ranking uses ``w_row = s_dot + 128 rs2[j]``
and the column ranking uses ``w_col = s_dot + 128 rs1[i]`` (each differs
from the true uint8 dot by a constant along its ranking axis), so the
reverse direction costs one extra VPU add + reduction per tile instead of
a second MXU pass.  The per-column running top-2 state lives in the output
VMEM block and accumulates across the row-block grid dimension (TPU grid
iterations execute sequentially).  Reference matcher semantics:
``/root/reference/src/feature/sift.cc:54-143,251-351``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
_MASK_BIAS = -(2 ** 26)  # dominates |w| < 2^23
_NEG = -(2 ** 30)


def _top2_kernel(d1_ref, d2_ref, rs2c_ref, best_ref, sec_ref, idx_ref,
                 *, tn: int):
    """One (TM)-row block: stream all N2 candidate tiles, keep top-2.

    d1_ref: (1, TM, 128) int8; d2_ref: (1, N2, 128) int8;
    rs2c_ref: (1, 1, N2) int32 = 128 * colsum(s8) + validity bias.
    Outputs (1, TM, 1): best w, second w, argmax index.
    """
    d1 = d1_ref[0]  # (TM, 128)
    tm = d1.shape[0]
    n2 = d2_ref.shape[1]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (tm, tn), 1)

    def body(j, state):
        best, sec, idx = state
        d2 = d2_ref[0, pl.ds(j * tn, tn), :]  # (TN, 128)
        w = jax.lax.dot_general(
            d1, d2, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)  # (TM, TN)
        w = w + rs2c_ref[0, 0:1, pl.ds(j * tn, tn)]
        bmax = jnp.max(w, axis=1, keepdims=True)  # (TM, 1)
        barg = jnp.min(jnp.where(w == bmax, lanes, tn), axis=1,
                       keepdims=True)
        bsec = jnp.max(jnp.where(lanes == barg, _NEG, w), axis=1,
                       keepdims=True)
        better = bmax > best  # strict: earlier tile wins ties
        new_best = jnp.where(better, bmax, best)
        new_idx = jnp.where(better, j * tn + barg, idx)
        new_sec = jnp.where(better, jnp.maximum(best, bsec),
                            jnp.maximum(sec, bmax))
        return new_best, new_sec, new_idx

    init = (jnp.full((tm, 1), _NEG, jnp.int32),
            jnp.full((tm, 1), _NEG, jnp.int32),
            jnp.zeros((tm, 1), jnp.int32))
    best, sec, idx = jax.lax.fori_loop(0, n2 // tn, body, init)
    best_ref[0] = best
    sec_ref[0] = sec
    idx_ref[0] = idx


def _pick_tile(n: int, cap: int) -> int:
    t = min(cap, n)
    while n % t:
        t //= 2
    return max(t, 1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def top2_scores(d1_u8: jax.Array, d2_u8: jax.Array, valid2: jax.Array,
                interpret: bool = False):
    """Batched top-2 dots + argmax along the candidate axis.

    d1_u8: (B, N1, 128) uint8; d2_u8: (B, N2, 128) uint8;
    valid2: (B, N2) bool.  N1/N2 must be multiples of 128.

    Returns (best_dot, second_dot, best_idx): (B, N1) f32/f32/int32 with
    the true uint8 dot products of the two nearest candidates per row
    (invalid candidates excluded; rows with no valid candidate get large
    negative dots).
    """
    b, n1, _ = d1_u8.shape
    n2 = d2_u8.shape[1]
    tm = _pick_tile(n1, 256)
    tn = _pick_tile(n2, 512)

    d1s = (d1_u8.astype(jnp.int32) - 128).astype(jnp.int8)
    d2s = (d2_u8.astype(jnp.int32) - 128).astype(jnp.int8)
    rs1 = jnp.sum(d1_u8.astype(jnp.int32), axis=-1) - 128 * LANE  # (B, N1)
    rs2 = jnp.sum(d2_u8.astype(jnp.int32), axis=-1) - 128 * LANE  # (B, N2)
    rs2c = (128 * rs2 + jnp.where(valid2, 0, _MASK_BIAS)
            ).astype(jnp.int32)[:, None, :]  # (B, 1, N2)

    grid = (b, n1 // tm)
    best_w, sec_w, idx = pl.pallas_call(
        functools.partial(_top2_kernel, tn=tn),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tm, LANE), lambda bb, i: (bb, i, 0)),
            pl.BlockSpec((1, n2, LANE), lambda bb, i: (bb, 0, 0)),
            pl.BlockSpec((1, 1, n2), lambda bb, i: (bb, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, tm, 1), lambda bb, i: (bb, i, 0)),
            pl.BlockSpec((1, tm, 1), lambda bb, i: (bb, i, 0)),
            pl.BlockSpec((1, tm, 1), lambda bb, i: (bb, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n1, 1), jnp.int32),
            jax.ShapeDtypeStruct((b, n1, 1), jnp.int32),
            jax.ShapeDtypeStruct((b, n1, 1), jnp.int32),
        ],
        interpret=interpret,
    )(d1s, d2s, rs2c)

    # w -> true uint8 dot: + 128 rs1[i] + 128^3 (per-row constant).
    shift = (128 * rs1 + 128 * 128 * LANE).astype(jnp.int32)
    best = (best_w[..., 0] + shift).astype(jnp.float32)
    second = (sec_w[..., 0] + shift).astype(jnp.float32)
    return best, second, idx[..., 0]


def _top2_bidir_kernel(d1_ref, d2_ref, rs2c_ref, rs1c_ref,
                       best_ref, sec_ref, idx_ref,
                       cbest_ref, csec_ref, cidx_ref, *, tn: int, tm: int):
    """One (TM)-row block, BOTH match directions from one tile stream.

    d1_ref: (1, TM, 128) int8; d2_ref: (1, N2, 128) int8;
    rs2c_ref: (1, 1, N2) int32 = 128 * colsum(s8_2) + validity bias (rows'
    ranking); rs1c_ref: (1, TM, 1) int32 = 128 * rowsum(s8_1) + validity
    bias (columns' ranking).  Row outputs (1, TM, 1) are per-block; column
    outputs (1, 1, N2) accumulate across the row-block grid dimension.
    """
    i = pl.program_id(1)
    d1 = d1_ref[0]       # (TM, 128)
    rs1 = rs1c_ref[0]    # (TM, 1)
    n2 = d2_ref.shape[1]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (tm, tn), 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (tm, tn), 0)

    @pl.when(i == 0)
    def _init_cols():
        cbest_ref[...] = jnp.full(cbest_ref.shape, _NEG, jnp.int32)
        csec_ref[...] = jnp.full(csec_ref.shape, _NEG, jnp.int32)
        cidx_ref[...] = jnp.zeros(cidx_ref.shape, jnp.int32)

    def body(j, state):
        best, sec, idx = state
        d2 = d2_ref[0, pl.ds(j * tn, tn), :]  # (TN, 128)
        s = jax.lax.dot_general(
            d1, d2, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)  # (TM, TN)

        # Forward (1->2): rank along candidates j.
        w = s + rs2c_ref[0, 0:1, pl.ds(j * tn, tn)]
        bmax = jnp.max(w, axis=1, keepdims=True)  # (TM, 1)
        barg = jnp.min(jnp.where(w == bmax, lanes, tn), axis=1,
                       keepdims=True)
        bsec = jnp.max(jnp.where(lanes == barg, _NEG, w), axis=1,
                       keepdims=True)
        better = bmax > best  # strict: earlier tile wins ties
        new_best = jnp.where(better, bmax, best)
        new_idx = jnp.where(better, j * tn + barg, idx)
        new_sec = jnp.where(better, jnp.maximum(best, bsec),
                            jnp.maximum(sec, bmax))

        # Reverse (2->1): rank along rows i for this column tile, merge
        # into the running per-column state.
        wc = s + rs1  # (TM, TN)
        cmax = jnp.max(wc, axis=0, keepdims=True)  # (1, TN)
        carg = jnp.min(jnp.where(wc == cmax, rows, tm), axis=0,
                       keepdims=True)
        csec_blk = jnp.max(jnp.where(rows == carg, _NEG, wc), axis=0,
                           keepdims=True)
        sl = pl.ds(j * tn, tn)
        prev_best = cbest_ref[0, :, sl]  # (1, TN)
        prev_sec = csec_ref[0, :, sl]
        prev_idx = cidx_ref[0, :, sl]
        cbetter = cmax > prev_best  # strict: earlier row block wins ties
        cbest_ref[0, :, sl] = jnp.where(cbetter, cmax, prev_best)
        cidx_ref[0, :, sl] = jnp.where(cbetter, i * tm + carg, prev_idx)
        csec_ref[0, :, sl] = jnp.where(
            cbetter, jnp.maximum(prev_best, csec_blk),
            jnp.maximum(prev_sec, cmax))
        return new_best, new_sec, new_idx

    init = (jnp.full((tm, 1), _NEG, jnp.int32),
            jnp.full((tm, 1), _NEG, jnp.int32),
            jnp.zeros((tm, 1), jnp.int32))
    best, sec, idx = jax.lax.fori_loop(0, n2 // tn, body, init)
    best_ref[0] = best
    sec_ref[0] = sec
    idx_ref[0] = idx


@functools.partial(jax.jit, static_argnames=("interpret",))
def top2_scores_bidir(d1_u8: jax.Array, d2_u8: jax.Array,
                      valid1: jax.Array, valid2: jax.Array,
                      interpret: bool = False):
    """Top-2 dots + argmax in BOTH directions from one tile stream.

    d1_u8: (B, N1, 128) uint8; d2_u8: (B, N2, 128) uint8; valid1/2:
    (B, N) bool.  N1/N2 must be multiples of 128.  Returns
    (bd12, sd12, idx12, bd21, sd21, idx21) — exactly what two swapped
    ``top2_scores`` calls return, at ~half the MXU/HBM traffic.
    """
    b, n1, _ = d1_u8.shape
    n2 = d2_u8.shape[1]
    tm = _pick_tile(n1, 256)
    tn = _pick_tile(n2, 512)

    d1s = (d1_u8.astype(jnp.int32) - 128).astype(jnp.int8)
    d2s = (d2_u8.astype(jnp.int32) - 128).astype(jnp.int8)
    rs1 = jnp.sum(d1_u8.astype(jnp.int32), axis=-1) - 128 * LANE  # (B, N1)
    rs2 = jnp.sum(d2_u8.astype(jnp.int32), axis=-1) - 128 * LANE  # (B, N2)
    rs2c = (128 * rs2 + jnp.where(valid2, 0, _MASK_BIAS)
            ).astype(jnp.int32)[:, None, :]  # (B, 1, N2)
    rs1c = (128 * rs1 + jnp.where(valid1, 0, _MASK_BIAS)
            ).astype(jnp.int32)[:, :, None]  # (B, N1, 1)

    grid = (b, n1 // tm)
    out = pl.pallas_call(
        functools.partial(_top2_bidir_kernel, tn=tn, tm=tm),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tm, LANE), lambda bb, i: (bb, i, 0)),
            pl.BlockSpec((1, n2, LANE), lambda bb, i: (bb, 0, 0)),
            pl.BlockSpec((1, 1, n2), lambda bb, i: (bb, 0, 0)),
            pl.BlockSpec((1, tm, 1), lambda bb, i: (bb, i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, tm, 1), lambda bb, i: (bb, i, 0)),
            pl.BlockSpec((1, tm, 1), lambda bb, i: (bb, i, 0)),
            pl.BlockSpec((1, tm, 1), lambda bb, i: (bb, i, 0)),
            pl.BlockSpec((1, 1, n2), lambda bb, i: (bb, 0, 0)),
            pl.BlockSpec((1, 1, n2), lambda bb, i: (bb, 0, 0)),
            pl.BlockSpec((1, 1, n2), lambda bb, i: (bb, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n1, 1), jnp.int32),
            jax.ShapeDtypeStruct((b, n1, 1), jnp.int32),
            jax.ShapeDtypeStruct((b, n1, 1), jnp.int32),
            jax.ShapeDtypeStruct((b, 1, n2), jnp.int32),
            jax.ShapeDtypeStruct((b, 1, n2), jnp.int32),
            jax.ShapeDtypeStruct((b, 1, n2), jnp.int32),
        ],
        interpret=interpret,
    )(d1s, d2s, rs2c, rs1c)
    best_w, sec_w, idx, cbest_w, csec_w, cidx = out

    # w -> true uint8 dot: add the constant that was dropped from each
    # direction's ranking weight.
    shift1 = (128 * rs1 + 128 * 128 * LANE).astype(jnp.int32)  # (B, N1)
    shift2 = (128 * rs2 + 128 * 128 * LANE).astype(jnp.int32)  # (B, N2)
    bd12 = (best_w[..., 0] + shift1).astype(jnp.float32)
    sd12 = (sec_w[..., 0] + shift1).astype(jnp.float32)
    bd21 = (cbest_w[:, 0, :] + shift2).astype(jnp.float32)
    sd21 = (csec_w[:, 0, :] + shift2).astype(jnp.float32)
    return bd12, sd12, idx[..., 0], bd21, sd21, cidx[:, 0, :]
