"""In-kernel building blocks for the fused codec kernels.

These are *not* pallas_calls — they are pure jnp helpers called from inside
Pallas TPU kernel bodies, written against Mosaic's lowering rules
(ARCHITECTURE.md; memory notes):

  * arrays are row-major (R, 128) views of a flat byte/element stream;
  * no reshapes except unit-dim add/remove; no transposes — one-hots are
    built transposed directly from broadcasted_iota compares;
  * gathers ride the MXU as one-hot ``dot_general`` contractions
    (contract dim 0 of both operands = A^T·B form, native to the MXU);
  * values are split into bf16 limbs (exact 0..255) for MXU trips;
  * scans are log-round shifted combines (VPU), with cross-row carries.

Everything here is shape-static; callers unroll Python loops over static
bounds or drive ``jax.lax.fori_loop`` with traced bounds.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

L = 128
NEG = -(2**31)  # plain int: jnp constants would be captured as tracers


def row_iota(rows: int) -> jnp.ndarray:
    """(rows, L) int32: flat element index in row-major order."""
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, L), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (rows, L), 1)
    return r * L + c


def stream_shift_down(x: jnp.ndarray, d: int, fill=0) -> jnp.ndarray:
    """y[flat i] = x[flat i - d] over row-major (R, L); head filled.

    d static, 0 <= d < R*L.  Two row-rolls + one lane-roll + lane blend.
    """
    if d == 0:
        return x
    R = x.shape[0]
    dr, dl = d // L, d % L
    a = pltpu.roll(x, dl, 1)           # a[r, l] = x[r, (l - dl) % L]
    b = pltpu.roll(a, dr, 0)           # x[(r-dr) % R, (l-dl) % L]
    c = pltpu.roll(a, dr + 1, 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    y = jnp.where(lane >= dl, b, c)
    return jnp.where(row_iota(R) >= d, y, fill)


def stream_shift_up(x: jnp.ndarray, d: int, fill=0) -> jnp.ndarray:
    """y[flat i] = x[flat i + d] over row-major (R, L); tail filled."""
    if d == 0:
        return x
    R = x.shape[0]
    dr, dl = d // L, d % L
    a = pltpu.roll(x, L - dl if dl else 0, 1)   # a[r, l] = x[r, (l + dl) % L]
    b = pltpu.roll(a, R - dr if dr else 0, 0)
    c = pltpu.roll(a, R - dr - 1, 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    y = jnp.where(lane < L - dl, b, c)
    return jnp.where(row_iota(R) < R * L - d, y, fill)


def _combine(op, a, b):
    if op == "max":
        return jnp.maximum(a, b)
    if op == "add":
        return a + b
    raise ValueError(op)


def scan2d(x: jnp.ndarray, op: str = "max") -> jnp.ndarray:
    """Inclusive scan in row-major flat order over (R, L) int32.

    op: "max" (fill NEG) or "add" (fill 0).  7 lane rounds + log2(R) row
    rounds + one broadcast combine; pure VPU.
    """
    R = x.shape[0]
    fill = NEG if op == "max" else 0
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    s = x
    k = 1
    while k < L:
        sh = pltpu.roll(s, k, 1)
        s = _combine(op, s, jnp.where(lane >= k, sh, fill))
        k <<= 1
    # row totals at the last lane, broadcast to all lanes of the row
    tot = pltpu.roll(s, 1, 1)[:, 0:1]                 # (R, 1) row totals
    rowi = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
    t = tot
    k = 1
    while k < R:
        sh = pltpu.roll(t, k, 0)
        t = _combine(op, t, jnp.where(rowi >= k, sh, fill))
        k <<= 1
    # exclusive prefix over rows: shift the inclusive row scan down one row
    excl = jnp.where(rowi >= 1, pltpu.roll(t, 1, 0), fill)
    return _combine(op, s, jnp.broadcast_to(excl, x.shape))


def limb_f(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """k-th 8-bit limb of a non-negative int32 array, as bf16 (exact)."""
    return ((x >> (8 * k)) & 0xFF).astype(jnp.bfloat16)


def onehot_rows_t(idx_row: jnp.ndarray, nrows: int) -> jnp.ndarray:
    """Transposed row one-hot: (nrows, E) bf16 with [q, e] = (idx[e]>>7 == q).

    idx_row: (1, E) flat element indices (caller clips to [0, nrows*L)).
    Built directly in transposed orientation — no Mosaic transpose needed.
    """
    E = idx_row.shape[1]
    q = jax.lax.broadcasted_iota(jnp.int32, (nrows, E), 0)
    return ((idx_row >> 7) == q).astype(jnp.bfloat16)


def onehot_lanes_t(idx_row: jnp.ndarray) -> jnp.ndarray:
    """Transposed lane one-hot: (L, E) bf16 with [l, e] = (idx[e]&127 == l)."""
    E = idx_row.shape[1]
    lq = jax.lax.broadcasted_iota(jnp.int32, (L, E), 0)
    return ((idx_row & (L - 1)) == lq).astype(jnp.bfloat16)


def gather_flat(table: jnp.ndarray, idx_row: jnp.ndarray, bits: int) -> jnp.ndarray:
    """y (1, E) = table[flat idx] for table (R, L) int32 in [0, 2^bits).

    idx_row: (1, E) int32 (clipped by caller).  Row pick = one-hot
    dot_general on the MXU (per 8-bit limb), lane pick = masked sublane
    reduction on the VPU.
    """
    R = table.shape[0]
    E = idx_row.shape[1]
    roh = onehot_rows_t(idx_row, R)                    # (R, E)
    loh = onehot_lanes_t(idx_row)                      # (L, E)
    limbs = (bits + 7) // 8
    acc = jnp.zeros((1, E), jnp.int32)
    for k in range(limbs):
        # picked[l, e] = sum_r table_limb[r, l] * roh[r, e]
        picked = jax.lax.dot_general(
            limb_f(table, k), roh,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                              # (L, E) f32
        val = jnp.sum(jnp.where(loh > 0, picked, 0.0), axis=0, keepdims=True)
        acc = acc | (val.astype(jnp.int32) << (8 * k))
    return acc


def local_gather_rows(vals: jnp.ndarray, li: jnp.ndarray) -> jnp.ndarray:
    """y[r, e] = vals[r, li[r, e]] — per-row 128-lane gather, int32-exact.

    One-hot select-sum on the VPU (exact for any int32, no limbs).
    li clipped by caller to [0, L).
    """
    lanes = jax.lax.broadcasted_iota(jnp.int32, li.shape + (L,), li.ndim)
    oh = li[..., None] == lanes
    return jnp.sum(jnp.where(oh, vals[..., None, :], 0), axis=-1)


# --------------------------------------------------------------------------
# MXU-backed shifts and scans.  pltpu.roll measures ~1µs/op on this chip
# (mosaic_probe r2: roll_static_min 993ns, roll_dyn 679ns) — a static shift
# as a multiply by a constant 0/1 permutation matrix costs ~50ns on the MXU
# instead.  f32 dots are exact for the 16-bit halves we feed them.
# --------------------------------------------------------------------------


def _shift_mat(k: int, n: int, up: bool) -> jnp.ndarray:
    """(n, n) f32 with M[i, j] = 1 iff (j == i + k) [down: x@M shifts toward
    higher indices] or (j == i - k) [up]."""
    i = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return ((j == i - k) if up else (j == i + k)).astype(jnp.float32)


def _mm_shift(x: jnp.ndarray, k: int, up: bool, bits: int) -> jnp.ndarray:
    """Zero-fill lane shift of (R, L) int32 by static k via permutation dot."""
    if k == 0:
        return x
    m = _shift_mat(k % L, L, up)
    if bits <= 16:
        y = jnp.dot(x.astype(jnp.float32), m, preferred_element_type=jnp.float32)
        return y.astype(jnp.int32)
    lo = (x & 0xFFFF).astype(jnp.float32)
    hi = ((x >> 16) & 0x7FFF).astype(jnp.float32)
    ylo = jnp.dot(lo, m, preferred_element_type=jnp.float32).astype(jnp.int32)
    yhi = jnp.dot(hi, m, preferred_element_type=jnp.float32).astype(jnp.int32)
    return ylo | (yhi << 16)


def lane_shift_down(x: jnp.ndarray, k: int, bits: int = 31) -> jnp.ndarray:
    """y[r, l] = x[r, l-k] (zero fill), static k in [0, L)."""
    return _mm_shift(x, k, up=False, bits=bits)


def lane_shift_up(x: jnp.ndarray, k: int, bits: int = 31) -> jnp.ndarray:
    """y[r, l] = x[r, l+k] (zero fill), static k in [0, L)."""
    return _mm_shift(x, k, up=True, bits=bits)


def row_shift_down(x: jnp.ndarray, k: int, fill: int = 0) -> jnp.ndarray:
    """y[r] = x[r-k] rows (fill rows at the top), static k."""
    if k == 0:
        return x
    pad = jnp.full((k,) + x.shape[1:], fill, x.dtype)
    return jnp.concatenate([pad, x[: x.shape[0] - k]], axis=0)


def row_shift_up(x: jnp.ndarray, k: int, fill: int = 0) -> jnp.ndarray:
    """y[r] = x[r+k] rows (fill rows at the bottom), static k."""
    if k == 0:
        return x
    pad = jnp.full((k,) + x.shape[1:], fill, x.dtype)
    return jnp.concatenate([x[k:], pad], axis=0)


def stream_shift_up_mm(x: jnp.ndarray, d: int, bits: int = 31) -> jnp.ndarray:
    """y[flat i] = x[flat i + d] (zero fill), 0 <= d < L, via MXU shifts."""
    if d == 0:
        return x
    cur = lane_shift_up(x, d, bits)
    nxt = lane_shift_down(row_shift_up(x, 1), L - d, bits)
    return cur + nxt  # disjoint non-zero lanes


def scan2d_mm(x: jnp.ndarray, op: str = "max", bits: int = 31) -> jnp.ndarray:
    """Inclusive row-major scan of (R, L) int32 using MXU shifts.

    op "max": requires x > NEG/2 sentinel discipline from the caller (empty
    cells should hold a value smaller than every real one, e.g. 0 with all
    real keys >= 1).  op "add": f32-exact for totals < 2^24.
    """
    R = x.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    s = x
    k = 1
    while k < L:
        sh = lane_shift_down(s, k, bits)
        if op == "max":
            sh = jnp.where(lane >= k, sh, NEG)
        s = _combine(op, s, sh)
        k <<= 1
    tot = s[:, L - 1 : L]                              # (R, 1) row totals
    t = tot
    k = 1
    while k < R:
        tk = row_shift_down(t, k, fill=(NEG if op == "max" else 0))
        t = _combine(op, t, tk)
        k <<= 1
    excl = row_shift_down(t, 1, fill=(NEG if op == "max" else 0))
    return _combine(op, s, jnp.broadcast_to(excl, x.shape))


# --------------------------------------------------------------------------
# Batched one-hot gather / scatter.  Per-row invocations are overhead-bound
# (mosaic_probe r2: 492ns per 128-element gather); concatenating 8 rows of
# one-hots along the lane axis amortizes it into one big MXU contraction.
# --------------------------------------------------------------------------


def _cat_lanes(rows):
    return jnp.concatenate(rows, axis=1)


def gather_flat8(table: jnp.ndarray, idx8: jnp.ndarray, bits: int) -> jnp.ndarray:
    """y (8, L) = table[flat idx8] for table (R, L) int32 in [0, 2^bits).

    idx8: (8, L) int32, caller-clipped to [0, R*L).  One (R, 8L) one-hot
    contraction per limb.
    """
    R = table.shape[0]
    roh = _cat_lanes([onehot_rows_t(idx8[j : j + 1, :], R) for j in range(8)])
    loh = _cat_lanes([onehot_lanes_t(idx8[j : j + 1, :]) for j in range(8)])
    limbs = (bits + 7) // 8
    acc = jnp.zeros((1, 8 * L), jnp.int32)
    for k in range(limbs):
        picked = jax.lax.dot_general(
            limb_f(table, k), roh,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                              # (L, 8L)
        val = jnp.sum(jnp.where(loh > 0, picked, 0.0), axis=0, keepdims=True)
        acc = acc | (val.astype(jnp.int32) << (8 * k))
    rowi = jax.lax.broadcasted_iota(jnp.int32, (8, L), 0)
    out = jnp.zeros((8, L), jnp.int32)
    for j in range(8):
        out = jnp.where(rowi == j, jnp.broadcast_to(acc[:, j * L : (j + 1) * L], (8, L)), out)
    return out


def scatter_sum8(
    pos8: jnp.ndarray, val8: jnp.ndarray, mask8: jnp.ndarray,
    out_rows: int, bits: int,
) -> jnp.ndarray:
    """H (out_rows, L) partial: H[flat pos8[j,e]] += val8[j,e] where mask8.

    pos8/val8 (8, L) int32, mask8 (8, L) bool; positions unique across all
    tiles (sum == store).  One (out_rows, 8L)x(L, 8L)^T contraction per limb.
    """
    p = jnp.where(mask8, pos8, out_rows * L)
    roh = _cat_lanes([onehot_rows_t(p[j : j + 1, :], out_rows) for j in range(8)])
    lohs = []
    for j in range(8):
        lj = onehot_lanes_t(p[j : j + 1, :])
        lohs.append(jnp.where(mask8[j : j + 1, :], lj, 0))
    loh = _cat_lanes(lohs)
    vcat = _cat_lanes([val8[j : j + 1, :] for j in range(8)])
    limbs = (bits + 7) // 8
    acc = jnp.zeros((out_rows, L), jnp.int32)
    for k in range(limbs):
        w = roh * ((vcat >> (8 * k)) & 0xFF).astype(jnp.bfloat16)
        h = jax.lax.dot_general(
            w, loh,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = acc | (h.astype(jnp.int32) << (8 * k))
    return acc


def scatter_sum_tile(
    pos_row: jnp.ndarray, val_row: jnp.ndarray, mask_row: jnp.ndarray,
    out_rows: int, bits: int,
) -> jnp.ndarray:
    """H (out_rows, L) += one scatter tile: H[flat pos[e]] += val[e].

    pos_row/val_row: (1, 128) int32; mask_row: (1, 128) bool.  Caller
    guarantees positions are unique across *all* tiles (so sum == store).
    Returns the partial H for this tile; caller accumulates.  bf16 limb
    dot_generals on the MXU.
    """
    p = jnp.where(mask_row, pos_row, out_rows * L)
    roh = onehot_rows_t(p, out_rows)                   # (out_rows, E)
    loh = onehot_lanes_t(p)                            # (L, E) — E==L here
    loh = jnp.where(mask_row, loh, 0)
    limbs = (bits + 7) // 8
    acc = jnp.zeros((out_rows, L), jnp.int32)
    for k in range(limbs):
        w = roh * limb_f(val_row, k)                   # (out_rows, E)
        # H[r, l] = sum_e w[r, e] * loh[l, e]  — contract E on both rhs dims
        h = jax.lax.dot_general(
            w, loh,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                              # (out_rows, L)
        acc = acc | (h.astype(jnp.int32) << (8 * k))
    return acc
