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


SAT = 1 << 23   # saturating-add ceiling (f32-exact, > any block capacity)
BIGV = 1 << 20  # "+inf" for min scans (non-negative, f32/16-bit-halves safe)


def _combine(op, a, b):
    if op == "max":
        return jnp.maximum(a, b)
    if op == "min":
        return jnp.minimum(a, b)
    if op == "add":
        return a + b
    if op == "addsat":
        # saturating add is associative for non-negative operands
        return jnp.minimum(a + b, SAT)
    raise ValueError(op)


def _fill_of(op):
    return {"max": NEG, "min": BIGV, "add": 0, "addsat": 0}[op]


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


def perm_apply(x: jnp.ndarray, m: jnp.ndarray, bits: int, left: bool = False) -> jnp.ndarray:
    """x @ m (or m @ x when left=True) for a 0/1 permutation-ish matrix m and
    non-negative int32 x < 2^bits, exactly.

    TPU matmuls round their inputs to bf16 regardless of preferred_element_
    type (only the accumulator is f32), so full 16-bit values through a dot
    silently lose low bits on hardware — interpret mode hides this.  Data
    therefore rides as 8-bit limbs (bf16-exact), like the one-hot gathers.
    """
    mb = m.astype(jnp.bfloat16)
    acc = None
    for k in range((bits + 7) // 8):
        limb = limb_f(x, k)
        y = (
            jnp.dot(mb, limb, preferred_element_type=jnp.float32)
            if left
            else jnp.dot(limb, mb, preferred_element_type=jnp.float32)
        ).astype(jnp.int32) << (8 * k)
        acc = y if acc is None else acc | y
    return acc


def _mm_shift(x: jnp.ndarray, k: int, up: bool, bits: int) -> jnp.ndarray:
    """Zero-fill lane shift of (R, L) int32 by static k via permutation dot."""
    if k == 0:
        return x
    return perm_apply(x, _shift_mat(k % L, L, up), bits)


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
    if k >= x.shape[0]:
        return jnp.full(x.shape, fill, x.dtype)
    pad = jnp.full((k,) + x.shape[1:], fill, x.dtype)
    return jnp.concatenate([pad, x[: x.shape[0] - k]], axis=0)


def row_shift_up(x: jnp.ndarray, k: int, fill: int = 0) -> jnp.ndarray:
    """y[r] = x[r+k] rows (fill rows at the bottom), static k."""
    if k == 0:
        return x
    if k >= x.shape[0]:
        return jnp.full(x.shape, fill, x.dtype)
    pad = jnp.full((k,) + x.shape[1:], fill, x.dtype)
    return jnp.concatenate([x[k:], pad], axis=0)


def stream_shift_up_mm(x: jnp.ndarray, d: int, bits: int = 31) -> jnp.ndarray:
    """y[flat i] = x[flat i + d] (zero fill), 0 <= d < L, via MXU shifts."""
    if d == 0:
        return x
    cur = lane_shift_up(x, d, bits)
    nxt = lane_shift_down(row_shift_up(x, 1), L - d, bits)
    return cur + nxt  # disjoint non-zero lanes


def stream_shift_down_mm(x: jnp.ndarray, d: int, bits: int = 31) -> jnp.ndarray:
    """y[flat i] = x[flat i - d] (zero fill), 0 <= d < L, via MXU shifts."""
    if d == 0:
        return x
    cur = lane_shift_down(x, d, bits)
    prv = lane_shift_up(row_shift_down(x, 1), L - d, bits)
    return cur + prv  # disjoint non-zero lanes


def scan2d_mm(x: jnp.ndarray, op: str = "max", bits: int = 31, fill=None) -> jnp.ndarray:
    """Inclusive row-major scan of (R, L) int32 using MXU shifts.

    All values (and `fill`) must be non-negative and < 2^bits (they ride
    f32 permutation dots as 16-bit halves).  op "max": empty cells should
    hold a value smaller than every real one; op "min": `fill` acts as the
    +inf sentinel; op "add"/"addsat": f32-exact for totals < 2^24.
    """
    R = x.shape[0]
    if fill is None:
        fill = _fill_of(op)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    s = x
    k = 1
    while k < L:
        sh = lane_shift_down(s, k, bits)
        if op in ("max", "min"):
            sh = jnp.where(lane >= k, sh, fill)
        s = _combine(op, s, sh)
        k <<= 1
    # row totals, re-laid to lane offset 0 (slicing lane 127 directly gives
    # an offset-127 layout Mosaic cannot concat) and broadcast full-width
    tot = jnp.broadcast_to(lane_shift_up(s, L - 1, bits)[:, 0:1], x.shape)
    t = tot
    k = 1
    while k < R:
        t = _combine(op, t, row_shift_down(t, k, fill=fill))
        k <<= 1
    excl = row_shift_down(t, 1, fill=fill)
    return _combine(op, s, excl)


def lane_gather(x: jnp.ndarray, lane_idx: jnp.ndarray) -> jnp.ndarray:
    """y[r, e] = x[r, lane_idx[r, e]] — native tpu.dynamic_gather (axis=1).

    ~0.25µs for a whole (256,128) table (mosaic_probe3c) — two orders of
    magnitude cheaper than one-hot dot gathers.  lane_idx must be the same
    2-D shape as x with values in [0, 128).  axis=0 (sublane) dynamic
    gather crashes this backend — only use the lane form.
    """
    return jnp.take_along_axis(x, lane_idx, axis=1)


def scan2d_tril(x: jnp.ndarray, bits: int = 31) -> jnp.ndarray:
    """Inclusive row-major add-scan of non-negative (R, L) int32 via two
    triangular-matrix dots on 8-bit limbs.  Exact while prefix sums stay
    < 2^31 (limb-wise recombination is carry-exact: sums of limbs weighted
    by 256^k equal the sum of values).  ~2x cheaper than the log-round
    scan2d_mm('add') (mosaic_probe3: 620ns vs 1372ns per (256,128) scan).
    """
    R = x.shape[0]
    li = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    lj = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    ML = (li <= lj).astype(jnp.bfloat16)               # lane-inclusive prefix
    ri = jax.lax.broadcasted_iota(jnp.int32, (R, R), 0)
    rj = jax.lax.broadcasted_iota(jnp.int32, (R, R), 1)
    MR = (ri > rj).astype(jnp.bfloat16)                # strict row prefix
    limbs = (bits + 7) // 8
    s = jnp.zeros((R, L), jnp.int32)
    for k in range(limbs):
        part = jax.lax.dot_general(
            limb_f(x, k), ML, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        s = s + (part.astype(jnp.int32) << (8 * k))
    tot = jnp.broadcast_to(lane_shift_up(s, L - 1, bits)[:, 0:1], x.shape)
    e = jnp.zeros((R, L), jnp.int32)
    for k in range(limbs):
        part = jax.lax.dot_general(
            MR, limb_f(tot, k), dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        e = e + (part.astype(jnp.int32) << (8 * k))
    return s + e


def fill_max_rows(x: jnp.ndarray, bits: int, rounds: int):
    """Row-major inclusive MAX scan with full lane rounds but only
    ``rounds`` row-doubling rounds (covers fills spanning < 2^rounds rows).

    Returns (result, s, t): callers that discover the fill must reach
    further (a rare multi-KB literal span) continue the row doubling on
    ``t`` and recombine with ``maximum(s, row_shift_down(t, 1))``.
    """
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    s = x
    k = 1
    while k < L:
        sh = lane_shift_down(s, k, bits)
        s = jnp.maximum(s, jnp.where(lane >= k, sh, NEG))
        k <<= 1
    tot = jnp.broadcast_to(lane_shift_up(s, L - 1, bits)[:, 0:1], x.shape)
    R = x.shape[0]
    t = tot
    for r in range(rounds):
        if (1 << r) < R:
            t = jnp.maximum(t, row_shift_down(t, 1 << r, fill=NEG))
    excl = row_shift_down(t, 1, fill=NEG)
    return jnp.maximum(s, excl), s, t


def flip2d(x: jnp.ndarray, bits: int = 16) -> jnp.ndarray:
    """Reverse the row-major flat order of (R, L) int32 (non-negative,
    < 2^bits) via anti-diagonal permutation dots (no negative strides)."""
    R = x.shape[0]
    li = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    lj = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    AL = (lj == L - 1 - li).astype(jnp.float32)
    ri = jax.lax.broadcasted_iota(jnp.int32, (R, R), 0)
    rj = jax.lax.broadcasted_iota(jnp.int32, (R, R), 1)
    AR = (rj == R - 1 - ri).astype(jnp.float32)
    return perm_apply(perm_apply(x, AL, bits), AR, bits, left=True)


# --------------------------------------------------------------------------
# Row-group one-hot gather / scatter over VMEM refs.  Rows are read one at a
# time STRAIGHT FROM THE REF (a register-array row slice x[j:j+1] carries a
# sublane-offset layout Mosaic cannot concat or re-lay), giving offset-0
# (1, L) values; the 8 per-row dot chains are independent and pipeline on
# the MXU, amortizing the ~0.5µs/row loop overhead (mosaic_probe r2).
# --------------------------------------------------------------------------


def _widen_rows(ref, r0, nrows, rows_out, pre=None):
    """(rows_out, nrows*L) int32 with [r, j*L+e] = ref[r0+j, e] — ref rows
    broadcast over sublanes then lane-concatenated.  Ref reads give
    offset-(0,0) values, so the concat pieces share one layout (slicing a
    register array instead yields sublane offsets Mosaic cannot concat)."""
    import jax.experimental.pallas as pl

    pieces = []
    for j in range(nrows):
        raw = ref[pl.ds(r0 + j, 1), :]
        if pre is not None:
            raw = pre(raw)
        pieces.append(jnp.broadcast_to(raw, (rows_out, L)))
    return jnp.concatenate(pieces, axis=1)


def gather_rows_multi(tables_bits, idx_ref, r0, nrows: int = 8, pre=None):
    """Gather several (R, L) int32 tables at the flat indices stored in rows
    r0..r0+nrows-1 of idx_ref.  tables_bits: [(table, bits), ...], all
    sharing R.  pre: optional fn mapping a raw (1, L) idx row to indices
    (e.g. masking/offsetting); indices are clipped to the table afterwards.
    Returns a list of (nrows, L) int32 results.

    One (R, nrows*L)-wide one-hot contraction per limb: 8 narrow dots per
    group are MXU-fill-latency-bound (~0.5µs/row measured); the wide form
    amortizes the pipeline fill across nrows*L gathered elements.
    """
    R = tables_bits[0][0].shape[0]
    E = nrows * L
    idxb = jnp.clip(_widen_rows(idx_ref, r0, nrows, R, pre), 0, R * L - 1)  # (R, E)
    q = jax.lax.broadcasted_iota(jnp.int32, (R, E), 0)
    roh8 = ((idxb >> 7) == q).astype(jnp.int8)
    idxL = jnp.clip(_widen_rows(idx_ref, r0, nrows, L, pre), 0, R * L - 1)  # (L, E)
    lq = jax.lax.broadcasted_iota(jnp.int32, (L, E), 0)
    lohb = (idxL & (L - 1)) == lq                       # bool mask
    # assembly operands: select element block j into output row j
    mrow = jax.lax.broadcasted_iota(jnp.int32, (nrows, E), 0)
    mblk = jax.lax.broadcasted_iota(jnp.int32, (nrows, E), 1) >> 7
    amask = mrow == mblk
    bi = jax.lax.broadcasted_iota(jnp.int32, (E, L), 0)
    bj = jax.lax.broadcasted_iota(jnp.int32, (E, L), 1)
    bmat8 = ((bi & (L - 1)) == bj).astype(jnp.int8)     # (E, L)
    outs = []
    for table, bits in tables_bits:
        acc = jnp.zeros((nrows, L), jnp.int32)
        for k in range((bits + 7) // 8):
            # int8 MXU dots with a -128 bias (8-bit limbs overflow signed
            # int8; every one-hot column sums to exactly 1, so the bias is
            # restored by +128 after the dot) — exact integer arithmetic,
            # ~1.5x bf16 throughput (mosaic_probe3b)
            lim8 = (limb_f(table, k) - 128).astype(jnp.int8)
            picked = jax.lax.dot_general(
                lim8, roh8,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ) + 128                                     # (L, E)
            val = jnp.sum(jnp.where(lohb, picked, 0), axis=0, keepdims=True)
            vb8 = jnp.where(
                amask, jnp.broadcast_to(val, (nrows, E)) - 128, 0
            ).astype(jnp.int8)
            lim = jax.lax.dot_general(
                vb8, bmat8,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ) + 128                                     # (nrows, L), one hit each
            acc = acc | (lim << (8 * k))
        outs.append(acc)
    return outs


def scatter_rows_multi(pos_ref, val_refs_bits, r0, out_rows: int, nrows: int = 8):
    """Scatter rows r0..r0+nrows-1: H[flat pos] += val for several value
    refs at shared positions.  Positions outside [0, out_rows*L) scatter
    nowhere (callers encode masking as an out-of-range sentinel).  Positions
    must be unique across ALL scattered rows (sum == store).
    val_refs_bits: [(ref, bits), ...].  Returns list of (out_rows, L)
    partials; caller accumulates into the H refs.  Wide-E form (see
    gather_rows_multi)."""
    import jax.experimental.pallas as pl

    E = nrows * L
    posb = _widen_rows(pos_ref, r0, nrows, out_rows)    # (out_rows, E)
    inb = (posb >= 0) & (posb < out_rows * L)
    pc = jnp.clip(posb, 0, out_rows * L - 1)
    q = jax.lax.broadcasted_iota(jnp.int32, (out_rows, E), 0)
    roh8 = jnp.where(inb, ((pc >> 7) == q).astype(jnp.int32), 0).astype(jnp.int8)
    posL = _widen_rows(pos_ref, r0, nrows, L)           # (L, E)
    inbL = (posL >= 0) & (posL < out_rows * L)
    pL = jnp.clip(posL, 0, out_rows * L - 1)
    lq = jax.lax.broadcasted_iota(jnp.int32, (L, E), 0)
    loh = jnp.where(inbL, ((pL & (L - 1)) == lq).astype(jnp.int32), 0)  # (L, E)
    vcats = []
    for vref, _bits in val_refs_bits:
        rows = [vref[pl.ds(r0 + j, 1), :] for j in range(nrows)]
        vcats.append(jnp.concatenate(rows, axis=1))     # (1, E)
    accs = []
    for (vref, bits), vcat in zip(val_refs_bits, vcats):
        acc = jnp.zeros((out_rows, L), jnp.int32)
        # 7-bit limbs keep w = onehot*limb inside signed int8 with no bias
        # bookkeeping; int8 MXU dots accumulate exactly in int32.  Values
        # ride the LANE one-hot — the O(L*E) elementwise multiply is
        # out_rows/L times cheaper than attaching them to the row side —
        # and the 0/1 row one-hot is reused across limbs and tables.
        for k in range((bits + 6) // 7):
            w8 = (loh * ((vcat >> (7 * k)) & 0x7F)).astype(jnp.int8)
            h = jax.lax.dot_general(
                roh8, w8,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )                                           # (out_rows, L)
            acc = acc + (h << (7 * k))
        accs.append(acc)
    return accs


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
