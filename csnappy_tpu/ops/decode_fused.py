"""Fused TPU block decoder — ONE pallas_call per batch of blocks.

Round 1 decoded via ~50 pallas_calls per batch, round-tripping every phase
through HBM (VERDICT r1: 20.2/29.6 ms in gather rounds alone).  This kernel
keeps the whole per-block state in VMEM/SMEM and replaces the dense
7-round chunk composition + mark phases with a *scalar tag walk*:

  1. parse   — dense speculative tag parse at every byte (VPU); packs
               (produced | advance<<16) per position plus covering fields.
  2. walk    — the real tag chain is sequential (csnappy_decompress.c:345
               tag N's start depends on tag N-1's length); on TPU the scalar
               unit walks it at a few cycles per tag, streaming the parse
               table through SMEM windows (mosaic_probe r2: SMEM scalar
               loads/stores are ~free; VMEM scalar access is unsupported).
               Emits the compact tag-position list.
  3. fields  — per-tag produced/kind/offset/literal-src via batched one-hot
               MXU gathers from the dense parse tables.
  4. cover   — per-tag output starts by saturating-add scan; per-output-byte
               covering tag by MXU one-hot scatter of (os+1)<<15|payload
               keys + running-max fill (the scatter-free analog of
               csnappy_decompress.c:152-185's char_table dispatch).
  5. resolve — copy chains: in-row pointer doubling (kills RLE,
               IncrementalCopy analog, csnappy_decompress.c:200-254), then
               adaptive global pointer-doubling rounds via MXU one-hot
               gathers; literal bytes fetched once from the source.

Error contract identical to the reference (csnappy.h:124-129), with
sequentially-exact priority between E_DATA_MALFORMED and E_OUTPUT_OVERRUN
(first event in output order wins, offset checks before space checks as in
SAW__AppendFromSelf, csnappy_decompress.c:295-317).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..errors import E_DATA_MALFORMED, E_OK, E_OUTPUT_OVERRUN
from ..models import wire
from . import kernel_lib as kl
from . import primitives as prim

L = 128
MAXW = 32         # SMEM walk window rows (4 KiB of stream per refill)
TBUF = 16         # SMEM tag buffer rows (2048 tags per flush)
INNER = 512       # walk steps per outer round
BIG = 1 << 24     # "never" event position
GLOBAL_MAX = 17   # pointer-doubling rounds cap (2^16 >= any chain)


def _troWS(P: int) -> int:
    return ((P // 2 + TBUF * L - 1) // (TBUF * L)) * TBUF


def _kernel(
    slen_ref, dlim_ref, comp_ref,                   # inputs
    out_ref, meta_ref,                              # outputs
    ap_ref, kf_ref, ls_ref,                         # dense scratch (CI*, L)
    tpos_ref, tprod_ref, tkf_ref, tls_ref, tose_ref,  # compact tag scratch
    h0_ref, h1_ref, h2_ref, par_ref, lv_ref, lidx_ref,  # output-side scratch
    win_smem, tbuf_smem, gflags, sem,               # SMEM + DMA
    *, CI: int, CO: int, phases: int = 99,
):
    def _cut(n, *vals):
        """Static profiling knob: stop after phase n, consuming its results
        (so the measured phase cannot be dead-code-eliminated)."""
        if phases != n:
            return False
        acc = jnp.int32(0)
        for v in vals:
            acc = acc + jnp.sum(jnp.asarray(v).astype(jnp.int32))
        meta_ref[b, 0] = acc
        meta_ref[b, 1] = jnp.int32(0)
        out_ref[0, 0:8, :] = jnp.zeros((8, L), jnp.int32) + acc
        return True
    P, OC = CI * L, CO * L
    CIP = CI + MAXW
    TROWS = _troWS(P)
    TMAX = TROWS * L
    MAX_ROUNDS = CI + TROWS // 4 + 64
    b = pl.program_id(0)
    slen = slen_ref[b]
    dlim = dlim_ref[b]
    comp = comp_ref[0]                              # (CI, L) byte values

    # ------------------------------------------------------------ 1. parse
    b1 = kl.stream_shift_up_mm(comp, 1, bits=8)
    b2 = kl.stream_shift_up_mm(comp, 2, bits=8)
    b3 = kl.stream_shift_up_mm(comp, 3, bits=8)
    b4 = kl.stream_shift_up_mm(comp, 4, bits=8)
    kind = comp & 3
    u = comp >> 2
    islit = kind == wire.TAG_LITERAL
    extra = jnp.clip(u - 59, 0, 4)
    t2 = b1 | (b2 << 8)
    t3 = t2 | (b3 << 16)
    tr = jnp.where(extra == 0, 0, jnp.where(extra == 1, b1, jnp.where(extra == 2, t2, t3)))
    lit_too_big = islit & (u >= 60) & (((extra == 4) & (b4 > 0)) | (tr + 1 > P))
    lit_len = jnp.where(u >= 60, jnp.minimum(tr + 1, P), u + 1)
    hdr = jnp.where(
        islit, 1 + extra,
        jnp.where(kind == wire.TAG_COPY_1, 2, jnp.where(kind == wire.TAG_COPY_2, 3, 5)),
    )
    copy_len = jnp.where(kind == wire.TAG_COPY_1, (u & 7) + wire.MIN_MATCH, u + 1)
    off16 = jnp.where(kind == wire.TAG_COPY_1, ((u >> 3) << 8) | b1, t2)
    # offsets >= 2^15 can never be valid inside a <=32K block; encode invalid
    # as 0, which the offset==0 check rejects (csnappy_decompress.c:302)
    # (no jnp.where over bools: Mosaic cannot truncate an i8 splat to i1)
    off_ok = (kind != wire.TAG_COPY_4) | ((b3 == 0) & (b4 == 0))
    off_ok = off_ok & (off16 <= 32767) & (off16 >= 0)
    off_store = jnp.where(off_ok, off16, 0)
    prod = jnp.minimum(jnp.where(islit, lit_len, copy_len), OC + 1)
    adv = hdr + jnp.where(islit, lit_len, 0)
    pos = kl.row_iota(CI)
    in_range = pos < slen
    perr = in_range & ((pos + adv > slen) | lit_too_big)
    ap_ref[0:CI, :] = jnp.where(in_range & ~perr, prod | (adv << 16), 0)
    ap_ref[CI:CIP, :] = jnp.zeros((MAXW, L), jnp.int32)
    kf_ref[...] = islit.astype(jnp.int32) | (off_store << 1)
    ls_ref[...] = jnp.clip(pos + hdr, 0, P - 1)

    if _cut(1, ap_ref[...], kf_ref[...], ls_ref[...]):
        return

    # ------------------------------------------------------------- 2. walk
    cp0 = pltpu.make_async_copy(ap_ref.at[0:MAXW], win_smem, sem)
    cp0.start()
    cp0.wait()

    def outer_cond(c):
        _p, _t, _tc, _wb, _err, done, rounds = c
        return (done == 0) & (rounds < MAX_ROUNDS)

    def outer_body(c):
        p, t, tc, wb, err_w, done, rounds = c
        full = tc >= TBUF * L

        @pl.when(full)
        def _():
            fr = (t >> 7) - TBUF
            cp = pltpu.make_async_copy(tbuf_smem, tpos_ref.at[pl.ds(fr, TBUF)], sem)
            cp.start()
            cp.wait()

        tc = jnp.where(full, 0, tc)
        iw0 = p - wb * L
        needw = (iw0 < 0) | (iw0 >= MAXW * L)
        wb2 = jnp.where(needw, jnp.minimum(p >> 7, CIP - MAXW), wb)

        @pl.when(needw)
        def _():
            cp = pltpu.make_async_copy(ap_ref.at[pl.ds(wb2, MAXW)], win_smem, sem)
            cp.start()
            cp.wait()

        def inner(i, ic):
            # trip count is bounded by free tag-buffer slots (no room check
            # in the body); stall only flags a window miss
            p, t, tc, err_w, done, stall = ic
            active = (done == 0) & (stall == 0)
            at_end = p == slen
            iw = p - wb2 * L
            inwin = (iw >= 0) & (iw < MAXW * L)
            proceed = active & ~at_end & inwin
            iwc = jnp.clip(iw, 0, MAXW * L - 1)
            v = win_smem[iwc >> 7, iwc & (L - 1)]
            adv_s = (v >> 16) & 0xFFFF
            take = proceed & (v != 0)
            iserr = proceed & (v == 0)

            @pl.when(take)
            def _():
                tbuf_smem[tc >> 7, tc & (L - 1)] = p

            stall2 = stall | (active & ~at_end & ~inwin)
            return (
                jnp.where(take, p + adv_s, p),
                jnp.where(take, t + 1, t),
                jnp.where(take, tc + 1, tc),
                err_w | jnp.where(iserr, 1, 0),
                done | jnp.where((active & at_end) | iserr, 1, 0),
                stall2,
            )

        # trips bound: free buffer slots and the TMAX cap replace in-body
        # room/TMAX checks (a tag-overflow block stalls to rounds exhaustion)
        trips = jnp.minimum(jnp.minimum(INNER, TBUF * L - tc), TMAX - t)
        p, t, tc, err_w, done, _ = jax.lax.fori_loop(
            0, trips, inner, (p, t, tc, err_w, done, jnp.int32(0))
        )
        # ADVICE r2: when the final tag lands p exactly on slen as t hits
        # TMAX, trips is 0 and no inner iteration observes at_end — a legal
        # stream would spin to the round bound and report E_DATA_MALFORMED
        done = done | jnp.where(p == slen, 1, 0)
        return p, t, tc, wb2, err_w, done, rounds + 1

    z = jnp.int32(0)
    p_f, ntags, tc_f, _wb, err_w, done_f, _r = jax.lax.while_loop(
        outer_cond, outer_body, (z, z, z, z, z, z, z)
    )
    err_w = err_w | jnp.where(done_f == 0, 1, 0)    # round-bound safety

    @pl.when(tc_f > 0)
    def _():
        fr = (ntags - tc_f) >> 7
        cp = pltpu.make_async_copy(tbuf_smem, tpos_ref.at[pl.ds(fr, TBUF)], sem)
        cp.start()
        cp.wait()

    malformed_walk = (err_w > 0) | (p_f != slen)
    if _cut(2, p_f, ntags, err_w, tpos_ref[...]):
        return

    # ----------------------------------------------------------- 3. fields
    FN = 16
    ngroups = (ntags + FN * L - 1) // (FN * L)
    ap_t = ap_ref[0:CI, :]
    kf_t = kf_ref[...]
    ls_t = ls_ref[...]

    def fields_grp(g, _):
        r0 = pl.multiple_of(g * FN, 8)
        prod8, kf8, ls8 = kl.gather_rows_multi(
            [(ap_t, 16), (kf_t, 16), (ls_t, 16)], tpos_ref, r0, nrows=FN
        )
        tprod_ref[pl.ds(r0, FN), :] = prod8
        tkf_ref[pl.ds(r0, FN), :] = kf8
        tls_ref[pl.ds(r0, FN), :] = ls8
        return 0

    jax.lax.fori_loop(0, ngroups, fields_grp, 0)

    if _cut(3, tprod_ref[...], tkf_ref[...], tls_ref[...]):
        return

    # ------------------------------------------------------------ 4. cover
    tagi = kl.row_iota(TROWS) < ntags
    tprod_m = jnp.where(tagi, tprod_ref[...] & 0xFFFF, 0)
    tin = kl.scan2d_mm(tprod_m, op="addsat", bits=24)
    tose = tin - tprod_m
    tose_ref[...] = tose
    total_out = jnp.max(tin)
    overrun = jnp.any(tagi & (tin > dlim))

    # dense scatter operands: position (sentinel -1 when dead) + 3 packed
    # value arrays, written to scratch so the row-group scatter reads refs
    kfd = tkf_ref[...]
    lsd = tls_ref[...]
    islit_d = kfd & 1
    key_d = tose + 1
    live_tag = tagi & (tose < OC)
    tpos_ref[...] = jnp.where(live_tag, tose, -1)           # tpos reused: spos
    tprod_ref[...] = (key_d << 15) | ((kfd >> 1) & 0x7FFF)  # reused: p1
    tkf_ref[...] = (key_d << 15) | (lsd & 0x7FFF)           # reused: p2
    tls_ref[...] = (key_d << 15) | islit_d | (((lsd >> 15) & 1) << 1)  # p3

    zero = jnp.zeros((CO, L), jnp.int32)
    h0_ref[...] = zero
    h1_ref[...] = zero
    h2_ref[...] = zero

    def scat_grp(g, _):
        r0 = pl.multiple_of(g * FN, 8)
        parts = kl.scatter_rows_multi(
            tpos_ref, [(tprod_ref, 31), (tkf_ref, 31), (tls_ref, 31)], r0, CO,
            nrows=FN,
        )
        h0_ref[...] += parts[0]
        h1_ref[...] += parts[1]
        h2_ref[...] += parts[2]
        return 0

    jax.lax.fori_loop(0, ngroups, scat_grp, 0)

    H0 = kl.scan2d_mm(h0_ref[...], op="max", bits=31)
    H1 = kl.scan2d_mm(h1_ref[...], op="max", bits=31)
    H2 = kl.scan2d_mm(h2_ref[...], op="max", bits=31)
    key_o = H0 >> 15
    t_os = key_o - 1
    valid = key_o >= 1
    off_o = H0 & 0x7FFF
    ls_o = (H1 & 0x7FFF) | (((H2 >> 1) & 1) << 15)
    islit_o = (H2 & 1) == 1
    o = kl.row_iota(CO)
    live = valid & (o < jnp.minimum(total_out, OC))
    is_copy = live & ~islit_o
    copy_err = is_copy & ((off_o == 0) | (off_o > t_os))
    ev_copy = jnp.min(jnp.where(copy_err, o, BIG))
    parent = jnp.where(is_copy & ~copy_err, o - off_o, o)
    par_ref[...] = jnp.clip(parent, 0, OC - 1)
    lidx = jnp.clip(ls_o + (o - t_os), 0, P - 1)
    lidx_ref[...] = lidx | (live.astype(jnp.int32) << 16)

    if _cut(4, par_ref[...], lidx_ref[...], total_out):
        return

    # ---------------------------------------------------------- 5. resolve
    LVN = next(n for n in (16, 8) if CO % n == 0)

    def lv_grp(g, _):
        r0 = pl.multiple_of(g * LVN, 8)
        (lv8,) = kl.gather_rows_multi(
            [(comp, 8)], lidx_ref, r0, nrows=LVN, pre=lambda r: r & 0xFFFF
        )
        lv_ref[pl.ds(r0, LVN), :] = lv8
        return 0

    jax.lax.fori_loop(0, CO // LVN, lv_grp, 0)

    if _cut(5, lv_ref[...]):
        return

    if _cut(6, par_ref[...]):
        return

    GN = next(n for n in (32, 16, 8) if CO % n == 0)  # doubling group rows
    NG = CO // GN
    BANDR = min(64, CO)  # banded-round table rows (offsets <= ~6KB resolve here)
    assert CO % 8 == 0

    def band_round(rnd, _):
        def grp(g, _2):
            r0 = pl.multiple_of(g * GN, 8)
            band_lo = jnp.maximum(r0 + GN - BANDR, 0)
            tbl = par_ref[pl.ds(band_lo, BANDR), :]
            parg = par_ref[pl.ds(r0, GN), :]
            (newg,) = kl.gather_rows_multi(
                [(tbl, 15)], par_ref, r0, nrows=GN,
                pre=lambda r: r - band_lo * L,
            )
            in_band = parg >= band_lo * L
            upd = jnp.where(in_band, newg, parg)
            par_ref[pl.ds(r0, GN), :] = upd
            # seed the full-round flags from the last band round: a group
            # is future-active iff something changed or a parent is still
            # out of band (in-band + unchanged == stable forever)
            @pl.when(rnd == 2)
            def _():
                gflags[g] = jnp.sum(((~in_band) | (upd != parg)).astype(jnp.int32))

            return 0

        jax.lax.fori_loop(0, NG, grp, 0)
        return 0

    if CO > GN:  # cheap near-offset rounds before the full-table rounds
        jax.lax.fori_loop(0, 3, band_round, 0)
    else:
        def ginit(g, _):
            gflags[g] = 1
            return 0

        jax.lax.fori_loop(0, NG, ginit, 0)

    def global_round(c):
        k, _ch = c
        par_t = par_ref[...]  # Jacobi: this round reads round-k values

        def grp(g, ch):
            # a group whose parents were all stable last round points only
            # at roots (roots never move) — skip it forever
            @pl.when(gflags[g] > 0)
            def _():
                r0 = pl.multiple_of(g * GN, 8)
                parg = par_ref[pl.ds(r0, GN), :]
                (newg,) = kl.gather_rows_multi([(par_t, 15)], par_ref, r0, nrows=GN)
                par_ref[pl.ds(r0, GN), :] = newg
                gflags[g] = jnp.sum((newg != parg).astype(jnp.int32))

            return ch + gflags[g]

        return k + 1, jax.lax.fori_loop(0, NG, grp, 0)

    jax.lax.while_loop(
        lambda c: (c[1] > 0) & (c[0] < GLOBAL_MAX), global_round, (z, jnp.int32(1))
    )

    if _cut(7, par_ref[...]):
        return

    lv_t = lv_ref[...]

    def fin_grp(g, _):
        r0 = pl.multiple_of(g * LVN, 8)
        (out8,) = kl.gather_rows_multi([(lv_t, 8)], par_ref, r0, nrows=LVN)
        live8 = (lidx_ref[pl.ds(r0, LVN), :] >> 16) & 1
        out_ref[0, pl.ds(r0, LVN), :] = jnp.where(live8 > 0, out8, 0)
        return 0

    jax.lax.fori_loop(0, CO // LVN, fin_grp, 0)

    # ------------------------------------------------------------- status
    ev_end = jnp.where(malformed_walk, total_out, BIG)
    ev_data = jnp.minimum(ev_copy, ev_end)
    ev_over = jnp.where(overrun, dlim, BIG)
    ok = (ev_data >= BIG) & (ev_over >= BIG)
    status = jnp.where(
        ok, E_OK, jnp.where(ev_data <= ev_over, E_DATA_MALFORMED, E_OUTPUT_OVERRUN)
    )
    produced = jnp.where(status == E_OK, total_out, 0)
    meta_ref[b, 0] = produced
    meta_ref[b, 1] = status
    meta_ref[b, 2] = ntags
    meta_ref[b, 3] = total_out
    # debug probes (harmless; used by bring-up diagnostics)
    ti_dbg = kl.row_iota(TROWS)
    meta_ref[b, 4] = jnp.max(jnp.where(ti_dbg == 1, tose, 0))
    meta_ref[b, 5] = jnp.max(jnp.where(o == 1, H0, 0))
    meta_ref[b, 6] = jnp.max(jnp.where(o == 0, H0, 0))
    meta_ref[b, 7] = jnp.max(jnp.where(o == 12, H0, 0))


@functools.lru_cache(maxsize=32)
def _compiled(B: int, CI: int, CO: int, phases: int = 99):
    P, OC = CI * L, CO * L
    CIP = CI + MAXW
    TROWS = _troWS(P)
    kern = functools.partial(_kernel, CI=CI, CO=CO, phases=phases)
    i32 = jnp.int32

    def call(slen, dlim, comp):
        return pl.pallas_call(
            kern,
            grid=(B,),
            out_shape=(
                jax.ShapeDtypeStruct((B, CO, L), i32),
                jax.ShapeDtypeStruct((B, 8), i32),
            ),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, CI, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, CO, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((CIP, L), i32),          # ap
                pltpu.VMEM((CI, L), i32),           # kf
                pltpu.VMEM((CI, L), i32),           # ls
                pltpu.VMEM((TROWS, L), i32),        # tpos
                pltpu.VMEM((TROWS, L), i32),        # tprod
                pltpu.VMEM((TROWS, L), i32),        # tkf
                pltpu.VMEM((TROWS, L), i32),        # tls
                pltpu.VMEM((TROWS, L), i32),        # tose
                pltpu.VMEM((CO, L), i32),           # h0
                pltpu.VMEM((CO, L), i32),           # h1
                pltpu.VMEM((CO, L), i32),           # h2
                pltpu.VMEM((CO, L), i32),           # par
                pltpu.VMEM((CO, L), i32),           # lv
                pltpu.VMEM((CO, L), i32),           # lidx
                pltpu.SMEM((MAXW, L), i32),         # walk window
                pltpu.SMEM((TBUF, L), i32),         # tag buffer
                pltpu.SMEM((32,), i32),             # doubling group flags
                pltpu.SemaphoreType.DMA,
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024,
            ),
            interpret=prim.interpret_mode(),
        )(slen, dlim, comp)

    return jax.jit(call)


def _round_up(n: int, m: int) -> int:
    return (n + m - 1) // m * m


def decode_blocks(comp: np.ndarray, src_lens: np.ndarray, block_out: int):
    """Batched independent-fragment decode (fused kernel).

    comp: uint8[B, Pin] zero-padded; src_lens: int[B]; block_out: per-block
    output capacity.  Returns (out uint8[B, block_out], produced, status).
    """
    B, Pin = comp.shape
    P = _round_up(max(Pin, 1024), 1024)
    OC = _round_up(max(block_out, 1024), 1024)
    Bp = _round_up(max(B, 1), 8)
    arr = np.zeros((Bp, P), np.uint8)
    arr[:B, :Pin] = comp
    lens = np.zeros((Bp,), np.int32)
    lens[:B] = src_lens
    fn = _compiled(Bp, P // L, OC // L)
    out, meta = fn(
        jnp.asarray(lens),
        jnp.full((Bp,), block_out, np.int32),
        jnp.asarray(arr.astype(np.int32)).reshape(Bp, P // L, L),
    )
    out_np = np.asarray(out).reshape(Bp, OC)[:B, :block_out].astype(np.uint8)
    meta_np = np.asarray(meta)
    return out_np, meta_np[:B, 0], meta_np[:B, 1]


prim.register_trace_cache(_compiled)
