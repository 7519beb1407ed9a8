"""Whole-stream fused decoder — segmented, ONE pallas_call per stream.

A csnappy whole-stream body is one continuous tag stream: fragment
boundaries (csnappy_compress.c:636-654) are invisible to the decoder, and
copy offsets are output-relative and never exceed 32 KiB (kBlockLog=15,
csnappy_compress.c:75-86).  So serving decode (csnappy_decompress.c:394-411
analog) runs the fused block machinery over 32 KiB *output segments* with a
grid over segments; scratch persists across grid steps and carries:

  * walk state (stream position, absolute output position),
  * the straddling tag (a literal/copy can span segment boundaries),
  * a 32 KiB history ring = the previous segment's output (offsets <= 32768
    mean parents never reach further back), and
  * error-event minima for the sequentially-exact status contract.

Copy resolution runs pointer doubling over a 512-row table: rows 0..255 are
history (frozen — parents there are already final bytes), rows 256..511 the
segment being built.

Fast-path envelope (round 3, VERDICT r2 #4): offsets <= 32768 (the full
history ring, including exactly 32768) and single-tag advances to 2^24
bytes — every stream any 32 KiB-block-family encoder can emit, plus all
foreign streams except copy offsets > 32768 (64 KiB-block encoders) and
single literals >= 16 MiB.  Those residuals are REJECTED with
E_DATA_MALFORMED — never silently corrupted — and the api layer routes
them to the general decoder (the native scan_segments pass classifies them
up front, so they normally never reach this kernel at all).
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
SEG = 32768            # output bytes per grid step
CO = SEG // L          # 256
WINR = 1664            # comp window rows: 32K back + ~180K fwd (>= 5*SEG+slack)
BACKR = 256            # rows of back-window (straddling literal payload)
MAXW = 32              # SMEM walk window rows
TBUF = 16              # SMEM tag buffer rows
INNER = 512
TROWS = 256            # <= 32768 tags per segment (1 byte produced each)
TMAX = TROWS * L
BIG = 1 << 30
GLOBAL_MAX = 17

# carry slots (SMEM, persists across grid steps)
C_P, C_OS, C_ERR, C_DONE, C_EVD, C_EVO, C_SOS, C_SKF, C_SLS, C_CONS = range(10)


def _kernel(
    slen_ref, dlim_ref,                      # SMEM inputs
    comp_any,                                # ANY/HBM: (CIT, L) comp bytes
    out_ref, meta_ref,                       # outputs
    wcomp_ref, ap_ref, kf_ref, ls_ref,       # window scratch
    tpos_ref, tprod_ref, tkf_ref, tls_ref, tose_ref,
    h0_ref, h1_ref, h2_ref, par_ref, lv_ref, lidx_ref, hist_ref,
    carry, win_smem, tbuf_smem, gflags, sem,
    *, CIT: int,
):
    P = WINR * L
    CIP = WINR + MAXW
    s = pl.program_id(0)
    slen = slen_ref[0]
    dlim = dlim_ref[0]
    seg_start = s * SEG
    seg_end = seg_start + SEG

    @pl.when(s == 0)
    def _():
        carry[C_P] = 0
        carry[C_OS] = 0
        carry[C_ERR] = 0
        carry[C_DONE] = 0
        carry[C_EVD] = BIG
        carry[C_EVO] = BIG
        carry[C_SOS] = -1
        carry[C_SKF] = 0
        carry[C_SLS] = 0
        carry[C_CONS] = 0

    active_seg = (carry[C_ERR] == 0) & (carry[C_DONE] == 0)

    # ------------------------------------------------ window DMA + parse
    p0 = carry[C_P]
    # a straddling literal's payload slice for THIS segment can sit far
    # behind p0 (the walk consumed the whole literal) — key the window to it
    strad_lit = (carry[C_SOS] >= 0) & ((carry[C_SKF] & 1) == 1)
    need0 = jnp.where(
        strad_lit, carry[C_SLS] + (seg_start - carry[C_SOS]), p0
    )
    base = jnp.clip(
        jnp.minimum((p0 >> 7) - BACKR, need0 >> 7), 0, CIT - WINR
    )

    @pl.when(active_seg)
    def _():
        cp = pltpu.make_async_copy(
            comp_any.at[pl.ds(base, WINR)], wcomp_ref, sem
        )
        cp.start()
        cp.wait()

    comp = wcomp_ref[...]
    babs = base * L                               # window base, stream coords
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
    # trailers up to 3 bytes decode exactly; a 4th trailer byte > 0 means a
    # single literal >= 2^24 — outside this kernel's envelope (the host
    # scan proves such streams legal and the general decoder serves them)
    lit_too_big = islit & (u >= 60) & (extra == 4) & (b4 > 0)
    lit_len = jnp.where(u >= 60, tr + 1, u + 1)          # exact, <= 2^24
    hdr = jnp.where(
        islit, 1 + extra,
        jnp.where(kind == wire.TAG_COPY_1, 2, jnp.where(kind == wire.TAG_COPY_2, 3, 5)),
    )
    copy_len = jnp.where(kind == wire.TAG_COPY_1, (u & 7) + wire.MIN_MATCH, u + 1)
    off16 = jnp.where(kind == wire.TAG_COPY_1, ((u >> 3) << 8) | b1, t2)
    # offsets 1..32768 resolve (32768 = full history ring; VERDICT r2 #4);
    # 0 / >32768 / COPY_4 high bytes mark the copy bad — sequential-order
    # malformation for 0, general-decoder fallback for legal far offsets
    off_ok = (kind != wire.TAG_COPY_4) | ((b3 == 0) & (b4 == 0))
    off_ok = off_ok & (off16 >= 1) & (off16 <= 32768)
    off_bad = (~islit) & (~off_ok)
    off_m1 = jnp.clip(off16 - 1, 0, 32767)               # 15-bit off-1
    pos_abs = kl.row_iota(WINR) + babs
    in_range = (pos_abs >= 0) & (pos_abs < slen)
    prod = jnp.where(islit, lit_len, copy_len)           # exact
    adv = hdr + jnp.where(islit, lit_len, 0)
    perr = in_range & ((pos_abs + adv > slen) | lit_too_big)
    # exact packing prod(<=2^24)<<4 | hdr<<1 | islit: the walk reconstructs
    # adv = hdr + islit*prod with no 16-bit cap, so single-tag advances
    # beyond 64 KiB stay on the fast path (VERDICT r2 #4)
    ap_ref[0:WINR, :] = jnp.where(
        in_range & ~perr, (prod << 4) | (hdr << 1) | islit, 0
    )
    ap_ref[WINR:CIP, :] = jnp.zeros((MAXW, L), jnp.int32)
    kf_ref[...] = (
        islit.astype(jnp.int32) | (off_bad.astype(jnp.int32) << 1) | (off_m1 << 2)
    )
    ls_ref[...] = jnp.clip(pos_abs + hdr, 0, (1 << 30) - 1)

    # ---------------------------------------------------------- walk
    cp0 = pltpu.make_async_copy(ap_ref.at[0:MAXW], win_smem, sem)
    cp0.start()
    cp0.wait()

    os0 = carry[C_OS]
    MAX_ROUNDS = WINR + TROWS // 4 + 64

    def outer_cond(c):
        return (c[5] == 0) & (c[6] < MAX_ROUNDS)

    def outer_body(c):
        p, osv, t, tc, wb, done, rounds = c
        full = tc >= TBUF * L

        @pl.when(full)
        def _():
            fr = (t >> 7) - TBUF
            cp = pltpu.make_async_copy(tbuf_smem, tpos_ref.at[pl.ds(fr, TBUF)], sem)
            cp.start()
            cp.wait()

        tc = jnp.where(full, 0, tc)
        pw = p - babs                              # window-local position
        iw0 = pw - wb * L
        needw = (iw0 < 0) | (iw0 >= MAXW * L)
        wb2 = jnp.where(needw, jnp.clip(pw >> 7, 0, CIP - MAXW), wb)

        @pl.when(needw)
        def _():
            cp = pltpu.make_async_copy(ap_ref.at[pl.ds(wb2, MAXW)], win_smem, sem)
            cp.start()
            cp.wait()

        def inner(i, ic):
            p, osv, t, tc, done, stall = ic
            active = (done == 0) & (stall == 0)
            at_end = (p == slen) | (osv >= seg_end)
            iw = (p - babs) - wb2 * L
            inwin = (iw >= 0) & (iw < MAXW * L)
            proceed = active & ~at_end & inwin
            iwc = jnp.clip(iw, 0, MAXW * L - 1)
            v = win_smem[iwc >> 7, iwc & (L - 1)]
            prod_s = v >> 4
            adv_s = ((v >> 1) & 7) + (v & 1) * prod_s
            take = proceed & (v != 0)
            iserr = proceed & (v == 0)

            @pl.when(take)
            def _():
                tbuf_smem[tc >> 7, tc & (L - 1)] = p - babs

            stall2 = stall | (active & ~at_end & ~inwin)
            return (
                jnp.where(take, p + adv_s, p),
                jnp.where(take, osv + prod_s, osv),
                jnp.where(take, t + 1, t),
                jnp.where(take, tc + 1, tc),
                done | jnp.where((active & at_end) | iserr, 2 * iserr.astype(jnp.int32) + 1, 0),
                stall2,
            )

        trips = jnp.minimum(jnp.minimum(INNER, TBUF * L - tc), TMAX - t)
        p, osv, t, tc, done, _ = jax.lax.fori_loop(
            0, trips, inner, (p, osv, t, tc, done, jnp.int32(0))
        )
        # ADVICE r2: a segment whose final tag fills TMAX exactly leaves
        # trips == 0 with at_end unobserved — spot the clean end here
        done = done | jnp.where((p == slen) | (osv >= seg_end), 1, 0)
        return p, osv, t, tc, wb2, done, rounds + 1

    z = jnp.int32(0)
    init = (p0, os0, z, z, z, jnp.where(active_seg, 0, 1), z)
    p_f, os_f, ntags, tc_f, _wb, done_w, _r = jax.lax.while_loop(
        outer_cond, outer_body, init
    )
    walk_err = (done_w >= 3) | (done_w == 0)

    @pl.when((tc_f > 0) & active_seg)
    def _():
        fr = (ntags - tc_f) >> 7
        cp = pltpu.make_async_copy(tbuf_smem, tpos_ref.at[pl.ds(fr, TBUF)], sem)
        cp.start()
        cp.wait()

    # --------------------------------------------- fields + output starts
    ap_t = ap_ref[0:WINR, :]
    kf_t = kf_ref[...]
    FN = 16
    ngroups = (ntags + FN * L - 1) // (FN * L)

    def fields_grp(g, _):
        r0 = pl.multiple_of(g * FN, 8)
        prod8, kf8 = kl.gather_rows_multi(
            [(ap_t, 29), (kf_t, 17)], tpos_ref, r0, nrows=FN
        )
        tprod_ref[pl.ds(r0, FN), :] = prod8
        tkf_ref[pl.ds(r0, FN), :] = kf8
        return 0

    jax.lax.fori_loop(0, ngroups, fields_grp, 0)

    # ls_abs per tag = babs + tpos_local + hdr; hdr from kf? recompute hdr by
    # re-parsing the tag byte is messy — gather window-local ls instead
    lsw = jnp.clip(ls_ref[...] - babs, 0, P - 1)   # window-local literal src

    def ls_grp(g, _):
        r0 = pl.multiple_of(g * FN, 8)
        (ls8,) = kl.gather_rows_multi([(lsw, 18)], tpos_ref, r0, nrows=FN)
        tls_ref[pl.ds(r0, FN), :] = ls8
        return 0

    jax.lax.fori_loop(0, ngroups, ls_grp, 0)

    tagi = kl.row_iota(TROWS) < ntags
    # prod is exact to 2^24 in ap; the scan rides f32-exact saturating adds,
    # so cap at 2*SEG+1 — only the segment-ENDING tag can exceed that (any
    # earlier tag would have ended the segment), and its own output start
    # uses the exclusive prefix, which the cap never touches
    tprod_m = jnp.minimum(jnp.where(tagi, tprod_ref[...] >> 4, 0), SEG * 2 + 1)
    tin = kl.scan2d_mm(tprod_m, op="addsat", bits=24)     # within-segment sums
    tose_rel = (os0 - seg_start) + (tin - tprod_m)        # may start negative? no:
    # the walk enters this segment with os0 >= seg_start (tags are whole)
    tose_ref[...] = tose_rel
    total_abs = os_f
    # os_f is the walk's EXACT output position — catches a single giant
    # literal whose capped prod would slip past the tin check
    overrun = active_seg & (
        jnp.any(tagi & ((os0 + tin) > dlim)) | (os_f > dlim)
    )
    ev_over_seg = jnp.where(overrun, dlim, BIG)

    # --------------------------------------------------- cover scatter+fill
    kfd = tkf_ref[...]
    lsd = tls_ref[...]
    islit_d = kfd & 1
    key_d = tose_rel + 1
    live_tag = tagi & (tose_rel < SEG) & (tose_rel >= 0)
    tpos_ref[...] = jnp.where(live_tag, tose_rel, -1)
    tprod_ref[...] = (key_d << 15) | ((kfd >> 2) & 0x7FFF)   # off-1 (15b)
    tkf_ref[...] = (key_d << 15) | (lsd & 0x7FFF)
    tls_ref[...] = (
        (key_d << 15) | islit_d | (((lsd >> 15) & 7) << 1)
        | (((kfd >> 1) & 1) << 4)                            # bad-copy bit
    )

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

    # banded max-fill (block decoder's pattern): 5 row rounds cover tag
    # spans < 32 rows (4 KiB); rare longer in-segment literals trigger the
    # guarded row-doubling continuation
    maxprod = jnp.max(jnp.where(tagi, tprod_m, 0))
    H0f, s0s, t0s = kl.fill_max_rows(h0_ref[...], 31, 5)
    H1f, s1s, t1s = kl.fill_max_rows(h1_ref[...], 31, 5)
    H2f, s2s, t2s = kl.fill_max_rows(h2_ref[...], 31, 5)
    h0_ref[...] = H0f
    h1_ref[...] = H1f
    h2_ref[...] = H2f

    @pl.when(maxprod > 31 * L)
    def _():
        t0x, t1x, t2x = t0s, t1s, t2s
        for r in range(5, 8):
            if (1 << r) < CO:
                t0x = jnp.maximum(t0x, kl.row_shift_down(t0x, 1 << r, fill=kl.NEG))
                t1x = jnp.maximum(t1x, kl.row_shift_down(t1x, 1 << r, fill=kl.NEG))
                t2x = jnp.maximum(t2x, kl.row_shift_down(t2x, 1 << r, fill=kl.NEG))
        h0_ref[...] = jnp.maximum(s0s, kl.row_shift_down(t0x, 1, fill=kl.NEG))
        h1_ref[...] = jnp.maximum(s1s, kl.row_shift_down(t1x, 1, fill=kl.NEG))
        h2_ref[...] = jnp.maximum(s2s, kl.row_shift_down(t2x, 1, fill=kl.NEG))

    H0 = h0_ref[...]
    H1 = h1_ref[...]
    H2 = h2_ref[...]
    key_o = H0 >> 15
    fresh = key_o >= 1
    # straddle fallback: cells before the first in-segment tag are covered by
    # the carried tag from the previous segment
    sos = carry[C_SOS]
    skf = carry[C_SKF]
    sls = carry[C_SLS]
    t_os_rel = jnp.where(fresh, key_o - 1, sos - seg_start)
    off_o = jnp.where(fresh, H0 & 0x7FFF, (skf >> 2) & 0x7FFF) + 1  # off-1 undone
    bad_o = jnp.where(fresh, (H2 >> 4) & 1, (skf >> 1) & 1) == 1
    lsv = jnp.where(
        fresh,
        (H1 & 0x7FFF) | (((H2 >> 1) & 7) << 15),
        sls - babs,  # may be negative as an intermediate; lidx clips the sum
    )
    islit_o = jnp.where(fresh, H2 & 1, skf & 1) == 1
    valid = fresh | (sos >= 0)
    o = kl.row_iota(CO)                                  # segment-relative
    o_abs = o + seg_start
    live = valid & (o_abs < jnp.minimum(total_abs, jnp.int32(seg_end)))
    is_copy = live & ~islit_o
    t_os_abs = t_os_rel + seg_start
    copy_err = is_copy & (bad_o | (off_o > t_os_abs))
    ev_copy = jnp.where(
        active_seg, jnp.min(jnp.where(copy_err, o_abs, BIG)), BIG
    )
    # parent in 2*SEG table coords: history bytes 0..SEG-1, segment SEG..2SEG-1
    parent = jnp.where(is_copy & ~copy_err, SEG + o - off_o, SEG + o)
    par_ref[...] = jnp.clip(parent, 0, 2 * SEG - 1)
    lidx_ref[...] = jnp.clip(lsv + (o - t_os_rel), 0, P - 1) | (
        live.astype(jnp.int32) << 20
    )

    # ------------------------------------------------------------- resolve
    LVN = 16

    def lv_grp(g, _):
        r0 = pl.multiple_of(g * LVN, 8)
        (lv8,) = kl.gather_rows_multi(
            [(comp, 8)], lidx_ref, r0, nrows=LVN, pre=lambda r: r & 0xFFFFF
        )
        lv_ref[pl.ds(r0, LVN), :] = lv8
        return 0

    jax.lax.fori_loop(0, CO // LVN, lv_grp, 0)

    # doubling table = [history parents: frozen self-loops | segment parents]
    GN = 32
    NG = CO // GN
    BANDR = 64

    def band_round(rnd, _):
        def grp(g, _2):
            r0 = pl.multiple_of(g * GN, 8)
            band_lo = jnp.maximum(r0 + GN - BANDR, 0)
            tbl = par_ref[pl.ds(band_lo, BANDR), :]
            parg = par_ref[pl.ds(r0, GN), :]
            (newg,) = kl.gather_rows_multi(
                [(tbl, 16)], par_ref, r0, nrows=GN,
                pre=lambda r: r - SEG - band_lo * L,
            )
            in_band = parg >= SEG + band_lo * L   # frozen (<SEG) stays put
            upd = jnp.where(in_band, newg, parg)
            par_ref[pl.ds(r0, GN), :] = upd

            @pl.when(rnd == 2)
            def _():
                unresolved = (parg >= SEG) & (~in_band)
                gflags[g] = jnp.sum((unresolved | (upd != parg)).astype(jnp.int32))

            return 0

        jax.lax.fori_loop(0, NG, grp, 0)
        return 0

    jax.lax.fori_loop(0, 3, band_round, 0)

    def global_round(c):
        k, _ch = c
        seg_par = par_ref[...]

        def grp(g, ch):
            @pl.when(gflags[g] > 0)
            def _():
                r0 = pl.multiple_of(g * GN, 8)
                parg = par_ref[pl.ds(r0, GN), :]
                # gather from the virtual 2*SEG table: indices < SEG are
                # frozen (history) — gather from seg rows only where >= SEG
                (newg,) = kl.gather_rows_multi(
                    [(seg_par, 16)], par_ref, r0, nrows=GN,
                    pre=lambda r: jnp.clip(r - SEG, 0, SEG - 1),
                )
                frozen = parg < SEG
                upd = jnp.where(frozen, parg, newg)
                par_ref[pl.ds(r0, GN), :] = upd
                gflags[g] = jnp.sum((upd != parg).astype(jnp.int32))

            return ch + gflags[g]

        return k + 1, jax.lax.fori_loop(0, NG, grp, 0)

    jax.lax.while_loop(
        lambda c: (c[1] > 0) & (c[0] < GLOBAL_MAX), global_round, (z, jnp.int32(1))
    )

    # final: value = hist[par] if par < SEG else lv[par - SEG]
    hist_t = hist_ref[...]
    lv_t = lv_ref[...]

    def fin_grp(g, _):
        r0 = pl.multiple_of(g * LVN, 8)
        (vh,) = kl.gather_rows_multi([(hist_t, 8)], par_ref, r0, nrows=LVN)
        (vs,) = kl.gather_rows_multi(
            [(lv_t, 8)], par_ref, r0, nrows=LVN,
            pre=lambda r: jnp.clip(r - SEG, 0, SEG - 1),
        )
        parg = par_ref[pl.ds(r0, LVN), :]
        live8 = (lidx_ref[pl.ds(r0, LVN), :] >> 20) & 1
        val = jnp.where(parg < SEG, vh, vs)
        out8 = jnp.where(live8 > 0, val, 0)
        out_ref[0, pl.ds(r0, LVN), :] = out8
        lv_ref[pl.ds(r0, LVN), :] = out8        # lv becomes resolved bytes
        return 0

    jax.lax.fori_loop(0, CO // LVN, fin_grp, 0)
    hist_ref[...] = lv_ref[...]                  # next segment's history

    @pl.when(~active_seg)
    def _():
        out_ref[0, :, :] = jnp.zeros((CO, L), jnp.int32)

    # ------------------------------------------------- carry + status
    done_clean = done_w == 1
    ended = (p_f == slen) & (os_f < seg_end)     # stream consumed mid-segment
    malformed_here = walk_err & active_seg
    ev_end = jnp.where(malformed_here, os_f, BIG)
    ev_d_new = jnp.minimum(jnp.minimum(carry[C_EVD], ev_copy), ev_end)
    ev_o_new = jnp.minimum(carry[C_EVO], ev_over_seg)
    # straddle for the next segment: the last walked tag
    last_i = ntags - 1
    ti_flat = kl.row_iota(TROWS)
    pick = tagi & (ti_flat == last_i)
    new_sos = jnp.max(jnp.where(pick, tose_rel + seg_start, -1))
    new_skf = jnp.max(jnp.where(pick, kfd, 0))
    new_sls = jnp.max(jnp.where(pick, lsd + babs, 0))
    has_new = ntags > 0

    @pl.when(active_seg)
    def _():
        carry[C_P] = p_f
        carry[C_OS] = os_f
        carry[C_ERR] = jnp.where(malformed_here | (ev_copy < BIG), 1, carry[C_ERR])
        carry[C_DONE] = jnp.where(ended & done_clean, 1, 0)
        carry[C_EVD] = ev_d_new
        carry[C_EVO] = ev_o_new
        carry[C_SOS] = jnp.where(has_new, new_sos, carry[C_SOS])
        carry[C_SKF] = jnp.where(has_new, new_skf, carry[C_SKF])
        carry[C_SLS] = jnp.where(has_new, new_sls, carry[C_SLS])
        carry[C_CONS] = jnp.where(p_f == slen, 1, 0)

    evd = jnp.minimum(jnp.minimum(carry[C_EVD], ev_copy), ev_end)
    evo = jnp.minimum(carry[C_EVO], ev_over_seg)
    total_final = jnp.where(active_seg, os_f, carry[C_OS])
    consumed = jnp.where(active_seg, p_f == slen, carry[C_CONS] == 1)
    evd = jnp.minimum(evd, jnp.where(consumed, BIG, total_final))
    ok = (evd >= BIG) & (evo >= BIG)
    status = jnp.where(
        ok, E_OK, jnp.where(evd <= evo, E_DATA_MALFORMED, E_OUTPUT_OVERRUN)
    )
    meta_ref[0, 0] = jnp.where(status == E_OK, total_final, 0)
    meta_ref[0, 1] = status


@functools.lru_cache(maxsize=8)
def _compiled(CIT: int, NSEG: int):
    kern = functools.partial(_kernel, CIT=CIT)
    i32 = jnp.int32

    def call(slen, dlim, comp):
        return pl.pallas_call(
            kern,
            grid=(NSEG,),
            out_shape=(
                jax.ShapeDtypeStruct((NSEG, CO, L), i32),
                jax.ShapeDtypeStruct((1, 8), i32),
            ),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=(
                pl.BlockSpec((1, CO, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((WINR, L), i32),          # wcomp
                pltpu.VMEM((WINR + MAXW, L), i32),   # ap
                pltpu.VMEM((WINR, L), i32),          # kf
                pltpu.VMEM((WINR, L), i32),          # ls
                pltpu.VMEM((TROWS, L), i32),         # tpos
                pltpu.VMEM((TROWS, L), i32),         # tprod
                pltpu.VMEM((TROWS, L), i32),         # tkf
                pltpu.VMEM((TROWS, L), i32),         # tls
                pltpu.VMEM((TROWS, L), i32),         # tose
                pltpu.VMEM((CO, L), i32),            # h0
                pltpu.VMEM((CO, L), i32),            # h1
                pltpu.VMEM((CO, L), i32),            # h2
                pltpu.VMEM((CO, L), i32),            # par
                pltpu.VMEM((CO, L), i32),            # lv
                pltpu.VMEM((CO, L), i32),            # lidx
                pltpu.VMEM((CO, L), i32),            # hist
                pltpu.SMEM((16,), i32),              # carry
                pltpu.SMEM((MAXW, L), i32),          # walk window
                pltpu.SMEM((TBUF, L), i32),          # tag buffer
                pltpu.SMEM((32,), i32),              # doubling group flags
                pltpu.SemaphoreType.DMA,
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=prim.interpret_mode(),
        )(slen, dlim, comp)

    return jax.jit(call)


def _round_up(n: int, m: int) -> int:
    return (n + m - 1) // m * m


def decompress_noheader_np(src: np.ndarray, dst_len: int):
    """Whole-stream headerless decode (serving path).

    src: uint8[n]; returns (out uint8[dst_len], produced, status).
    """
    n = int(src.shape[0])
    CIT = _round_up(n, 1024) // L + WINR + MAXW
    CIT = _round_up(CIT, 8)
    NSEG = max(1, _round_up(max(dst_len, 1), SEG) // SEG)
    arr = np.zeros((CIT, L), np.uint8)
    arr.reshape(-1)[:n] = src
    fn = _compiled(CIT, NSEG)
    out, meta = fn(
        jnp.full((1,), n, np.int32),
        jnp.full((1,), dst_len, np.int32),
        jnp.asarray(arr.astype(np.int32)),
    )
    meta_np = np.asarray(meta)
    produced = int(meta_np[0, 0])
    out_np = np.asarray(out).reshape(NSEG * SEG)[:dst_len].astype(np.uint8)
    return out_np, produced, int(meta_np[0, 1])


prim.register_trace_cache(_compiled)
