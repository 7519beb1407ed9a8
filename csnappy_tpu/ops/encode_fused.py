"""Fused TPU block encoder — sort-based match finding + scalar greedy walk.

Round 1's encoder rode XLA scatter/gather formulations that serialize on
TPU (VERDICT r1: 0.8 MB/s).  This design splits the work by hardware unit:

  1. candidates (XLA, dense): hash every 4-byte window with the reference
     multiplier (csnappy_compress.c:228-232) and sort (hash<<15 | pos) keys
     — each position's sorted predecessor with equal hash IS its most
     recent prior occurrence.  This replaces the reference's lossy 2^16
     hash table (csnappy_compress.c:501,535-551) with an exact
     most-recent-match index; any match source is format-conformant
     (csnappy_compress.c:221-227).
  2. kernel: un-sort the candidate list with one-hot MXU scatters; compute
     next-candidate jump targets (suffix-min scan) so literal stretches
     cost O(1) walk steps, the vector analog of the reference's skip>>5
     literal acceleration (csnappy_compress.c:535-551).
  3. greedy walk (scalar unit + SMEM): the commit chain is sequential by
     nature (FindMatchLength + "jump len" greediness,
     csnappy_compress.c:469-606); a SCAN/EXTEND state machine walks it with
     the whole block resident in SMEM as packed LE words, extending matches
     word-at-a-time with the trailing-equal-bytes trick (the vector dual of
     FindMatchLength's ctz, csnappy_compress.c:252-295).  Emits compact
     (pos, len, off, is_match) tags, 64-byte chunked like EmitCopy
     (csnappy_compress.c:395-415).
  4. emission (dense): per-tag sizes -> output offsets by MXU add-scan;
     covering-tag map by one-hot scatter + running-max fill; every output
     byte computes its value densely (EmitLiteral/EmitCopyLessThan64 rules,
     csnappy_compress.c:332-415), with one one-hot gather for literal
     payload bytes.

Grammar guarantees: COPY_1 iff len<12 & offset<2048, no COPY_4, no
cross-block offsets, output <= 32 + n + n/6 (csnappy_compress.c:612-616).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models import wire
from . import kernel_lib as kl
from . import primitives as prim

L = 128
MAXW = 16         # SMEM walk-stream window rows (2 KiB of positions)
TBUF = 8          # SMEM tag buffer rows (1024 tags per flush)
INNER = 512       # walk steps per outer round
NOCAND = 0x7FFF   # candidate sentinel
NONEXT = 0xFFFF   # next-candidate sentinel


def _trows(BS: int) -> int:
    return ((BS // 2 + TBUF * L - 1) // (TBUF * L)) * TBUF


def _ocr(BS: int) -> int:
    return (wire.max_compressed_length(BS) + 1023) // 1024 * 8


def _srl(x, k):
    return jax.lax.shift_right_logical(x, k)


def _kernel(
    blen_ref, data_ref, w_ref, spos_ref, scand_ref,      # inputs
    comp_ref, meta_ref,                                  # outputs
    cand_ref, wst_ref, wpk_ref,                          # dense scratch
    t1_ref, t2_ref, spq_ref, sp1_ref, sp2_ref, sp3_ref,  # tag scratch
    h1_ref, h2_ref, h3_ref, vals_ref, lidx_ref,          # emission scratch
    sps_ref, scs_ref,                                    # sorted-input copies
    dpk_smem, wwin_smem, tb1_smem, tb2_smem, wsm, sem,   # SMEM + DMA
    *, BR: int, OCR: int, phases: int = 99,
):
    def _cut(n, *vals):
        if phases != n:
            return False
        acc = jnp.int32(0)
        for v in vals:
            acc = acc + jnp.sum(jnp.asarray(v).astype(jnp.int32))
        meta_ref[b, 0] = acc
        meta_ref[b, 1] = jnp.int32(0)
        comp_ref[0, 0:8, :] = jnp.zeros((8, L), jnp.int32) + acc
        return True
    BS, OCAP = BR * L, OCR * L
    BRW = BS // 4 // L                                   # packed-word rows
    BRP = BR + MAXW
    TR = _trows(BS)
    TMAX = TR * L
    MAX_ROUNDS = 4 * BS // INNER + TR // TBUF + 32
    b = pl.program_id(0)
    blen = blen_ref[b]
    data = data_ref[0]
    w = w_ref[0]
    pos = kl.row_iota(BR)

    # -------------------------------------------------- un-sort candidates
    sps_ref[...] = spos_ref[0]
    scs_ref[...] = scand_ref[0]
    cand_ref[...] = jnp.zeros((BR, L), jnp.int32)

    def unsort_grp(g, _):
        r0 = pl.multiple_of(g * 8, 8)
        (part,) = kl.scatter_rows_multi(sps_ref, [(scs_ref, 16)], r0, BR)
        cand_ref[...] += part
        return 0

    jax.lax.fori_loop(0, BR // 8, unsort_grp, 0)

    if _cut(1, cand_ref[...]):
        return

    # ---------------------------- dense candidate verification (MXU gather)
    # one gather of w[cand] refutes hash collisions up front, so the walk
    # never burns iterations on false candidates (FindMatchLength's 4-byte
    # entry check, csnappy_compress.c:539-551, done for every position at once)
    VN = min(16, BR)

    def ver_grp(g, _):
        r0 = pl.multiple_of(g * VN, 8)
        (wc,) = kl.gather_rows_multi(
            [(w, 32)], cand_ref, r0, nrows=VN,
            pre=lambda r: jnp.clip(r, 0, BS - 1),
        )
        candg = cand_ref[pl.ds(r0, VN), :]
        wrow = w_ref[0, pl.ds(r0, VN), :]
        ok = (candg != NOCAND) & (wc == wrow)
        cand_ref[pl.ds(r0, VN), :] = jnp.where(ok, candg, NOCAND)
        return 0

    jax.lax.fori_loop(0, BR // VN, ver_grp, 0)

    # ------------------------------------------- next-candidate jump table
    cand = cand_ref[...]
    has = (cand != NOCAND) & (pos + 4 <= blen) & (cand < pos)
    v = jnp.where(has, pos, NONEXT)
    nc = kl.flip2d(
        kl.scan2d_mm(kl.flip2d(v, 16), "min", bits=16, fill=NONEXT), 16
    )
    wst_ref[0:BR, :] = jnp.where(has, cand, NOCAND) | (nc << 16)
    wst_ref[BR:BRP, :] = jnp.full((MAXW, L), NOCAND | (NONEXT << 16), jnp.int32)

    if _cut(2, wst_ref[...]):
        return

    # --------------------------------- pack LE words 4-per-int32 into SMEM
    # packed[flat k] = w[4k]: row-stride-4 pick (Rq) + lane-stride-4 place
    # (Mq), moved as 8-bit limbs (TPU dots round inputs to bf16; limbs are
    # exact, and limb extraction/reassembly is sign-correct for full int32)
    ri = jax.lax.broadcasted_iota(jnp.int32, (BRW, BR), 0)
    rj = jax.lax.broadcasted_iota(jnp.int32, (BRW, BR), 1)
    mi = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    mj = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    packed = jnp.zeros((BRW, L), jnp.int32)
    for q in range(4):
        Rq = (rj == 4 * ri + q).astype(jnp.float32)      # (BRW, BR)
        Mq = (
            (mj >= 32 * q) & (mj < 32 * (q + 1)) & (mi == 4 * (mj - 32 * q))
        ).astype(jnp.float32)                            # (L, L)
        rows = kl.perm_apply(w, Rq, 32, left=True)       # (BRW, L)
        packed = packed | kl.perm_apply(rows, Mq, 32)
    wpk_ref[...] = packed
    cpd = pltpu.make_async_copy(wpk_ref, dpk_smem, sem)
    cpd.start()
    cpd.wait()

    if _cut(3, wpk_ref[...]):
        return

    # --------------------------------------------------------- greedy walk
    # State lives in SMEM cells so each mode runs as a pl.when-specialized
    # branch (only the active mode's ops execute per iteration; the
    # everything-both-ways formulation measured ~95 cycles/step).
    S_P, S_LITS, S_T, S_TC, S_MODE, S_MS, S_MC, S_J, S_DONE, S_STALL, S_FL, S_WB = range(12)
    for cell in range(12):
        wsm[cell] = 0

    cp0 = pltpu.make_async_copy(wst_ref.at[0:MAXW], wwin_smem, sem)
    cp0.start()
    cp0.wait()

    def w_at(idx):
        """LE 4-byte word at byte index idx, from packed SMEM words."""
        k = jnp.clip(idx >> 2, 0, BRW * L - 1)
        r = idx & 3
        k2 = jnp.minimum(k + 1, BRW * L - 1)
        a = dpk_smem[k >> 7, k & (L - 1)]
        c = dpk_smem[k2 >> 7, k2 & (L - 1)]
        comb = _srl(a, 8 * r) | jax.lax.shift_left(c, (32 - 8 * r) & 31)
        return jnp.where(r == 0, a, comb)

    def _flush():
        tc = wsm[S_TC]
        frows = tc >> 7
        tail = tc & (L - 1)

        @pl.when(frows > 0)
        def _():
            dst = wsm[S_FL] >> 7
            c1 = pltpu.make_async_copy(tb1_smem, t1_ref.at[pl.ds(dst, TBUF)], sem)
            c1.start()
            c1.wait()
            c2 = pltpu.make_async_copy(tb2_smem, t2_ref.at[pl.ds(dst, TBUF)], sem)
            c2.start()
            c2.wait()
            wsm[S_FL] = wsm[S_FL] + frows * L

            def mv(i, _):
                @pl.when(i < tail)
                def _():
                    src_r = jnp.minimum(frows, TBUF - 1)
                    tb1_smem[0, i] = tb1_smem[src_r, i]
                    tb2_smem[0, i] = tb2_smem[src_r, i]
                return 0

            jax.lax.fori_loop(0, L, mv, 0)
            wsm[S_TC] = tail

    def outer_cond(c):
        return (c[1] == 0) & (c[0] < MAX_ROUNDS)

    def outer_body(c):
        rounds, _done = c

        @pl.when(wsm[S_TC] >= TBUF * L - 1)
        def _():
            _flush()

        p0 = wsm[S_P]
        iw0 = p0 - wsm[S_WB] * L
        needw = (iw0 < 0) | (iw0 >= MAXW * L)

        @pl.when(needw)
        def _():
            wb2 = jnp.minimum(p0 >> 7, BRP - MAXW)
            wsm[S_WB] = wb2
            cw = pltpu.make_async_copy(wst_ref.at[pl.ds(wb2, MAXW)], wwin_smem, sem)
            cw.start()
            cw.wait()

        wsm[S_STALL] = 0
        wb2 = wsm[S_WB]

        def inner(i, _):
            act = (wsm[S_DONE] == 0) & (wsm[S_STALL] == 0)
            mode = wsm[S_MODE]

            @pl.when(act & (mode == 0))
            def _scan():
                p = wsm[S_P]
                at_end = p >= blen

                @pl.when(at_end)
                def _():
                    lits = wsm[S_LITS]
                    tc = wsm[S_TC]
                    pend = lits < blen

                    @pl.when(pend & (tc < TBUF * L))
                    def _():
                        tb1_smem[tc >> 7, tc & (L - 1)] = lits | ((blen - lits) << 15)
                        tb2_smem[tc >> 7, tc & (L - 1)] = 0
                        wsm[S_TC] = tc + 1
                        wsm[S_T] = wsm[S_T] + 1
                        wsm[S_DONE] = 1

                    @pl.when(pend & (tc >= TBUF * L))
                    def _():
                        wsm[S_STALL] = 1

                    @pl.when(~pend)
                    def _():
                        wsm[S_DONE] = 1

                iw = p - wb2 * L
                inwin = (iw >= 0) & (iw < MAXW * L)

                @pl.when(~at_end & ~inwin)
                def _():
                    wsm[S_STALL] = 1

                @pl.when(~at_end & inwin)
                def _():
                    iwc = jnp.clip(iw, 0, MAXW * L - 1)
                    v = wwin_smem[iwc >> 7, iwc & (L - 1)]
                    cand = v & 0xFFFF
                    nc = _srl(v, 16) & 0xFFFF

                    @pl.when(cand == NOCAND)
                    def _():
                        wsm[S_P] = jnp.clip(jnp.maximum(nc, p + 1), 0, blen)

                    @pl.when(cand != NOCAND)
                    def _():
                        # pre-verified: first 4 bytes are known equal
                        wsm[S_MODE] = 1
                        wsm[S_MS] = p
                        wsm[S_MC] = cand
                        wsm[S_J] = 4

            @pl.when(act & (mode == 1))
            def _extend():
                ms = wsm[S_MS]
                mc = wsm[S_MC]
                j = wsm[S_J]
                rem = blen - ms
                mlmax = jnp.minimum(rem, wire.MAX_COPY_LEN)
                x1 = w_at(ms + j) ^ w_at(mc + j)
                x2 = w_at(ms + j + 4) ^ w_at(mc + j + 4)
                x3 = w_at(ms + j + 8) ^ w_at(mc + j + 8)
                x4 = w_at(ms + j + 12) ^ w_at(mc + j + 12)
                allz = (x1 == 0) & (x2 == 0) & (x3 == 0) & (x4 == 0)
                cont = allz & (j + 16 < mlmax)

                @pl.when(cont)
                def _():
                    wsm[S_J] = j + 16

                @pl.when(~cont)
                def _():
                    def teq(x):
                        return jnp.where(
                            x == 0, 4,
                            ((x & 0xFF) == 0).astype(jnp.int32)
                            + ((x & 0xFFFF) == 0).astype(jnp.int32)
                            + ((x & 0xFFFFFF) == 0).astype(jnp.int32),
                        )

                    run = jnp.where(
                        x1 != 0, teq(x1),
                        4 + jnp.where(
                            x2 != 0, teq(x2),
                            4 + jnp.where(x3 != 0, teq(x3), 4 + teq(x4)),
                        ),
                    )
                    ml = jnp.minimum(j + run, mlmax)
                    good = ml >= wire.MIN_MATCH

                    @pl.when(~good)
                    def _():
                        wsm[S_MODE] = 0  # failed continuation; rescan at p

                    @pl.when(good)
                    def _():
                        tc = wsm[S_TC]

                        @pl.when(tc + 2 > TBUF * L)
                        def _():
                            wsm[S_STALL] = 1

                        @pl.when(tc + 2 <= TBUF * L)
                        def _():
                            lits = wsm[S_LITS]
                            needlit = (lits < ms).astype(jnp.int32)

                            @pl.when(needlit > 0)
                            def _():
                                tb1_smem[tc >> 7, tc & (L - 1)] = lits | ((ms - lits) << 15)
                                tb2_smem[tc >> 7, tc & (L - 1)] = 0

                            tc1 = tc + needlit
                            tb1_smem[tc1 >> 7, tc1 & (L - 1)] = (
                                ms | (ml << 15) | jnp.int32(-(2**31))
                            )
                            tb2_smem[tc1 >> 7, tc1 & (L - 1)] = ms - mc
                            wsm[S_TC] = tc1 + 1
                            wsm[S_T] = wsm[S_T] + needlit + 1
                            p2 = ms + ml
                            wsm[S_P] = p2
                            wsm[S_LITS] = p2
                            longer = (ml == wire.MAX_COPY_LEN) & (rem > wire.MAX_COPY_LEN)

                            @pl.when(longer)
                            def _():
                                wsm[S_MS] = ms + wire.MAX_COPY_LEN
                                wsm[S_MC] = mc + wire.MAX_COPY_LEN
                                wsm[S_J] = 0

                            @pl.when(~longer)
                            def _():
                                wsm[S_MODE] = 0

            return 0

        jax.lax.fori_loop(0, INNER, inner, 0)
        return rounds + 1, wsm[S_DONE]

    z = jnp.int32(0)
    jax.lax.while_loop(outer_cond, outer_body, (z, z))
    _flush()

    @pl.when(wsm[S_TC] > 0)
    def _():
        dst = wsm[S_FL] >> 7
        c1 = pltpu.make_async_copy(tb1_smem, t1_ref.at[pl.ds(dst, TBUF)], sem)
        c1.start()
        c1.wait()
        c2 = pltpu.make_async_copy(tb2_smem, t2_ref.at[pl.ds(dst, TBUF)], sem)
        c2.start()
        c2.wait()

    ntags = wsm[S_T]
    done_f = wsm[S_DONE]

    if _cut(4, ntags, t1_ref[...], t2_ref[...]):
        return

    # ------------------------------------------------------------ emission
    ti = kl.row_iota(TR) < ntags
    t1v = t1_ref[0:TR, :]
    ism = _srl(t1v, 31)
    pos_t = t1v & 0x7FFF
    len_t = _srl(t1v, 15) & 0xFFFF
    off_t = t2_ref[0:TR, :]
    rl1 = jnp.maximum(len_t - 1, 0)
    extra_t = jnp.where(rl1 < 60, 0, jnp.where(rl1 < 256, 1, 2)) * (1 - ism)
    use_c1 = (ism == 1) & (len_t <= wire.COPY1_MAX_LEN) & (off_t < wire.COPY1_MAX_OFFSET)
    sz = jnp.where(
        ism == 1, jnp.where(use_c1, 2, 3), 1 + extra_t + len_t
    )
    sz = jnp.where(ti, sz, 0)
    incl = kl.scan2d_mm(sz, "add", bits=16)
    comp_len = jnp.max(incl)
    ooff = incl - sz

    key = ooff + 1
    spq_ref[...] = jnp.where(ti & (ooff < OCAP), ooff, -1)
    sp1_ref[...] = (key << 15) | pos_t
    sp2_ref[...] = (key << 15) | (jnp.where(ism == 1, off_t, rl1) & 0x7FFF)
    sp3_ref[...] = (
        (key << 15) | ism | (use_c1.astype(jnp.int32) << 1)
        | ((len_t & 0x7F) << 2) | (extra_t << 9)
    )
    if _cut(5, spq_ref[...], sp1_ref[...], sp2_ref[...], sp3_ref[...], comp_len):
        return

    zero = jnp.zeros((OCR, L), jnp.int32)
    h1_ref[...] = zero
    h2_ref[...] = zero
    h3_ref[...] = zero
    ngroups = (ntags + 8 * L - 1) // (8 * L)

    def scat_grp(g, _):
        r0 = pl.multiple_of(g * 8, 8)
        parts = kl.scatter_rows_multi(
            spq_ref, [(sp1_ref, 31), (sp2_ref, 31), (sp3_ref, 31)], r0, OCR
        )
        h1_ref[...] += parts[0]
        h2_ref[...] += parts[1]
        h3_ref[...] += parts[2]
        return 0

    jax.lax.fori_loop(0, ngroups, scat_grp, 0)

    H1 = kl.scan2d_mm(h1_ref[...], "max", bits=31)
    H2 = kl.scan2d_mm(h2_ref[...], "max", bits=31)
    H3 = kl.scan2d_mm(h3_ref[...], "max", bits=31)
    if _cut(6, H1, H2, H3):
        return

    o = kl.row_iota(OCR)
    key0 = _srl(H1, 15)
    valid = key0 >= 1
    too = key0 - 1
    delta = o - too
    tpos_o = H1 & 0x7FFF
    aux = H2 & 0x7FFF
    f3 = H3 & 0x7FFF
    ism_o = (f3 & 1) == 1
    c1_o = ((f3 >> 1) & 1) == 1
    len_o = (f3 >> 2) & 0x7F
    ext_o = (f3 >> 9) & 3

    litop = jnp.where(aux < 60, aux << 2, (59 + ext_o) << 2)
    sh = 8 * jnp.clip(delta - 1, 0, 3)
    trailer = _srl(aux, sh) & 0xFF
    val_lit = jnp.where(delta == 0, litop, trailer)
    ispay = (~ism_o) & (delta > ext_o)

    c1v = jnp.where(
        delta == 0,
        wire.TAG_COPY_1 | ((len_o - wire.MIN_MATCH) << 2) | (_srl(aux, 8) << 5),
        aux & 0xFF,
    )
    c2v = jnp.where(
        delta == 0,
        wire.TAG_COPY_2 | ((len_o - 1) << 2),
        jnp.where(delta == 1, aux & 0xFF, _srl(aux, 8) & 0xFF),
    )
    val = jnp.where(ism_o, jnp.where(c1_o, c1v, c2v), val_lit) & 0xFF
    live = valid & (o < comp_len)
    vals_ref[...] = jnp.where(live, val, 0) | jnp.where(ispay & live, 1 << 8, 0)
    lidx_ref[...] = jnp.clip(tpos_o + delta - 1 - ext_o, 0, BS - 1)

    def fin_grp(g, _):
        r0 = pl.multiple_of(g * 8, 8)
        (pay8,) = kl.gather_rows_multi([(data, 8)], lidx_ref, r0)
        v8 = vals_ref[pl.ds(r0, 8), :]
        comp_ref[0, pl.ds(r0, 8), :] = jnp.where((v8 >> 8) & 1 > 0, pay8, v8 & 0xFF)
        return 0

    jax.lax.fori_loop(0, OCR // 8, fin_grp, 0)

    meta_ref[b, 0] = comp_len
    meta_ref[b, 1] = jnp.where(done_f > 0, 0, 1)   # 1 = walk bound exhausted
    meta_ref[b, 2] = ntags


@functools.lru_cache(maxsize=16)
def _compiled(B: int, BR: int, hash_bits: int = 16, phases: int = 99):
    BS = BR * L
    OCR = _ocr(BS)
    TR = _trows(BS)
    BRP = BR + MAXW
    BRW = BS // 4 // L
    kern = functools.partial(_kernel, BR=BR, OCR=OCR, phases=phases)
    i32 = jnp.int32

    def run(data, blens):
        # dense prep + exact most-recent-match candidates via sort (XLA)
        flat = data.reshape(B, BS)
        z = jnp.zeros((B, 4), i32)
        ext = jnp.concatenate([flat, z], axis=1)
        w = (
            flat
            | (ext[:, 1 : BS + 1] << 8)
            | (ext[:, 2 : BS + 2] << 16)
            | (ext[:, 3 : BS + 3] << 24)
        )
        h = _srl(w * np.int32(wire.HASH_MULTIPLIER), 32 - hash_bits)
        posf = jnp.arange(BS, dtype=i32)[None, :]
        keys = (h << 15) | posf
        sk = jnp.sort(keys, axis=1)
        prevk = jnp.concatenate([jnp.full((B, 1), -1, i32), sk[:, :-1]], axis=1)
        same = _srl(sk, 15) == _srl(prevk, 15)
        spos = sk & 0x7FFF
        scand = jnp.where(same, prevk & 0x7FFF, NOCAND)

        comp, meta = pl.pallas_call(
            kern,
            grid=(B,),
            out_shape=(
                jax.ShapeDtypeStruct((B, OCR, L), i32),
                jax.ShapeDtypeStruct((B, 8), i32),
            ),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, BR, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BR, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BR, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BR, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, OCR, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((BR, L), i32),            # cand
                pltpu.VMEM((BRP, L), i32),           # wst
                pltpu.VMEM((BRW, L), i32),           # wpk
                pltpu.VMEM((TR + TBUF, L), i32),     # t1 (+flush slack)
                pltpu.VMEM((TR + TBUF, L), i32),     # t2 (+flush slack)
                pltpu.VMEM((TR, L), i32),            # spq
                pltpu.VMEM((TR, L), i32),            # sp1
                pltpu.VMEM((TR, L), i32),            # sp2
                pltpu.VMEM((TR, L), i32),            # sp3
                pltpu.VMEM((OCR, L), i32),           # h1
                pltpu.VMEM((OCR, L), i32),           # h2
                pltpu.VMEM((OCR, L), i32),           # h3
                pltpu.VMEM((OCR, L), i32),           # vals
                pltpu.VMEM((OCR, L), i32),           # lidx
                pltpu.VMEM((BR, L), i32),            # sps copy
                pltpu.VMEM((BR, L), i32),            # scs copy
                pltpu.SMEM((BRW, L), i32),           # packed words
                pltpu.SMEM((MAXW, L), i32),          # walk-stream window
                pltpu.SMEM((TBUF, L), i32),          # tag buffer 1
                pltpu.SMEM((TBUF, L), i32),          # tag buffer 2
                pltpu.SMEM((16,), i32),              # walk state cells
                pltpu.SemaphoreType.DMA,
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024,
            ),
            interpret=prim.interpret_mode(),
        )(blens, data.reshape(B, BR, L), w.reshape(B, BR, L),
          spos.reshape(B, BR, L), scand.reshape(B, BR, L))
        return comp, meta

    return jax.jit(run)


def _round_up(n: int, m: int) -> int:
    return (n + m - 1) // m * m


def encode_blocks(data: np.ndarray, blens: np.ndarray, hash_bits: int = 16):
    """Compress B independent fragments (fused kernel).

    data: uint8[B, bs] zero-padded, bs <= 32768 a multiple of 1024;
    blens: int[B].  Returns (comp uint8[B, ocap], comp_lens int32[B]).
    """
    B, bs = data.shape
    BSP = _round_up(max(bs, 1024), 1024)
    Bp = _round_up(max(B, 1), 8)
    arr = np.zeros((Bp, BSP), np.uint8)
    arr[:B, :bs] = data
    lens = np.zeros((Bp,), np.int32)
    lens[:B] = blens
    fn = _compiled(Bp, BSP // L, hash_bits)
    comp, meta = fn(jnp.asarray(arr.astype(np.int32)), jnp.asarray(lens))
    OCR = _ocr(BSP)
    comp_np = np.asarray(comp).reshape(Bp, OCR * L).astype(np.uint8)
    meta_np = np.asarray(meta)
    if (meta_np[:B, 1] != 0).any():
        raise RuntimeError("encoder walk exhausted its round bound")
    return comp_np[:B], meta_np[:B, 0]


def compress_np(data: bytes | np.ndarray, block_size: int = wire.BLOCK_SIZE,
                hash_bits: int = 16) -> bytes:
    """Whole-stream compress: varint preamble + independent 32 KiB fragments
    (csnappy_compress.c:621-656 semantics), batched on device."""
    buf = np.frombuffer(data, np.uint8) if isinstance(data, (bytes, bytearray)) else data
    n = len(buf)
    out = bytearray(wire.varint_encode(n))
    if n == 0:
        return bytes(out)
    BS = block_size
    nb = (n + BS - 1) // BS
    padded = np.zeros((nb, BS), np.uint8)
    padded.reshape(-1)[:n] = buf
    blens = np.full((nb,), BS, np.int32)
    blens[-1] = n - (nb - 1) * BS
    comp, lens = encode_blocks(padded, blens, hash_bits)
    for i in range(nb):
        out += comp[i, : lens[i]].tobytes()
    return bytes(out)


prim.register_trace_cache(_compiled)
