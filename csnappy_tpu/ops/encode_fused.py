"""Fused TPU block encoder — dense successor precomputation + slim walk.

Round-3 architecture (VERDICT r2 #2).  Round 2 proved the sort-based exact
match index but ran a ~100-cycle/step SMEM state machine for the greedy
commit chain (~90% of encode time).  This design makes the commit chain's
successor function a PRECOMPUTED dense table, so the serial walk is the
same slim load/store chain-following as the decoder's:

  1. candidates (XLA, dense): stable-sort every position by its FULL
     4-byte window (w, pos) — each position's sorted predecessor with an
     equal window IS its most recent prior occurrence, exactly, with no
     hash and no verification gather.  Replaces the reference's lossy 2^16
     hash table (csnappy_compress.c:501,535-551, multiplier :228-232); any
     match source is format-conformant (csnappy_compress.c:221-227).
     Sorts and the suffix scans (chain floor, next-candidate) ride XLA,
     where they are near-free; gathers stay in-kernel on the MXU (XLA TPU
     gathers measured 100x slower, tools/mosaic_probe3c).
  2. dense match lengths (XLA, carried by the sort): the sort carries the
     windows at p+4/p+8/p+12 as extra operands, so the LCP against the
     sorted predecessor — the vector FindMatchLength
     (csnappy_compress.c:252-295) — is an elementwise XOR/compare in
     sorted order, up to 16 bytes, with NO gathers anywhere.  The chain
     floor adds run lengths on top: consecutive candidate chains
     (cand[p+1]==cand[p]+1) prove 4+run matching bytes inductively.
     Matches longer than 16 commit short — still a conformant stream
     (any length <= the true match conforms, csnappy_compress.c:221-227)
     at ~1% ratio cost — keeping the serial walk entirely branchless.
  3. dense successors: succ(p) = nextc(p + ml[p]) composes through literal
     gaps (the vector analog of the skip>>5 literal acceleration,
     csnappy_compress.c:535-551), so every walk step lands on a commit;
     adjacent commits fuse into one entry (2 commits per serial step).
  4. walk (scalar + SMEM): decode-grade branchless chain following over
     the precomputed entry table at ~15ns/step, storing ONE position per
     step.
  5. emission (dense): literal gaps derived from consecutive commit ends;
     four parallel record streams (litA/copyA/litB/copyB) sized, offset by
     triangular-matmul add-scan, scattered (EmitLiteral/EmitCopy rules,
     csnappy_compress.c:332-415), and valued per output byte with one
     payload gather.

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
INNER = 256       # walk steps per outer round (end checked between rounds)
NOCAND = 0x7FFF   # candidate sentinel
# Carried LCP windows (direct LCP cap = 4 + 4*EXTRAS).  r5 A/B on urls.10K
# (tools/extras_ab.py, records/extras_ab_r5.txt): each carried operand costs
# ~0.15 ms of XLA sort prep per 24-block batch; the staircase propagation
# recovers most long matches, so EXTRAS=2 compresses to 354,567 B (ref
# 357,267) at 246 MB/s vs EXTRAS=7's 344,271 B at 174 MB/s.  EXTRAS=1
# misses the reference ratio (360,200) — 2 is the floor.  Set 7 for
# maximum-ratio batch compression.
EXTRAS = 2


def _trows(BS: int) -> int:
    # stored walk steps: paired stores retire TWO commits (<= BS/8 of
    # them); unpaired stores need commit spacing > 127 (<= BS/128); + 1
    # terminal.  Rounded to a full 16-row gather group so the last
    # residual scatter group never reads past the step refs (r5).
    return (BS // 8 // L + BS // 128 // L + 1 + 15) // 16 * 16


def _ocr(BS: int) -> int:
    return (wire.max_compressed_length(BS) + 1023) // 1024 * 8


def _srl(x, k):
    return jax.lax.shift_right_logical(x, k)


def _bounded_gather(table, dist, bits_fill=0):
    """y[flat p] = table[flat p + dist[p]] for 0 <= dist <= 191 (parent at
    most one row ahead): two native lane gathers + select."""
    lane = jax.lax.broadcasted_iota(jnp.int32, table.shape, 1)
    q = (lane + dist) & (L - 1)
    g0 = kl.lane_gather(table, q)
    g1 = kl.lane_gather(kl.row_shift_up(table, 1, fill=bits_fill), q)
    return jnp.where((lane + dist) >> 7 == 0, g0, g1)


NBE = 4           # blocks per grid step (4-chain interleaved walk, r4)


def _kernel(
    blen_ref, data_ref, in1_ref, nc_ref,                 # inputs (NBE-blocked)
    comp_ref, meta_ref,                                  # outputs
    ml_ref, wtab_ref, m2d_ref, o2d_ref,                  # dense scratch (NBE*BR(+1), L)
    tpos_ref, tpos2_ref, m1_ref, o1_ref, m2_ref, o2_ref, # step fields (TR, L)
    sq_ref, s1_ref, s2_ref, s3_ref,                      # scatter stage (TR, L)
    h1_ref, h2_ref, h3_ref, vals_ref, lidx_ref,          # emission (OCR, L)
    w_smem, tag_smem, sem,                               # SMEM + DMA
    *, BR: int, OCR: int, phases: int = 99,
):
    BS, OCAP = BR * L, OCR * L
    TR = _trows(BS)
    TGRE = TR + 8
    # steps = commits (<= BS/4, each >= 4 output bytes) + jumps (only after
    # EXT commits, <= commits) + 1 — bound generously, converged walks exit
    # via the p-stuck check long before this
    MAX_ROUNDS = BS // 2 // INNER + 8
    gi = pl.program_id(0)
    pos = kl.row_iota(BR)

    def _cut(n, *vals):
        if phases != n:
            return False
        acc = jnp.int32(0)
        for v in vals:
            a = jnp.asarray(v).astype(jnp.int32)
            a = a[: min(8, a.shape[0])] if a.ndim >= 1 else a
            acc = acc + jnp.sum(a)
        meta_ref[gi * NBE, 0] = acc
        meta_ref[gi * NBE, 1] = jnp.int32(0)
        comp_ref[0, 0:8, :] = jnp.zeros((8, L), jnp.int32) + acc
        return True

    # --------------------------------------------- dense successors (per j)
    # match lengths arrive fully computed from the XLA prep (staircase-
    # propagated LCP capped at MAX_COPY_LEN), so the dense side runs NO
    # gathers at all beyond the two bounded lane-gathers below.
    blens = [blen_ref[gi * NBE + j] for j in range(NBE)]
    cut12 = []
    for j in range(NBE):
        in1 = in1_ref[j]
        nc = nc_ref[j]
        cand = in1 & 0x7FFF
        ml = _srl(in1, 15) & 0x7F
        has = (_srl(in1, 22) & 1) > 0
        ml_ref[pl.ds(j * BR, BR), :] = jnp.where(has, ml, 0)

        # successors composed through literal gaps so every walk step lands
        # on a commit (the vector analog of the skip>>5 literal
        # acceleration, csnappy_compress.c:535-551)
        nextc = jnp.where(has, pos, nc)
        succ = _bounded_gather(nextc, ml, bits_fill=BS)
        succ = jnp.where(pos + ml >= BS, BS, succ)
        d1 = jnp.where(succ < BS, succ - pos, 0)
        # partner lookup for pair fusion (2 commits retire per walk step)
        d1b = jnp.where((d1 >= 1) & (d1 <= 127), d1, 0)
        Ep = _bounded_gather(d1, d1b)
        pd = Ep & 0xFFFF
        paired = has & (d1 >= 1) & (d1 <= 127)
        d2 = jnp.where(pd > 0, d1 + pd, BS - pos)
        # partner FIELDS precomputed densely (r5): ml and commit offset of
        # the paired partner via the same bounded lane gathers, so the
        # fields phase serves both streams from ONE row-gather call instead
        # of a second, dependent call at pos+d1
        mlv = jnp.where(has, ml, 0)
        candv = jnp.where(cand == NOCAND, 0, cand)
        ml2d = _bounded_gather(mlv, d1b)
        cnd2 = _bounded_gather(candv, d1b)
        pairedi = paired.astype(jnp.int32)
        m2_ref_d = ml2d * pairedi
        o2_ref_d = (pos + d1 - cnd2) * pairedi
        m2d_ref[pl.ds(j * BR, BR), :] = m2_ref_d
        o2d_ref[pl.ds(j * BR, BR), :] = o2_ref_d
        # walk entry layout (fully branchless, like the decoder's):
        #   bit30 = store flag (commit entries store their position)
        #   bits 23-29 = paired partner delta d1 (0 when unpaired)
        #   bits 0-16 = advance (next entry position, pre-baked: pair skip,
        #               literal-gap jump, or off-the-end for the last commit)
        STORE = 1 << 30
        adv_un = jnp.where(d1 > 0, d1, BS - pos)
        w_has = jnp.where(paired, STORE | (d1 << 23) | d2, STORE | adv_un)
        w_nohas = jnp.where(nc < BS, nc - pos, 0)
        # strided region with a zeroed guard row at local position BS: the
        # interleaved walk reads at p == blen == BS with no per-step clamp
        wtab_ref[pl.ds(j * (BR + 1), BR), :] = jnp.where(has, w_has, w_nohas)
        wtab_ref[pl.ds(j * (BR + 1) + BR, 1), :] = jnp.zeros((1, L), jnp.int32)
        cut12.extend([ml_ref[pl.ds(j * BR, 8), :], wtab_ref[pl.ds(j * (BR + 1), 8), :]])

    cpw = pltpu.make_async_copy(wtab_ref, w_smem, sem)
    cpw.start()
    cpw.wait()

    if _cut(1, *cut12):
        return
    if _cut(2, *cut12):
        return
    if _cut(3, *cut12):
        return

    # --------------------------------------------------------- greedy walk
    # four interleaved chains (one per block), exactly like the decoder's
    # (decode_fused phase 2): the dependent SMEM load chains are
    # independent across blocks, so the scalar unit overlaps their
    # latencies (21.6 -> 8.6 ns/step measured, mosaic_probe5).  Positions
    # and tag counters carry their region bases so the hot step is: load,
    # store, two adds, one shift-mask pair per chain.
    BASEW = [j * (BR + 1) * L for j in range(NBE)]
    TBASE = [j * TGRE * L for j in range(NBE)]
    ends = [blens[j] + BASEW[j] for j in range(NBE)]

    def outer_cond(c):
        return (c[1] == 0) & (c[0] < MAX_ROUNDS)

    def outer_body(c):
        rounds, _d = c[0], c[1]
        ps0 = c[2:2 + NBE]
        tcs0 = c[2 + NBE:2 + 2 * NBE]

        def step(i, c2):
            ps = c2[:NBE]
            tcs = c2[NBE:]
            nps, ntcs = [], []
            for j in range(NBE):
                p, tc = ps[j], tcs[j]
                v = w_smem[p >> 7, p & (L - 1)]
                tag_smem[tc >> 7, tc & (L - 1)] = p
                ntcs.append(tc + (_srl(v, 30) & 1))
                nps.append(p + (v & 0x1FFFF))
            return tuple(nps) + tuple(ntcs)

        res = jax.lax.fori_loop(0, INNER, step, tuple(ps0) + tuple(tcs0))
        ps = res[:NBE]
        tcs = res[NBE:]
        done = jnp.int32(1)
        for j in range(NBE):
            # every entry type advances p except END, so a stuck p IS the
            # clean end (trailing-literal region with no more candidates)
            done = done & ((ps[j] >= ends[j]) | (ps[j] == ps0[j])).astype(jnp.int32)
        return (rounds + 1, done) + tuple(ps) + tuple(tcs)

    z = jnp.int32(0)
    init = (z, z) + tuple(jnp.int32(b_) for b_ in BASEW) + tuple(
        jnp.int32(t_) for t_ in TBASE
    )
    fin = jax.lax.while_loop(outer_cond, outer_body, init)
    done_f = fin[1]
    tcfs = fin[2 + NBE:2 + 2 * NBE]
    # fail only when the round bound ran out mid-walk (never in practice)
    fail = jnp.where(done_f > 0, 0, 1)
    for j in range(NBE):
        # virtual trailing slot at blen: its dense ml/d1 are 0, so emission
        # derives the trailing literal (csnappy_compress.c:600-605) densely
        tag_smem[tcfs[j] >> 7, tcfs[j] & (L - 1)] = ends[j]
    nsteps_all = [tcfs[j] - TBASE[j] + 1 for j in range(NBE)]

    if _cut(4, *nsteps_all):
        return

    # ------------------------------------- per-block emission (phases 5-8)
    cutacc = []
    for j in range(NBE):
        b = gi * NBE + j
        blen = blens[j]
        nsteps = nsteps_all[j]
        data = data_ref[j]

        cpt = pltpu.make_async_copy(tag_smem.at[pl.ds(j * TGRE, TR)], tpos_ref, sem)
        cpt.start()
        cpt.wait()

        # --------------------------------------------------------- fields
        FN = 16
        ngroups = (nsteps + FN * L - 1) // (FN * L)
        mlT = ml_ref[pl.ds(j * BR, BR), :]
        wt = wtab_ref[pl.ds(j * (BR + 1), BR), :]
        in1j = in1_ref[j]
        candT = jnp.where((in1j & 0x7FFF) == NOCAND, 0, in1j & 0x7FFF)
        d1T = _srl(wt, 23) & 0x7F
        m2T = m2d_ref[pl.ds(j * BR, BR), :]
        o2T = o2d_ref[pl.ds(j * BR, BR), :]

        def fields_grp(g, _):
            r0 = pl.multiple_of(g * FN, 8)
            posA = tpos_ref[pl.ds(r0, FN), :] - BASEW[j]
            # both streams from ONE gather (partner fields are dense, r5)
            mlA, cg, d1q, m2g, o2g = kl.gather_rows_multi(
                [(mlT, 7), (candT, 15), (d1T, 7), (m2T, 7), (o2T, 16)],
                tpos_ref, r0, nrows=FN,
                pre=lambda r: r - BASEW[j],   # walk stores region-based p
            )
            tpos2_ref[pl.ds(r0, FN), :] = posA + d1q
            m1_ref[pl.ds(r0, FN), :] = mlA
            o1_ref[pl.ds(r0, FN), :] = posA - cg
            m2_ref[pl.ds(r0, FN), :] = m2g
            o2_ref[pl.ds(r0, FN), :] = o2g
            return 0

        jax.lax.fori_loop(0, ngroups, fields_grp, 0)

        if phases == 5:
            cutacc.extend([m1_ref[0:8, :], o1_ref[0:8, :], m2_ref[0:8, :]])
            continue

        # ------------------------------- literal gaps, sizes, offsets
        stepm = kl.row_iota(TR) < nsteps
        posA = jnp.where(stepm, tpos_ref[...] - BASEW[j], 0)
        posB = jnp.where(stepm, tpos2_ref[...], 0)
        mlA = jnp.where(stepm, m1_ref[...], 0)
        mlB = jnp.where(stepm, m2_ref[...], 0)
        offA = o1_ref[...]
        offB = o2_ref[...]
        endA = posA + mlA
        endB = jnp.where(mlB > 0, posB + mlB, endA)
        prevEnd = kl.stream_shift_down_mm(jnp.where(stepm, endB, 0), 1, bits=17)
        litA = jnp.where(stepm, jnp.maximum(posA - prevEnd, 0), 0)
        litB = jnp.where(stepm & (mlB > 0), posB - endA, 0)

        def lit_sz(lit):
            rl = jnp.maximum(lit - 1, 0)
            extra = jnp.where(rl < 60, 0, jnp.where(rl < 256, 1, 2))
            return jnp.where(lit > 0, 1 + extra + lit, 0), rl, extra

        szLA, rlA, exA = lit_sz(litA)
        szLB, rlB, exB = lit_sz(litB)
        c1A = (mlA <= wire.COPY1_MAX_LEN) & (offA < wire.COPY1_MAX_OFFSET)
        c1B = (mlB <= wire.COPY1_MAX_LEN) & (offB < wire.COPY1_MAX_OFFSET)
        szCA = jnp.where(mlA > 0, jnp.where(c1A, 2, 3), 0)
        szCB = jnp.where(mlB > 0, jnp.where(c1B, 2, 3), 0)
        pp = szLA + szCA + szLB + szCB
        S = kl.scan2d_tril(pp, bits=18)
        excl = S - pp
        comp_len = jnp.max(jnp.where(stepm, S, 0))
        oLA = excl
        oCA = oLA + szLA
        oLB = oCA + szCA
        oCB = oLB + szLB

        if phases == 6:
            cutacc.extend([S[0:8, :], comp_len])
            continue

        # --------------------------------------------- scatter 4 streams
        zero = jnp.zeros((OCR, L), jnp.int32)
        h1_ref[...] = zero
        h2_ref[...] = zero
        h3_ref[...] = zero

        streams = [
            # (offset, size, is_copy, src/aux fields)
            (oLA, szLA, None, prevEnd, rlA, exA),
            (oCA, szCA, (mlA, offA, c1A), None, None, None),
            (oLB, szLB, None, endA, rlB, exB),
            (oCB, szCB, (mlB, offB, c1B), None, None, None),
        ]
        for off_o, sz, copyf, src, rl, exn in streams:
            key = off_o + 1
            sq_ref[...] = jnp.where(stepm & (sz > 0) & (off_o < OCAP), off_o, -1)
            if copyf is None:
                s1 = (key << 15) | (src & 0x7FFF)
                s2 = (key << 15) | (rl & 0x7FFF)
                s3 = (key << 15) | (exn << 9)
            else:
                cml, coff, cc1 = copyf
                s1 = (key << 15)
                s2 = (key << 15) | (coff & 0x7FFF)
                s3 = (
                    (key << 15) | 1 | (cc1.astype(jnp.int32) << 1)
                    | ((cml & 0x7F) << 2)
                )
            s1_ref[...] = s1
            s2_ref[...] = s2
            s3_ref[...] = s3

            def scat_grp(g, _):
                r0 = pl.multiple_of(g * FN, 8)
                parts = kl.scatter_rows_multi(
                    sq_ref, [(s1_ref, 31), (s2_ref, 31), (s3_ref, 31)],
                    r0, OCR, nrows=FN,
                )
                h1_ref[...] += parts[0]
                h2_ref[...] += parts[1]
                h3_ref[...] += parts[2]
                return 0

            jax.lax.fori_loop(0, ngroups, scat_grp, 0)

        if phases == 65:
            cutacc.extend([h1_ref[0:8, :], h2_ref[0:8, :], h3_ref[0:8, :]])
            continue

        # banded running-max fills (like the decoder's cover): 5 row rounds
        # cover record spans < 32 rows (4 KiB); rarer multi-KB literals
        # extend the row doubling under a guard
        maxsz = jnp.max(jnp.where(stepm, jnp.maximum(szLA, szLB), 0))
        H1f, s1f, t1f = kl.fill_max_rows(h1_ref[...], 31, 5)
        H2f, s2f, t2f = kl.fill_max_rows(h2_ref[...], 31, 5)
        H3f, s3f, t3f = kl.fill_max_rows(h3_ref[...], 31, 5)
        h1_ref[...] = H1f
        h2_ref[...] = H2f
        h3_ref[...] = H3f

        @pl.when(maxsz > 31 * L)
        def _():
            t1x, t2x, t3x = t1f, t2f, t3f
            for r in range(5, 9):
                if (1 << r) < OCR:
                    t1x = jnp.maximum(t1x, kl.row_shift_down(t1x, 1 << r, fill=kl.NEG))
                    t2x = jnp.maximum(t2x, kl.row_shift_down(t2x, 1 << r, fill=kl.NEG))
                    t3x = jnp.maximum(t3x, kl.row_shift_down(t3x, 1 << r, fill=kl.NEG))
            h1_ref[...] = jnp.maximum(s1f, kl.row_shift_down(t1x, 1, fill=kl.NEG))
            h2_ref[...] = jnp.maximum(s2f, kl.row_shift_down(t2x, 1, fill=kl.NEG))
            h3_ref[...] = jnp.maximum(s3f, kl.row_shift_down(t3x, 1, fill=kl.NEG))

        H1 = h1_ref[...]
        H2 = h2_ref[...]
        H3 = h3_ref[...]
        if phases == 7:
            cutacc.extend([H1[0:8, :], H2[0:8, :], H3[0:8, :]])
            continue

        # ------------------------------------------------------ valuation
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

        if phases == 8:
            cutacc.extend([vals_ref[0:8, :], lidx_ref[0:8, :]])
            continue

        # wide groups + a trip count bounded by the block's actual
        # compressed length (rows past comp_len are never read by the host)
        FV = 16 if OCR % 16 == 0 else 8
        fgroups = (comp_len + FV * L - 1) // (FV * L)

        def fin_grp(g, _):
            r0 = pl.multiple_of(g * FV, 8)
            (pay8,) = kl.gather_rows_multi([(data, 8)], lidx_ref, r0, nrows=FV)
            v8 = vals_ref[pl.ds(r0, FV), :]
            comp_ref[j, pl.ds(r0, FV), :] = jnp.where((v8 >> 8) & 1 > 0, pay8, v8 & 0xFF)
            return 0

        jax.lax.fori_loop(0, fgroups, fin_grp, 0)

        meta_ref[b, 0] = comp_len
        meta_ref[b, 1] = fail
        meta_ref[b, 2] = nsteps

    if phases in (5, 6, 65, 7, 8):
        _cut(phases, *cutacc)


@functools.lru_cache(maxsize=16)
def _compiled(B: int, BR: int, hash_bits: int = 16, phases: int = 99):
    # hash_bits is accepted for API/config parity but unused by the exact
    # full-window sort matcher (py/native models still honor it)
    assert B % NBE == 0, f"batch {B} must divide into {NBE}-block grid steps"
    BS = BR * L
    OCR = _ocr(BS)
    TR = _trows(BS)
    kern = functools.partial(_kernel, BR=BR, OCR=OCR, phases=phases)
    i32 = jnp.int32

    def run(data, blens):
        # dense prep in XLA: sorts and cumulative scans are near-free on
        # TPU (xla_dense_probe: sort 15us/blk, cummin ~0) while XLA
        # gathers are 100x worse than in-kernel MXU one-hot gathers — so
        # everything except the w[cand+ml] extension gather lives here.
        flat = data.reshape(B, BS)
        z = jnp.zeros((B, 32), i32)
        extz = jnp.concatenate([flat, z], axis=1)

        def win(at):
            return (
                extz[:, at : BS + at]
                | (extz[:, at + 1 : BS + at + 1] << 8)
                | (extz[:, at + 2 : BS + at + 2] << 16)
                | (extz[:, at + 3 : BS + at + 3] << 24)
            )

        w = win(0)
        posf = jnp.broadcast_to(jnp.arange(BS, dtype=i32)[None, :], (B, BS))
        # exact most-recent-match: stable sort by the FULL 4-byte window
        # (signed order still groups equal windows; stability keeps
        # positions ascending) — no hash, no verification gather needed.
        # The sort CARRIES the windows at p+4/p+8/... so the match-length
        # extension beyond the guaranteed 4 bytes is an elementwise compare
        # against the sorted predecessor — the vector FindMatchLength
        # (csnappy_compress.c:252-295) costs no in-kernel gathers at all.
        # lexicographic (w, pos) keys replace a stable single-key sort
        # (pos is unique, so the order is identical); stability machinery
        # measured 2-4x the cost of the extra key on this chip.
        # EXTRAS carried windows (r4): each costs ~6.3µs/block of sort time
        # (records/phaseprof_r4_start.json); the staircase propagation
        # below recovers long matches from short carried LCPs, so 4
        # windows (20-byte direct LCP) beat r3's 7 on BOTH time and ratio.
        carried = jax.lax.sort(
            (w, posf) + tuple(win(4 * k) for k in range(1, 1 + EXTRAS)),
            dimension=1, is_stable=False, num_keys=2,
        )
        ws, ps = carried[0], carried[1]
        same = jnp.concatenate(
            [jnp.zeros((B, 1), jnp.bool_), ws[:, 1:] == ws[:, :-1]], axis=1
        )
        scand = jnp.where(same, jnp.roll(ps, 1, axis=1), NOCAND)

        # LCP against the sorted predecessor, all carried windows in one
        # stacked pass (separate per-window rolls each materialize a full
        # (B, BS) array; the stacked form rolls once)
        st = jnp.stack(carried[2:], axis=1)                  # (B, EXTRAS, BS)
        xk = st ^ jnp.concatenate([st[:, :, :1], st[:, :, :-1]], axis=2)
        eqw = (xk == 0).astype(i32)
        teqk = jnp.where(
            xk == 0, 4,
            ((xk & 0xFF) == 0).astype(i32)
            + ((xk & 0xFFFF) == 0).astype(i32)
            + ((xk & 0xFFFFFF) == 0).astype(i32),
        )
        pref = jnp.concatenate(
            [jnp.ones((B, 1, BS), i32), jnp.cumprod(eqw[:, :-1, :], axis=1)],
            axis=1,
        )
        lcp = 4 + jnp.sum(pref * teqk, axis=1)
        slcp = jnp.where(same, lcp, 0)
        # un-sort via a single-key sort (pos is unique); cand (15b) and
        # lcp (6b, <= 4+4*EXTRAS) ride packed in ONE carried operand —
        # each sort operand costs ~6µs/block (records/phaseprof_r4)
        _, upk = jax.lax.sort(
            (ps, scand | (slcp << 15)), dimension=1, is_stable=False, num_keys=1
        )
        cand = upk & 0x7FFF
        lcpu = _srl(upk, 15) & 0x3F
        blc = blens[:, None]
        has = (cand != NOCAND) & (posf + 4 <= blc) & (cand < posf)
        # staircase propagation (r4, VERDICT r3 #4): when cand[p+1] ==
        # cand[p] + 1 the exact 4-byte match at p extends through p+1's
        # match, so ml(p) >= 1 + ml(p+1); inductively ml(p) >= (j - p) +
        # lcp(j) for every j in p's consecutive-candidate run.  Computed
        # as a reverse cummax of h(j) = j + lcp(j), segmented by run id
        # (later runs penalized by K > any in-block h difference so they
        # can never win across a break).  This both recovers the matches
        # r3's hard 32-byte LCP cap truncated (the ratio regression,
        # 350,322 vs r2's 346,059 B) and subsumes the old pure-run floor
        # MIN_MATCH + runlen (= the j=nb term, lcp(nb) >= 4).
        candn = jnp.concatenate([cand[:, 1:], jnp.full((B, 1), NOCAND, i32)], axis=1)
        hasn = jnp.concatenate([has[:, 1:], jnp.zeros((B, 1), jnp.bool_)], axis=1)
        consec = has & hasn & (candn == cand + 1)
        # K must exceed any in-block h difference (BS + max lcp < 2^16) and
        # keep rid*K inside int32 (rid < BS = 2^15, so K = 2^16 is the max)
        K = 1 << 16
        rid = jnp.cumsum((~consec).astype(i32), axis=1) - (~consec).astype(i32)
        hstair = jnp.where(has, posf + lcpu, 0) - rid * K
        segmax = jax.lax.cummax(hstair, axis=1, reverse=True) + rid * K
        cap = jnp.clip(blc - posf, 0, wire.MAX_COPY_LEN)
        ml0 = jnp.minimum(jnp.maximum(segmax - posf, lcpu), cap)
        # lazy deferral (r4): the reference is strictly greedy
        # (csnappy_compress.c:574-594 commits the first 4-byte match), but
        # any commit schedule is conformant (csnappy_compress.c:221-227).
        # Deferring one position costs <= 1 literal byte and pays when the
        # next position's match is >= 2 longer; a deferred position simply
        # loses its commit candidacy, so the walk lands on the longer
        # match.  Pure dense ops; chains of deferrals need ml to keep
        # growing by >= 2/step, so runaway literal runs cannot form.
        mln = jnp.concatenate([ml0[:, 1:], jnp.zeros((B, 1), i32)], axis=1)
        defer = has & hasn & (mln >= ml0 + 2)
        has = has & ~defer
        in1 = (
            jnp.where(has, cand, NOCAND)
            | (jnp.where(has, ml0, 0) << 15)
            | (has.astype(i32) << 22)
        )
        nc = jax.lax.cummin(jnp.where(has, posf, BS), axis=1, reverse=True)

        comp, meta = pl.pallas_call(
            kern,
            grid=(B // NBE,),
            out_shape=(
                jax.ShapeDtypeStruct((B, OCR, L), i32),
                jax.ShapeDtypeStruct((B, 8), i32),
            ),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((NBE, BR, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((NBE, BR, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((NBE, BR, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((NBE, OCR, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((NBE * BR, L), i32),        # ml
                pltpu.VMEM((NBE * (BR + 1), L), i32),  # wtab (strided, guard rows)
                pltpu.VMEM((NBE * BR, L), i32),        # m2d (dense partner ml)
                pltpu.VMEM((NBE * BR, L), i32),        # o2d (dense partner offset)
                pltpu.VMEM((TR, L), i32),            # tpos
                pltpu.VMEM((TR, L), i32),            # tpos2
                pltpu.VMEM((TR, L), i32),            # m1
                pltpu.VMEM((TR, L), i32),            # o1
                pltpu.VMEM((TR, L), i32),            # m2
                pltpu.VMEM((TR, L), i32),            # o2
                pltpu.VMEM((TR, L), i32),            # sq
                pltpu.VMEM((TR, L), i32),            # s1
                pltpu.VMEM((TR, L), i32),            # s2
                pltpu.VMEM((TR, L), i32),            # s3
                pltpu.VMEM((OCR, L), i32),           # h1
                pltpu.VMEM((OCR, L), i32),           # h2
                pltpu.VMEM((OCR, L), i32),           # h3
                pltpu.VMEM((OCR, L), i32),           # vals
                pltpu.VMEM((OCR, L), i32),           # lidx
                pltpu.SMEM((NBE * (BR + 1), L), i32),  # walk entry tables
                pltpu.SMEM((NBE * (TR + 8), L), i32),  # step buffers (+spare)
                pltpu.SemaphoreType.DMA,
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024,
            ),
            interpret=prim.interpret_mode(),
        )(blens, data.reshape(B, BR, L),
          in1.reshape(B, BR, L), nc.reshape(B, BR, L))
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
    Bp = prim.bucket_pow2(max(B, 1), 8)
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
        # surface through the csnappy error taxonomy like every other
        # failure path (csnappy.h:124-129; VERDICT r3 weak #7) — the walk
        # bound is sized so this is unreachable for real inputs, so if it
        # fires it is an internal invariant break, not a data error
        from ..errors import E_DATA_MALFORMED, SnappyError

        bad = np.nonzero(meta_np[:B, 1])[0].tolist()
        raise SnappyError(E_DATA_MALFORMED,
                          f"encoder walk exhausted its round bound (blocks {bad})")
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
    out += _compact(comp, lens)
    return bytes(out)


def _compact(comp: np.ndarray, lens: np.ndarray) -> bytes:
    """Host-leg ragged assembly: native memcpy compactor when built
    (csnappy_host_compact, csrc), Python loop otherwise."""
    try:
        from ..runtime import native

        return native.compact(comp, lens)
    except Exception:
        return b"".join(comp[i, : lens[i]].tobytes() for i in range(len(lens)))


prim.register_trace_cache(_compiled)
