"""Fused TPU block decoder — ONE pallas_call per batch of blocks.

Round-3 architecture, r5 quad-fusion + staged banded resolve.  Each grid
step decodes NB=4 blocks; per 32 KiB block:

  1. parse   — dense speculative tag parse at every byte (VPU): advance,
               produced|islit, and a UNION field (literal source index or
               copy offset, 16 bits — offsets up to 65535 are representable
               so exotic-but-legal streams error at the right output
               position instead of being folded, csnappy_decompress.c:302).
               A *pair table* packs each position's advance plus, when the
               tag is short (adv<=31), the following tag's advance; pairs
               with total advance <= 63 absorb the NEXT pair too (quad
               fusion, r5) — all built with native lane dynamic_gathers
               (~0.25µs each), so the serial walk retires up to FOUR tags
               per step.
  2. walk    — the real tag chain is sequential (csnappy_decompress.c:345:
               tag N's start depends on tag N-1's length); the scalar unit
               walks FOUR blocks' chains interleaved in one loop over the
               whole quad tables resident in SMEM.  The chains are
               independent, so interleaving hides the dependent-load
               latency: 21.6 ns/step alone vs 8.6 ns/step with 4 chains
               (mosaic_probe5).  Stalled chains self-loop harmlessly (the
               entry at p==slen and at any invalid byte is 0) until all
               four finish; errors are judged after.
  3. fields  — per-tag produced/islit/field via ONE batched one-hot MXU
               gather serving FOUR tag streams per step (stored + pair
               partner + quad pair), from dense parse-precomputed tables.
  4. cover   — joint output starts for all streams by triangular-matmul
               add-scan (exact to 2^31); per-output-byte covering tag via
               packed one-hot scatters + banded running-max fills (row
               rounds sized by the actual max span, guarded continuation
               for rare multi-KB literals) — the scatter-free analog of
               char_table dispatch (csnappy_decompress.c:152-185).
  5. resolve — copies only reference earlier output
               (csnappy_decompress.c:302).  Self-overlap is removed
               ANALYTICALLY (periodic source modulo the offset — the
               IncrementalCopy/RLE analog, csnappy_decompress.c:200-254),
               then parent chains collapse by STAGED BANDED SQUARING
               (r5): rounds of native lane-gather composition at reach
               BWG then BWG2=31 rows.  Every in-group hop is <= 31 rows,
               and each round squares chain depth, so BWG_ROUNDS+
               BWG2_ROUNDS rounds collapse depth 2^(sum) chains for ALL
               groups at once — measured 2.3x cheaper than the r4
               per-group MXU doubling it replaces.  Values then
               materialize in 4 KiB row groups, in order, via ONE 8-bit
               one-hot gather per group from the resolved prefix; a
               residual counter triggers a rare adaptive fallback for
               adversarially deep chains.

Phases 3-5 run block-sequentially within the step (j = 0..NB-1), reusing
one block's worth of scratch.

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
NB = 4            # blocks per grid step (4-chain interleaved walk)
TBUF = 16         # retained for stream-decoder imports
CHUNK = 256       # walk steps per outer round (end checked between chunks)
BIG = 1 << 24     # "never" event position
PAIR_MAX_ADV = 31  # first-tag advance cap for pair-table entries
QUAD_MAX_D2 = 63   # pair-advance cap for quad fusion (bounds lane reach)
# Resolve pointer-collapse schedule (r5 hardware A/B, tools/decode_ab.py):
# each banded round SQUARES chain depth for hops within reach, so staged
# reaches (short cheap rounds first, then full-in-group reach-31 rounds)
# replace the per-group MXU doubling entirely — the 16 small gather calls
# it took measured 1.4µs each, ~10µs/block/round, while a reach-31 banded
# round costs ~8.7µs/block for ALL groups.  (0,9,3,31,2): 0.502 GB/s,
# resid 0; old (KFIX=2,7,3): 0.404 GB/s.
BWG = 9           # first-stage banded reach (rows per hop)
BWG_ROUNDS = 3    # first-stage rounds
BWG2 = 31         # second-stage reach (covers every in-group hop)
BWG2_ROUNDS = 2   # second-stage rounds
KFIX = 0          # per-group MXU doubling rounds (superseded by BWG2)


def _troWS(P: int) -> int:
    # stored walk steps advance >= 4 compressed bytes each: a pair is two
    # tags of >= 2 bytes; an unpaired single has adv > PAIR_MAX_ADV >= 32
    # except at most two terminal ones (partner at slen / stall).  So
    # steps <= P/4 + 2 — the step buffers (and every step-phase shape)
    # need only a quarter of the block, not half (r5).
    return ((P // 4 + 2 * L + TBUF * L - 1) // (TBUF * L)) * TBUF


def _srl(x, k):
    return jax.lax.shift_right_logical(x, k)


def _kernel(
    *refs,
    CI: int, CO: int, phases: int = 99, streamed: bool = False, MR: int = 0,
):
    """Fused block decode.  Two input layouts:

    block mode (streamed=False): comp arrives pre-segmented as (NB, CI, L)
    VMEM blocks per grid step (the zram/container serving shape).

    stream mode (streamed=True, r4): comp is the WHOLE compressed stream
    resident in HBM as (MR, L) int32 bytes plus per-block compressed
    offsets (SMEM); each block DMAs its own CI+1-row window and
    lane-aligns it on device.  This is the device-resident serving path
    (csnappy_decompress.c:394-411 analog): no host segmentation, no
    per-stream-shape recompiles (MR/CI/B are bucketed), one launch.
    """
    if streamed:
        (slen_ref, dlim_ref, soffs_ref, stream_ref,
         out_ref, meta_ref,
         tp_ref, tf_ref, pt_ref, tpp_ref, tfp_ref,
         tp3_ref, tf3_ref, tp4_ref, tf4_ref,
         tpos_ref, tpos2_ref, tpos3_ref, tpos4_ref,
         tp1_ref, tf1_ref, tp2_ref, tf2_ref,
         tp3s_ref, tf3s_ref, tp4s_ref, tf4s_ref,
         h1_ref, h2_ref,
         par_ref, lidx_ref,
         big_ref,
         win_ref, compal_ref,
         pt_smem, tag_smem, gflags_ref, sem) = refs
    else:
        (slen_ref, dlim_ref, comp_ref,
         out_ref, meta_ref,
         tp_ref, tf_ref, pt_ref, tpp_ref, tfp_ref,
         tp3_ref, tf3_ref, tp4_ref, tf4_ref,
         tpos_ref, tpos2_ref, tpos3_ref, tpos4_ref,
         tp1_ref, tf1_ref, tp2_ref, tf2_ref,
         tp3s_ref, tf3s_ref, tp4s_ref, tf4s_ref,
         h1_ref, h2_ref,
         par_ref, lidx_ref,
         big_ref,
         pt_smem, tag_smem, gflags_ref, sem) = refs
    P, OCL = CI * L, CO * L
    TROWS = _troWS(P)
    TGR = TROWS + 8                                 # tag region rows per block
    TMAX = TROWS * L
    MAX_ROUNDS = TMAX // CHUNK + 2
    NRG_MAX = CO // 8
    gi = pl.program_id(0)

    def _cut(n, *vals):
        """Static profiling knob: stop after phase n, consuming its results
        (so the measured phase cannot be dead-code-eliminated)."""
        if phases != n:
            return False
        acc = jnp.int32(0)
        for v in vals:
            a = jnp.asarray(v).astype(jnp.int32)
            a = a[: min(8, a.shape[0])] if a.ndim >= 1 else a
            acc = acc + jnp.sum(a)
        meta_ref[gi * NB, 0] = acc
        meta_ref[gi * NB, 1] = jnp.int32(0)
        out_ref[0, 0:8, :] = jnp.zeros((8, L), jnp.int32) + acc
        return True

    # ------------------------------------------------------------ 1. parse
    cut1 = []
    for j in range(NB):
        b = gi * NB + j
        slen = slen_ref[b]
        if streamed:
            # window DMA from the HBM stream at this block's compressed
            # offset, then a dynamic lane-alignment (offsets are byte-
            # granular; rows are 128-wide): two native lane gathers +
            # row-boundary select, ~0.5µs per block
            soff = soffs_ref[b]
            # caller pads the stream array so soff>>7 never exceeds
            # MR - (CI+8); the clip is a belt only
            r0 = jnp.clip(_srl(soff, 7), 0, MR - (CI + 8))
            cpin = pltpu.make_async_copy(
                stream_ref.at[pl.ds(r0, CI + 8)], win_ref, sem
            )
            cpin.start()
            cpin.wait()
            sl = soff & (L - 1)
            lane_a = jax.lax.broadcasted_iota(jnp.int32, (CI, L), 1)
            q_a = (lane_a + sl) & (L - 1)
            g0 = kl.lane_gather(win_ref[0:CI, :], q_a)
            g1 = kl.lane_gather(win_ref[1 : CI + 1, :], q_a)
            comp = jnp.where(lane_a + sl < L, g0, g1)
            compal_ref[pl.ds(j * CI, CI), :] = comp
        else:
            comp = comp_ref[j]                      # (CI, L) byte values
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
        # 16-bit union field: literal source start or copy offset.  COPY_4
        # offsets above 65535 clamp to 65535, which exceeds any in-block
        # written-length, so they fail the offset>written check at the right
        # output position (csnappy_decompress.c:302) instead of being folded.
        off16 = jnp.where(
            kind == wire.TAG_COPY_1, (_srl(u, 3) << 8) | b1,
            jnp.where((kind == wire.TAG_COPY_4) & ((b3 | b4) != 0), 0xFFFF, t2),
        )
        prod = jnp.minimum(jnp.where(islit, lit_len, copy_len), OCL + 1)
        adv = hdr + jnp.where(islit, lit_len, 0)
        pos = kl.row_iota(CI)
        in_range = pos < slen
        valid = in_range & ~(((pos + adv) > slen) | lit_too_big)
        adv_v = jnp.where(valid, adv, 0)
        tpv = jnp.where(valid, prod | (islit.astype(jnp.int32) << 16), 0)
        ls = jnp.clip(pos + hdr, 0, P - 1)
        tfv = jnp.where(islit, ls, off16)
        tp_ref[pl.ds(j * CI, CI), :] = tpv
        tf_ref[pl.ds(j * CI, CI), :] = tfv
        # pair table: short first tag (adv<=31) fuses with its successor so
        # the scalar walk retires 2 tags per load; partner advance fetched
        # with one native lane gather (successor is at most 31+127 lanes
        # away -> within this row or the next)
        lane = jax.lax.broadcasted_iota(jnp.int32, (CI, L), 1)
        small = valid & (adv <= PAIR_MAX_ADV)
        q_l = (lane + jnp.where(small, adv, 0)) & (L - 1)
        nx_same = kl.lane_gather(adv_v, q_l)
        nx_next = kl.lane_gather(kl.row_shift_up(adv_v, 1), q_l)
        rowd = (lane + adv) >> 7
        adv2 = jnp.where(small, jnp.where(rowd == 0, nx_same, nx_next), 0)
        paired = adv2 > 0
        d2 = jnp.where(paired, adv + adv2, adv)     # pair (or single) advance
        # partner fields precomputed densely (two lane gathers each), so
        # the fields phase serves its tag streams from ONE row-gather call
        # with a single shared one-hot mask
        tpn = kl.row_shift_up(tpv, 1)
        tfn = kl.row_shift_up(tfv, 1)
        tpp = jnp.where(rowd == 0, kl.lane_gather(tpv, q_l), kl.lane_gather(tpn, q_l))
        tfp = jnp.where(rowd == 0, kl.lane_gather(tfv, q_l), kl.lane_gather(tfn, q_l))
        tpp = jnp.where(paired, tpp, 0)
        tfp = jnp.where(paired, tfp, 0)
        # r5 quad fusion: when the PAIR is short (d2 <= QUAD_MAX_D2) the
        # entry also absorbs the pair entry at p+d2, so one scalar step
        # retires up to FOUR tags (streams A=p, B=p+adv, C=p+d2,
        # D=partner of C).  Reach stays bounded (lane+d2 <= 190 -> this
        # row or the next), so stream C/D fields come from the same cheap
        # native lane gathers; the walk step itself is unchanged.
        pairent = jnp.where(valid, d2, 0)           # pre-quad walk entry
        quadable = paired & (d2 <= QUAD_MAX_D2)
        q_l2 = (lane + jnp.where(quadable, d2, 0)) & (L - 1)
        rowd2 = (lane + jnp.where(quadable, d2, 0)) >> 7

        def _g2(tab):
            g0 = kl.lane_gather(tab, q_l2)
            g1 = kl.lane_gather(kl.row_shift_up(tab, 1), q_l2)
            return jnp.where(rowd2 == 0, g0, g1)

        pair2 = _g2(pairent)                        # C's pair advance (0 = invalid)
        quad = quadable & (pair2 > 0)
        quad_i = quad.astype(jnp.int32)
        tp3_ref[pl.ds(j * CI, CI), :] = _g2(tpv) * quad_i
        tf3_ref[pl.ds(j * CI, CI), :] = _g2(tfv) * quad_i
        tp4_ref[pl.ds(j * CI, CI), :] = _g2(tpp) * quad_i
        tf4_ref[pl.ds(j * CI, CI), :] = _g2(tfp) * quad_i
        tpp_ref[pl.ds(j * CI, CI), :] = tpp
        tfp_ref[pl.ds(j * CI, CI), :] = tfp
        # pair-table regions are strided CI+1 rows with a zeroed guard row
        # at local position P: the walk can then read at p == slen == P
        # (self-terminating) with NO per-step clamp, and track positions
        # pre-offset by the region base with NO per-step base add
        pt_ref[pl.ds(j * (CI + 1), CI), :] = jnp.where(quad, d2 + pair2, pairent)
        pt_ref[pl.ds(j * (CI + 1) + CI, 1), :] = jnp.zeros((1, L), jnp.int32)
        cut1.extend([tp_ref[pl.ds(j * CI, 8), :], pt_ref[pl.ds(j * (CI + 1), 8), :]])

    cpd = pltpu.make_async_copy(pt_ref, pt_smem, sem)
    cpd.start()
    cpd.wait()

    if _cut(1, *cut1):
        return

    # ------------------------------------------------------------- 2. walk
    # four interleaved chains (one per block): the dependent SMEM load
    # chains are independent across blocks, so the scalar unit overlaps
    # their latencies.  A finished or stalled chain reads the zeroed guard
    # row and stops advancing (re-storing its last tag slot harmlessly)
    # until all four are done.  Positions and tag counters carry their
    # region bases (p in [BASE_j, BASE_j + P], tc in [TBASE_j, ...]) so the
    # hot step is exactly: load, store, two adds, one compare per chain.
    BASEW = [j * (CI + 1) * L for j in range(NB)]
    TBASE = [j * TGR * L for j in range(NB)]
    ends = [slen_ref[gi * NB + j] + BASEW[j] for j in range(NB)]

    def outer_cond(c):
        rounds, done = c[0], c[1]
        return (done == 0) & (rounds < MAX_ROUNDS)

    def outer_body(c):
        rounds, _d = c[0], c[1]
        ps0 = c[2:2 + NB]
        tcs0 = c[2 + NB:2 + 2 * NB]

        def step(i, c2):
            ps = c2[:NB]
            tcs = c2[NB:]
            nps, ntcs = [], []
            for j in range(NB):
                p, tc = ps[j], tcs[j]
                v = pt_smem[p >> 7, p & (L - 1)]
                tag_smem[tc >> 7, tc & (L - 1)] = p
                ntcs.append(tc + (v != 0).astype(jnp.int32))
                nps.append(p + (v & 0x1FFFF))
            return tuple(nps) + tuple(ntcs)

        res = jax.lax.fori_loop(0, CHUNK, step, tuple(ps0) + tuple(tcs0))
        ps = res[:NB]
        tcs = res[NB:]
        done = jnp.int32(1)
        for j in range(NB):
            done = done & ((ps[j] == ends[j]) | (ps[j] == ps0[j])).astype(jnp.int32)
        return (rounds + 1, done) + tuple(ps) + tuple(tcs)

    z = jnp.int32(0)
    init = (z, z) + tuple(jnp.int32(b_) for b_ in BASEW) + tuple(
        jnp.int32(t_) for t_ in TBASE
    )
    fin = jax.lax.while_loop(outer_cond, outer_body, init)
    p_fs = [fin[2 + j] - BASEW[j] for j in range(NB)]
    nsteps_all = [fin[2 + NB + j] - TBASE[j] for j in range(NB)]

    if _cut(2, *p_fs, *nsteps_all):
        return

    # --------------------------------------- per-block vector phases (3-5)
    cutacc = []
    for j in range(NB):
        b = gi * NB + j
        slen = slen_ref[b]
        dlim = dlim_ref[b]
        comp = compal_ref[pl.ds(j * CI, CI), :] if streamed else comp_ref[j]
        nsteps = nsteps_all[j]
        malformed_walk = p_fs[j] != slen

        # tag_smem carries 8 spare rows per block: the final step's stores
        # can land one slot past TMAX; only the real rows are shipped
        cpt = pltpu.make_async_copy(
            tag_smem.at[pl.ds(j * TGR, TROWS)], tpos_ref, sem
        )
        cpt.start()
        cpt.wait()

        # ------------------------------------------------------- 3. fields
        # four tag streams per walk step: A at the stored position, B/C/D
        # the parse-precomputed pair and quad partners (empty when the
        # step fused fewer tags) — ALL streams served by ONE gather call
        # with one shared one-hot mask
        FN = 16
        ngroups = (nsteps + FN * L - 1) // (FN * L)
        tp_t = tp_ref[pl.ds(j * CI, CI), :]
        tf_t = tf_ref[pl.ds(j * CI, CI), :]
        tpp_t = tpp_ref[pl.ds(j * CI, CI), :]
        tfp_t = tfp_ref[pl.ds(j * CI, CI), :]
        tp3_t = tp3_ref[pl.ds(j * CI, CI), :]
        tf3_t = tf3_ref[pl.ds(j * CI, CI), :]
        tp4_t = tp4_ref[pl.ds(j * CI, CI), :]
        tf4_t = tf4_ref[pl.ds(j * CI, CI), :]

        def fields_grp(g, _):
            r0 = pl.multiple_of(g * FN, 8)
            tpg, tfg, tpg2, tfg2, tpg3, tfg3, tpg4, tfg4 = kl.gather_rows_multi(
                [(tp_t, 17), (tf_t, 16), (tpp_t, 17), (tfp_t, 16),
                 (tp3_t, 17), (tf3_t, 16), (tp4_t, 17), (tf4_t, 16)],
                tpos_ref, r0, nrows=FN,
                pre=lambda r: r - BASEW[j],   # walk stores region-based p
            )
            tp1_ref[pl.ds(r0, FN), :] = tpg
            tf1_ref[pl.ds(r0, FN), :] = tfg
            tp2_ref[pl.ds(r0, FN), :] = tpg2
            tf2_ref[pl.ds(r0, FN), :] = tfg2
            tp3s_ref[pl.ds(r0, FN), :] = tpg3
            tf3s_ref[pl.ds(r0, FN), :] = tfg3
            tp4s_ref[pl.ds(r0, FN), :] = tpg4
            tf4s_ref[pl.ds(r0, FN), :] = tfg4
            return 0

        jax.lax.fori_loop(0, ngroups, fields_grp, 0)

        if phases == 3:
            cutacc.extend([tp1_ref[0:8, :], tf1_ref[0:8, :], tp3s_ref[0:8, :]])
            continue

        # -------------------------------------------------------- 4. cover
        stepm = kl.row_iota(TROWS) < nsteps
        tp1v, tp2v = tp1_ref[...], tp2_ref[...]
        tp3v, tp4v = tp3s_ref[...], tp4s_ref[...]
        prod1 = jnp.where(stepm, tp1v & 0xFFFF, 0)
        prod2 = jnp.where(stepm, tp2v & 0xFFFF, 0)
        prod3 = jnp.where(stepm, tp3v & 0xFFFF, 0)
        prod4 = jnp.where(stepm, tp4v & 0xFFFF, 0)
        islit1 = _srl(tp1v, 16) & 1
        islit2 = _srl(tp2v, 16) & 1
        islit3 = _srl(tp3v, 16) & 1
        islit4 = _srl(tp4v, 16) & 1
        fld1, fld2 = tf1_ref[...], tf2_ref[...]
        fld3, fld4 = tf3s_ref[...], tf4s_ref[...]
        pp = prod1 + prod2 + prod3 + prod4
        S = kl.scan2d_tril(pp, bits=31)
        excl = S - pp
        tose1 = excl
        tose2 = excl + prod1
        tose3 = tose2 + prod2
        tose4 = tose3 + prod3
        total_out = jnp.max(jnp.where(stepm, S, 0))
        overrun = jnp.any(stepm & (S > dlim))
        live1 = stepm & (tose1 < OCL) & (prod1 > 0)
        live2 = stepm & (tose2 < OCL) & (prod2 > 0)
        live3 = stepm & (tose3 < OCL) & (prod3 > 0)
        live4 = stepm & (tose4 < OCL) & (prod4 > 0)
        key1 = tose1 + 1
        key2 = tose2 + 1
        key3 = tose3 + 1
        key4 = tose4 + 1
        maxprod = jnp.max(jnp.where(
            stepm,
            jnp.maximum(jnp.maximum(prod1, prod2), jnp.maximum(prod3, prod4)),
            0,
        ))
        tpos_ref[...] = jnp.where(live1, tose1, -1)               # reused: sposA
        tpos2_ref[...] = jnp.where(live2, tose2, -1)              # reused: sposB
        tpos3_ref[...] = jnp.where(live3, tose3, -1)              # sposC
        tpos4_ref[...] = jnp.where(live4, tose4, -1)              # sposD
        # h2 records carry only 2 payload bits, so their key rides at
        # bit 2 (18-bit values, 3 scatter limbs instead of 5); winners
        # stay consistent with h1 because ordering is key-dominant and
        # keys (tose+1) are unique across all four streams
        tp1_ref[...] = (key1 << 15) | (fld1 & 0x7FFF)             # s1A
        tf1_ref[...] = (key1 << 2) | ((_srl(fld1, 15) & 1) << 1) | islit1  # s2A
        tp2_ref[...] = (key2 << 15) | (fld2 & 0x7FFF)             # s1B
        tf2_ref[...] = (key2 << 2) | ((_srl(fld2, 15) & 1) << 1) | islit2  # s2B
        tp3s_ref[...] = (key3 << 15) | (fld3 & 0x7FFF)            # s1C
        tf3s_ref[...] = (key3 << 2) | ((_srl(fld3, 15) & 1) << 1) | islit3  # s2C
        tp4s_ref[...] = (key4 << 15) | (fld4 & 0x7FFF)            # s1D
        tf4s_ref[...] = (key4 << 2) | ((_srl(fld4, 15) & 1) << 1) | islit4  # s2D

        zero = jnp.zeros((CO, L), jnp.int32)
        h1_ref[...] = zero
        h2_ref[...] = zero

        def scat_grp(g, _):
            r0 = pl.multiple_of(g * FN, 8)
            # h2 records are (key << 2 | 2 payload bits) <= 18 bits -> 3
            # scatter limbs instead of 5 (h1 keys ride at bit 15, 31 bits)
            pa = kl.scatter_rows_multi(
                tpos_ref, [(tp1_ref, 31), (tf1_ref, 18)], r0, CO, nrows=FN,
            )
            pb = kl.scatter_rows_multi(
                tpos2_ref, [(tp2_ref, 31), (tf2_ref, 18)], r0, CO, nrows=FN,
            )
            pc = kl.scatter_rows_multi(
                tpos3_ref, [(tp3s_ref, 31), (tf3s_ref, 18)], r0, CO, nrows=FN,
            )
            pd = kl.scatter_rows_multi(
                tpos4_ref, [(tp4s_ref, 31), (tf4s_ref, 18)], r0, CO, nrows=FN,
            )
            h1_ref[...] += pa[0] + pb[0] + pc[0] + pd[0]
            h2_ref[...] += pa[1] + pb[1] + pc[1] + pd[1]
            return 0

        jax.lax.fori_loop(0, ngroups, scat_grp, 0)

        if phases == 41:     # profiling: cover scatter done
            cutacc.extend([h1_ref[0:8, :], h2_ref[0:8, :]])
            continue

        # banded fill: 5 row rounds cover spans < 32 rows (4 KiB); rare
        # longer literal spans trigger the guarded continuation
        H1f, s1s, t1s = kl.fill_max_rows(h1_ref[...], 31, 5)
        H2f, s2s, t2s = kl.fill_max_rows(h2_ref[...], 18, 5)
        h1_ref[...] = H1f
        h2_ref[...] = H2f

        @pl.when(maxprod > 31 * L)
        def _():
            t1, t2x = t1s, t2s
            for r in range(5, 8):
                if (1 << r) < CO:
                    t1 = jnp.maximum(t1, kl.row_shift_down(t1, 1 << r, fill=kl.NEG))
                    t2x = jnp.maximum(t2x, kl.row_shift_down(t2x, 1 << r, fill=kl.NEG))
            h1_ref[...] = jnp.maximum(s1s, kl.row_shift_down(t1, 1, fill=kl.NEG))
            h2_ref[...] = jnp.maximum(s2s, kl.row_shift_down(t2x, 1, fill=kl.NEG))

        H1 = h1_ref[...]
        H2 = h2_ref[...]
        if phases == 42:     # profiling: banded max fills done
            cutacc.extend([H1[0:8, :], H2[0:8, :]])
            continue
        key_o = _srl(H1, 15)
        valid_o = key_o >= 1
        t_os = key_o - 1
        fld_o = (H1 & 0x7FFF) | ((_srl(H2, 1) & 1) << 15)
        islit_o = (H2 & 1) == 1
        o = kl.row_iota(CO)
        live = valid_o & (o < jnp.minimum(total_out, OCL))
        is_copy = live & ~islit_o
        copy_err = is_copy & ((fld_o == 0) | (fld_o > t_os))
        ev_copy = jnp.min(jnp.where(copy_err, o, BIG))
        # combined-table parent index: literals point straight at their
        # source byte in the compressed stream (rows < CI of [comp; out]),
        # copies at their source output byte — so the per-group value gather
        # serves literals and copies from ONE table.  Self-referential
        # copies (off < len, the IncrementalCopy/RLE case,
        # csnappy_decompress.c:200-254) are periodic with period off, so the
        # pre-tag source is computed ANALYTICALLY: byte o of a tag starting
        # at t_os with offset off resolves to t_os - off + (o - t_os) % off,
        # which escapes the self-overlap in one step (when off >= len this
        # is exactly o - off).  Parent chains then only span copy NESTING
        # depth, never run lengths.  Dead/errored cells park at comp row 0
        # (an always-final table row, value masked by live8) rather than
        # self-looping at their own output cell — self-loops would read
        # "still in-group" forever under the count-based convergence
        # criterion below.
        lidx = jnp.clip(fld_o + (o - t_os), 0, P - 1)
        rel = o - t_os
        offc = jnp.maximum(fld_o, 1)
        src0 = t_os - fld_o + jnp.where(rel < offc, rel, rel % offc)
        parent = jnp.where(
            is_copy & ~copy_err,
            jnp.clip(src0, 0, OCL - 1) + CI * L,
            jnp.where(islit_o & live, lidx, 0),
        )
        if phases == 43:     # profiling: analytic parents (pre-halving)
            cutacc.extend([parent[0:8, :], ev_copy])
            continue
        # global banded path halving BEFORE the group loop: parent->parent
        # composition is globally sound (chains strictly descend through the
        # [comp; out] table), so short-hop chains collapse here in ONE pass
        # over the whole (CO, L) table — (32,128)-sized in-group halving ops
        # were dispatch-bound, costing nearly as much as full-table ones 8x
        # over.  Parents within BWG rows hop to their grandparent via native
        # lane gathers on row-shifted copies; comp-region parents (< CI*L,
        # already-final literal sources) never move.
        arow_g = jax.lax.broadcasted_iota(jnp.int32, (CO, L), 0) + CI
        # BWG x BWG_ROUNDS (r4/r5 tuned): native lane gathers are ~free
        # (the whole r3 BWG=3 pass measured ~1µs/block), and reaching BWG
        # rows per hop collapses most mid-range copy chains here, letting
        # the per-group doubling machinery below skip far more groups
        def _banded(par, reach, rounds):
            for _i in range(rounds):
                d_g = arow_g - _srl(par, 7)
                hop = par
                for dd in range(reach + 1):
                    src = par if dd == 0 else kl.row_shift_down(par, dd)
                    gth = kl.lane_gather(src, par & (L - 1))
                    hop = jnp.where((par >= CI * L) & (d_g == dd), gth, hop)
                par = hop
            return par

        parent = _banded(parent, BWG, BWG_ROUNDS)
        # second stage at full in-group reach (r5): a reach-31 round
        # composes EVERY in-group parent (group hops are <= 31 rows), so
        # BWG2_ROUNDS of it substitute the same count of per-group MXU
        # doubling rounds at native-lane-gather cost
        parent = _banded(parent, BWG2, BWG2_ROUNDS)
        par_ref[...] = parent
        lidx_ref[...] = live.astype(jnp.int32) << 16

        if phases == 4:
            cutacc.extend([par_ref[0:8, :], lidx_ref[0:8, :], total_out])
            continue

        # ------------------------------------------------------ 5. resolve
        # RG=32 is the measured sweet spot: RG=64 raised resolve 1.27 ->
        # 1.57 ms/32blk (deeper in-group chains cost more doubling than the
        # halved per-group overhead saves) — r4 A/B on urls.10K
        RG = next(n for n in (32, 16, 8) if CO % n == 0)
        NRG = CO // RG
        LOCAL_MAX = 18  # fallback cap: in-group chain depth after halving
        par_bits = ((CI + CO) * L - 1).bit_length()
        big_ref[pl.ds(0, CI), :] = comp

        # r4 redesign (VERDICT r3 weak #2): the r3 per-group machinery —
        # gflags vector->SMEM sums, pl.when skip branches, count-based
        # while loops — cost 4.3µs/group while its gathers cost ~0.5µs:
        # on urls.10K EVERY group is entered and converges in ~2 rounds
        # (measured via the meta counters), so the adaptive control was
        # pure overhead.  Instead: KFIX unconditional vector doubling
        # rounds per group (no reduces, no branches), a single OR-
        # accumulated residual mask across the block, ONE scalar reduce,
        # and a rare while-based fallback pass for adversarially deep
        # in-group chains (> 2^KFIX after halving; depth is copy NESTING
        # only — run lengths were removed analytically above).
        resid = jnp.zeros((RG, L), jnp.int32)
        for _g in range(NRG):      # unrolled: static prefix sizes per group
            r0 = _g * RG
            base = (CI + r0) * L
            # static prefix bound: parents only ever point below the
            # group's end, so gathers read a growing prefix of [comp; out]
            PR = CI + r0   # own group excluded: parents are < base after doubling (r5)
            new = par_ref[pl.ds(r0, RG), :]
            for _k in range(KFIX):
                cur = new
                (gath,) = kl.gather_rows_multi(
                    [(cur, par_bits)], par_ref, r0, nrows=RG,
                    pre=lambda r: r - base,
                )
                new = jnp.where(cur >= base, gath, cur)
                par_ref[pl.ds(r0, RG), :] = new
            resid = resid | (new >= base).astype(jnp.int32)
            live8 = _srl(lidx_ref[pl.ds(r0, RG), :], 16) & 1
            if phases == 5:     # profiling: parents only, no value gather
                fin8 = new & 0xFF
            else:
                (val8,) = kl.gather_rows_multi(
                    [(big_ref[0:PR, :], 8)], par_ref, r0, nrows=RG
                )
                fin8 = jnp.where(live8 > 0, val8, 0)
            big_ref[pl.ds(CI + r0, RG), :] = fin8
            out_ref[j, pl.ds(r0, RG), :] = fin8

        gflags_ref[0] = jnp.sum(resid)        # ONE reduce per block
        gflags_ref[1] = 0                     # fallback rounds (profiling)

        @pl.when(gflags_ref[0] > 0)
        def _fallback():
            # rare: some group still holds in-group parents after KFIX
            # rounds.  Re-run ALL groups with the adaptive while-loop
            # collapse (pointer composition is idempotent-safe — chains
            # strictly descend — so continuing from the mutated table is
            # sound), re-materializing values in order.
            for _g in range(NRG):
                r0 = _g * RG
                base = (CI + r0) * L
                PR = CI + r0   # own group excluded: parents are < base after doubling (r5)

                def rcond(c):
                    return (c[1] > 0) & (c[0] < LOCAL_MAX)

                def rbody(c):
                    k, _ch = c
                    cur = par_ref[pl.ds(r0, RG), :]
                    (gath,) = kl.gather_rows_multi(
                        [(cur, par_bits)], par_ref, r0, nrows=RG,
                        pre=lambda r: r - base,
                    )
                    nw = jnp.where(cur >= base, gath, cur)
                    par_ref[pl.ds(r0, RG), :] = nw
                    return k + 1, jnp.sum((nw >= base).astype(jnp.int32))

                parg = par_ref[pl.ds(r0, RG), :]
                rk, _ = jax.lax.while_loop(
                    rcond, rbody,
                    (jnp.int32(0), jnp.sum((parg >= base).astype(jnp.int32))),
                )
                gflags_ref[1] = gflags_ref[1] + rk
                live8 = _srl(lidx_ref[pl.ds(r0, RG), :], 16) & 1
                if phases == 5:
                    fin8 = par_ref[pl.ds(r0, RG), :] & 0xFF
                else:
                    (val8,) = kl.gather_rows_multi(
                        [(big_ref[0:PR, :], 8)], par_ref, r0, nrows=RG
                    )
                    fin8 = jnp.where(live8 > 0, val8, 0)
                big_ref[pl.ds(CI + r0, RG), :] = fin8
                out_ref[j, pl.ds(r0, RG), :] = fin8

        # --------------------------------------------------------- status
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
        meta_ref[b, 2] = nsteps
        meta_ref[b, 3] = total_out
        meta_ref[b, 4] = gflags_ref[0]        # residual count (fallback trigger)
        meta_ref[b, 5] = gflags_ref[1]        # fallback doubling rounds
        meta_ref[b, 6] = jnp.int32(0)
        meta_ref[b, 7] = jnp.int32(0)

    if phases in (3, 4, 41, 42, 43):
        _cut(phases, *cutacc)


@functools.lru_cache(maxsize=32)
def _compiled(B: int, CI: int, CO: int, phases: int = 99):
    assert B % NB == 0
    P = CI * L
    TROWS = _troWS(P)
    kern = functools.partial(_kernel, CI=CI, CO=CO, phases=phases)
    i32 = jnp.int32

    def call(slen, dlim, comp):
        return pl.pallas_call(
            kern,
            grid=(B // NB,),
            out_shape=(
                jax.ShapeDtypeStruct((B, CO, L), i32),
                jax.ShapeDtypeStruct((B, 8), i32),
            ),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((NB, CI, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((NB, CO, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((NB * CI, L), i32),      # tp
                pltpu.VMEM((NB * CI, L), i32),      # tf
                pltpu.VMEM((NB * (CI + 1), L), i32),  # pt (strided, guard rows)
                pltpu.VMEM((NB * CI, L), i32),      # tpp (partner prod)
                pltpu.VMEM((NB * CI, L), i32),      # tfp (partner field)
                pltpu.VMEM((NB * CI, L), i32),      # tp3 (quad C prod)
                pltpu.VMEM((NB * CI, L), i32),      # tf3 (quad C field)
                pltpu.VMEM((NB * CI, L), i32),      # tp4 (quad D prod)
                pltpu.VMEM((NB * CI, L), i32),      # tf4 (quad D field)
                pltpu.VMEM((TROWS, L), i32),        # tpos (step positions)
                pltpu.VMEM((TROWS, L), i32),        # tpos2 / sposB
                pltpu.VMEM((TROWS, L), i32),        # tpos3 / sposC
                pltpu.VMEM((TROWS, L), i32),        # tpos4 / sposD
                pltpu.VMEM((TROWS, L), i32),        # tp1
                pltpu.VMEM((TROWS, L), i32),        # tf1
                pltpu.VMEM((TROWS, L), i32),        # tp2
                pltpu.VMEM((TROWS, L), i32),        # tf2
                pltpu.VMEM((TROWS, L), i32),        # tp3s
                pltpu.VMEM((TROWS, L), i32),        # tf3s
                pltpu.VMEM((TROWS, L), i32),        # tp4s
                pltpu.VMEM((TROWS, L), i32),        # tf4s
                pltpu.VMEM((CO, L), i32),           # h1
                pltpu.VMEM((CO, L), i32),           # h2
                pltpu.VMEM((CO, L), i32),           # par
                pltpu.VMEM((CO, L), i32),           # lidx (live bits)
                pltpu.VMEM((CI + CO, L), i32),      # big: [comp; out] values
                pltpu.SMEM((NB * (CI + 1), L), i32),  # pair walk tables
                pltpu.SMEM((NB * (TROWS + 8), L), i32),  # step buffers
                pltpu.SMEM((max(CO // 8, 8) + 2,), i32),  # group flags + counters
                pltpu.SemaphoreType.DMA,
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024,
            ),
            interpret=prim.interpret_mode(),
        )(slen, dlim, comp)

    return jax.jit(call)


@functools.lru_cache(maxsize=32)
def _compiled_streamed(B: int, MR: int, CI: int, CO: int):
    """Stream-mode decoder: comp = whole stream in HBM (MR, L) + per-block
    offsets; blocks window-DMA + lane-align on device.  Shapes (B, MR, CI)
    are BUCKETED by the caller so serving never recompiles per stream."""
    assert B % NB == 0
    TROWS = _troWS(CI * L)
    kern = functools.partial(_kernel, CI=CI, CO=CO, streamed=True, MR=MR)
    i32 = jnp.int32

    def call(slen, dlim, soffs, stream):
        return pl.pallas_call(
            kern,
            grid=(B // NB,),
            out_shape=(
                jax.ShapeDtypeStruct((B, CO, L), i32),
                jax.ShapeDtypeStruct((B, 8), i32),
            ),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=(
                pl.BlockSpec((NB, CO, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((NB * CI, L), i32),      # tp
                pltpu.VMEM((NB * CI, L), i32),      # tf
                pltpu.VMEM((NB * (CI + 1), L), i32),  # pt (strided, guard rows)
                pltpu.VMEM((NB * CI, L), i32),      # tpp
                pltpu.VMEM((NB * CI, L), i32),      # tfp
                pltpu.VMEM((NB * CI, L), i32),      # tp3
                pltpu.VMEM((NB * CI, L), i32),      # tf3
                pltpu.VMEM((NB * CI, L), i32),      # tp4
                pltpu.VMEM((NB * CI, L), i32),      # tf4
                pltpu.VMEM((TROWS, L), i32),        # tpos
                pltpu.VMEM((TROWS, L), i32),        # tpos2
                pltpu.VMEM((TROWS, L), i32),        # tpos3
                pltpu.VMEM((TROWS, L), i32),        # tpos4
                pltpu.VMEM((TROWS, L), i32),        # tp1
                pltpu.VMEM((TROWS, L), i32),        # tf1
                pltpu.VMEM((TROWS, L), i32),        # tp2
                pltpu.VMEM((TROWS, L), i32),        # tf2
                pltpu.VMEM((TROWS, L), i32),        # tp3s
                pltpu.VMEM((TROWS, L), i32),        # tf3s
                pltpu.VMEM((TROWS, L), i32),        # tp4s
                pltpu.VMEM((TROWS, L), i32),        # tf4s
                pltpu.VMEM((CO, L), i32),           # h1
                pltpu.VMEM((CO, L), i32),           # h2
                pltpu.VMEM((CO, L), i32),           # par
                pltpu.VMEM((CO, L), i32),           # lidx
                pltpu.VMEM((CI + CO, L), i32),      # big
                pltpu.VMEM((CI + 8, L), i32),       # win (window DMA)
                pltpu.VMEM((NB * CI, L), i32),      # compal (aligned comp)
                pltpu.SMEM((NB * (CI + 1), L), i32),  # pair walk tables
                pltpu.SMEM((NB * (TROWS + 8), L), i32),  # step buffers
                pltpu.SMEM((max(CO // 8, 8) + 2,), i32),  # group flags
                pltpu.SemaphoreType.DMA,
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024,
            ),
            interpret=prim.interpret_mode(),
        )(slen, dlim, soffs, stream)

    return call


def _round_up(n: int, m: int) -> int:
    return (n + m - 1) // m * m


def decode_blocks(comp: np.ndarray, src_lens: np.ndarray, block_out: int):
    """Batched independent-fragment decode (fused kernel).

    comp: uint8[B, Pin] zero-padded; src_lens: int[B]; block_out: per-block
    output capacity.  Returns (out uint8[B, block_out], produced, status).
    """
    B, Pin = comp.shape
    P = prim.bucket_pow2(_round_up(max(Pin, 1024), 1024), 1024)
    OC = _round_up(max(block_out, 1024), 1024)
    Bp = prim.bucket_pow2(max(B, 1), 8)
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
