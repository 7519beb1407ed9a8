"""TPU-native block decoder — chunk-composition formulation.

Decodes one independent Snappy fragment (≤ 32 KiB output) per batch row.
Replaces `decode_jnp`'s global pointer-doubling (whose arbitrary-index
gathers XLA:TPU serializes to ~140M elem/s) with the ARCHITECTURE.md design:

  A1. dense speculative tag parse at every byte;
  A2. in-chunk composition: per 128-byte chunk, "first tag position at or
      beyond the chunk end" via 7 rounds of *local* one-hot einsum gathers
      (9 G elem/s measured vs 0.11 G for XLA gather);
  A3. the real tag chain: a lax.scan walk across chunk boundaries
      (≤ P/128 steps, batch-amortized);
  A4. tag marking: frontier propagation with the saved per-level local jump
      maps (vector × one-hot-matrix einsums);
  B1. covering-tag map with NO scatter: per output chunk, an 8-input-chunk
      window (a COPY_4 len-1 tag consumes 5 bytes per output byte, so 128
      output bytes span ≤ 7 input chunks) selected by one-hot row einsums,
      then a two-stage dense argmax over the monotone out_start values;
  B2. copy resolution: local one-hot rounds for offsets within a chunk
      (kills RLE chains), then a few global MXU-gather rounds for
      cross-chunk parents;
  B3. literal values materialized once, final value = one 1-limb gather.

Error contract identical to the reference decoder: truncated tags /
offset 0 / offset > written ⇒ E_DATA_MALFORMED; output beyond the block
capacity ⇒ E_OUTPUT_OVERRUN; never an out-of-bounds access on any input.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..errors import E_DATA_MALFORMED, E_OK, E_OUTPUT_OVERRUN
from ..models import wire
from . import primitives as prim

L = 128              # chunk length = lane count
WIN = 8              # input-chunk window per output chunk (see B1 note)
LOCAL_ROUNDS = 7     # 2^7 = 128 covers any within-chunk tag chain
GLOBAL_ROUNDS = 9    # cross-chunk parent chains hop >= 1 chunk => <= 256 hops


def _oh(idx, n, dtype=jnp.bfloat16):
    """One-hot along a new trailing axis of size n (exact 0/1)."""
    iota = jax.lax.broadcasted_iota(jnp.int32, idx.shape + (n,), idx.ndim)
    return (idx[..., None] == iota).astype(dtype)


# ------------------------------------------------------------------ A1 --


def _parse(comp, src_len, out_cap):
    P = comp.shape[0]
    ext = jnp.concatenate([comp, jnp.zeros((4,), jnp.int32)])
    b1, b2, b3, b4 = (jax.lax.dynamic_slice_in_dim(ext, k, P) for k in range(1, 5))
    kind = comp & 3
    u = comp >> 2
    is_lit = kind == wire.TAG_LITERAL

    extra = jnp.clip(u - 59, 0, 4)
    le4 = (
        b1.astype(jnp.uint32)
        | (b2.astype(jnp.uint32) << 8)
        | (b3.astype(jnp.uint32) << 16)
        | (b4.astype(jnp.uint32) << 24)
    )
    shift = (8 * (4 - jnp.maximum(extra, 1))).astype(jnp.uint32)
    trailer = jnp.where(extra > 0, (le4 << shift) >> shift, jnp.uint32(0))
    lit_len_u = trailer + 1
    lit_too_big = (u >= 60) & ((lit_len_u == 0) | (lit_len_u > jnp.uint32(P)))
    lit_len = jnp.where(
        u >= 60, jnp.minimum(lit_len_u, jnp.uint32(P)).astype(jnp.int32), u + 1
    )

    hdr = jnp.where(
        is_lit,
        1 + extra,
        jnp.where(kind == wire.TAG_COPY_1, 2, jnp.where(kind == wire.TAG_COPY_2, 3, 5)),
    )
    copy_len = jnp.where(kind == wire.TAG_COPY_1, (u & 7) + wire.MIN_MATCH, u + 1)
    copy_off = jnp.where(
        kind == wire.TAG_COPY_1,
        ((u >> 3) << 8) | b1,
        jnp.where(kind == wire.TAG_COPY_2, b1 | (b2 << 8), b1 | (b2 << 8) | (b3 << 16) | (b4 << 24)),
    )
    # copy4 offsets >= 2^17 cannot be valid inside a <=32K block; clamp to a
    # sentinel that always fails the offset check but keeps limb math exact
    copy_off = jnp.where((copy_off < 0) | (copy_off > P + out_cap), P + out_cap + 1, copy_off)

    produced = jnp.where(is_lit, lit_len, copy_len)
    produced = jnp.minimum(produced, out_cap + 1)
    advance = hdr + jnp.where(is_lit, lit_len, 0)

    pos = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)[:, 0]
    in_range = pos < src_len
    err = in_range & ((pos + advance > src_len) | (is_lit & lit_too_big))
    return dict(
        pos=pos,
        kind=kind,
        err=err.astype(jnp.int32),
        in_range=in_range,
        advance=advance,
        produced=jnp.where(in_range & ~err, produced, 0),
        copy_off=copy_off,
        lit_src=pos + hdr,
    )


# ------------------------------------------------------------------ A2 --


def _compose_chunks(t, src_len, P):
    """In-chunk composition. Returns (F, S, E, level_maps) with
    F[p] = first tag position ≥ chunk_end(p) on the chain from p (or P),
    S[p] = output produced strictly before reaching F[p],
    E[p] = any errored tag on that path."""
    CI = P // L
    pos = t["pos"]
    usable = t["in_range"] & (t["err"] == 0)
    # clean-end absorbing state: the chain lands exactly on src_len, which
    # self-loops so composition and the walk both terminate there
    F = jnp.where(
        usable, jnp.minimum(pos + t["advance"], P), jnp.where(pos == src_len, src_len, P)
    )
    S = t["produced"]
    E = t["err"]
    chunk_end = ((pos >> 7) + 1) << 7

    levels = []
    for _ in range(LOCAL_ROUNDS):
        levels.append((F, F < chunk_end))
        F, S, E = prim.compose_round(F, S, E, chunk_end)
    return F, S, E, levels


# ------------------------------------------------------------------ A3 --


def _walk(F, S, E, src_len, P):
    """Sequential chain walk across chunk boundaries (lax.scan over CI)."""
    CI = P // L
    F_ext = jnp.concatenate([F, jnp.full((1,), P, jnp.int32)])
    S_ext = jnp.concatenate([S, jnp.zeros((1,), jnp.int32)])
    E_ext = jnp.concatenate([E, jnp.zeros((1,), jnp.int32)])

    def step(carry, c):
        posn, out, err = carry
        inside = (posn >> 7) == c
        p = jnp.minimum(posn, P)
        f, s, e = F_ext[p], S_ext[p], E_ext[p]
        entry = jnp.where(inside, posn, -1)
        entry_out = jnp.where(inside, out, 0)
        entry_s = jnp.where(inside, s, 0)
        posn = jnp.where(inside, f, posn)
        out = jnp.where(inside, jnp.minimum(out + s, 1 << 23), out)
        err = jnp.where(inside, err | e, err)
        return (posn, out, err), (entry, entry_out, entry_s)

    init = (jnp.int32(0), jnp.int32(0), jnp.int32(0))
    (pos_f, total_out, err_f), (entry, entry_out, entry_s) = jax.lax.scan(
        step, init, jnp.arange(CI, dtype=jnp.int32)
    )
    consumed = (pos_f == src_len) | (src_len == 0)
    return entry, entry_out, entry_s, total_out, err_f, consumed


# ------------------------------------------------------------------ A4 --


def _mark_tags(levels, entry, P):
    """Frontier propagation from each chunk's entry using saved level maps."""
    CI = P // L
    e_local = jnp.where(entry >= 0, entry & (L - 1), L)  # L = no entry
    m = jnp.where(
        _oh(e_local, L + 1, dtype=jnp.int32)[:, :L] > 0, 1, 0
    )  # (CI, L) int32
    for F_k, local_k in levels:
        tgt = jnp.where(local_k, F_k & (L - 1), L).reshape(CI, L)
        m = prim.local_scatter_or(m, tgt)  # includes the OR with m
    return m.reshape(-1) > 0


# ------------------------------------------------------------------ B1 --


def _cover(t, is_tag, os, entry_out, total_out, out_cap, P):
    """Per-output-byte covering-tag fields, scatter-free.

    Two gather windows per output chunk (a long literal can put the tags
    after it arbitrarily far past the chunk that covers the chunk start):
      * row A  — chain chunk ``ic`` = max{c : entry_out[c] <= o_chunk_start}.
        The tag covering the chunk start lives in ``ic`` itself.
      * window B — WIN chunks from ``ic2`` = the next chain chunk after
        ``ic`` (first with entry_out > o_chunk_start).  Tags past the
        straddling tag with os inside this output chunk span <= 128*5+5
        input bytes from ic2's entry, so WIN=8 chunks suffice.
    The covering tag of byte o = the candidate with the larger os <= o
    (os is strictly increasing over tags, so max-os = latest tag).
    """
    CI, CO = P // L, out_cap // L
    o_chunk_start = jnp.arange(CO, dtype=jnp.int32) << 7

    # chunks the chain never enters have entry −1
    has_entry = entry_out >= 0
    eo = entry_out
    cmpm = has_entry[None, :] & (eo[None, :] <= o_chunk_start[:, None])
    cidx = jax.lax.broadcasted_iota(jnp.int32, (CO, CI), 1)
    ic = jnp.clip(jnp.max(jnp.where(cmpm, cidx, -1), axis=1), 0, CI - 1)
    nxt = has_entry[None, :] & (eo[None, :] > o_chunk_start[:, None])
    ic2 = jnp.clip(jnp.min(jnp.where(nxt, cidx, CI), axis=1), 0, CI - 1)

    rows = jnp.concatenate(
        [ic, (ic2[None, :] + jnp.arange(WIN)[:, None]).reshape(-1)]
    )  # (CO + WIN*CO,)

    def window(field):
        got = prim.row_gather(field.reshape(CI, L), rows)  # (CO + WIN*CO, L)
        a = got[:CO]                                       # (CO, L)
        b = got[CO:].reshape(WIN, CO, L).transpose(1, 0, 2).reshape(CO, WIN * L)
        return a, b

    big = (1 << 22) - 1
    os_key = jnp.where(is_tag, jnp.minimum(os, big), big)
    a_os, b_os = window(os_key)
    # packed fields: kind(2b) | off(17b valid<=2^17) … off needs up to 17 bits
    off_clip = jnp.clip(t["copy_off"], 0, (1 << 17) - 1)
    packed = t["kind"] | (off_clip << 2)
    a_packed, b_packed = window(packed)
    a_lit, b_lit = window(jnp.clip(t["lit_src"], 0, P - 1))

    o = jax.lax.broadcasted_iota(jnp.int32, (CO, L), 1) + o_chunk_start[:, None]
    # per window: last slot with os <= o (slots in input order; os strictly
    # increasing over real tags, sentinel big elsewhere)
    le_a = a_os[:, None, :] <= o[:, :, None]                   # (CO, L, L)
    sidx_a = jax.lax.broadcasted_iota(jnp.int32, (CO, L, L), 2)
    slot_a = jnp.max(jnp.where(le_a, sidx_a, -1), axis=2)      # (CO, L)
    le_b = b_os[:, None, :] <= o[:, :, None]                   # (CO, L, WIN*L)
    sidx_b = jax.lax.broadcasted_iota(jnp.int32, (CO, L, WIN * L), 2)
    slot_b = jnp.max(jnp.where(le_b, sidx_b, -1), axis=2)      # (CO, L)
    valid_a, valid_b = slot_a >= 0, slot_b >= 0

    def pick(w_field, slot, width):
        return prim.rowwise_gather(w_field, jnp.clip(slot, 0, width - 1), limbs=3)

    ta_os = pick(a_os, slot_a, L)
    tb_os = pick(b_os, slot_b, WIN * L)
    use_b = valid_b & ((tb_os >= ta_os) | ~valid_a)

    def choose(a_field, b_field):
        va = pick(a_field, slot_a, L)
        vb = pick(b_field, slot_b, WIN * L)
        return jnp.where(use_b, vb, va).reshape(-1)

    t_os = jnp.where(use_b, tb_os, ta_os).reshape(-1)
    t_packed = choose(a_packed, b_packed)
    t_lit = choose(a_lit, b_lit)
    t_kind = t_packed & 3
    t_off = t_packed >> 2
    valid = valid_a | valid_b
    live = (jnp.arange(out_cap) < total_out) & valid.reshape(-1)
    return t_os, t_kind, t_off, t_lit, live


# ------------------------------------------------------------------ B2/B3


def _resolve_copies(comp, t_os, t_kind, t_off, t_lit, live, out_cap, P):
    o = jnp.arange(out_cap, dtype=jnp.int32)
    is_copy = live & (t_kind != wire.TAG_LITERAL)
    parent = jnp.where(is_copy, o - t_off, o)
    copy_err = is_copy & ((t_off <= 0) | (parent < 0))
    parent = jnp.clip(parent, 0, out_cap - 1)

    # literal byte values, dense
    root_src = jnp.clip(t_lit + (o - t_os), 0, P - 1)
    lit_val = prim.table_gather(comp, root_src, limbs=1)  # bytes

    # local rounds: parents within the same output chunk
    for _ in range(LOCAL_ROUNDS):
        local = (parent >> 7) == (o >> 7)
        li = jnp.where(local, parent & (L - 1), o & (L - 1))
        g = prim.local_gather(parent.reshape(-1, L), li.reshape(-1, L)).reshape(-1)
        parent = jnp.where(local, g, parent)

    # global rounds: cross-chunk hops (chain length <= out_cap/128)
    for _ in range(GLOBAL_ROUNDS):
        parent = prim.table_gather(parent, parent, limbs=2)

    out = prim.table_gather(lit_val, parent, limbs=1)
    out = jnp.where(live, out, 0)
    return out, jnp.any(copy_err)


# ----------------------------------------------------------------- core --


def _decode_block_core(comp, src_len, dst_limit, *, out_cap: int):
    """comp: int32[P] (P % 128 == 0); returns (out u8[out_cap], produced, status)."""
    P = comp.shape[0]
    t = _parse(comp, src_len, out_cap)
    F, S, E, levels = _compose_chunks(t, src_len, P)
    entry, entry_out_raw, entry_s, total_out, err_walk, consumed = _walk(F, S, E, src_len, P)
    entry_out = jnp.where(entry >= 0, entry_out_raw, -1)

    is_tag = _mark_tags(levels, entry, P) & t["in_range"]
    # out_start[p] = entry_out[chunk] + (S[entry] - S[p]); per-chunk scalars
    # broadcast densely (no gather)
    CI = P // L
    base = (entry_out_raw + entry_s)[:, None]  # (CI, 1)
    os = (base - S.reshape(CI, L)).reshape(-1)
    os = jnp.where(is_tag, os, 0)

    overrun = total_out > dst_limit
    cap_ok = total_out <= out_cap
    t_os, t_kind, t_off, t_lit, live = _cover(t, is_tag, os, entry_out, total_out, out_cap, P)
    out, copy_err = _resolve_copies(comp, t_os, t_kind, t_off, t_lit, live, out_cap, P)

    malformed = (err_walk > 0) | ~consumed | copy_err
    status = jnp.where(
        malformed, E_DATA_MALFORMED, jnp.where(overrun | ~cap_ok, E_OUTPUT_OVERRUN, E_OK)
    )
    produced = jnp.where(status == E_OK, total_out, 0)
    return out.astype(jnp.uint8), produced, status


@functools.lru_cache(maxsize=32)
def _compiled(P: int, out_cap: int):
    return jax.jit(jax.vmap(functools.partial(_decode_block_core, out_cap=out_cap)))


prim.register_trace_cache(_compiled)


def decode_blocks(comp: np.ndarray, src_lens: np.ndarray, block_out: int):
    """Batched independent-fragment decode (drop-in for decode_jnp.decode_blocks)."""
    B, P = comp.shape
    if P % L:
        raise ValueError("compressed width must be a multiple of 128")
    fn = _compiled(P, block_out)
    out, produced, status = fn(
        jnp.asarray(comp.astype(np.int32)),
        jnp.asarray(src_lens.astype(np.int32)),
        jnp.full((B,), block_out, np.int32),
    )
    return np.asarray(out), np.asarray(produced), np.asarray(status)
