"""Parallel Snappy encoder — XLA/jnp backend.

The reference compressor (csnappy_compress_fragment,
csnappy_compress.c:469-606) is a sequential greedy scan over a lossy hash
table.  The TPU formulation evaluates every input position at once:

1. **Match finding** — two complementary, fully vectorized probes:
   * *near* (offset 1..63): direct shifted word compares (pure VPU, no
     gathers) — exhaustive over small distances, where most text matches
     live and where the reference's hash table is weakest (collisions).
   * *far* (offset 64..32K): a hash table (same multiplier 0x1e35a7bd,
     csnappy_compress.c:228-232) updated by a 64-position segment scan —
     candidates come from strictly earlier segments, so no serial dependence
     inside a segment; distances < 64 are already covered by the near probe.
2. **Match-length extension** — word-XOR rounds; the low-order byte count of
   the first mismatching word is the vector analog of the reference's
   64-bit ctz trick (FindMatchLength, csnappy_compress.c:252-295).  Capped
   at 64: a longer match simply re-matches at the next committed position,
   emitting the same 64-byte COPY_2 chunking the reference produces.
3. **Greedy commit** — the sequential "take match, jump len, else step 1"
   recurrence is a successor function; its orbit from position 0 (the set of
   committed tags) is resolved with doubled jump pointers, exactly like the
   decoder's tag-boundary phase.
4. **Emission** — literal runs are found with mask algebra + suffix-min,
   per-tag sizes prefix-summed into output offsets, and every *output* byte
   computes its own value from the covering tag (scatter + cummax + gathers),
   so the variable-length tag stream is written with no sequential pass.

The emitted grammar follows the reference's rules exactly (COPY_1 iff
len<12 and offset<2048; literal length trailers; no COPY_4; no offset ever
crosses the fragment boundary), so any Snappy decoder accepts it.

Block size is a static parameter: 32768 for whole-stream fragments, 4096 for
zram-style pages (each size compiles once; hash-table order follows the
reference's workmem rule, kernel_3_2_10.patch WMSIZE_ORDER).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..models import wire

BS = wire.BLOCK_SIZE          # 32768 — default fragment size
SEG = 64                      # far-table segment length
NEAR_MAX = 64                 # offsets 1..63 by shifted compare
MLEN_CAP = wire.MAX_COPY_LEN  # 64


def _out_cap(bs: int) -> int:
    """Padded per-block output capacity ≥ max_compressed_length(bs)."""
    return (wire.max_compressed_length(bs) + 127) // 128 * 128


def _hash_bits(bs: int) -> int:
    """Table order per the reference's workmem rule
    (min(PAGE_SHIFT+1, 15) workmem order, kernel_3_2_10.patch:1346)."""
    return min(15, max(8, bs.bit_length() - 1))


def _ceil_log2(n: int) -> int:
    return max(1, int(n - 1).bit_length())


def _suffix_min(x):
    return jnp.flip(jax.lax.cummin(jnp.flip(x)))


def _trailing_eq_bytes(x):
    """Number of matching low-order (little-endian leading) bytes of XOR word x≠0."""
    return (
        ((x & 0xFF) == 0).astype(jnp.int32)
        + ((x & 0xFFFF) == 0).astype(jnp.int32)
        + ((x & 0xFFFFFF) == 0).astype(jnp.int32)
    )


def _match_length(w, cand, valid, pos, blen, bs):
    """Extend verified-4-byte matches word-by-word up to MLEN_CAP / block end."""
    maxlen = jnp.where(valid, jnp.minimum(MLEN_CAP, blen - pos), 0)
    ml = jnp.where(valid, 4, 0)
    done = ~valid

    def body(_, carry):
        ml, done = carry
        a = w[jnp.clip(pos + ml, 0, bs - 1)]
        b = w[jnp.clip(cand + ml, 0, bs - 1)]
        x = a ^ b
        step = jnp.where(x == 0, 4, _trailing_eq_bytes(x))
        ml2 = jnp.minimum(ml + jnp.where(done, 0, step), maxlen)
        done = done | (x != 0) | (ml2 >= maxlen)
        return ml2, done

    ml, _ = jax.lax.fori_loop(0, (MLEN_CAP - 4) // 4 + 1, body, (ml, done))
    return ml


def _find_matches(w, pos, blen, bs):
    """Per-position best match: (length, offset); length<4 means none."""
    can_match = pos + 4 <= blen

    # near probe: smallest offset 1..63 whose 4-byte window equals ours
    def near_body(d, best):
        wd = jnp.roll(w, d)
        ok = can_match & (pos >= d) & (w == wd)
        return jnp.where((best == 0) & ok, d, best)

    best_d = jax.lax.fori_loop(1, NEAR_MAX, near_body, jnp.zeros((bs,), jnp.int32))
    cand_near = pos - best_d
    near_ok = best_d > 0

    # far probe: segment-scanned hash table (most recent earlier-segment pos)
    hb = _hash_bits(bs)
    h = ((w.astype(jnp.uint32) * jnp.uint32(wire.HASH_MULTIPLIER)) >> (32 - hb)).astype(
        jnp.int32
    )

    def far_step(table, hp):
        hs, ps = hp
        cand = table[hs]
        table = table.at[hs].max(ps)
        return table, cand

    _, far = jax.lax.scan(
        far_step,
        jnp.full((1 << hb,), -1, jnp.int32),
        (h.reshape(bs // SEG, SEG), pos.reshape(bs // SEG, SEG)),
    )
    cand_far = far.reshape(bs)
    far_ok = can_match & (cand_far >= 0) & (w[jnp.clip(cand_far, 0, bs - 1)] == w)

    ml_near = _match_length(w, cand_near, near_ok, pos, blen, bs)
    ml_far = _match_length(w, cand_far, far_ok, pos, blen, bs)
    use_far = ml_far > ml_near  # tie → near (smaller offset → cheaper tag)
    mlen = jnp.maximum(ml_near, ml_far)
    off = jnp.where(use_far, pos - cand_far, best_d)
    return mlen, off


def _greedy_commit(mlen, pos, blen, bs):
    """Orbit of 0 under i -> i + (mlen[i] if match else 1): the committed tags."""
    valid = mlen >= wire.MIN_MATCH
    adv = jnp.where(valid, mlen, 1)
    nxt = jnp.where(pos < blen, jnp.minimum(pos + adv, bs), bs)
    J = jnp.concatenate([nxt, jnp.array([bs], jnp.int32)])
    m = jnp.zeros((bs + 1,), jnp.int32).at[0].set(1)

    def body(_, carry):
        m, J = carry
        m = m.at[J].max(m, mode="drop")
        J = J[J]
        return m, J

    m, _ = jax.lax.fori_loop(0, _ceil_log2(bs + 1) + 1, body, (m, J))
    committed = m[:bs].astype(bool) & (pos < blen)
    return committed & valid, committed & ~valid


def _emit(data, pos, blen, is_match, is_lit, mlen, off, bs):
    """Materialize the tag stream: per-compressed-byte value via covering tag."""
    oc = _out_cap(bs)
    # literal runs: maximal runs of committed-literal positions
    is_lit_prev = jnp.concatenate([jnp.zeros((1,), bool), is_lit[:-1]])
    run_start = is_lit & ~is_lit_prev
    next_non_lit = _suffix_min(jnp.where(is_lit, bs, pos))
    runlen = jnp.minimum(next_non_lit, blen) - pos  # meaningful at run_start

    rl1 = runlen - 1
    extra = jnp.where(rl1 < 60, 0, jnp.where(rl1 < 256, 1, 2))
    lit_total = 1 + extra + runlen
    use_c1 = is_match & (mlen <= wire.COPY1_MAX_LEN) & (off < wire.COPY1_MAX_OFFSET)
    copy_total = jnp.where(use_c1, 2, 3)

    is_tag = run_start | is_match
    tag_sz = jnp.where(run_start, lit_total, jnp.where(is_match, copy_total, 0))
    cum = jnp.cumsum(tag_sz)
    out_off = cum - tag_sz
    comp_len = cum[-1]

    # covering tag per compressed output byte
    scat = jnp.where(is_tag & (out_off < oc), out_off, oc)
    cover = (
        jnp.full((oc + 1,), -1, jnp.int32)
        .at[scat]
        .max(jnp.where(is_tag, pos, -1), mode="drop")[:oc]
    )
    cover = jax.lax.cummax(cover)
    p = jnp.clip(cover, 0, bs - 1)

    o = jax.lax.broadcasted_iota(jnp.int32, (oc, 1), 0)[:, 0]
    delta = o - out_off[p]
    t_lit = is_lit[p]
    t_rl1 = rl1[p]
    t_extra = extra[p]
    t_len = mlen[p]
    t_off = off[p]
    t_c1 = use_c1[p]

    lit_op = jnp.where(t_rl1 < 60, t_rl1 << 2, (59 + t_extra) << 2)
    lit_trailer = (t_rl1 >> (8 * jnp.maximum(delta - 1, 0))) & 0xFF
    payload = data[jnp.clip(p + delta - 1 - t_extra, 0, bs - 1)]
    lit_val = jnp.where(
        delta == 0, lit_op, jnp.where(delta <= t_extra, lit_trailer, payload)
    )

    c1_op = wire.TAG_COPY_1 | ((t_len - wire.MIN_MATCH) << 2) | ((t_off >> 8) << 5)
    c2_op = wire.TAG_COPY_2 | ((t_len - 1) << 2)
    copy_val = jnp.where(
        t_c1,
        jnp.where(delta == 0, c1_op, t_off & 0xFF),
        jnp.where(
            delta == 0, c2_op, jnp.where(delta == 1, t_off & 0xFF, (t_off >> 8) & 0xFF)
        ),
    )

    val = jnp.where(t_lit, lit_val, copy_val) & 0xFF
    live = (o < comp_len) & (cover >= 0)
    return jnp.where(live, val, 0).astype(jnp.uint8), comp_len


def _encode_core(data, blen, *, bs: int):
    """data: int32[bs] byte values (zero-padded past blen); blen: int32 scalar.

    Returns (comp uint8[_out_cap(bs)], comp_len int32).
    """
    pos = jax.lax.broadcasted_iota(jnp.int32, (bs, 1), 0)[:, 0]
    ext = jnp.concatenate([data, jnp.zeros((3,), jnp.int32)])
    b1, b2, b3 = (jax.lax.dynamic_slice_in_dim(ext, k, bs) for k in range(1, 4))
    w = data | (b1 << 8) | (b2 << 16) | (b3 << 24)

    mlen, off = _find_matches(w, pos, blen, bs)
    is_match, is_lit = _greedy_commit(mlen, pos, blen, bs)
    return _emit(data, pos, blen, is_match, is_lit, mlen, off, bs)


@functools.lru_cache(maxsize=8)
def _compiled_batch(bs: int):
    return jax.jit(jax.vmap(functools.partial(_encode_core, bs=bs)))


def encode_blocks(data: np.ndarray, blens: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Compress B independent fragments.

    data: uint8[B, bs] (zero-padded), bs a power of two ≤ 32768;
    blens: int32[B] actual lengths.
    Returns (comp uint8[B, _out_cap(bs)], comp_lens int32[B]).
    """
    bs = int(data.shape[1])
    if bs % SEG or bs > wire.BLOCK_SIZE:
        raise ValueError(f"block size must be a multiple of {SEG} and <= 32768")
    fn = _compiled_batch(bs)
    comp, lens = fn(jnp.asarray(data.astype(np.int32)), jnp.asarray(blens.astype(np.int32)))
    return np.asarray(comp), np.asarray(lens)


def compress_np(data: bytes | np.ndarray) -> bytes:
    """Whole-stream compress: varint preamble + independent 32 KiB fragments
    (csnappy_compress.c:621-656 semantics), batched on device."""
    buf = np.frombuffer(data, np.uint8) if isinstance(data, (bytes, bytearray)) else data
    n = len(buf)
    out = bytearray(wire.varint_encode(n))
    if n == 0:
        return bytes(out)
    nb = (n + BS - 1) // BS
    padded = np.zeros((nb, BS), np.uint8)
    flat = padded.reshape(-1)
    flat[:n] = buf
    blens = np.full((nb,), BS, np.int32)
    blens[-1] = n - (nb - 1) * BS
    comp, lens = encode_blocks(padded, blens)
    for i in range(nb):
        out += comp[i, : lens[i]].tobytes()
    return bytes(out)
