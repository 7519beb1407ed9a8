"""Mesh scale-out — data-parallel block codec over a TPU device mesh.

The reference is single-threaded C; its parallelism hook is format-level:
no back-reference ever crosses a 32 KiB block boundary
(csnappy_compress.c:75-87), so blocks are independent (SURVEY.md §2).  The
TPU-native communication design (SURVEY.md §5) is therefore:

  * scatter fixed-size input blocks across the ``blocks`` mesh axis
    (device placement via shard_map — rides ICI, not DCN, within a host);
  * each device runs the batched encode/decode kernels on its shard with no
    halo exchange;
  * all-gather the per-block compressed *lengths* (a cheap u32 vector) so
    every device/host can compute the global in-order payload offsets —
    the distributed analog of the block container's length table
    (block_compressor.c:298-333);
  * payloads are fetched shard-wise and assembled in block order on host.

Everything compiles under one jit: the collective is XLA's all_gather over
the mesh axis.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import wire
from ..ops import decode_fused, encode_fused


def default_mesh(devices=None, n: int | None = None) -> Mesh:
    devs = list(devices if devices is not None else jax.devices())
    if n is not None:
        devs = devs[:n]
    return Mesh(np.asarray(devs), ("blocks",))


def _shard_encode(data, blens, *, bs: int, mesh: Mesh):
    """shard_map body: local fused-kernel encode + global length all-gather."""
    BR = bs // 128

    def body(d, l):
        B = d.shape[0]
        kern = encode_fused._compiled(B, BR)
        comp, meta = kern(d, l)
        lens = meta[:, 0]
        all_lens = jax.lax.all_gather(lens, "blocks", tiled=True)
        offsets = jnp.cumsum(all_lens) - all_lens  # identical on every device
        return comp.reshape(B, -1), lens, offsets

    # check_vma off: kernel scans/loops carry replicated-initialized state
    # (walk state, frontier masks) that becomes axis-varying — intended.
    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P("blocks", None), P("blocks")),
        out_specs=(P("blocks", None), P("blocks"), P()),
        check_vma=False,
    )(data, blens)


def _shard_decode(comp, clens, dst_limits, *, out_cap: int, mesh: Mesh):
    def body(c, l, dl):
        B, Pw = c.shape
        kern = decode_fused._compiled(B, Pw // 128, out_cap // 128)
        out, meta = kern(l, dl, c.reshape(B, Pw // 128, 128))
        produced, status = meta[:, 0], meta[:, 1]
        all_prod = jax.lax.all_gather(produced, "blocks", tiled=True)
        offsets = jnp.cumsum(all_prod) - all_prod
        return out.reshape(B, -1), produced, status, offsets

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P("blocks", None), P("blocks"), P("blocks")),
        out_specs=(P("blocks", None), P("blocks"), P("blocks"), P()),
        check_vma=False,
    )(comp, clens, dst_limits)


@functools.lru_cache(maxsize=16)
def _compiled_shard_encode(bs: int, mesh: Mesh):
    return jax.jit(functools.partial(_shard_encode, bs=bs, mesh=mesh))


@functools.lru_cache(maxsize=16)
def _compiled_shard_decode(out_cap: int, mesh: Mesh):
    return jax.jit(functools.partial(_shard_decode, out_cap=out_cap, mesh=mesh))


def _pad_batch(nb: int, n_dev: int) -> int:
    return ((nb + n_dev - 1) // n_dev) * n_dev


def compress_sharded(data: bytes, mesh: Mesh | None = None, bs: int = wire.BLOCK_SIZE) -> bytes:
    """Whole-stream compress with blocks data-parallel over the mesh."""
    mesh = mesh or default_mesh()
    n_dev = mesh.devices.size
    buf = np.frombuffer(data, np.uint8)
    n = len(buf)
    out = bytearray(wire.varint_encode(n))
    if n == 0:
        return bytes(out)
    nb = (n + bs - 1) // bs
    # per-device batch must divide into the encode kernel's NBE-block grid
    # steps (4-chain interleaved walk, r4)
    B = _pad_batch(nb, n_dev * encode_fused.NBE)
    pages = np.zeros((B, bs), np.uint8)
    pages.reshape(-1)[:n] = buf
    blens = np.zeros((B,), np.int32)
    blens[:nb] = bs
    blens[nb - 1] = n - (nb - 1) * bs

    fn = _compiled_shard_encode(bs, mesh)
    sh_b = NamedSharding(mesh, P("blocks", None))
    sh_l = NamedSharding(mesh, P("blocks"))
    comp, lens, offsets = fn(
        jax.device_put(pages.astype(np.int32), sh_b), jax.device_put(blens, sh_l)
    )
    comp = np.asarray(comp).astype(np.uint8)   # kernel emits byte-per-int32
    lens = np.asarray(lens)
    from ..ops.encode_fused import _compact

    out += _compact(comp[:nb], lens[:nb])
    return bytes(out)


def decompress_fragments_sharded(
    frags: list[bytes], out_lens: list[int], mesh: Mesh | None = None
) -> list[bytes]:
    """Decode independent headerless fragments data-parallel over the mesh."""
    mesh = mesh or default_mesh()
    n_dev = mesh.devices.size
    nb = len(frags)
    out_cap = max(out_lens) if out_lens else 1
    # round to whole 1024-element row groups: the fused decode kernel picks
    # gather group sizes that require CO = out_cap/128 % 8 == 0 (ADVICE r2)
    out_cap = (out_cap + 1023) // 1024 * 1024
    width = max(len(f) for f in frags) if frags else 1
    width = (width + 1023) // 1024 * 1024
    # per-device batch must divide into the decode kernel's NB-block grid
    # steps (4-chain interleaved walk)
    B = _pad_batch(max(nb, 1), n_dev * decode_fused.NB)
    batch = np.zeros((B, width), np.uint8)
    clens = np.zeros((B,), np.int32)
    # per-fragment dst_limit (ADVICE r1: not the batch-wide out_cap, so a
    # fragment producing more than its declared length is E_OUTPUT_OVERRUN)
    dlims = np.full((B,), out_cap, np.int32)
    for i, f in enumerate(frags):
        batch[i, : len(f)] = np.frombuffer(f, np.uint8)
        clens[i] = len(f)
        dlims[i] = out_lens[i]
    fn = _compiled_shard_decode(out_cap, mesh)
    sh_b = NamedSharding(mesh, P("blocks", None))
    sh_l = NamedSharding(mesh, P("blocks"))
    out, produced, status, _ = fn(
        jax.device_put(batch.astype(np.int32), sh_b),
        jax.device_put(clens, sh_l),
        jax.device_put(dlims, sh_l),
    )
    out = np.asarray(out)
    produced = np.asarray(produced)
    status_np = np.asarray(status)
    from ..errors import raise_for_code

    for i in range(nb):
        raise_for_code(int(status_np[i]), f"fragment {i}")
    return [out[i, : produced[i]].astype(np.uint8).tobytes() for i in range(nb)]
