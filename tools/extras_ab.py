"""A/B the encoder's carried-LCP window count (EXTRAS) on real hardware.

The XLA sort prep is 64% of encode time (records/phaseprof_r4_end_encode);
each carried sort operand costs ~6µs/block.  The r4 staircase propagation
recovers long matches from consecutive-candidate runs, so short direct LCPs
may suffice.  This probe measures, per EXTRAS value: full-encode slope time
and compressed size on urls.10K (must stay <= the reference's 357,267 B).

Run on the TPU:  python tools/extras_ab.py [extras ...]
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from csnappy_tpu.models import pymodel, wire
from csnappy_tpu.ops import encode_fused
from csnappy_tpu.tools.timing import slope_time

DATA = pathlib.Path(__file__).parents[1] / "tests" / "data" / "urls.10K"
REF_SIZE = 357267


def run_one(extras: int, data: bytes):
    encode_fused.EXTRAS = extras
    n = len(data)
    nb = (n + 32767) // 32768
    Bp = encode_fused._round_up(nb, 8)
    pages = np.zeros((Bp, 32768), np.uint8)
    pages.reshape(-1)[:n] = np.frombuffer(data, np.uint8)
    lens = np.zeros((Bp,), np.int32)
    lens[:nb] = 32768
    lens[nb - 1] = n - (nb - 1) * 32768
    fn = encode_fused._compiled.__wrapped__(Bp, 256, 16)
    pages_dev = jax.device_put(jnp.asarray(pages.astype(np.int32)))
    lens_dev = jax.device_put(jnp.asarray(lens))
    comp, meta = jax.device_get(fn(pages_dev, lens_dev))
    comp = comp.reshape(Bp, -1).astype(np.uint8)
    clens = meta[:, 0]
    stream = b"".join(comp[i, : clens[i]].tobytes() for i in range(nb))
    size = len(wire.varint_encode(n)) + len(stream)
    ok = pymodel.decompress_noheader(stream, n) == data

    def enc_step(k):
        pk = pages_dev.at[Bp - 1, 32767].add(k & 63)
        c, m = fn(pk, lens_dev)
        return m[:, 0].sum() + c[0, 0, 0]

    t = slope_time(enc_step, k_lo=4, k_hi=20, reps=3)
    mbps = n / t / 1e6
    print(f"EXTRAS={extras}: size={size} (ref {REF_SIZE}, "
          f"{'OK' if size <= REF_SIZE else 'TOO BIG'}) roundtrip={'OK' if ok else 'FAIL'} "
          f"t={t*1e3:.3f}ms {mbps:.1f} MB/s", flush=True)
    return size, ok, t


def main():
    data = DATA.read_bytes()
    vals = [int(a) for a in sys.argv[1:]] or [7, 4, 2, 1, 0]
    for e in vals:
        run_one(e, data)


if __name__ == "__main__":
    main()
