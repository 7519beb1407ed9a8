"""A/B the decode resolve knobs (KFIX doubling rounds, banded-halving
rounds/reach) on real hardware.

resolve_par is 40% of decode time (records/phaseprof_r4_end_decode); the
question is whether stronger (nearly-free) banded halving lets the
per-group MXU doubling drop to one round.  Correctness is pinned by the
fallback path (residual mask -> adaptive while loop), so every combo is
safe; this just measures.

Run on the TPU:  python tools/decode_ab.py "KFIX,BWG,ROUNDS" ...
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from csnappy_tpu.models import pymodel
from csnappy_tpu.ops import decode_fused
from csnappy_tpu.tools.timing import slope_time

DATA = pathlib.Path(__file__).parents[1] / "tests" / "data" / "urls.10K"


def main():
    data = DATA.read_bytes()
    B = 64
    blocks = [data[(i % 21) * 32768 : (i % 21 + 1) * 32768] or data[:32768]
              for i in range(B)]
    frags = [pymodel.compress_fragment(b) for b in blocks]
    P = decode_fused._round_up(max(len(f) for f in frags) + 128, 1024)
    arr = np.zeros((B, P), np.uint8)
    lens = np.zeros((B,), np.int32)
    for i, f in enumerate(frags):
        arr[i, : len(f)] = np.frombuffer(f, np.uint8)
        lens[i] = len(f)
    comp_dev = jax.device_put(jnp.asarray(arr.astype(np.int32)).reshape(B, P // 128, 128))
    lens_dev = jax.device_put(jnp.asarray(lens))
    cap_dev = jax.device_put(jnp.full((B,), 32768, np.int32))
    total = sum(len(b) for b in blocks)

    combos = [tuple(int(x) for x in a.split(",")) for a in sys.argv[1:]] or [(2, 7, 3, 31, 0)]
    for combo in combos:
        kfix, bwg, rounds = combo[:3]
        b2, r2 = (combo[3], combo[4]) if len(combo) > 4 else (31, 0)
        decode_fused.KFIX = kfix
        decode_fused.BWG = bwg
        decode_fused.BWG_ROUNDS = rounds
        decode_fused.BWG2 = b2
        decode_fused.BWG2_ROUNDS = r2
        fn = decode_fused._compiled.__wrapped__(B, P // 128, 256)
        out, meta = jax.device_get(fn(lens_dev, cap_dev, comp_dev))
        ok = all(
            out[i].reshape(-1)[: len(blocks[i])].astype(np.uint8).tobytes() == blocks[i]
            for i in range(B)
        ) and (meta[:, 1] == 0).all()
        resid = int(meta[:, 4].sum())
        fbr = int(meta[:, 5].sum())

        def step(k):
            ck = comp_dev.at[:, -1, 127].add(k & 63)
            o, m = fn(lens_dev, cap_dev, ck)
            return m[:, 0].sum() + o[0, 0, 0]

        t = slope_time(step, k_lo=4, k_hi=20, reps=3)
        print(f"KFIX={kfix} BWG={bwg} R={rounds} BWG2={b2}x{r2}: {'OK' if ok else 'FAIL'} "
              f"t={t*1e3:.3f}ms {total/t/1e9:.4f} GB/s resid={resid} fb={fbr}",
              flush=True)


if __name__ == "__main__":
    main()
