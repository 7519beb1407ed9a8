"""On-chip phase profiler for the fused kernels (tracing/profiling, A1).

Each fused kernel takes a static ``phases`` knob that truncates its pipeline
after phase N while consuming that phase's outputs (so nothing dead-code-
eliminates).  Slope-timing each prefix and differencing gives a per-phase
cost breakdown on real hardware — the committed analog of the reference's
perf profiles (zram_benchmark.txt:26-101).

Run:  python -m csnappy_tpu.tools.phaseprof [decode|encode] [data_file]
Prints one JSON line per phase prefix.
"""
from __future__ import annotations

import json
import pathlib
import sys

import numpy as np

DEC_PHASES = {1: "parse", 2: "walk", 3: "fields", 41: "cov_scatter",
              42: "cov_fill", 43: "par_analytic", 4: "par_halved",
              5: "resolve_par", 99: "full"}
ENC_PHASES = {1: "prep", 2: "succ", 3: "pack", 4: "walk", 5: "fields",
              6: "sizes", 65: "scatter", 7: "hscans", 8: "valuation",
              99: "full"}


def _load(path: str | None) -> bytes:
    p = pathlib.Path(path) if path else (
        pathlib.Path(__file__).parents[2] / "tests" / "data" / "urls.10K"
    )
    return p.read_bytes()


def profile_decode(data: bytes) -> list[dict]:
    import jax
    import jax.numpy as jnp

    from ..models import pymodel
    from ..ops import decode_fused
    from .timing import slope_time

    B = 32
    blocks = [data[i * 32768 : (i + 1) * 32768] or data[:32768] for i in range(B)]
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
    rows = []
    prev = 0.0
    for ph, name in DEC_PHASES.items():
        fn = decode_fused._compiled(B, P // 128, 256, ph)

        def step(k):
            ck = comp_dev.at[:, -1, 127].add(k & 63)
            o, m = fn(lens_dev, cap_dev, ck)
            return m[:, 0].sum() + o[0, 0, 0]

        sec = slope_time(step, k_lo=4, k_hi=36, reps=3)
        rows.append({"phase": name, "cum_ms": round(sec * 1e3, 3),
                     "delta_ms": round((sec - prev) * 1e3, 3)})
        prev = sec
    total = sum(len(b) for b in blocks)
    rows.append({"GBps_full": round(total / prev / 1e9, 4)})
    return rows


def profile_encode(data: bytes) -> list[dict]:
    import jax
    import jax.numpy as jnp

    from ..ops import encode_fused
    from .timing import slope_time

    n = len(data)
    nb = (n + 32767) // 32768
    Bp = encode_fused._round_up(nb, 8)
    pages = np.zeros((Bp, 32768), np.uint8)
    pages.reshape(-1)[:n] = np.frombuffer(data, np.uint8)
    lens = np.zeros((Bp,), np.int32)
    lens[:nb] = 32768
    lens[nb - 1] = n - (nb - 1) * 32768
    pages_dev = jax.device_put(jnp.asarray(pages.astype(np.int32)))
    lens_dev = jax.device_put(jnp.asarray(lens))
    rows = []
    prev = 0.0
    for ph, name in ENC_PHASES.items():
        fn = encode_fused._compiled(Bp, 256, 16, ph)

        def step(k):
            # padding byte (blocks nb..Bp-1 have blens==0): 64 distinct
            # inputs, like bench.py — the 2-input ^(k&1) form can hit the
            # runtime's identical-call short-circuit (VERDICT r4 weak #1)
            pk = pages_dev.at[Bp - 1, 32767].add(k & 63)
            c, m = fn(pk, lens_dev)
            return m[:, 0].sum() + c[0, 0, 0]

        sec = slope_time(step, k_lo=2, k_hi=10, reps=3)
        rows.append({"phase": name, "cum_ms": round(sec * 1e3, 3),
                     "delta_ms": round((sec - prev) * 1e3, 3)})
        prev = sec
    rows.append({"MBps_full": round(n / prev / 1e6, 1)})
    return rows


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    which = argv[0] if argv else "decode"
    data = _load(argv[1] if len(argv) > 1 else None)
    rows = profile_decode(data) if which == "decode" else profile_encode(data)
    for r in rows:
        print(json.dumps(r), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
