"""Benchmark-table generator — userspace_benchmark.txt parity (C14/C17).

Reproduces the reference's published table format (file, in→out bytes,
ratio, compress MB/s, decompress MB/s) for any set of input files, per
backend.  The reference produced its table with Google snappy's patched
snappy_unittest (snappy_tester.patch); here the harness is built in.

Usage:  python -m csnappy_tpu.tools.benchtable [-b jax|py|native] FILES...
"""
from __future__ import annotations

import argparse
import sys
import time

from .. import api


def measure(data: bytes, backend: str, reps: int = 3) -> dict:
    comp = api.compress(data, backend=backend)
    t_c = min(
        _timed(lambda: api.compress(data, backend=backend)) for _ in range(reps)
    )
    out = api.decompress(comp, backend=backend)
    assert out == data, "roundtrip mismatch"
    t_d = min(
        _timed(lambda: api.decompress(comp, backend=backend)) for _ in range(reps)
    )
    return dict(
        n_in=len(data),
        n_out=len(comp),
        ratio=100.0 * len(comp) / max(len(data), 1),
        c_mbps=len(data) / t_c / 1e6,
        d_mbps=len(data) / t_d / 1e6,
    )


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return max(time.perf_counter() - t0, 1e-9)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-b", "--backend", default="native", choices=["jax", "py", "native"])
    ap.add_argument("files", nargs="+")
    args = ap.parse_args(argv)
    print(f"backend={args.backend}")
    print(f"{'file':<28} {'in->out bytes':>20} {'ratio':>7} {'comp':>10} {'decomp':>10}")
    for path in args.files:
        with open(path, "rb") as f:
            data = f.read()
        m = measure(data, args.backend)
        name = path.rsplit("/", 1)[-1]
        print(
            f"{name:<28} {m['n_in']:>9} -> {m['n_out']:>8} {m['ratio']:>6.1f}% "
            f"{m['c_mbps']:>7.1f}MB/s {m['d_mbps']:>7.1f}MB/s"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
