"""Codec configuration — the reference's knob surface as one dataclass.

The reference exposes: compile-time macros (DEBUG, HAVE_BUILTIN_CTZ, arch
switches), one real runtime knob (``workmem_bytes_power_of_two``, 9..15,
csnappy_compress.c:484-488), getopt flags, and Kconfig choices (SURVEY.md §5
"config / flag system").  Here every tunable is explicit and serializable;
kernels treat each distinct config as a static compile key.
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field


@dataclass(frozen=True)
class CodecConfig:
    # format / kernel shape
    block_size: int = 32768        # fragment size; ≤ 32768, multiple of 64
    page_size: int = 4096          # block-container page size (zram parity)
    hash_bits: int | None = None   # far-table order; None → min(log2(bs), 15),
                                   # the reference's workmem rule (patch :1346)
    near_window: int = 64          # exhaustive shifted-compare offsets 1..n-1
    # batching / mesh
    batch_blocks: int = 0          # 0 → derive from input size
    mesh_axis: str = "blocks"
    # backend selection (jax | py | native)
    backend: str = "jax"
    # debug: run Pallas/XLA kernels in interpreter-equivalent checking mode
    debug_checks: bool = field(
        default_factory=lambda: bool(os.environ.get("CSNAPPY_TPU_DEBUG"))
    )

    def resolved_hash_bits(self) -> int:
        if self.hash_bits is not None:
            return self.hash_bits
        return min(15, max(8, self.block_size.bit_length() - 1))

    def __post_init__(self):
        if self.block_size > 32768 or self.block_size % 64:
            raise ValueError("block_size must be ≤ 32768 and a multiple of 64")
        if not 8 <= self.resolved_hash_bits() <= 16:
            raise ValueError("hash_bits out of range")


DEFAULT = CodecConfig()
