"""csnappy_tpu — a TPU-native Snappy codec framework.

A from-scratch JAX/XLA/Pallas implementation of the Snappy compression format
with the full capability surface of the C reference (zeevt/csnappy, see
SURVEY.md): whole-stream and headerless-fragment APIs, safe bounds-checked
decode with the reference's error-code contract, zram-style batched block
mode with a length-table container, CLI/selftest harness, and data-parallel
scale-out over TPU meshes.
"""
import os as _os


def _honor_platform_env() -> None:
    """Make JAX_PLATFORMS behave as documented.

    This image's sitecustomize force-registers its TPU platform and wins over
    the environment variable; restore the user's choice before any backend
    initialization."""
    want = _os.environ.get("JAX_PLATFORMS")
    if not want:
        return
    try:
        import jax
        import jax._src.xla_bridge as _xb

        if not _xb._backends:
            jax.config.update("jax_platforms", want)
    except Exception:
        pass


_honor_platform_env()

from .errors import (
    E_DATA_MALFORMED,
    E_HEADER_BAD,
    E_INPUT_NOT_CONSUMED,
    E_OK,
    E_OUTPUT_INSUF,
    E_OUTPUT_OVERRUN,
    SnappyError,
)
from .models import wire

__version__ = "0.1.0"
CSNAPPY_COMPAT_VERSION = 5  # API-parity version (csnappy.h:11)

__all__ = [
    "wire",
    "SnappyError",
    "E_OK",
    "E_HEADER_BAD",
    "E_OUTPUT_INSUF",
    "E_OUTPUT_OVERRUN",
    "E_INPUT_NOT_CONSUMED",
    "E_DATA_MALFORMED",
]
