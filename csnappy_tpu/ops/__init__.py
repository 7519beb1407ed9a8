from . import decode_jnp

__all__ = ["decode_jnp"]
