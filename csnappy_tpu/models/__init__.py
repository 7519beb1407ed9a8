from . import pymodel, wire

__all__ = ["wire", "pymodel"]
