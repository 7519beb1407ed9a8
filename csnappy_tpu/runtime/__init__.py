from . import container

__all__ = ["container"]
