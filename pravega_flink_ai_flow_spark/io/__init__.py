from . import batch
from .pravega_sim import StreamDir

__all__ = ["batch", "StreamDir"]
