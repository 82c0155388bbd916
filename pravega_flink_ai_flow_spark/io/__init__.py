from . import batch
from .pravega_server import PravegaEmulatorServer
from .pravega_sim import StreamDir
from .pravega_source import PravegaSocketDataSource
from .pravega_source import register as register_pravega_socket

__all__ = ["batch", "StreamDir", "PravegaEmulatorServer",
           "PravegaSocketDataSource", "register_pravega_socket"]
