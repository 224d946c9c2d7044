"""HTTP/JSON service surface (reference: StorageEngine/API/api_server.hpp)."""

from .server import SamanvayAPIServer, make_server

__all__ = ["SamanvayAPIServer", "make_server"]
