from . import deflate, gzip, zlib

__all__ = ["deflate", "gzip", "zlib"]
