"""ICC profile decompression (stub — full implementation in color work)."""
from ..errors import NotSupported


def read_icc(br):
    raise NotSupported("ICC decoding not yet implemented")
