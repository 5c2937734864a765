"""Splines (stub — full implementation in features work)."""
from ..errors import NotSupported


class Splines:
    @staticmethod
    def read(br, num_pixels):
        raise NotSupported("splines not yet implemented")
