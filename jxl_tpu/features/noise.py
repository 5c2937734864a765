"""Noise (stub — full implementation in features work)."""
from ..errors import NotSupported


class Noise:
    @staticmethod
    def read(br):
        raise NotSupported("noise not yet implemented")
