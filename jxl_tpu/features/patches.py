"""Patches dictionary (stub — full implementation in features work)."""
from ..errors import NotSupported


class PatchesDictionary:
    @staticmethod
    def read(br, w, h, num_ec, reference_frames):
        raise NotSupported("patches not yet implemented")
