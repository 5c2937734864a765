"""Error taxonomy for the decoder.

Mirrors the capability of the reference's typed error enum
(ref: jxl/src/error.rs) — in particular the `OutOfBounds(n)` convention:
every parsing routine that runs out of input raises OutOfBounds with the
number of *additional bytes* needed, which the streaming API layer turns
into `NeedsMoreInput{size_hint}` so decoding can resume byte-by-byte.
"""

from __future__ import annotations


class JxlError(Exception):
    """Base class for all decoder errors (malformed input, limits, ...)."""


class OutOfBounds(JxlError):
    """Ran out of input; `needed` more bytes are required to make progress.

    This is the universal resumability signal — see api/decoder.py.
    """

    def __init__(self, needed: int = 1):
        super().__init__(f"out of bounds: need {needed} more bytes")
        self.needed = max(int(needed), 1)


class InvalidBitstream(JxlError):
    """Malformed codestream (bad signature, invalid field, range error...)."""


class NonZeroPadding(InvalidBitstream):
    pass


class InvalidEnum(InvalidBitstream):
    def __init__(self, enum_name: str, value: int):
        super().__init__(f"invalid value {value} for enum {enum_name}")


class InvalidSignature(InvalidBitstream):
    pass


class SizeOverflow(InvalidBitstream):
    pass


class ArithmeticOverflow(InvalidBitstream):
    pass


class LimitExceeded(JxlError):
    """Decoder-configured resource limit exceeded (e.g. sample_limit)."""


class NotSupported(JxlError):
    """Valid bitstream uses a feature this build does not implement yet."""


class InternalError(JxlError):
    """Invariant violation — a bug in the decoder, not the input."""
