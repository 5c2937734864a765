"""Simple whole-buffer decode entry point (non-streaming).

The full streaming typestate API lives in api/decoder.py; this helper
decodes a complete .jxl byte buffer in one call — the path used by tests
and the CLI for whole files.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..errors import NotSupported
from ..io.bit_reader import BitReader
from ..io.container import extract_codestream
from ..io.headers import FileHeader
from ..io.headers.frame import Encoding, FrameHeader, FrameType, Toc
from .frame import Frame


@dataclass
class DecodedFrame:
    frame: Frame
    # channels as int planes (modular) — color conversion happens in render
    channels: list


def parse_frame(br: BitReader, file_header: FileHeader, decoder_state=None) -> Frame:
    frame_header = FrameHeader.read(br, file_header)
    toc = Toc.read(br, frame_header.num_toc_entries)
    return Frame(frame_header, toc, file_header, decoder_state)


def decode_first_frame(data: bytes) -> DecodedFrame:
    """Decode headers + the first frame of a .jxl file (modular path)."""
    codestream = extract_codestream(data)
    br = BitReader(codestream)
    fh = FileHeader.read(br)
    icc_profile = None
    if fh.image_metadata.color_encoding.want_icc:
        from ..icc.decode import read_icc

        icc_profile = read_icc(br)

    frame = parse_frame(br, fh)
    frame.icc_profile = icc_profile
    frame.decode_all_sections(br)

    channels = []
    if frame.modular_color_channels:
        for c in range(frame.modular_color_channels):
            channels.append(frame.modular_channel(c))
    for i in range(len(fh.image_metadata.extra_channel_info)):
        channels.append(frame.modular_channel(3 + i))
    return DecodedFrame(frame, channels)
