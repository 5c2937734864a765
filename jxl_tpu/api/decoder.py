"""Streaming decoder API: incremental input, resumable at any byte.

Capability reference: jxl/src/api/{decoder,inner/*}.rs. The reference uses
a typestate API (Initialized -> WithImageInfo -> WithFrameInfo) driven by
`process()` returning Complete/NeedsMoreInput{size_hint}; this is the
Pythonic equivalent: feed bytes incrementally, `process()` advances a
stage machine and returns events. Every parsing stage is resumable: on
OutOfBounds(n) the stage's input cursor is rewound and NEED_MORE_INPUT
with a byte hint is returned (the 1-byte-at-a-time tests exercise this).

Device work is dispatched at section granularity; sections only decode
once all their bytes (known from the TOC) have arrived.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field as dfield

import numpy as np

from ..errors import InvalidBitstream, InvalidBox, InvalidSignature, OutOfBounds
from ..io.bit_reader import BitReader
from ..io.container import CODESTREAM_SIG, CONTAINER_SIG
from ..io.headers import FileHeader
from ..io.headers.frame import FrameHeader, FrameType, Toc
from .frame import Frame
from .state import DecoderState


class Event(enum.Enum):
    NEED_MORE_INPUT = "need_more_input"
    IMAGE_INFO = "image_info"
    FRAME_START = "frame_start"
    FRAME_PROGRESSION = "frame_progression"  # new flushable data (see progressive_mode)
    FRAME_DONE = "frame_done"
    COMPLETE = "complete"


class ProgressiveMode(enum.Enum):
    """When process() reports FRAME_PROGRESSION so the caller can
    flush_pixels() (ref api/options.rs:16-44 JxlProgressiveMode)."""

    EAGER = "eager"          # whenever new sections decoded
    PASSES = "passes"        # when a full AC pass completes across groups
    FULL_FRAME = "full_frame"  # never (frames only)


@dataclass
class JxlDecoderOptions:
    apply_orientation: bool = True
    render_spot_colors: bool = True
    coalescing: bool = True
    sample_limit: int | None = None
    high_precision: bool = False
    premultiply_output: bool = False
    scan_frames_only: bool = False
    skip_preview: bool = True
    pixel_format: str = "f32"  # "f32" | "u8" | "u16" | "f16"
    progressive_mode: ProgressiveMode = ProgressiveMode.FULL_FRAME


@dataclass(frozen=True)
class VisibleFrameSeekTarget:
    """Computed seek inputs for a target visible frame (ref api/decoder.rs:64-75).

    decode_start_offset is a codestream byte offset: resume parsing there and
    skip `visible_frames_to_skip` visible frames before the target."""

    decode_start_offset: int
    visible_frames_to_skip: int


@dataclass(frozen=True)
class VisibleFrameInfo:
    """Info about one visible frame found while decoding/scanning
    (ref api/decoder.rs:41-62)."""

    index: int
    duration_ms: float
    duration_ticks: int
    codestream_offset: int
    is_last: bool
    is_keyframe: bool
    seek_target: VisibleFrameSeekTarget
    name: str


class _FrameScanInfo:
    """Per-frame dependency analysis for seeking (ref frame_scan_info.rs:18-168):
    tracks, per reference/LF slot, the earliest frame needed to reconstruct it;
    a visible frame's seek target starts at the earliest such dependency."""

    MAX_STORED_FRAMES = 4
    NUM_LF_FRAMES = 4

    def __init__(self):
        self.scanned: list[VisibleFrameInfo] = []
        self.visible_index = 0
        self.frame_starts: list[tuple[int, int]] = []  # (offset, visible_before)
        self.ref_slot_start = [None] * self.MAX_STORED_FRAMES
        self.lf_slot_start = [None] * self.NUM_LF_FRAMES

    def record(self, header, animation, offset: int) -> None:
        cur = len(self.frame_starts)
        self.frame_starts.append((offset, self.visible_index))
        decode_start = cur

        used = [False] * self.MAX_STORED_FRAMES
        if header.needs_blending():
            for bi in [header.blending_info, *header.ec_blending_info]:
                used[bi.source] = True
        if header.has_patches:
            used = [True] * self.MAX_STORED_FRAMES
        for slot, u in enumerate(used):
            if u and self.ref_slot_start[slot] is not None:
                decode_start = min(decode_start, self.ref_slot_start[slot])
        if header.has_lf_frame:
            dep = self.lf_slot_start[header.lf_level]
            if dep is not None:
                decode_start = min(decode_start, dep)

        if header.is_visible:
            ticks = header.duration
            ms = 0.0
            if animation is not None and animation.tps_numerator > 0:
                ms = ticks * 1000.0 * animation.tps_denominator / animation.tps_numerator
            start_off, visible_before = self.frame_starts[decode_start]
            target = VisibleFrameSeekTarget(
                decode_start_offset=start_off,
                visible_frames_to_skip=self.visible_index - visible_before,
            )
            self.scanned.append(
                VisibleFrameInfo(
                    index=self.visible_index,
                    duration_ms=ms,
                    duration_ticks=ticks,
                    codestream_offset=offset,
                    is_last=header.is_last,
                    is_keyframe=target.visible_frames_to_skip == 0,
                    seek_target=target,
                    name=header.name,
                )
            )
            self.visible_index += 1

        if header.can_be_referenced:
            self.ref_slot_start[header.save_as_reference] = decode_start
        if header.lf_level != 0:
            self.lf_slot_start[header.lf_level - 1] = decode_start


@dataclass
class ImageInfo:
    width: int
    height: int
    num_extra_channels: int
    bits_per_sample: int
    have_animation: bool
    orientation: int
    preview_size: tuple[int, int] | None = None


class _BoxParser:
    """Streaming ISOBMFF box parser feeding codestream bytes.

    ref api/inner/box_parser.rs: handles jxlc/jxlp (incl. out-of-order
    jxlp via index), skips other boxes, supports unbounded final boxes.
    """

    def __init__(self):
        self.mode = None  # None (undetected) | 'bare' | 'container'
        self.buf = bytearray()
        self.pos = 0  # consumed bytes within buf
        self.state = "signature"
        self.remaining = 0  # remaining payload of current box
        self.current_box = None
        self.jxlp_parts = {}
        self._jxlp_complete = set()
        self._jxlp_ooo = set()  # part indices received out of physical order
        self.ooo_ranges = []  # codestream [start, end) ranges from OOO boxes
        self.jxlp_pending_index = False
        self.codestream = bytearray()
        self.done = False
        self._jxlp_next = 0
        self._jxlp_index = 0

    def feed(self, data: bytes):
        self.buf.extend(data)
        self._advance()

    def finish(self):
        """No more input: unbounded boxes end here."""
        if self.mode == "bare":
            self.codestream.extend(self.buf[self.pos :])
            self.pos = len(self.buf)
        elif self.current_box in (b"jxlc", b"jxlp") and self.remaining == -1:
            if self.current_box == b"jxlp":
                self._jxlp_complete.add(self._jxlp_index)
                self._flush_jxlp()
            else:
                self._append_codestream(self.buf[self.pos :])
            self.pos = len(self.buf)
        if self.jxlp_parts:
            # parts remain whose index order cannot be satisfied: the file
            # interleaves jxlp boxes out of order (ref tests/api.rs:36-44
            # expects Error::InvalidBox for such files)
            raise InvalidBox("out-of-order jxlp boxes")
        self.done = True

    def _append_codestream(self, data):
        self.codestream.extend(data)

    def _advance(self):
        if self.mode is None:
            if len(self.buf) < 2:
                return
            if bytes(self.buf[:2]) == CODESTREAM_SIG:
                self.mode = "bare"
            elif bytes(self.buf[: min(len(self.buf), 12)]) == CONTAINER_SIG[: min(len(self.buf), 12)]:
                if len(self.buf) < 12:
                    return
                self.mode = "container"
                self.pos = 12
                self.state = "box_header"
            else:
                raise InvalidSignature("not a JPEG XL file")
        if self.mode == "bare":
            self.codestream.extend(self.buf[self.pos :])
            self.pos = len(self.buf)
            return
        # container mode
        while True:
            avail = len(self.buf) - self.pos
            if self.state == "box_header":
                if avail < 8:
                    return
                size = int.from_bytes(self.buf[self.pos : self.pos + 4], "big")
                btype = bytes(self.buf[self.pos + 4 : self.pos + 8])
                hdr = 8
                if size == 1:
                    if avail < 16:
                        return
                    size = int.from_bytes(self.buf[self.pos + 8 : self.pos + 16], "big")
                    hdr = 16
                self.pos += hdr
                self.current_box = btype
                self.remaining = (size - hdr) if size != 0 else -1  # -1: to EOF
                self.jxlp_pending_index = btype == b"jxlp"
                self.state = "box_payload"
            elif self.state == "box_payload":
                if self.jxlp_pending_index:
                    if len(self.buf) - self.pos < 4:
                        return
                    idx = int.from_bytes(self.buf[self.pos : self.pos + 4], "big")
                    self.pos += 4
                    if self.remaining > 0:
                        self.remaining -= 4
                    self.jxlp_pending_index = False
                    self._jxlp_index = idx & 0x7FFFFFFF
                    # a box is a valid frame-start checkpoint only if it is
                    # physically in logical order and no future parts are
                    # pending (ref box_parser.rs:120-133 add_checkpoint)
                    if self._jxlp_index != self._jxlp_next or self.jxlp_parts:
                        self._jxlp_ooo.add(self._jxlp_index)
                avail = len(self.buf) - self.pos
                take = avail if self.remaining < 0 else min(avail, self.remaining)
                chunk = bytes(self.buf[self.pos : self.pos + take])
                streaming_part = (
                    self.current_box == b"jxlp"
                    and self._jxlp_index == self._jxlp_next
                    and self._jxlp_index not in self.jxlp_parts
                    and not any(k < self._jxlp_index for k in self.jxlp_parts)
                )
                if self.current_box == b"jxlc":
                    self._append_codestream(chunk)
                elif streaming_part:
                    # in-order jxlp: stream payload straight into the
                    # codestream so partial frames can decode progressively
                    self._append_codestream(chunk)
                elif self.current_box == b"jxlp":
                    self.jxlp_parts.setdefault(self._jxlp_index, bytearray()).extend(chunk)
                self.pos += take
                if self.remaining > 0:
                    self.remaining -= take
                if self.remaining == 0:
                    if self.current_box == b"jxlp":
                        if streaming_part:
                            self._jxlp_next += 1
                        else:
                            self._jxlp_complete.add(self._jxlp_index)
                        self._flush_jxlp()
                    self.state = "box_header"
                    continue
                return
            else:
                return

    def _flush_jxlp(self):
        # append jxlp parts to the codestream in index order, each once its
        # box payload is fully consumed (ref box_parser.rs jxlp handling)
        while self._jxlp_next in self._jxlp_complete:
            part = self.jxlp_parts.pop(self._jxlp_next, b"")
            if self._jxlp_next in self._jxlp_ooo:
                self.ooo_ranges.append(
                    (len(self.codestream), len(self.codestream) + len(part))
                )
            self.codestream.extend(part)
            self._jxlp_complete.discard(self._jxlp_next)
            self._jxlp_next += 1


class JxlDecoder:
    """Incremental decoder. feed() bytes, then call process() until
    COMPLETE; rendered frames accumulate in `frames`."""

    def __init__(self, options: JxlDecoderOptions | None = None):
        from .. import enable_persistent_jit_cache

        enable_persistent_jit_cache()
        self.options = options or JxlDecoderOptions()
        self.boxes = _BoxParser()
        self.stage = "file_header"
        self.cursor = 0  # bits consumed from the codestream so far
        self.file_header: FileHeader | None = None
        self.image_info: ImageInfo | None = None
        self.icc_profile: bytes | None = None
        self.state: DecoderState | None = None
        self.frame: Frame | None = None
        self.frames: list[np.ndarray] = []
        self.frame_infos: list[dict] = []
        self.durations: list[float] = []
        self._preview_pending = False
        self._input_ended = False
        self._section_cursor = 0
        self._events: list[Event] = []
        self.scan = _FrameScanInfo()
        self._scan_frozen = False
        self._skip_visible = 0
        self.preview: np.ndarray | None = None
        # size hint carried by the last NEED_MORE_INPUT (ref api/mod.rs:36-54
        # ProcessingResult::NeedsMoreInput{size_hint}): feed at least this
        # many more bytes before the next process() can progress
        self.bytes_needed: int | None = None
        self._progress_marker = (0, 0)  # (#decoded sections, min pass done)
        self._lf_preview: np.ndarray | None = None

    # -- input ----------------------------------------------------------------

    def feed(self, data: bytes) -> None:
        self.boxes.feed(data)

    def end_input(self) -> None:
        self._input_ended = True
        self.boxes.finish()

    # -- processing ------------------------------------------------------------

    def _reader(self) -> BitReader:
        # zero-copy over the live (append-only) codestream buffer; a fresh
        # reader is built per step so the length snapshot stays current
        br = BitReader(self.boxes.codestream)
        br.pos = self.cursor
        return br

    def process(self) -> Event:
        while True:
            if self._events:
                return self._events.pop(0)
            try:
                ev = self._step()
            except OutOfBounds as e:
                if self._input_ended:
                    raise InvalidBitstream("truncated input") from e
                self.bytes_needed = e.needed
                return Event.NEED_MORE_INPUT
            self.bytes_needed = None
            if ev is not None:
                return ev

    def _step(self) -> Event | None:
        if self.stage == "file_header":
            br = self._reader()
            self.file_header = FileHeader.read(br)
            self.cursor = br.pos
            meta = self.file_header.image_metadata
            self.stage = "icc" if meta.color_encoding.want_icc else "post_icc"
            return None
        if self.stage == "icc":
            from ..icc.decode import read_icc

            br = self._reader()
            self.icc_profile = read_icc(br)
            self.cursor = br.pos
            self.stage = "post_icc"
            return None
        if self.stage == "post_icc":
            meta = self.file_header.image_metadata
            self.image_info = ImageInfo(
                *_oriented_size(self.file_header),
                num_extra_channels=len(meta.extra_channel_info),
                bits_per_sample=meta.bit_depth.bits_per_sample,
                have_animation=meta.animation is not None,
                orientation=int(meta.orientation),
                preview_size=(
                    (meta.preview.xsize, meta.preview.ysize) if meta.preview else None
                ),
            )
            if self.options.sample_limit is not None:
                # DoS guard (ref codestream_parser/mod.rs:61-74): untrusted
                # headers must not trigger huge downstream allocations
                from ..errors import LimitExceeded

                xs = max(self.file_header.xsize, 16)
                total = xs * self.file_header.ysize * (
                    3 + len(meta.extra_channel_info)
                )
                if total >= self.options.sample_limit:
                    raise LimitExceeded(
                        f"image needs {total} samples, limit {self.options.sample_limit}"
                    )
            self.state = DecoderState(self.file_header, self.options)
            self._preview_pending = meta.preview is not None
            self.stage = "frame_header"
            return Event.IMAGE_INFO
        if self.stage == "frame_header":
            from .simple import parse_frame

            br = self._reader()
            br.jump_to_byte_boundary()
            start_byte = br.pos // 8
            for lo, hi in self.boxes.ooo_ranges:
                if lo <= start_byte < hi:
                    # ref tests/api.rs:36-44: frames must start in a box that
                    # is a valid checkpoint (physically in logical order)
                    raise InvalidBox("frame starts in out-of-order jxlp box")
            if self._preview_pending:
                pframe = parse_frame(br, self.file_header, None, preview=True)
                br.jump_to_byte_boundary()
                if not self.options.skip_preview:
                    # decode + render the preview frame (ref options.rs:21
                    # skip_preview=false)
                    total = pframe.toc.total_size
                    if br.total_bits_available() < total * 8:
                        raise OutOfBounds(total - br.total_bits_available() // 8)
                    from ..render.simple import color_transform, render_frame_channels_ex

                    pframe.icc_profile = self.icc_profile
                    pframe.decode_all_sections(br)
                    planes, color_done, _ = render_frame_channels_ex(pframe, fuse=True)
                    if not color_done:
                        planes = color_transform(pframe, planes)
                    self.preview = np.stack(planes, axis=-1)
                    self.cursor = br.pos
                else:
                    # preview sections must be present before skipping
                    br.skip_bits(pframe.toc.total_size * 8)
                    self.cursor = br.pos
                self._preview_pending = False
                return None
            self.frame = parse_frame(br, self.file_header, self.state)
            self.frame.icc_profile = self.icc_profile
            self.cursor = br.pos
            if not self._scan_frozen:
                self.scan.record(
                    self.frame.header,
                    self.file_header.image_metadata.animation,
                    start_byte,
                )
            self.frame_infos.append(
                {
                    "is_last": self.frame.header.is_last,
                    "duration": self.frame.header.duration,
                    "name": self.frame.header.name,
                    "is_visible": self.frame.header.is_visible,
                }
            )
            if self.options.scan_frames_only:
                br2 = self._reader()
                br2.jump_to_byte_boundary()
                br2.skip_bits(self.frame.toc.total_size * 8)
                self.cursor = br2.pos
                if self.frame.header.is_last:
                    self.stage = "done"
                    return Event.COMPLETE
                return Event.FRAME_START
            self.stage = "frame_sections"
            return Event.FRAME_START
        if self.stage == "frame_sections":
            # decode sections incrementally as their bytes become available
            # (section-availability scheduling, ref frame_info.rs:551-604)
            frame = self.frame
            if not hasattr(frame, "_sec_decoded"):
                frame.begin_sections()
                self._progress_marker = (0, 0)
            toc_end = (self.cursor + 7) // 8
            codestream = self.boxes.codestream
            need = frame.process_sections_incremental(
                codestream, toc_end, len(codestream)
            )
            if need is not None:
                ev = self._progression_event(frame)
                if ev is not None:
                    return ev  # next process() re-enters and reports the need
                if self._input_ended:
                    raise InvalidBitstream("truncated frame")
                raise OutOfBounds(need - len(codestream))
            self.cursor = (toc_end + frame.toc.total_size) * 8
            self._finish_frame()
            if self.frame.header.is_last:
                self.stage = "done"
                self._events.append(Event.COMPLETE)
            else:
                self.stage = "frame_header"
            return Event.FRAME_DONE
        if self.stage == "done":
            return Event.COMPLETE
        raise AssertionError(self.stage)

    def _progression_event(self, frame) -> Event | None:
        """FRAME_PROGRESSION per the configured progressive mode."""
        mode = self.options.progressive_mode
        if mode is ProgressiveMode.FULL_FRAME:
            return None
        from ..io.headers.frame import Encoding

        if frame.lf_global is None or (
            frame.header.encoding == Encoding.VARDCT and not frame._lf_finalized
        ):
            return None  # nothing renderable yet
        n_dec = sum(frame._sec_decoded)
        min_pass = min(frame._passes_done) if frame._passes_done else 0
        prev = self._progress_marker
        self._progress_marker = (n_dec, min_pass)
        if mode is ProgressiveMode.EAGER:
            return Event.FRAME_PROGRESSION if n_dec > prev[0] else None
        return Event.FRAME_PROGRESSION if min_pass > prev[1] else None

    @property
    def scanned_frames(self) -> list[VisibleFrameInfo]:
        """Visible frame info collected so far (ref api/decoder.rs:95-99);
        with scan_frames_only this is the primary output of decoding."""
        return self.scan.scanned

    def start_new_frame(self, seek_target: VisibleFrameSeekTarget) -> None:
        """Seek: reset frame-level state and resume parsing at the target
        (ref api/decoder.rs:195-206 + codestream_parser start_new_frame).
        Call after a scan pass; then keep calling process()."""
        self._scan_frozen = True
        self.frame = None
        self._events.clear()
        self.frames.clear()
        self.durations.clear()
        self.options = type(self.options)(**{**self.options.__dict__, "scan_frames_only": False})
        self.cursor = seek_target.decode_start_offset * 8
        self._skip_visible = seek_target.visible_frames_to_skip
        self.stage = "frame_header"

    def lf_preview(self) -> np.ndarray | None:
        """1/8-scale preview rendered from a decoded lf_level-1 frame
        (ref frame/lf_preview.rs:279 maybe_preview_lf_frame). Available for
        XYB images without extra channels once the LF frame has been
        decoded, before any main-frame section arrives; None otherwise."""
        return self._lf_preview

    def flush_pixels(self) -> np.ndarray | None:
        """Render the current partial frame state (ref api/decoder.rs:176
        flush_pixels + frame_info.rs:607 do_flush). Pure re-render: decode
        state is not mutated, so processing can continue afterwards.

        VarDCT groups without AC yet are synthesized by 8x LF upsampling
        (ref frame/decode.rs:58 upsample_lf_group); groups with a partial
        pass set are re-rendered from accumulated coefficients."""
        import copy

        from ..io.headers.frame import Encoding
        from ..render.simple import (
            apply_orientation,
            blend_and_extend,
            color_transform,
            render_frame_channels_ex,
        )

        frame = self.frame
        if (
            self.stage != "frame_sections"
            or frame is None
            or not getattr(frame, "_sec_decoded", None)
        ):
            return None
        header = frame.header
        partial_lf = False
        if frame.lf_global is None:
            if not self._try_partial_lf_global(frame):
                return self._flush_lf_frame_preview(frame)
            partial_lf = True
        is_vardct = header.encoding == Encoding.VARDCT
        if is_vardct and not frame._lf_finalized:
            if partial_lf:
                frame.lf_global = None
            return self._flush_lf_frame_preview(frame)

        # snapshot mutable pieces, render, then restore
        saved_mg = frame.lf_global.modular_global
        saved_px = frame.vardct_pixels
        try:
            mg = copy.deepcopy(saved_mg)
            mg.run_transforms()
            frame.lf_global.modular_global = mg
            if is_vardct:
                from ..vardct.group import ensure_pixel_buffers
                from ..vardct.lf import upsample_lf_group

                frame.vardct_pixels = (
                    [p.copy() for p in saved_px] if saved_px is not None else None
                )
                ensure_pixel_buffers(frame)
                num_passes = header.passes.num_passes
                device_mode = getattr(frame, "_device_vardct", False)
                for g in range(header.num_groups):
                    done = frame._passes_done[g]
                    if done == 0:
                        upsample_lf_group(frame, g, frame.vardct_pixels)
                    elif done < num_passes or device_mode:
                        # device-mode frames defer all rendering to frame
                        # completion, so flush re-renders from coefficients
                        frame.render_group_from_coeffs(g)
            planes, color_done, _ = render_frame_channels_ex(frame, fuse=True)
            if header.frame_type != FrameType.REFERENCE_ONLY and not color_done:
                planes = color_transform(frame, planes)
            if header.needs_blending():
                canvas = blend_and_extend(frame, planes)
            else:
                img_w, img_h = self.file_header.xsize, self.file_header.ysize
                canvas = [p[:img_h, :img_w] for p in planes]
            arr = np.stack(canvas, axis=-1)
            if self.options.apply_orientation:
                arr = apply_orientation(arr, self.file_header.image_metadata.orientation)
            return arr
        finally:
            if partial_lf:
                # the partial LfGlobal was decoded only for this flush; the
                # real decode re-reads it when the section completes
                frame.lf_global = None
                frame.vardct_pixels = saved_px
            else:
                frame.lf_global.modular_global = saved_mg
                frame.vardct_pixels = saved_px

    def _flush_lf_frame_preview(self, frame) -> np.ndarray | None:
        """Flush fallback for frames that reference a stored LF frame
        before their own sections are renderable: 8x-upsample the LF frame
        into a full-size canvas (ref frame/lf_preview.rs:279 + the
        Upsample8x flush path)."""
        from ..io.headers.frame import Encoding

        header = frame.header
        if (
            header.encoding != Encoding.VARDCT
            or not header.has_lf_frame
            or self.state is None
        ):
            return None
        lf = self.state.lf_frames[header.lf_level]
        if lf is None:
            return None
        from ..render.simple import apply_orientation, color_transform
        from ..render.stages import core as st

        kern = st.build_upsample_kernels(
            self.file_header.transform_data.weights8, 8
        )
        planes = [st.upsample(np, np.asarray(p), kern, 8) for p in lf]
        img_w, img_h = self.file_header.xsize, self.file_header.ysize
        planes = [p[:img_h, :img_w] for p in planes]
        planes = color_transform(frame, planes)
        arr = np.stack(planes, axis=-1)
        if self.options.apply_orientation:
            arr = apply_orientation(arr, self.file_header.image_metadata.orientation)
        return arr

    def _try_partial_lf_global(self, frame) -> bool:
        """Flush-time partial decode of an incomplete LfGlobal section
        (ref frame_info.rs:607-652 has_partial_lf + decode_lf_global
        allow_partial). Modular regular/LF frames only; re-attempted when
        the available bytes grew by >= 1.5x since the last attempt."""
        from ..errors import JxlError
        from ..io.bit_reader import BitReader
        from ..io.headers.frame import Encoding, FrameType

        header = frame.header
        if header.encoding != Encoding.MODULAR:
            return False
        if header.frame_type not in (FrameType.REGULAR, FrameType.LF_FRAME):
            return False
        codestream = self.boxes.codestream
        toc_end = (self.cursor + 7) // 8
        stored = (
            frame.toc.permutation[0]
            if frame.toc.permuted
            else 0
        ) if header.num_toc_entries > 1 else 0
        start = frame._stored_end[stored] - frame.toc.entries[stored]
        end = frame._stored_end[stored]
        avail = min(len(codestream) - toc_end, end) - start
        if avail <= 0:
            return False
        last = getattr(self, "_lf_flush_len", 0)
        if 2 * avail <= 3 * last:
            return False
        self._lf_flush_len = avail
        br = BitReader(codestream[toc_end + start : toc_end + start + avail])
        try:
            frame.decode_lf_global(br, allow_partial=True)
        except JxlError:
            frame.lf_global = None
            return False
        if (
            frame.lf_global is None
            or not frame.lf_global.modular_global.early_render_ok
        ):
            frame.lf_global = None
            return False
        return True

    def _finish_frame(self) -> None:
        from ..render.simple import (
            apply_orientation,
            blend_and_extend,
            color_transform,
            render_frame_channels_ex,
        )

        frame = self.frame
        header = frame.header
        state = self.state
        planes, color_done, converted = render_frame_channels_ex(
            frame, fuse=True, out_format=self.options.pixel_format
        )
        if header.lf_level != 0:
            state.lf_frames[header.lf_level - 1] = [p.copy() for p in planes[:3]]
            if (
                header.lf_level == 1
                and not header.needs_blending()
                and self.file_header.image_metadata.xyb_encoded
                and not self.file_header.image_metadata.extra_channel_info
                and not color_done
            ):
                # 1/8-scale preview from the LF frame (ref
                # frame/lf_preview.rs:279 maybe_preview_lf_frame): color
                # transform the LF planes so callers can show progress
                # before any main-frame section arrives
                pv = color_transform(
                    frame, [p.copy() for p in planes[:3]], in_place=True
                )
                self._lf_preview = np.stack(pv, axis=-1)
        if header.can_be_referenced and header.save_before_ct:
            state.reference_frames[header.save_as_reference] = {
                "frame": [p.copy() for p in planes],
                "saved_before_color_transform": True,
            }
        if header.frame_type != FrameType.REFERENCE_ONLY and not color_done:
            planes = color_transform(frame, planes)
        if header.needs_blending():
            canvas = blend_and_extend(frame, planes)
        else:
            img_w, img_h = self.file_header.xsize, self.file_header.ysize
            canvas = [p[:img_h, :img_w] for p in planes]
        if header.can_be_referenced and not header.save_before_ct:
            state.reference_frames[header.save_as_reference] = {
                "frame": [np.array(p, copy=True) for p in canvas],
                "saved_before_color_transform": False,
            }
        from ..render.simple import apply_spot_and_premultiply

        canvas = apply_spot_and_premultiply(frame, canvas, self.options)
        if self.options.pixel_format != "f32" and not converted:
            from ..render.stages import core as st

            canvas = [
                st.convert_output(np, p, self.options.pixel_format, channel=i)
                for i, p in enumerate(canvas)
            ]
        if header.is_visible and self._skip_visible > 0:
            # seeking: this frame was decoded only to rebuild reference state
            self._skip_visible -= 1
            return
        if header.is_visible:
            arr = np.stack(canvas, axis=-1)
            meta = self.file_header.image_metadata
            if self.options.apply_orientation:
                arr = apply_orientation(arr, meta.orientation)
            self.frames.append(arr)
            dur = 0.0
            if meta.animation is not None:
                dur = (
                    header.duration
                    * 1000.0
                    * meta.animation.tps_denominator
                    / meta.animation.tps_numerator
                )
            self.durations.append(dur)


def _oriented_size(file_header) -> tuple[int, int]:
    meta = file_header.image_metadata
    w, h = file_header.xsize, file_header.ysize
    if meta.orientation.is_transposing:
        w, h = h, w
    return (w, h)
