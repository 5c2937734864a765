"""Multi-host animation pipelining over DCN (SURVEY §2.3 north star:
frame-level pipelining across hosts).

Frames of an animation are expensive to *decode* (entropy + render) but
cheap to *compose* (canvas blending). The multi-host schedule exploits
that split: host h decodes frames h, h+N, h+2N, ... in parallel — the
entropy, IDCT, filter, and color work all overlap across hosts — then the
pre-blend frame contents are allgathered over DCN (jax.distributed
collectives; gloo on the CPU dryrun, ICI/DCN on a pod) and the sequential
canvas-composition chain runs on every host (it is deterministic, so all
hosts end with identical frames without a broadcast).

Scope: animations whose frames use Replace blending and carry no
reference/LF-frame dependencies (the common case, e.g. GIF-style clips).
Anything else falls back to the caller's single-host path.

Capability reference: the reference is single-process (SURVEY §2.3 —
"Reference has none"); this subsystem is designed fresh for the TPU
deployment target.
"""

from __future__ import annotations

import numpy as np

from ..errors import NotSupported
from ..io.bit_reader import BitReader
from ..io.container import extract_codestream
from ..io.headers import FileHeader
from ..io.headers.frame import BlendingMode, FrameHeader, FrameType, Toc


def init_distributed(coordinator: str, num_processes: int, process_id: int) -> None:
    """Bring up jax.distributed for a multi-host run (gloo CPU collectives
    for the dryrun; TPU pods configure their own backend)."""
    import jax

    # consult the *configured* platform only — jax.devices()/default_backend()
    # would initialise XLA before distributed.initialize is allowed to run
    platforms = jax.config.jax_platforms or ""
    if "cpu" in platforms:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator, num_processes=num_processes, process_id=process_id
    )


def _scan_frames(data: bytes):
    """Parse every frame header + TOC, recording codestream byte ranges
    (cheap host work, done identically on every host)."""
    codestream = extract_codestream(data)
    br = BitReader(codestream)
    fh = FileHeader.read(br)
    if fh.image_metadata.color_encoding.want_icc:
        from ..icc.decode import read_icc

        read_icc(br)
    frames = []
    while True:
        br.jump_to_byte_boundary()
        start = br.pos // 8
        header = FrameHeader.read(br, fh)
        toc = Toc.read(br, header.num_toc_entries)
        br.jump_to_byte_boundary()
        sections_start = br.pos // 8
        br.skip_bits(toc.total_size * 8)
        frames.append((header, start, sections_start, sections_start + toc.total_size))
        if header.is_last:
            break
    return fh, codestream, frames


def _pipeline_eligible(fh, frames) -> bool:
    if fh.image_metadata.animation is None:
        return False
    for header, *_ in frames:
        if (
            header.frame_type != FrameType.REGULAR
            or not header.is_visible
            or header.can_be_referenced
            or header.has_patches
            or header.lf_level != 0
            or header.has_lf_frame
        ):
            return False
        if header.needs_blending() and (
            header.blending_info.mode != BlendingMode.REPLACE
            or any(
                bi.mode != BlendingMode.REPLACE for bi in header.ec_blending_info
            )
        ):
            return False
    return True


def _decode_one(fh, codestream: bytes, rec, icc_profile=None):
    """Decode one frame's sections to color-transformed content planes."""
    from ..api.frame import Frame
    from ..api.state import DecoderState
    from ..render.simple import color_transform, render_frame_channels_ex

    header, start, sec_start, sec_end = rec
    frame = Frame(header, None, fh, DecoderState(fh))
    # re-parse to rebuild the Toc-carrying frame object at this offset
    br = BitReader(codestream)
    br.pos = start * 8
    h2 = FrameHeader.read(br, fh)
    toc = Toc.read(br, h2.num_toc_entries)
    br.jump_to_byte_boundary()
    frame = Frame(h2, toc, fh, DecoderState(fh))
    frame.icc_profile = icc_profile
    frame.decode_all_sections(br)
    planes, color_done, _ = render_frame_channels_ex(frame, fuse=True)
    if not color_done:
        planes = color_transform(frame, planes)
    return np.stack(planes, axis=-1), h2


def decode_animation_multihost(data: bytes):
    """Decode an animation with frames pipelined across jax processes.

    Every process returns the full frame list (the composition chain is
    replicated). Raises NotSupported for ineligible files — callers fall
    back to the single-host decoder."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    fh, codestream, frames = _scan_frames(data)
    if not _pipeline_eligible(fh, frames):
        raise NotSupported("animation not eligible for multi-host pipelining")

    nproc = jax.process_count()
    pid = jax.process_index()
    img_w, img_h = fh.xsize, fh.ysize
    n = len(frames)
    per_host = -(-n // nproc)

    # decode this host's frames into canvas-sized content + geometry
    my = np.zeros((per_host, img_h, img_w, 3), dtype=np.float32)
    my_geo = np.zeros((per_host, 4), dtype=np.int32)  # x0, y0, w, h
    for slot, k in enumerate(range(pid, n, nproc)):
        content, header = _decode_one(fh, codestream, frames[k])
        x0, y0 = max(header.x0, 0), max(header.y0, 0)
        w = min(content.shape[1], img_w - x0)
        h = min(content.shape[0], img_h - y0)
        my[slot, :h, :w] = content[:h, :w, :3]
        my_geo[slot] = (x0, y0, w, h)

    # DCN gather: (nproc, per_host, H, W, 3) + geometry
    all_content = np.asarray(multihost_utils.process_allgather(jnp.asarray(my)))
    all_geo = np.asarray(multihost_utils.process_allgather(jnp.asarray(my_geo)))

    # canvas composition (cheap, identical on every host). Replace-blend
    # frames compose against the source reference slot, which is never
    # written here (can_be_referenced frames are excluded by eligibility),
    # i.e. an empty canvas — so every output frame is zeros + its rect
    # (matches render/simple.py blend_and_extend with a None reference).
    out = []
    for k in range(n):
        p, slot = k % nproc, k // nproc
        x0, y0, w, h = all_geo[p, slot]
        canvas = np.zeros((img_h, img_w, 3), dtype=np.float32)
        canvas[y0 : y0 + h, x0 : x0 + w] = all_content[p, slot, :h, :w]
        out.append(canvas)
    return out
