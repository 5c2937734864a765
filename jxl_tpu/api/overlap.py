"""Overlapped banded decode: host entropy ‖ device IDCT+filters ‖ readback.

The single biggest single-chip perf lever on tunneled hardware (see
BASELINE.md transfer economics): the whole-frame path serializes ~0.14 s
of host entropy, the device program, and a ~0.27 s blocking readback per
1 MP photo. Here the frame decodes in GROUP-ROW BANDS:

    host:    entropy band 0 | entropy band 1 | entropy band 2 | ...
    device:         IDCT 0  |  IDCT 1, filt 0|  IDCT 2, filt 1| ...
    wire:                   |   <- band 0 output streams back  | ...

Band k's IDCT program dispatches (async) as soon as its sections are
entropy-decoded; band k-1's filter+color+convert program dispatches once
band k's IDCT is in the queue (its 8-row halo needs the neighbor band);
each output band starts its device->host copy immediately
(copy_to_host_async — measured to pipeline on the tunnel: 4 async band
readbacks complete faster than one whole-image readback). The host never
blocks until final assembly, so entropy, device compute, and readback
genuinely overlap — the reference achieves the same shape with a
work-stealing thread pool (frame/render.rs:373-459).

Output is bit-identical to the whole-image device path: the 8-row halo
covers the 7-pixel filter support, bands start at multiples of the
32x32 dither tile, and the per-band IDCT math is the per-block math of
the whole-frame program (vardct/device_band.py).
"""

from __future__ import annotations

import os

import numpy as np

from ..errors import JxlError
from ..io.headers.frame import Encoding, FrameType
from ..render.stages import core as st

HALO = 8


def eligible(frame) -> bool:
    """Header-only eligibility (checked before any section decode)."""
    h = frame.header
    fh = frame.file_header
    if h.encoding != Encoding.VARDCT or not h.is444:
        return False
    if h.frame_type != FrameType.REGULAR or not h.is_last or not h.is_visible:
        return False
    if h.has_patches or h.has_splines or h.has_noise:
        return False
    if h.upsampling != 1 or any(u != 1 for u in h.ec_upsampling):
        return False
    if h.num_extra_channels != 0:
        return False
    if h.needs_blending() or h.can_be_referenced or h.lf_level != 0:
        return False
    if h.x0 != 0 or h.y0 != 0:
        return False
    if h.num_toc_entries == 1:
        return False
    wv, hv = h.size()
    if (wv, hv) != (fh.xsize, fh.ysize):
        return False
    _, gy_count = h.size_groups()
    if gy_count < 2:
        return False  # single band: the whole-frame path is already one shot
    if wv * hv < 160_000:
        return False  # small frames beat the tunnel on host numpy
    return True


HOST_MPS = 11.0  # measured native host photo decode rate (BASELINE.md)


def enabled(frame=None) -> bool:
    mode = os.environ.get("JXL_TPU_OVERLAP", "auto")
    if mode == "0":
        return False
    if mode == "1":
        return True
    from ..utils.devhealth import device_fast, device_wins

    if frame is None:
        return device_fast()
    # steady-state cost model (VERDICT r04 #10): the threaded pipeline
    # moves ~4 B/px up (sparse coefficient wire + indices) and 3 B/px of
    # u8 back, fully overlapped with host entropy; route to the device
    # when the measured link beats the native host rate for this frame
    wv, hv = frame.header.size()
    px = wv * hv
    return device_wins(
        up_bytes=4 * px,
        down_bytes=int(3.2 * px),
        host_seconds=px / 1e6 / HOST_MPS,
        dispatches=2 * (hv // 256 + 1),
    )


def try_decode(frame, br, pixel_format: str):
    """Overlapped decode of an eligible frame. Consumes `br` past the
    frame on success and returns the (hv, wv, 3) output array (converted
    to pixel_format); restores `br` and returns None on infrastructure
    fallback. Bitstream errors propagate."""
    pos0 = br.pos
    try:
        return _decode(frame, br, pixel_format)
    except JxlError:
        raise
    except Exception:
        # infrastructure fallback: restore the reader and frame state so
        # the caller's whole-frame path can decode from scratch
        br.pos = pos0
        frame.render_after_decode = True
        frame.lf_global = None
        frame.hf_global = None
        frame.hf_meta = None
        frame.lf_image = None
        frame.vardct_pixels = None
        from ..utils import trace

        trace.metrics.add("overlap_fallbacks", 1)
        return None


def _decode(frame, br, pixel_format: str):
    import jax

    from ..render.device_band_filters import dispatch_band_filters
    from ..vardct.device_band import BandRenderer

    header = frame.header
    sections = frame.split_sections(br)
    frame.render_after_decode = False  # keep coefficients per group

    frame.decode_lf_global(sections[frame.section_index("lf_global")])
    for g in range(header.num_lf_groups):
        frame.decode_lf_group(g, sections[frame.section_index("lf", group=g)])
    frame.decode_hf_global(sections[frame.section_index("hf_global")])
    frame.finalize_lf()

    wv, hv = header.size()
    gx_count, gy_count = header.size_groups()
    num_passes = header.passes.num_passes

    rf = header.restoration_filter
    sigma_block = (
        st.compute_sigma_image(frame) if rf.epf_iters > 0 else
        np.zeros((-(-hv // 8), -(-wv // 8)), np.float32)
    )
    bwv = -(-wv // 8)

    def entropy_band(gy: int) -> None:
        for gx in range(gx_count):
            g = gy * gx_count + gx
            readers = [
                (p, sections[frame.section_index("hf", group=g, pass_idx=p)])
                for p in range(num_passes)
            ]
            frame.decode_hf_group(g, readers, render=False)

    def band_rows(gy: int) -> int:
        return min(256, hv - gy * 256)

    def dispatch_filters(gy: int, prev_dev, cur_dev, nxt_dev):
        rows = band_rows(gy)
        bot_rows = min(HALO, band_rows(gy + 1)) if nxt_dev is not None else 0
        top = HALO if prev_dev is not None else 0
        b0 = (gy * 256 - top) // 8
        nby = -(-(top + rows + bot_rows) // 8)
        sig = sigma_block[b0 : b0 + nby, :bwv]
        if sig.shape[0] < nby:
            sig = np.pad(sig, ((0, nby - sig.shape[0]), (0, 0)), mode="edge")
        out = dispatch_band_filters(
            frame,
            prev_dev,
            cur_dev,
            nxt_dev,
            sig,
            rows=rows,
            bot_rows=bot_rows,
            wv=wv,
            out_format=pixel_format,
        )
        try:
            out.copy_to_host_async()
        except Exception:
            pass
        return out

    # Three-thread pipeline (ref frame/render.rs:373-459 fan-out): the
    # main thread runs host entropy, a device thread does the blocking
    # host->device transfers + async dispatches, and a readback thread
    # pulls finished u8 bands. The tunnel's two directions then carry
    # upload and readback simultaneously while the host entropy-decodes
    # the next band — none of the three serializes against the others.
    import queue
    import threading

    outputs = [None] * gy_count
    ready_q: queue.Queue = queue.Queue()
    rb_q: queue.Queue = queue.Queue()
    errors: list = []

    def device_worker():
        dev_bands = [None, None, None]  # gy-2, gy-1, gy sliding window
        try:
            # constructing the renderer here overlaps its blocking static
            # upload (LF/quant/CfL maps) with the main thread's entropy
            # decode of band 0 (~40 ms of tunnel RTT off the critical path)
            renderer = BandRenderer(frame)
            for gy in range(gy_count):
                item = ready_q.get()
                if item is None:
                    return  # main thread aborted
                cur = renderer.dispatch(gy)
                dev_bands = [dev_bands[1], dev_bands[2], cur]
                if gy >= 1:
                    out = dispatch_filters(
                        gy - 1, dev_bands[0], dev_bands[1], dev_bands[2]
                    )
                    rb_q.put((gy - 1, out))
            out = dispatch_filters(
                gy_count - 1, dev_bands[1], dev_bands[2], None
            )
            rb_q.put((gy_count - 1, out))
        except BaseException as e:
            errors.append(e)
        finally:
            rb_q.put(None)

    def readback_worker():
        try:
            while True:
                item = rb_q.get()
                if item is None:
                    return
                gy, dev = item
                outputs[gy] = np.asarray(dev)
        except BaseException as e:
            errors.append(e)

    dev_t = threading.Thread(target=device_worker, daemon=True)
    rb_t = threading.Thread(target=readback_worker, daemon=True)
    dev_t.start()
    rb_t.start()
    try:
        for gy in range(gy_count):
            entropy_band(gy)
            ready_q.put(gy)
    except BaseException:
        ready_q.put(None)  # unblock the device thread
        dev_t.join(timeout=60)
        rb_t.join(timeout=60)
        raise
    frame.lf_global.modular_global.run_transforms()
    dev_t.join()
    rb_t.join()
    if errors:
        raise errors[0]

    bands = outputs
    out = np.empty((hv, wv, 3), dtype=bands[0].dtype)
    for gy, b in enumerate(bands):
        y0 = gy * 256
        out[y0 : y0 + b.shape[1]] = np.moveaxis(b, 0, -1)
    from ..utils import trace

    trace.metrics.add("overlap_bands", gy_count)
    return out
