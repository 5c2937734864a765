"""Film-grain noise synthesis.

Capability reference: jxl/src/features/noise.rs, util/xorshift128plus.rs,
render/stages/noise.rs, frame/decode.rs:585-695. The xorshift128+ random
field is bit-exact (8-lane generator, split-mix seeding, per-group
per-upsampling-subregion seeds); the 5x5 laplacian-ish convolution and the
strength-LUT modulated add run vectorized.
"""

from __future__ import annotations

import numpy as np

from ..io.bit_reader import BitReader

_M64 = (1 << 64) - 1


class Noise:
    def __init__(self, lut=None):
        self.lut = lut if lut is not None else [0.0] * 8

    @staticmethod
    def read(br: BitReader) -> "Noise":
        return Noise([br.read(10) / 1024.0 for _ in range(8)])

    def strength(self, vx, xp=np):
        """Piecewise-linear 8-point LUT (ref noise.rs:20-39), vectorized
        and xp-generic (numpy oracle / jnp device stage)."""
        k_scale = np.float32(len(self.lut) - 2)
        scaled = xp.maximum(np.float32(0.0), vx * k_scale)
        floor = xp.floor(scaled)
        frac = scaled - floor
        big = scaled >= k_scale + 1.0
        floor = xp.where(big, k_scale, floor)
        frac = xp.where(big, np.float32(1.0), frac)
        idx = xp.minimum(floor.astype(np.int32), len(self.lut) - 2)
        lut = xp.asarray(np.asarray(self.lut, dtype=np.float32))
        low = xp.take(lut, idx)
        hi = xp.take(lut, idx + 1)
        return xp.clip((hi - low) * frac + low, 0.0, 1.0).astype(np.float32)


class Xorshift128Plus:
    """8-lane xorshift128+ with split-mix seeding (bit-exact w/ reference)."""

    N = 8

    @staticmethod
    def _split_mix(z: int) -> int:
        z &= _M64
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & _M64
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & _M64
        return (z ^ (z >> 31)) & _M64

    def __init__(self, seed1: int, seed2: int, seed3: int, seed4: int):
        s0 = [0] * self.N
        s1 = [0] * self.N
        s0[0] = self._split_mix((((seed1 << 32) + seed2) + 0x9E3779B97F4A7C15) & _M64)
        s1[0] = self._split_mix((((seed3 << 32) + seed4) + 0x9E3779B97F4A7C15) & _M64)
        for i in range(1, self.N):
            s0[i] = self._split_mix(s0[i - 1])
            s1[i] = self._split_mix(s1[i - 1])
        self.s0 = np.array(s0, dtype=np.uint64)
        self.s1 = np.array(s1, dtype=np.uint64)

    @classmethod
    def from_single_seed(cls, seed: int) -> "Xorshift128Plus":
        """Single-seed construction with interleaved lane chaining (ref
        util/xorshift128plus.rs new_with_seed; exercised by the in-tree
        golden vectors)."""
        self = cls.__new__(cls)
        s0 = [0] * cls.N
        s1 = [0] * cls.N
        s0[0] = cls._split_mix((seed + 0x9E3779B97F4A7C15) & _M64)
        s1[0] = cls._split_mix(s0[0])
        for i in range(1, cls.N):
            s0[i] = cls._split_mix(s1[i - 1])
            s1[i] = cls._split_mix(s0[i])
        self.s0 = np.array(s0, dtype=np.uint64)
        self.s1 = np.array(s1, dtype=np.uint64)
        return self

    def fill(self) -> np.ndarray:
        """Returns 8 u64 of random bits, advancing the state."""
        new_s1 = self.s0.copy()
        self.s0 = self.s1.copy()
        bits = new_s1 + self.s0
        new_s1 = new_s1 ^ (new_s1 << np.uint64(23))
        new_s1 = new_s1 ^ self.s0 ^ (new_s1 >> np.uint64(18)) ^ (self.s0 >> np.uint64(5))
        self.s1 = new_s1
        return bits


def _bits_to_float(bits_u32: np.ndarray) -> np.ndarray:
    return ((bits_u32 >> np.uint32(9)) | np.uint32(0x3F800000)).view(np.float32)


def generate_noise_field(frame) -> list[np.ndarray]:
    """Whole-image 3-channel random field, matching the reference's
    per-group per-subregion seeding and row-batch draws exactly
    (ref frame/decode.rs:585-695)."""
    header = frame.header
    up = header.upsampling
    group_dim = header.group_dim
    wu, hu = header.size_upsampled()
    gx_count, gy_count = header.size_groups()
    vfi = frame.decoder_state.visible_frame_index if frame.decoder_state else 1
    nfi = frame.decoder_state.nonvisible_frame_index if frame.decoder_state else 0
    bufs = [np.zeros((hu, wu), dtype=np.float32) for _ in range(3)]

    from .. import native

    if native.noise_field_native(bufs, up, group_dim, gx_count, gy_count, vfi, nfi):
        return bufs
    FLOATS_PER_BATCH = 16

    for gy in range(gy_count):
        for gx in range(gx_count):
            bx0 = gx * up * group_dim
            by0 = gy * up * group_dim
            buf_xsize = min((gx + 1) * up * group_dim, wu) - bx0
            buf_ysize = min((gy + 1) * up * group_dim, hu) - by0
            for iy in range(up):
                for ix in range(up):
                    x0 = (gx * up + ix) * group_dim
                    y0 = (gy * up + iy) * group_dim
                    rng = Xorshift128Plus(vfi, nfi, x0, y0)
                    sx0 = ix * group_dim
                    sy0 = iy * group_dim
                    sub_xsize = min((ix + 1) * group_dim, buf_xsize) - sx0
                    sub_ysize = min((iy + 1) * group_dim, buf_ysize) - sy0
                    if sub_xsize <= 0 or sub_ysize <= 0:
                        continue
                    # libjxl (the conformance ground truth) generates each
                    # row over the rect extended 2 columns to the right —
                    # the margin feeds the convolve stage's horizontal
                    # border — so each row consumes ceil((sub_xsize+2)/16)
                    # fills; values beyond sub_xsize are discarded (the
                    # neighbor group's own field wins in the image).
                    # Verified bit-exact on noise.jxl (17 fills/row, mse
                    # 2e-13) and multiple_layers_noise_spline's upsampled
                    # 1024-wide subregions (65 fills/row); the reference's
                    # decode.rs:655 uses ceil(sub_xsize/16), which
                    # diverges from libjxl on interior groups.
                    nbatch = -(-(sub_xsize + 2) // FLOATS_PER_BATCH)
                    for buf in bufs:
                        for y in range(sub_ysize):
                            row = buf[by0 + sy0 + y]
                            for b in range(nbatch):
                                bits64 = rng.fill()
                                u32 = np.empty(16, dtype=np.uint32)
                                u32[0::2] = (bits64 & np.uint64(0xFFFFFFFF)).astype(np.uint32)
                                u32[1::2] = (bits64 >> np.uint64(32)).astype(np.uint32)
                                take = min(FLOATS_PER_BATCH, sub_xsize - b * FLOATS_PER_BATCH)
                                if take <= 0:
                                    continue
                                xoff = bx0 + sx0 + b * FLOATS_PER_BATCH
                                row[xoff : xoff + take] = _bits_to_float(u32[:take])
    return bufs


def generate_noise_field_rows(frame, y_lo: int, y_hi: int) -> list[np.ndarray]:
    """Rows [y_lo, y_hi) of the whole-image noise field, as 3
    (y_hi - y_lo, wu) planes — bit-identical to the corresponding slice
    of generate_noise_field. The RNG is seeded per group subregion, so
    only subregions intersecting the row range are generated (draws for
    leading skipped rows are consumed and discarded). Used by the banded
    low-memory decoder, which needs one band plus the 2-row convolve
    margin (ref render/low_memory_pipeline/mod.rs row-ring discipline)."""
    header = frame.header
    up = header.upsampling
    group_dim = header.group_dim
    wu, hu = header.size_upsampled()
    gx_count, gy_count = header.size_groups()
    vfi = frame.decoder_state.visible_frame_index if frame.decoder_state else 1
    nfi = frame.decoder_state.nonvisible_frame_index if frame.decoder_state else 0
    y_lo = max(0, y_lo)
    y_hi = min(hu, y_hi)
    bufs = [np.zeros((y_hi - y_lo, wu), dtype=np.float32) for _ in range(3)]

    from .. import native

    if native.noise_field_rows_native(
        bufs, hu, wu, up, group_dim, gx_count, gy_count, vfi, nfi, y_lo, y_hi
    ):
        return bufs
    FLOATS_PER_BATCH = 16
    for gy in range(gy_count):
        gby0 = gy * up * group_dim
        gby1 = min((gy + 1) * up * group_dim, hu)
        if gby1 <= y_lo or gby0 >= y_hi:
            continue
        for gx in range(gx_count):
            bx0 = gx * up * group_dim
            buf_xsize = min((gx + 1) * up * group_dim, wu) - bx0
            buf_ysize = gby1 - gby0
            for iy in range(up):
                for ix in range(up):
                    x0 = (gx * up + ix) * group_dim
                    y0 = (gy * up + iy) * group_dim
                    sx0 = ix * group_dim
                    sy0 = iy * group_dim
                    sub_xsize = min((ix + 1) * group_dim, buf_xsize) - sx0
                    sub_ysize = min((iy + 1) * group_dim, buf_ysize) - sy0
                    if sub_xsize <= 0 or sub_ysize <= 0:
                        continue
                    abs0 = gby0 + sy0
                    if abs0 >= y_hi or abs0 + sub_ysize <= y_lo:
                        continue
                    rng = Xorshift128Plus(vfi, nfi, x0, y0)
                    nbatch = -(-(sub_xsize + 2) // FLOATS_PER_BATCH)
                    for c, buf in enumerate(bufs):
                        for y in range(sub_ysize):
                            abs_y = abs0 + y
                            if abs_y >= y_hi and c == 2:
                                break
                            want = y_lo <= abs_y < y_hi
                            for b in range(nbatch):
                                bits64 = rng.fill()
                                if not want:
                                    continue
                                u32 = np.empty(16, dtype=np.uint32)
                                u32[0::2] = (bits64 & np.uint64(0xFFFFFFFF)).astype(np.uint32)
                                u32[1::2] = (bits64 >> np.uint64(32)).astype(np.uint32)
                                take = min(FLOATS_PER_BATCH, sub_xsize - b * FLOATS_PER_BATCH)
                                if take <= 0:
                                    continue
                                xoff = bx0 + sx0 + b * FLOATS_PER_BATCH
                                buf[abs_y - y_lo, xoff : xoff + take] = _bits_to_float(u32[:take])
    return bufs


def convolve_noise(xp, plane):
    """5x5 sum*0.16 + center*(-3.84) (ref stages/noise.rs ConvolveNoise)."""
    from ..render.stages.core import _pad_mirror

    p = _pad_mirror(xp, plane, 2, 2)
    h, w = plane.shape
    total = None
    for dy in range(5):
        for dx in range(5):
            v = p[dy : dy + h, dx : dx + w]
            total = v if total is None else total + v
    center = p[2 : 2 + h, 2 : 2 + w]
    return (total - center) * np.float32(0.16) + center * np.float32(-3.84)


def add_noise(xp, planes, noise_planes, noise: Noise, ccp):
    """ref stages/noise.rs AddNoiseStage."""
    if all(v == 0.0 for v in noise.lut):
        return planes
    norm_const = np.float32(0.22)
    ytox = np.float32(ccp.y_to_x_lf if ccp else 0.0)
    ytob = np.float32(ccp.y_to_b_lf if ccp else 1.0)
    vx, vy, vb = planes[0], planes[1], planes[2]
    rnd_r, rnd_g, rnd_c = noise_planes
    in_g = vy - vx
    in_r = vy + vx
    sg = noise.strength(in_g * np.float32(0.5), xp)
    sr = noise.strength(in_r * np.float32(0.5), xp)
    ar = rnd_r * norm_const
    ag = rnd_g * norm_const
    ac = rnd_c * norm_const
    k_rg = np.float32(0.9921875)
    k_rgn = np.float32(0.0078125)
    red_noise = sr * (k_rgn * ar + k_rg * ac)
    green_noise = sg * (k_rgn * ag + k_rg * ac)
    rg = red_noise + green_noise
    return [
        vx + ytox * rg + red_noise - green_noise,
        vy + rg,
        vb + ytob * rg,
    ]
