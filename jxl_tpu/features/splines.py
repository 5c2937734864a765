"""Splines: centripetal Catmull-Rom curves with DCT32-coded color/sigma,
rendered as Gaussian brush segments.

Capability reference: jxl/src/features/spline.rs + util/fast_math.rs.
The fast_cos / fast_erff approximations are reproduced exactly so output
matches the reference's quality baselines. Segment splatting is
vectorized per segment over its bounding box (additive — order-free).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field as dfield

import numpy as np

from ..errors import InvalidBitstream, SplineAdjacentCoincidingControlPoints, SplinesAreaTooLarge, SplinesDeltaLimit, SplinesDistanceTooLarge, SplinesPointOutOfRange, SplinesTooMany, SplinesTooManyControlPoints
from ..entropy import Histograms, SymbolReader
from ..io.bit_reader import BitReader
from ..io.bundle import unpack_signed

_QUANT_ADJ_CTX = 0
_START_POS_CTX = 1
_NUM_SPLINES_CTX = 2
_NUM_CP_CTX = 3
_CP_CTX = 4
_DCT_CTX = 5
_NUM_CONTEXTS = 6
_MAX_CP = 1 << 20
_DELTA_LIMIT = 1 << 30
_POS_LIMIT = 1 << 23
_DESIRED_DIST = 1.0
_CHANNEL_WEIGHT = (0.0042, 0.075, 0.07, 0.3333)


def fast_cos(x):
    """ref util/fast_math.rs:16-41 (vectorized)."""
    x = np.asarray(x, dtype=np.float32)
    pi2 = np.float32(2 * math.pi)
    npi2 = np.floor(x * np.float32(0.5 / math.pi)) * pi2
    xmod = x - npi2
    x_pi = np.minimum(xmod, pi2 - xmod)
    above = x_pi >= np.float32(math.pi / 2)
    x_ph = np.where(above, np.float32(math.pi) - x_pi, x_pi)
    xs = x_ph * np.float32(0.25)
    x2 = xs * xs
    x4 = x2 * x2
    pre = x4 * np.float32(0.06960438) + (x2 * np.float32(-0.84087373) + np.float32(1.68179268))
    s1 = pre * pre - np.float32(math.sqrt(2.0))
    s2 = s1 * s1 - np.float32(1.0)
    return np.where(above, -s2, s2).astype(np.float32)


def fast_erf(x):
    """ref util/fast_math.rs:45-59 (vectorized)."""
    absx = np.abs(x)
    d1 = absx * np.float32(7.77394369e-02) + np.float32(2.05260015e-04)
    d2 = d1 * absx + np.float32(2.32120216e-01)
    d3 = d2 * absx + np.float32(2.77820801e-01)
    d4 = d3 * absx + np.float32(1.0)
    d5 = d4 * d4
    inv = np.float32(1.0) / d5
    return np.copysign(-inv * inv + np.float32(1.0), x).astype(np.float32)


def _area_limit(image_size: int) -> int:
    return min(1024 * image_size + (1 << 32), 1 << 42)


@dataclass
class QuantizedSpline:
    control_points: list
    color_dct: list  # [3][32] int
    sigma_dct: list  # [32] int


@dataclass
class _Segment:
    center_x: float
    center_y: float
    maximum_distance: float
    inv_sigma: float
    sigma_over_4_times_intensity: float
    color: tuple


class Splines:
    def __init__(self):
        self.quantization_adjustment = 0
        self.splines: list[QuantizedSpline] = []
        self.starting_points: list = []
        self.segments: list[_Segment] = []

    @staticmethod
    def read(br: BitReader, num_pixels: int) -> "Splines":
        """ref spline.rs:826-889."""
        s = Splines()
        histograms = Histograms.decode(_NUM_CONTEXTS, br, allow_lz77=True)
        reader = SymbolReader(histograms, br)
        num_splines = reader.read_unsigned(histograms, br, _NUM_SPLINES_CTX) + 1
        max_cp = min(_MAX_CP, num_pixels // 2)
        if num_splines > max_cp:
            raise SplinesTooMany("too many splines")
        last_x = last_y = 0
        for i in range(num_splines):
            ux = reader.read_unsigned(histograms, br, _START_POS_CTX)
            uy = reader.read_unsigned(histograms, br, _START_POS_CTX)
            if i != 0:
                x = unpack_signed(ux) + last_x
                y = unpack_signed(uy) + last_y
            else:
                x, y = ux, uy
            if max(abs(x), abs(y)) >= _POS_LIMIT:
                raise SplinesPointOutOfRange("spline coordinates out of range")
            s.starting_points.append((float(x), float(y)))
            last_x, last_y = x, y
        s.quantization_adjustment = reader.read_signed(histograms, br, _QUANT_ADJ_CTX)
        total_cp = 0
        for _ in range(num_splines):
            n = reader.read_unsigned(histograms, br, _NUM_CP_CTX)
            total_cp += n
            if total_cp > max_cp:
                raise SplinesTooManyControlPoints("too many control points")
            cps = []
            for _ in range(n):
                dx = reader.read_signed(histograms, br, _CP_CTX)
                dy = reader.read_signed(histograms, br, _CP_CTX)
                if max(abs(dx), abs(dy)) >= _DELTA_LIMIT:
                    raise SplinesDeltaLimit("spline delta too large")
                cps.append((dx, dy))
            color_dct = [
                [reader.read_signed(histograms, br, _DCT_CTX) for _ in range(32)]
                for _ in range(3)
            ]
            sigma_dct = [reader.read_signed(histograms, br, _DCT_CTX) for _ in range(32)]
            s.splines.append(QuantizedSpline(cps, color_dct, sigma_dct))
        reader.check_final_state(histograms, br)
        return s

    # -- dequantize + draw cache ---------------------------------------------

    def initialize_draw_cache(self, image_xsize, image_ysize, ccp, high_precision=False):
        y_to_x = ccp.y_to_x_lf if ccp else 0.0
        y_to_b = ccp.y_to_b_lf if ccp else 1.0
        image_area = image_xsize * image_ysize
        area_limit = _area_limit(image_area)
        total_area = 0
        self.segments = []
        inv_quant = (
            1.0 / (1.0 + 0.125 * self.quantization_adjustment)
            if self.quantization_adjustment >= 0
            else 1.0 - 0.125 * self.quantization_adjustment
        )
        for qspline, start in zip(self.splines, self.starting_points):
            cps, color_dct, sigma_dct, est_area = _dequantize(
                qspline, start, inv_quant, y_to_x, y_to_b, image_area
            )
            total_area += est_area
            if total_area > area_limit:
                raise SplinesAreaTooLarge("splines area too large")
            for a, b in zip(cps, cps[1:]):
                if a == b:
                    raise SplineAdjacentCoincidingControlPoints("identical adjacent spline points")
            pts = _catmull_rom(cps)
            draw_pts = _equally_spaced(pts, _DESIRED_DIST)
            if not draw_pts:
                continue
            length = (len(draw_pts) - 2) * _DESIRED_DIST + draw_pts[-1][1]
            if length <= 0.0:
                continue
            self._add_segments(draw_pts, length, color_dct, sigma_dct, high_precision)

    def _add_segments(self, draw_pts, length, color_dct, sigma_dct, high_precision):
        # vectorized over all arc-length samples: the per-point 32-tap
        # DCT evaluation (fast_cos + dot) was a python loop over
        # thousands of points per spline (animated-spline frames decode
        # one spline set per frame)
        inv_length = 1.0 / length
        P = len(draw_pts)
        idxs = np.arange(P, dtype=np.float32)
        progress = np.minimum(
            idxs * np.float32(_DESIRED_DIST * inv_length), np.float32(1.0)
        )
        t = np.float32(31.0) * progress
        ang = (
            np.arange(32, dtype=np.float32)[None, :]
            * np.float32(math.pi / 32.0)
            * (t[:, None] + np.float32(0.5))
        )
        cosines = np.float32(math.sqrt(2.0)) * fast_cos(ang)  # (P, 32)
        cd = np.asarray(color_dct, dtype=np.float32)  # (3, 32)
        sd = np.asarray(sigma_dct, dtype=np.float32)  # (32,)
        colors = cosines @ cd.T  # (P, 3)
        sigmas = cosines @ sd  # (P,)
        mults = np.asarray([m for _, m in draw_pts], dtype=np.float64)
        ok = (
            np.isfinite(sigmas)
            & (sigmas != 0.0)
            & np.isfinite(mults)
        )
        with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
            ok &= np.isfinite(1.0 / sigmas)
            distance_exp = 5.0 if high_precision else 3.0
            max_color = np.maximum(
                np.abs(colors.astype(np.float64) * mults[:, None]).max(axis=1),
                np.abs(0.01 * mults),
            )
            s64 = sigmas.astype(np.float64)
            max_dist = np.sqrt(
                np.maximum(
                    0.0,
                    -2.0 * s64 * s64 * (math.log(0.1) * distance_exp - np.log(max_color)),
                )
            )
            inv_sigma = 1.0 / s64
            s4m = 0.25 * s64 * mults
        append = self.segments.append
        colors_l = colors.astype(np.float64).tolist()
        md_l = max_dist.tolist()
        is_l = inv_sigma.tolist()
        s4_l = s4m.tolist()
        ok_l = ok.tolist()
        for i, (pt, _) in enumerate(draw_pts):
            if not ok_l[i]:
                continue
            append(
                _Segment(
                    pt[0], pt[1], md_l[i], is_l[i], s4_l[i], tuple(colors_l[i])
                )
            )

    # -- rendering ------------------------------------------------------------

    def draw(self, planes):
        """Additively splat all segments onto 3 whole-image planes."""
        return self.draw_rows(planes, 0)

    def draw_rows(self, planes, row0: int):
        """Additively splat onto 3 band planes covering global rows
        [row0, row0 + rows): splats are per-pixel independent, so the
        row-clipped evaluation is bit-identical to the whole-image one
        (the band low-memory pipeline's spline stage; ref
        render/low_memory_pipeline row-windowed stages)."""
        rows, w = planes[0].shape
        row1 = row0 + rows
        for seg in self.segments:
            x0 = max(0, int(round(seg.center_x - seg.maximum_distance)))
            x1 = min(w, int(round(seg.center_x + seg.maximum_distance)) + 1)
            y0 = max(row0, int(round(seg.center_y - seg.maximum_distance)))
            y1 = min(row1, int(round(seg.center_y + seg.maximum_distance)) + 1)
            if x1 <= x0 or y1 <= y0:
                continue
            xs = np.arange(x0, x1, dtype=np.float32) - np.float32(seg.center_x)
            ys = np.arange(y0, y1, dtype=np.float32) - np.float32(seg.center_y)
            dist = np.sqrt(xs[None, :] ** 2 + ys[:, None] ** 2)
            c = np.float32(0.35355338)
            arg1 = (dist * np.float32(0.5) + c) * np.float32(seg.inv_sigma)
            arg2 = (dist * np.float32(0.5) - c) * np.float32(seg.inv_sigma)
            f = fast_erf(arg1) - fast_erf(arg2)
            local = np.float32(seg.sigma_over_4_times_intensity) * f * f
            for ci in range(3):
                planes[ci][y0 - row0 : y1 - row0, x0:x1] += (
                    np.float32(seg.color[ci]) * local
                )
        return planes


def _dequantize(qspline, start, inv_quant, y_to_x, y_to_b, image_area):
    """ref spline.rs:237-338."""
    area_limit = _area_limit(image_area)
    px, py = round(start[0]), round(start[1])
    cps = [(float(px), float(py))]
    cur_x, cur_y = int(px), int(py)
    dx = dy = 0
    manhattan = 0
    for (ddx, ddy) in qspline.control_points:
        dx += ddx
        dy += ddy
        if max(abs(dx), abs(dy)) >= _POS_LIMIT:
            raise SplinesDeltaLimit("spline delta out of range")
        manhattan += abs(dx) + abs(dy)
        if manhattan > area_limit:
            raise SplinesDistanceTooLarge("spline too long")
        cur_x += dx
        cur_y += dy
        if max(abs(cur_x), abs(cur_y)) >= _POS_LIMIT:
            raise SplinesPointOutOfRange("spline point out of range")
        cps.append((float(cur_x), float(cur_y)))

    frac_sqrt2 = 1.0 / math.sqrt(2.0)
    color_dct = []
    for c in range(3):
        row = []
        for i in range(32):
            f = frac_sqrt2 if i == 0 else 1.0
            row.append(qspline.color_dct[c][i] * f * _CHANNEL_WEIGHT[c] * inv_quant)
        color_dct.append(row)
    for i in range(32):
        color_dct[0][i] += y_to_x * color_dct[1][i]
        color_dct[2][i] += y_to_b * color_dct[1][i]

    color = [0, 0, 0]
    for c in range(3):
        for i in range(32):
            color[c] += math.ceil(inv_quant * abs(qspline.color_dct[c][i]))
    color[0] += math.ceil(abs(y_to_x)) * color[1]
    color[2] += math.ceil(abs(y_to_b)) * color[1]
    max_color = max(color)
    logcolor = max(1, _ceil_log2(1 + max_color))
    weight_limit = math.ceil(
        math.sqrt((area_limit / logcolor) / max(manhattan, 1))
    )

    sigma_dct = []
    width_estimate = 0
    for i in range(32):
        f = frac_sqrt2 if i == 0 else 1.0
        sigma_dct.append(qspline.sigma_dct[i] * f * _CHANNEL_WEIGHT[3] * inv_quant)
        weight_f = math.ceil(inv_quant * abs(qspline.sigma_dct[i]))
        weight = int(min(weight_limit, max(weight_f, 1.0)))
        width_estimate += weight * weight * logcolor
    est_area = width_estimate * manhattan
    return cps, color_dct, sigma_dct, est_area


def _ceil_log2(x: int) -> int:
    return (x - 1).bit_length() if x > 1 else 0


def _catmull_rom(points):
    """ref spline.rs:360-419."""
    if not points:
        return []
    if len(points) == 1:
        return [points[0]]
    NUM = 16
    p = [tuple(points[0][k] + (points[0][k] - points[1][k]) for k in range(2))]
    p += [tuple(pt) for pt in points]
    p.append(tuple(points[-1][k] + (points[-1][k] - points[-2][k]) for k in range(2)))
    d = [math.sqrt(math.hypot(p[i + 1][0] - p[i][0], p[i + 1][1] - p[i][1])) for i in range(len(p) - 1)]
    result = []
    for i in range(len(points) - 1):
        # window p[i..i+4] with deltas d[i..i+3]
        w = [p[i], p[i + 1], p[i + 2], p[i + 3]]
        wd = [d[i], d[i + 1], d[i + 2]]
        result.append(w[1])
        t = [0.0] * 4
        for k in range(3):
            t[k + 1] = t[k] + wd[k]
        for j in range(1, NUM):
            tt = wd[0] + (j / NUM) * wd[1]
            a = []
            for k in range(3):
                r = (tt - t[k]) / wd[k] if wd[k] else 0.0
                a.append(
                    tuple(w[k][m] + (w[k + 1][m] - w[k][m]) * r for m in range(2))
                )
            b = []
            for k in range(2):
                denom = wd[k] + wd[k + 1]
                r = (tt - t[k]) / denom if denom else 0.0
                b.append(tuple(a[k][m] + (a[k + 1][m] - a[k][m]) * r for m in range(2)))
            r = (tt - t[1]) / wd[1] if wd[1] else 0.0
            result.append(tuple(b[0][m] + (b[1][m] - b[0][m]) * r for m in range(2)))
    result.append(points[-1])
    return result


def _equally_spaced(points, desired):
    """ref spline.rs:421-454."""
    if not points:
        return []
    out = [(points[0], desired)]
    if len(points) == 1:
        return out
    acc = 0.0
    for i in range(len(points) - 1):
        cur = points[i]
        nxt = points[i + 1]
        seg = (nxt[0] - cur[0], nxt[1] - cur[1])
        seg_len = math.hypot(*seg)
        if seg_len == 0.0:
            continue
        unit = (seg[0] / seg_len, seg[1] / seg_len)
        if acc + seg_len >= desired:
            cur = (cur[0] + unit[0] * (desired - acc), cur[1] + unit[1] * (desired - acc))
            out.append((cur, desired))
            acc -= desired
        acc += seg_len
        while acc >= desired:
            cur = (cur[0] + unit[0] * desired, cur[1] + unit[1] * desired)
            out.append((cur, desired))
            acc -= desired
    out.append((points[-1], acc))
    return out
