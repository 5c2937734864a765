"""Color management system: lcms2 bindings for ICC transforms.

Capability reference: jxl_cms/src/lib.rs (JxlCms / JxlCmsTransformer traits
over lcms2) — N independent transformers over interleaved f32 rows. Binds
the system liblcms2 via ctypes (native library, float pixel formats),
matching the reference's use of the same library.
"""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np

# lcms2 pixel format codes: FLOAT_SH(1) | COLORSPACE_SH(PT_*) | CHANNELS_SH(n) | BYTES_SH(4)
TYPE_RGB_FLT = (1 << 22) | (4 << 16) | (3 << 3) | 4
TYPE_GRAY_FLT = (1 << 22) | (3 << 16) | (1 << 3) | 4

INTENT_PERCEPTUAL = 0
INTENT_RELATIVE_COLORIMETRIC = 1
INTENT_SATURATION = 2
INTENT_ABSOLUTE_COLORIMETRIC = 3

_lib = None


def _lcms():
    global _lib
    if _lib is None:
        import glob

        candidates = [ctypes.util.find_library("lcms2")]
        candidates += glob.glob(
            "/opt/venv/lib/python*/site-packages/pillow.libs/liblcms2*"
        )
        for name in candidates:
            if not name:
                continue
            try:
                lib = ctypes.CDLL(name)
                break
            except OSError:
                continue
        else:  # pragma: no cover
            raise RuntimeError("liblcms2 not found")
        lib.cmsOpenProfileFromMem.restype = ctypes.c_void_p
        lib.cmsOpenProfileFromMem.argtypes = [ctypes.c_void_p, ctypes.c_uint32]
        lib.cmsCreateTransform.restype = ctypes.c_void_p
        lib.cmsCreateTransform.argtypes = [
            ctypes.c_void_p, ctypes.c_uint32,
            ctypes.c_void_p, ctypes.c_uint32,
            ctypes.c_uint32, ctypes.c_uint32,
        ]
        lib.cmsDoTransform.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint32
        ]
        lib.cmsCloseProfile.argtypes = [ctypes.c_void_p]
        lib.cmsDeleteTransform.argtypes = [ctypes.c_void_p]
        lib.cmsGetColorSpace.restype = ctypes.c_uint32
        lib.cmsGetColorSpace.argtypes = [ctypes.c_void_p]
        _lib = lib
    return _lib


def _fmt_for(profile_handle) -> tuple[int, int]:
    """(lcms pixel format, channel count) for a profile's colorspace."""
    # cmsGetColorSpace returns an ICC colorspace signature
    sig = _lcms().cmsGetColorSpace(profile_handle)
    if sig == 0x47524159:  # 'GRAY'
        return TYPE_GRAY_FLT, 1
    return TYPE_RGB_FLT, 3


class CmsTransformer:
    """One ICC transform over interleaved f32 pixels
    (ref JxlCmsTransformer: run(&mut [f32]))."""

    def __init__(self, src_icc: bytes, dst_icc: bytes, intent: int = INTENT_RELATIVE_COLORIMETRIC):
        lib = _lcms()
        self._src = lib.cmsOpenProfileFromMem(src_icc, len(src_icc))
        self._dst = lib.cmsOpenProfileFromMem(dst_icc, len(dst_icc))
        if not self._src or not self._dst:
            raise ValueError("invalid ICC profile")
        in_fmt, self.in_channels = _fmt_for(self._src)
        out_fmt, self.out_channels = _fmt_for(self._dst)
        self._xform = lib.cmsCreateTransform(
            self._src, in_fmt, self._dst, out_fmt, intent, 0
        )
        if not self._xform:
            raise ValueError("could not create ICC transform")

    def run(self, pixels: np.ndarray) -> np.ndarray:
        """pixels: (..., in_channels) float32 interleaved; returns the
        transformed (..., out_channels) float32 array."""
        lib = _lcms()
        flat = np.ascontiguousarray(pixels, dtype=np.float32)
        n = flat.size // self.in_channels
        out = np.empty(flat.shape[:-1] + (self.out_channels,), dtype=np.float32)
        lib.cmsDoTransform(
            self._xform,
            flat.ctypes.data_as(ctypes.c_void_p),
            out.ctypes.data_as(ctypes.c_void_p),
            n,
        )
        return out

    def __del__(self):  # pragma: no cover
        lib = _lib
        if lib is None:
            return
        if getattr(self, "_xform", None):
            lib.cmsDeleteTransform(self._xform)
        for h in (getattr(self, "_src", None), getattr(self, "_dst", None)):
            if h:
                lib.cmsCloseProfile(h)


class JxlCms:
    """CMS interface (ref jxl_cms/src/lib.rs:28-50): create N parallel
    transformers for a src/dst profile pair."""

    @staticmethod
    def begin_transforms(
        src_icc: bytes, dst_icc: bytes, num: int = 1, intent: int = INTENT_RELATIVE_COLORIMETRIC
    ) -> list[CmsTransformer]:
        return [CmsTransformer(src_icc, dst_icc, intent) for _ in range(num)]


def srgb_profile() -> bytes:
    """A standard sRGB ICC profile (synthesized by lcms2 via Pillow)."""
    from PIL import ImageCms

    return ImageCms.ImageCmsProfile(ImageCms.createProfile("sRGB")).tobytes()
