"""Gated ctypes bindings to the distro's canonical image-codec C libraries
(libwebp, libpng16, libtiff, libgif).

Two roles, both optional — every entry point degrades cleanly when a
library is absent (returns ``None`` / ``False``), so nothing here is a
hard dependency and no pip/apt install is ever attempted:

1. **Independent test oracles** (``tests/test_syscodec_oracle.py``): the
   reference C implementations that real-world files were written by
   cross-validate the pure-python codecs byte-for-byte — the same
   independent-reader discipline the Avro export already has
   (``tests/test_avro_independent.py``). The pure codecs remain the
   production path; these bindings never replace them.

2. **Production fallback for lossy VP8** — the one image format the pure
   decoders deliberately do not implement (a full intra video codec,
   RFC 6386; the pure ``webpcodec.py`` covers the VP8L lossless side
   completely, both directions). ``webp_decode_argb`` routes RIFF/WEBP
   files whose image chunk is ``VP8 `` here when libwebp is present;
   without it the documented ValueError seam stands unchanged. This is
   the right engineering call for a 100 TB ingest engine: on a real
   cluster libwebp is a base-image apt package, and hand-rolling a VP8
   entropy decoder in Python would be both slower and unverifiable
   in-sandbox (no second implementation to oracle it against).

Reference parity: the reference engine links the same system codecs
through its JVM/CGo image utilities rather than reimplementing them;
see SURVEY.md §2 (K2 image kernels).

ctypes notes: only stable public ABIs are bound — libwebp's
``WebPDecodeRGBA`` (simple one-call API), libpng16's simplified
``png_image`` API (fixed 96-byte struct, version 1), libtiff's
``TIFFReadRGBAImageOriented`` (file-handle API; callers hand us bytes,
we stage a temp file — oracle-only, never a hot path), and giflib 5's
``DGifSlurp``/``DGifSavedExtensionToGCB``. libjpeg62 is deliberately NOT
bound: classic libjpeg has no simple API — its ABI is a ~600-byte
version-locked ``jpeg_decompress_struct`` plus setjmp error handling
that cannot be expressed safely in ctypes (and no libturbojpeg is
installed). The JPEG codec keeps its existing oracles (encode→decode
round-trips and libjpeg-written real files).
"""

from __future__ import annotations

import ctypes
import ctypes.util
import os
import tempfile
from functools import lru_cache

import numpy as np

# ---------------------------------------------------------------------------
# lazy library loading
# ---------------------------------------------------------------------------

_SONAMES = {
    "webp": ("libwebp.so.7", "libwebp.so"),
    "png": ("libpng16.so.16", "libpng16.so"),
    "tiff": ("libtiff.so.6", "libtiff.so.5", "libtiff.so"),
    "gif": ("libgif.so.7", "libgif.so"),
}


@lru_cache(maxsize=None)
def _lib(name: str):
    """Load a system codec library by short name; None if unavailable."""
    for soname in _SONAMES[name]:
        try:
            return ctypes.CDLL(soname)
        except OSError:
            continue
    found = ctypes.util.find_library(name)
    if found:
        try:
            return ctypes.CDLL(found)
        except OSError:
            pass
    return None


def have(name: str) -> bool:
    """True if the system library ('webp'|'png'|'tiff'|'gif') loads."""
    return _lib(name) is not None


# ---------------------------------------------------------------------------
# libwebp — WebPDecodeRGBA / WebPFree (stable simple API since 0.2)
# ---------------------------------------------------------------------------


def webp_decode_rgba_sys(data: bytes) -> np.ndarray | None:
    """Decode any WebP payload (VP8 lossy, VP8L lossless, VP8X extended
    with ALPH/animation-first-frame) to (h, w, 4) uint8 RGBA via system
    libwebp. None if libwebp is unavailable; ValueError on decode failure."""
    lw = _lib("webp")
    if lw is None:
        return None
    lw.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
    lw.WebPDecodeRGBA.argtypes = [
        ctypes.c_char_p,
        ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    w = ctypes.c_int(0)
    h = ctypes.c_int(0)
    data = bytes(data)
    ptr = lw.WebPDecodeRGBA(data, len(data), ctypes.byref(w), ctypes.byref(h))
    if not ptr:
        raise ValueError("libwebp could not decode the WebP payload")
    try:
        out = np.ctypeslib.as_array(ptr, shape=(h.value, w.value, 4)).copy()
    finally:
        lw.WebPFree(ctypes.cast(ptr, ctypes.c_void_p))
    return out


# ---------------------------------------------------------------------------
# libpng16 — simplified png_image read API (libpng manual §V)
# ---------------------------------------------------------------------------

_PNG_IMAGE_VERSION = 1
_PNG_FORMAT_RGBA = 3  # PNG_FORMAT_FLAG_ALPHA | PNG_FORMAT_FLAG_COLOR


class _PngImage(ctypes.Structure):
    # struct png_image, png.h (simplified API): layout is ABI-frozen.
    _fields_ = [
        ("opaque", ctypes.c_void_p),
        ("version", ctypes.c_uint32),
        ("width", ctypes.c_uint32),
        ("height", ctypes.c_uint32),
        ("format", ctypes.c_uint32),
        ("flags", ctypes.c_uint32),
        ("colormap_entries", ctypes.c_uint32),
        ("warning_or_error", ctypes.c_uint32),
        ("message", ctypes.c_char * 64),
    ]


def png_decode_rgba_sys(data: bytes) -> np.ndarray | None:
    """Decode PNG bytes to (h, w, 4) uint8 straight (unassociated) RGBA via
    libpng's simplified API. None if libpng is unavailable; ValueError on
    decode failure. NOTE: for 16-bit sources the simplified API *scales*
    to 8 bits (round(v/257)) rather than the classic strip-16 high-byte
    convention the pure decoder follows — oracle tests therefore restrict
    themselves to ≤8-bit-per-sample files, where the conventions agree."""
    lp = _lib("png")
    if lp is None:
        return None
    img = _PngImage()
    img.version = _PNG_IMAGE_VERSION
    data = bytes(data)
    if not lp.png_image_begin_read_from_memory(
        ctypes.byref(img), data, len(data)
    ):
        raise ValueError(
            f"libpng begin_read failed: {img.message.decode(errors='replace')}"
        )
    img.format = _PNG_FORMAT_RGBA
    buf = np.zeros((img.height, img.width, 4), np.uint8)
    if not lp.png_image_finish_read(
        ctypes.byref(img), None, buf.ctypes.data_as(ctypes.c_void_p), 0, None
    ):
        raise ValueError(
            f"libpng finish_read failed: {img.message.decode(errors='replace')}"
        )
    return buf


# ---------------------------------------------------------------------------
# libtiff — TIFFReadRGBAImageOriented (RGBA interface, TIFF 6.0 baseline)
# ---------------------------------------------------------------------------

_TIFFTAG_IMAGEWIDTH = 256
_TIFFTAG_IMAGELENGTH = 257
_ORIENTATION_TOPLEFT = 1


def tiff_decode_rgba_sys(data: bytes) -> np.ndarray | None:
    """Decode TIFF bytes to (h, w, 4) uint8 RGBA via libtiff's RGBA
    interface (top-left oriented, stop-on-error). None if libtiff is
    unavailable; ValueError on open/decode failure. NOTE: for files with
    UNASSOCIATED alpha libtiff premultiplies: out = (rgb*a + 127) // 255
    — oracle tests verify that exact relation against the pure decoder's
    unmultiplied planes. Bytes are staged through a temp file (the RGBA
    interface is handle-based); this binding is a test oracle, never a
    data-path component."""
    lt = _lib("tiff")
    if lt is None:
        return None
    lt.TIFFOpen.restype = ctypes.c_void_p
    lt.TIFFOpen.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    fd, path = tempfile.mkstemp(suffix=".tiff")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(bytes(data))
        tif = lt.TIFFOpen(path.encode(), b"r")
        if not tif:
            raise ValueError("libtiff could not open the TIFF payload")
        try:
            w = ctypes.c_uint32(0)
            h = ctypes.c_uint32(0)
            lt.TIFFGetField(
                ctypes.c_void_p(tif), ctypes.c_uint32(_TIFFTAG_IMAGEWIDTH),
                ctypes.byref(w),
            )
            lt.TIFFGetField(
                ctypes.c_void_p(tif), ctypes.c_uint32(_TIFFTAG_IMAGELENGTH),
                ctypes.byref(h),
            )
            if not (w.value and h.value):
                raise ValueError("libtiff reports zero dimensions")
            buf = np.zeros((h.value, w.value), np.uint32)
            ok = lt.TIFFReadRGBAImageOriented(
                ctypes.c_void_p(tif), w, h,
                buf.ctypes.data_as(ctypes.c_void_p),
                ctypes.c_int(_ORIENTATION_TOPLEFT), ctypes.c_int(1),
            )
            if not ok:
                raise ValueError("libtiff RGBA decode failed")
        finally:
            lt.TIFFClose(ctypes.c_void_p(tif))
    finally:
        os.unlink(path)
    # ABGR-packed uint32, little-endian → bytes land as R,G,B,A
    return buf.view(np.uint8).reshape(h.value, w.value, 4)


# ---------------------------------------------------------------------------
# libgif — DGifSlurp + GCB (giflib 5 ABI)
# ---------------------------------------------------------------------------


class _GifColorType(ctypes.Structure):
    _fields_ = [
        ("Red", ctypes.c_ubyte),
        ("Green", ctypes.c_ubyte),
        ("Blue", ctypes.c_ubyte),
    ]


class _ColorMapObject(ctypes.Structure):
    _fields_ = [
        ("ColorCount", ctypes.c_int),
        ("BitsPerPixel", ctypes.c_int),
        ("SortFlag", ctypes.c_int),
        ("Colors", ctypes.POINTER(_GifColorType)),
    ]


class _GifImageDesc(ctypes.Structure):
    _fields_ = [
        ("Left", ctypes.c_int),
        ("Top", ctypes.c_int),
        ("Width", ctypes.c_int),
        ("Height", ctypes.c_int),
        ("Interlace", ctypes.c_int),
        ("ColorMap", ctypes.POINTER(_ColorMapObject)),
    ]


class _SavedImage(ctypes.Structure):
    _fields_ = [
        ("ImageDesc", _GifImageDesc),
        ("RasterBits", ctypes.POINTER(ctypes.c_ubyte)),
        ("ExtensionBlockCount", ctypes.c_int),
        ("ExtensionBlocks", ctypes.c_void_p),
    ]


class _GifFileType(ctypes.Structure):
    _fields_ = [
        ("SWidth", ctypes.c_int),
        ("SHeight", ctypes.c_int),
        ("SColorResolution", ctypes.c_int),
        ("SBackGroundColor", ctypes.c_int),
        ("AspectByte", ctypes.c_ubyte),
        ("SColorMap", ctypes.POINTER(_ColorMapObject)),
        ("ImageCount", ctypes.c_int),
        ("Image", _GifImageDesc),
        ("SavedImages", ctypes.POINTER(_SavedImage)),
        ("ExtensionBlockCount", ctypes.c_int),
        ("ExtensionBlocks", ctypes.c_void_p),
        ("Error", ctypes.c_int),
        ("UserData", ctypes.c_void_p),
        ("Private", ctypes.c_void_p),
    ]


class _GCB(ctypes.Structure):
    # GraphicsControlBlock: giflib uses C99 bool (1 byte) for UserInputFlag.
    _fields_ = [
        ("DisposalMode", ctypes.c_int),
        ("UserInputFlag", ctypes.c_bool),
        ("DelayTime", ctypes.c_int),
        ("TransparentColor", ctypes.c_int),
    ]


def _colormap(cm) -> np.ndarray | None:
    if not cm:
        return None
    n = cm.contents.ColorCount
    pal = np.empty((n, 3), np.uint8)
    colors = cm.contents.Colors
    for i in range(n):
        c = colors[i]
        pal[i] = (c.Red, c.Green, c.Blue)
    return pal


def gif_slurp_sys(data: bytes) -> dict | None:
    """Parse GIF bytes with giflib (DGifSlurp) and return the raw decoded
    structure: screen dims/background/global palette plus one dict per
    frame with the LZW-decoded index raster in DISPLAY order (DGifSlurp
    de-interlaces — its 4-pass loop writes each line to its display row;
    the ``interlace`` flag is still passed through), the frame
    rect, its effective palette, and the GCB transparent index / disposal
    (-1 / 0 when absent). None if giflib is unavailable; ValueError on
    parse failure. Bytes are staged through a temp file (simplest stable
    entry point; test oracle only)."""
    lg = _lib("gif")
    if lg is None:
        return None
    lg.DGifOpenFileName.restype = ctypes.POINTER(_GifFileType)
    lg.DGifOpenFileName.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int)]
    err = ctypes.c_int(0)
    fd, path = tempfile.mkstemp(suffix=".gif")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(bytes(data))
        gf = lg.DGifOpenFileName(path.encode(), ctypes.byref(err))
        if not gf:
            raise ValueError(f"giflib open failed (error {err.value})")
        try:
            if lg.DGifSlurp(gf) != 1:
                raise ValueError(f"giflib slurp failed (error {gf.contents.Error})")
            g = gf.contents
            out = {
                "width": g.SWidth,
                "height": g.SHeight,
                "background": g.SBackGroundColor,
                "global_palette": _colormap(g.SColorMap),
                "frames": [],
            }
            for i in range(g.ImageCount):
                si = g.SavedImages[i]
                d = si.ImageDesc
                npx = d.Width * d.Height
                raster = (
                    np.ctypeslib.as_array(si.RasterBits, shape=(npx,))
                    .reshape(d.Height, d.Width)
                    .copy()
                )
                gcb = _GCB()
                has_gcb = lg.DGifSavedExtensionToGCB(
                    gf, ctypes.c_int(i), ctypes.byref(gcb)
                )
                local = _colormap(d.ColorMap)
                out["frames"].append(
                    {
                        "left": d.Left,
                        "top": d.Top,
                        "width": d.Width,
                        "height": d.Height,
                        "interlace": bool(d.Interlace),
                        "raster": raster,
                        "palette": local
                        if local is not None
                        else out["global_palette"],
                        "transparent": gcb.TransparentColor if has_gcb == 1 else -1,
                        "disposal": gcb.DisposalMode if has_gcb == 1 else 0,
                        "delay": gcb.DelayTime if has_gcb == 1 else 0,
                    }
                )
            return out
        finally:
            lg.DGifCloseFile(gf, ctypes.byref(err))
    finally:
        os.unlink(path)
