"""ctypes bindings for the native video decoder (native/video_decode.cpp).

libavformat/libavcodec decode with optional DCT-domain ``lowres`` plus a
libswscale scale+convert straight to the model input resolution - the
staging-path replacement for cv2.VideoCapture, which always converts
YUV->BGR at full source resolution before the host resize (TPU-side
equivalent of the reference decode loop, reference predict.py:126-161).

Builds ``native/libtrackvideo.so`` on demand; requires system ffmpeg dev
libs, so ``open_native_video`` returns None whenever the library cannot be
built/loaded or the file cannot be opened - callers then use cv2.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libtrackvideo.so")

_lib = None
_lock = threading.Lock()
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        # Always run make: it no-ops when the .so is newer than the
        # sources and rebuilds a stale one (the .so is gitignored, so a
        # prebuilt library would otherwise mask source updates forever).
        try:
            subprocess.run(
                ["make", "-s", "-C", _NATIVE_DIR, "video"],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception as e:
            if not os.path.exists(_LIB_PATH):
                _build_failed = True
                return None
            # A previously built library exists; fall back to it, but say
            # so - silently loading a stale .so after a failed rebuild
            # would mask compile errors in edited native sources.
            import sys

            err = getattr(e, "stderr", b"") or b""
            print(
                "warning: rebuilding native/libtrackvideo.so failed; using "
                f"the existing (possibly stale) library. make said:\n"
                f"{err.decode(errors='replace').strip()}",
                file=sys.stderr,
            )
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _build_failed = True
            return None
        lib.vdec_open.restype = ctypes.c_void_p
        lib.vdec_open.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_longlong),
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.vdec_read.restype = ctypes.c_int
        lib.vdec_read.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.vdec_read_yuv.restype = ctypes.c_int
        lib.vdec_read_yuv.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
        ]
        lib.vdec_close.restype = None
        lib.vdec_close.argtypes = [ctypes.c_void_p]
        lib.venc_write_test_clip.restype = ctypes.c_int
        lib.venc_write_test_clip.argtypes = [
            ctypes.c_char_p,
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
        ]
        _lib = lib
        return _lib


class NativeVideoReader:
    """Decode a video to packed (N, out_h, out_w, 3) uint8 batches.

    ``lowres`` asks the codec for DCT-domain reduced-resolution decode
    (mpeg4-family; clamped to the codec's max - ``applied_lowres`` reports
    what was granted). ``lowres=-1`` selects AUTO: the largest level whose
    decoded dims still cover (out_w, out_h), so scaling always goes down.
    Source dims/fps always describe the full-resolution container stream,
    so coordinate scalers are unaffected by lowres.
    """

    def __init__(
        self,
        video_file: str,
        out_w: int,
        out_h: int,
        lowres: int = 0,
        bgr: bool = True,
    ):
        lib = _load()
        if lib is None:
            raise RuntimeError("native video decoder unavailable")
        sw = ctypes.c_int()
        sh = ctypes.c_int()
        nf = ctypes.c_longlong()
        fps = ctypes.c_double()
        alr = ctypes.c_int()
        self._h = lib.vdec_open(
            video_file.encode(),
            out_w,
            out_h,
            lowres,
            ctypes.byref(sw),
            ctypes.byref(sh),
            ctypes.byref(nf),
            ctypes.byref(fps),
            ctypes.byref(alr),
        )
        if not self._h:
            raise RuntimeError(f"native open failed: {video_file}")
        self._lib = lib
        self.out_w, self.out_h = out_w, out_h
        self.src_w, self.src_h = sw.value, sh.value
        self.n_frames = int(nf.value)  # -1 when the container doesn't say
        self.fps = fps.value
        self.applied_lowres = alr.value
        self.bgr = bgr

    def read_batch(self, max_frames: int) -> Optional[np.ndarray]:
        """Next ``<= max_frames`` frames, or None at end of stream."""
        out = np.empty((max_frames, self.out_h, self.out_w, 3), np.uint8)
        n = self.read_into(out)
        if n <= 0:
            return None
        return out[:n]

    def read_into(self, out: np.ndarray) -> int:
        """Decode into a preallocated (N, out_h, out_w, 3) C-contiguous
        uint8 array; returns frames written (0 at EOS, raises on error).
        The foreign call releases the GIL, so a producer thread decoding
        with this overlaps the main thread's upload RPCs on one core."""
        if self._h is None:
            return 0
        assert out.dtype == np.uint8 and out.flags.c_contiguous
        n = self._lib.vdec_read(
            self._h,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            int(out.shape[0]),
            1 if self.bgr else 0,
        )
        if n < 0:
            raise RuntimeError("native video decode error")
        return n

    def read_into_yuv(self, out: np.ndarray) -> int:
        """Decode into a preallocated (N, out_h*out_w*3//2) C-contiguous
        uint8 array of planar YUV420 frames (per frame: Y[h*w], U[h/2*w/2],
        V[h/2*w/2]); returns frames written (0 at EOS, raises on error).

        HALF the bytes of the packed-BGR form - the H2D-staging format.
        The BT.601 limited-range YUV->RGB conversion then runs on device
        inside the finalize program (ops.preprocess.yuv420_to_rgb), where
        it fuses with the concat+median for free. Output dims must be even
        (the C side checks at the FIRST READ, returning -1 -> RuntimeError
        here, not at open; callers wanting an early failure should
        validate out_w/out_h themselves)."""
        if self._h is None:
            return 0
        assert out.dtype == np.uint8 and out.flags.c_contiguous
        assert out.shape[-1] == self.out_h * self.out_w * 3 // 2, out.shape
        n = self._lib.vdec_read_yuv(
            self._h,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            int(out.shape[0]),
        )
        if n < 0:
            raise RuntimeError("native video decode error (yuv420)")
        return n

    def close(self):
        if getattr(self, "_h", None):
            self._lib.vdec_close(self._h)
            self._h = None

    def __del__(self):  # pragma: no cover - GC timing
        try:
            self.close()
        except Exception:
            pass


def open_native_video(
    video_file: str, out_w: int, out_h: int, lowres: int = 0, bgr: bool = True
) -> Optional[NativeVideoReader]:
    """NativeVideoReader or None (no toolchain/ffmpeg libs/open failure)."""
    try:
        return NativeVideoReader(video_file, out_w, out_h, lowres=lowres, bgr=bgr)
    except Exception:
        return None


def write_test_clip(
    video_file: str, codec: str = "libx264", n: int = 24, w: int = 1280, h: int = 720
) -> bool:
    """Encode a synthetic moving-square clip with the named libav codec.

    Test-fixture utility (cv2's bundled ffmpeg cannot encode h264); True
    on success."""
    lib = _load()
    if lib is None:
        return False
    return (
        lib.venc_write_test_clip(video_file.encode(), codec.encode(), n, w, h)
        == 0
    )


def probe_video(video_file: str) -> Optional[Tuple[int, int, int, float]]:
    """(src_w, src_h, n_frames, fps) via the native decoder, else None."""
    r = open_native_video(video_file, 64, 36)
    if r is None:
        return None
    try:
        return (r.src_w, r.src_h, r.n_frames, r.fps)
    finally:
        r.close()
