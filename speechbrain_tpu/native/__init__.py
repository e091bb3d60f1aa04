"""Native (C++) runtime components.

The reference's native surface outside CUDA is the sentencepiece C++
tokenizer (reference ``tokenizers/SentencePiece.py:20``) and
torchaudio's C++ decode path (``dataio/dataio.py:162``).  This package
holds the framework's own C++ equivalents, compiled on first use with
the system toolchain and bound through ctypes.  Every caller falls
back to the pure-Python implementation when a compiler is unavailable,
so the native layer is an accelerator, never a hard dependency.
"""

import ctypes
import logging
import os
import subprocess
import threading

logger = logging.getLogger(__name__)

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libsb_native.so")
_SOURCES = ["sb_tokenizer.cc", "sb_audio.cc"]
_lock = threading.RLock()  # get_lib() -> build() re-enters
_lib = None
_tried = False


def _needs_build():
    if not os.path.exists(_LIB_PATH):
        return True
    lib_mtime = os.path.getmtime(_LIB_PATH)
    return any(
        os.path.getmtime(os.path.join(_DIR, src)) > lib_mtime
        for src in _SOURCES
        if os.path.exists(os.path.join(_DIR, src))
    )


def build(force=False):
    """Compile the native library (g++ -O3).  Returns the .so path."""
    with _lock:
        if not force and not _needs_build():
            return _LIB_PATH
        srcs = [
            os.path.join(_DIR, s)
            for s in _SOURCES
            if os.path.exists(os.path.join(_DIR, s))
        ]
        cmd = [
            "g++",
            "-O3",
            "-std=c++17",
            "-shared",
            "-fPIC",
            "-o",
            _LIB_PATH,
            *srcs,
        ]
        logger.info("Building native library: %s", " ".join(cmd))
        subprocess.run(cmd, check=True, capture_output=True)
        return _LIB_PATH


def get_lib():
    """The loaded native library, or None when unavailable."""
    global _lib, _tried
    if _lib is not None:
        return _lib
    # NOTE: _tried may only be read under the lock — a no-lock
    # `if _tried: return None` races with the loading thread (which
    # sets it before _lib is assigned) and made concurrent dataloader
    # workers see a phantom-missing native lib (round 5).
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            build()
            lib = ctypes.CDLL(_LIB_PATH)
            lib.sb_tok_train.restype = ctypes.c_void_p  # manual free
            lib.sb_tok_train.argtypes = [
                ctypes.c_char_p,
                ctypes.c_int,
                ctypes.c_char_p,
                ctypes.c_char_p,
            ]
            lib.sb_free.argtypes = [ctypes.c_void_p]
            lib.sb_tok_load.restype = ctypes.c_void_p
            lib.sb_tok_load.argtypes = [ctypes.c_char_p]
            lib.sb_tok_unload.argtypes = [ctypes.c_void_p]
            lib.sb_tok_encode.restype = ctypes.c_int
            lib.sb_tok_encode.argtypes = [
                ctypes.c_void_p,
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int,
            ]
            lib.sb_flac_decode.restype = ctypes.c_int
            lib.sb_flac_decode.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
            ]
            lib.sb_free_f32.argtypes = [ctypes.POINTER(ctypes.c_float)]
            _lib = lib
        except Exception as err:  # pragma: no cover
            logger.warning("Native library unavailable (%s); using Python", err)
            _lib = None
    return _lib


def tok_train(sentences, vocab_size, model_type, special_tokens):
    """Train natively; returns the model blob string or None."""
    lib = get_lib()
    if lib is None or model_type not in ("bpe", "unigram"):
        return None
    corpus = "\n".join(sentences).encode("utf-8")
    ptr = lib.sb_tok_train(
        corpus,
        int(vocab_size),
        model_type.encode(),
        " ".join(special_tokens).encode(),
    )
    if not ptr:
        return None
    try:
        return ctypes.string_at(ptr).decode("utf-8")
    finally:
        lib.sb_free(ptr)


class NativeEncoder:
    """ctypes handle around the native encode hot path."""

    def __init__(self, blob):
        self._lib = get_lib()
        if self._lib is None:
            raise RuntimeError("native library unavailable")
        self._h = self._lib.sb_tok_load(blob.encode("utf-8"))
        self._buf = (ctypes.c_int32 * 512)()

    def encode(self, text):
        """Token ids for whitespace-split text."""
        data = text.encode("utf-8")
        n = self._lib.sb_tok_encode(self._h, data, self._buf, len(self._buf))
        if n > len(self._buf):
            self._buf = (ctypes.c_int32 * (2 * n))()
            n = self._lib.sb_tok_encode(
                self._h, data, self._buf, len(self._buf)
            )
        return list(self._buf[:n])

    def close(self):
        """Release the native model."""
        if getattr(self, "_h", None):
            self._lib.sb_tok_unload(self._h)
            self._h = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass


def flac_decode(path):
    """Decode a FLAC file natively.

    Returns ``(audio, sample_rate)`` with float32 ``audio`` shaped
    (frames,) for mono or (frames, channels); None when the native
    library is unavailable.  Raises ValueError on malformed files.
    """
    lib = get_lib()
    if lib is None:
        return None
    import numpy as np

    out = ctypes.POINTER(ctypes.c_float)()
    n_frames = ctypes.c_int64()
    channels = ctypes.c_int()
    rate = ctypes.c_int()
    code = lib.sb_flac_decode(
        os.fspath(path).encode(),
        ctypes.byref(out),
        ctypes.byref(n_frames),
        ctypes.byref(channels),
        ctypes.byref(rate),
    )
    if code != 0:
        raise ValueError(f"FLAC decode failed ({code}): {path}")
    try:
        n = n_frames.value * channels.value
        audio = np.ctypeslib.as_array(out, shape=(n,)).copy()
    finally:
        lib.sb_free_f32(out)
    if channels.value > 1:
        audio = audio.reshape(n_frames.value, channels.value)
    return audio, rate.value
