"""ctypes bindings for the native IO library (native/avsr_io.cpp), with
pure-numpy fallbacks so the framework runs everywhere.

The native side replaces the reference's C/C++ library dependencies
(SURVEY.md §2.3): torchaudio wav load + resample
(reference: av_dataset.py:75-84) and fairseq's batch_by_size packer
(reference: data_module.py:37). The library is compiled on demand with g++
(cached in native/build/).
"""

from __future__ import annotations

import ctypes
import logging
import math
import os
import subprocess
import wave
from functools import lru_cache

import numpy as np

logger = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "build", "libavsr_io.so")


@lru_cache(maxsize=1)
def load_library():
    """Load (building if needed) the native library; None if unavailable.
    Rebuilds when the source is newer than the cached .so."""
    src = os.path.join(_NATIVE_DIR, "avsr_io.cpp")
    stale = (os.path.exists(_LIB_PATH) and os.path.exists(src)
             and os.path.getmtime(src) > os.path.getmtime(_LIB_PATH))
    if not os.path.exists(_LIB_PATH) or stale:
        if not os.path.exists(src):
            return None
        try:
            os.makedirs(os.path.dirname(_LIB_PATH), exist_ok=True)
            subprocess.run(
                ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", "-o", _LIB_PATH, src],
                check=True, capture_output=True, timeout=120)
        except Exception as e:  # no compiler / failed build -> numpy fallback
            logger.warning("native build failed (%s); using numpy fallbacks", e)
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.avsr_wav_info.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_long)]
    lib.avsr_wav_info.restype = ctypes.c_int
    lib.avsr_wav_read_mono_f32.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_long]
    lib.avsr_wav_read_mono_f32.restype = ctypes.c_long
    lib.avsr_resample_f32.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_long, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_long]
    lib.avsr_resample_f32.restype = ctypes.c_long
    lib.avsr_batch_by_size.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64), ctypes.c_long,
        ctypes.c_long, ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64)]
    lib.avsr_batch_by_size.restype = ctypes.c_long
    lib.avsr_dtw.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_long, ctypes.c_long,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64)]
    lib.avsr_dtw.restype = ctypes.c_long
    return lib


# ---------------------------------------------------------------------------
# WAV
# ---------------------------------------------------------------------------


def wav_info(path: str) -> tuple[int, int, int]:
    """(sample_rate, channels, frames)."""
    lib = load_library()
    if lib is not None:
        sr, ch, fr = ctypes.c_int(), ctypes.c_int(), ctypes.c_long()
        if lib.avsr_wav_info(path.encode(), ctypes.byref(sr), ctypes.byref(ch),
                             ctypes.byref(fr)) == 0:
            return sr.value, ch.value, fr.value
    with wave.open(path, "rb") as w:
        return w.getframerate(), w.getnchannels(), w.getnframes()


def read_wav_mono(path: str) -> tuple[np.ndarray, int]:
    """Mono float32 waveform in [-1, 1] + sample rate (torchaudio
    normalize=True semantics, reference: av_dataset.py:78)."""
    sr, ch, frames = wav_info(path)
    lib = load_library()
    if lib is not None:
        out = np.empty(frames, dtype=np.float32)
        got = lib.avsr_wav_read_mono_f32(
            path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), frames)
        if got >= 0:
            return out[:got], sr
    # numpy fallback via the stdlib wave module (PCM16/8/32 only)
    with wave.open(path, "rb") as w:
        raw = w.readframes(w.getnframes())
        width = w.getsampwidth()
        if width == 2:
            data = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
        elif width == 4:
            data = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
        elif width == 1:
            data = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128) / 128.0
        else:
            raise ValueError(f"unsupported wav sample width {width}")
        data = data.reshape(-1, ch).mean(axis=1)
        return data.astype(np.float32), sr


# ---------------------------------------------------------------------------
# Resample
# ---------------------------------------------------------------------------


def resample(x: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Polyphase windowed-sinc resample to sr_out."""
    if sr_in == sr_out:
        return x.astype(np.float32, copy=False)
    lib = load_library()
    n_out = int(math.ceil(len(x) * sr_out / sr_in))
    if lib is not None:
        xin = np.ascontiguousarray(x, dtype=np.float32)
        out = np.empty(n_out + 8, dtype=np.float32)
        got = lib.avsr_resample_f32(
            xin.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(xin), sr_in, sr_out,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(out))
        if got >= 0:
            return out[:got]
    # numpy fallback: FFT-domain resample on the reduced ratio grid
    g = math.gcd(sr_in, sr_out)
    up, down = sr_out // g, sr_in // g
    n_up = len(x) * up
    spec = np.fft.rfft(x)
    n_bins_up = n_up // 2 + 1
    spec_up = np.zeros(n_bins_up, dtype=spec.dtype)
    spec_up[: len(spec)] = spec * up
    x_up = np.fft.irfft(spec_up, n=n_up)
    return x_up[::down][:n_out].astype(np.float32)


# ---------------------------------------------------------------------------
# Batch packing (fairseq batch_by_size semantics)
# ---------------------------------------------------------------------------


def batch_by_size(indices: np.ndarray, sizes: np.ndarray, max_tokens: int) -> list[np.ndarray]:
    """Greedy packing: consecutive indices are batched while
    len(batch) * max(size) <= max_tokens (a lone index always forms a
    batch) — the packing contract the reference's bucketing sampler gets
    from fairseq (reference: data_module.py:37,57-61)."""
    indices = np.ascontiguousarray(indices, dtype=np.int64)
    sizes = np.ascontiguousarray(sizes, dtype=np.int64)
    n = len(indices)
    if n == 0:
        return []
    lib = load_library()
    if lib is not None:
        flat = np.empty(n, dtype=np.int64)
        offsets = np.empty(n + 1, dtype=np.int64)
        n_batches = lib.avsr_batch_by_size(
            indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            n, int(max_tokens),
            flat.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        if n_batches >= 0:
            return [flat[offsets[i]:offsets[i + 1]] for i in range(n_batches)]
    # python fallback with identical semantics
    batches: list[np.ndarray] = []
    start, batch_max = 0, 0
    for i, idx in enumerate(indices):
        sz = int(sizes[idx])
        new_max = max(batch_max, sz)
        if i > start and (i - start + 1) * new_max > max_tokens:
            batches.append(indices[start:i])
            start, batch_max = i, sz
        else:
            batch_max = new_max
    batches.append(indices[start:])
    return batches


# ---------------------------------------------------------------------------
# Monotonic DTW (decode/timestamps.py word alignment)
# ---------------------------------------------------------------------------


def dtw(cost: np.ndarray) -> tuple[np.ndarray, np.ndarray] | None:
    """Native DTW over an [n, m] cost matrix; None when the library is
    unavailable (the caller falls back to the numpy DP with identical
    semantics — equality is tested in tests/test_timestamps.py)."""
    lib = load_library()
    if lib is None:
        return None
    c = np.ascontiguousarray(cost, dtype=np.float64)
    n, m = c.shape
    out_text = np.empty(n + m, dtype=np.int64)
    out_time = np.empty(n + m, dtype=np.int64)
    length = lib.avsr_dtw(
        c.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n, m,
        out_text.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        out_time.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    if length < 0:
        return None
    return out_text[:length], out_time[:length]
