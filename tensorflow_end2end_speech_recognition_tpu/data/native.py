"""ctypes bindings for the C++ host runtime (native/asr_native.cpp).

Loads ``native/libasr_native.so`` (building it on first use if a toolchain
is present) and exposes:

- :func:`batch_assemble` — multithreaded pad+gather of utterance buffers
  into a contiguous batch (the reference's per-utterance Python copy loop,
  SURVEY.md §3.4 hot loop #3, done by C++ worker threads);
- :func:`levenshtein_batch` — batched token edit distance with S/I/D counts.

Every entry point has a pure-numpy fallback, so the framework works without
the shared library; ``HAVE_NATIVE`` reports which path is active.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_LIB = None


def _lib_path() -> Path:
    return Path(__file__).resolve().parents[2] / "native" / "libasr_native.so"


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    path = _lib_path()
    if not path.exists():
        build = path.parent / "build.sh"
        try:
            subprocess.run(["sh", str(build)], check=True, capture_output=True)
        except Exception:
            _LIB = False
            return _LIB
    try:
        lib = ctypes.CDLL(str(path))
        lib.batch_assemble.argtypes = [
            ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_int32,
        ]
        lib.levenshtein_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_void_p, ctypes.c_int32,
        ]
        lib.asr_native_abi_version.restype = ctypes.c_int32
        assert lib.asr_native_abi_version() == 1
        _LIB = lib
    except Exception:
        _LIB = False
    return _LIB


def have_native() -> bool:
    return bool(_load())


def batch_assemble(utts: list[np.ndarray], t_pad: int, n_threads: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """Pad/stack float32 utterance arrays -> ([B, t_pad(, D)], lengths)."""
    b = len(utts)
    dim = 1 if utts[0].ndim == 1 else utts[0].shape[-1]
    lens = np.asarray([u.shape[0] for u in utts], np.int32)
    if lens.size and int(lens.max()) > t_pad:
        # the C++ kernel memcpys lens[i] rows into a t_pad row and memsets
        # the (negative -> huge unsigned) remainder: validate HERE so a bad
        # t_pad is a clean error, not silent heap corruption
        raise ValueError(
            f"utterance length {int(lens.max())} exceeds t_pad {t_pad}"
        )
    lib = _load()
    if lib:
        utts = [np.ascontiguousarray(u, np.float32) for u in utts]
        out = np.empty((b, t_pad, dim), np.float32)
        ptrs = (ctypes.c_void_p * b)(
            *[u.ctypes.data_as(ctypes.c_void_p).value for u in utts]
        )
        lib.batch_assemble(
            ctypes.cast(ptrs, ctypes.POINTER(ctypes.c_void_p)),
            lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            b, dim, t_pad,
            out.ctypes.data_as(ctypes.c_void_p), n_threads,
        )
    else:  # pure-python fallback
        out = np.zeros((b, t_pad, dim), np.float32)
        for i, u in enumerate(utts):
            out[i, : u.shape[0]] = u.reshape(u.shape[0], dim)
    if utts[0].ndim == 1:
        out = out.reshape(b, t_pad)
    return out, lens


def levenshtein_batch(refs: list[list[int]], hyps: list[list[int]], n_threads: int = 0) -> np.ndarray:
    """Per-pair [distance, subs, ins, dels], int32 [N, 4]."""
    n = len(refs)
    max_len = max([1] + [len(x) for x in refs + hyps])
    r = np.full((n, max_len), -1, np.int32)
    h = np.full((n, max_len), -1, np.int32)
    rl = np.asarray([len(x) for x in refs], np.int32)
    hl = np.asarray([len(x) for x in hyps], np.int32)
    for i in range(n):
        r[i, : rl[i]] = refs[i]
        h[i, : hl[i]] = hyps[i]
    lib = _load()
    out = np.zeros((n, 4), np.int32)
    if lib:
        lib.levenshtein_batch(
            r.ctypes.data_as(ctypes.c_void_p), rl.ctypes.data_as(ctypes.c_void_p),
            h.ctypes.data_as(ctypes.c_void_p), hl.ctypes.data_as(ctypes.c_void_p),
            n, max_len, out.ctypes.data_as(ctypes.c_void_p), n_threads,
        )
        return out
    # fallback: python DP (slow; used only without a C++ toolchain)
    for i in range(n):
        a, b_ = refs[i], hyps[i]
        w = len(b_) + 1
        dp = np.zeros((len(a) + 1, w), np.int32)
        dp[0, :] = np.arange(w)
        dp[:, 0] = np.arange(len(a) + 1)
        for x in range(1, len(a) + 1):
            for y in range(1, w):
                dp[x, y] = min(
                    dp[x - 1, y - 1] + (a[x - 1] != b_[y - 1]),
                    dp[x - 1, y] + 1,
                    dp[x, y - 1] + 1,
                )
        x, y, subs, ins, dels = len(a), len(b_), 0, 0, 0
        while x > 0 or y > 0:
            if x > 0 and y > 0 and dp[x, y] == dp[x - 1, y - 1] + (a[x - 1] != b_[y - 1]):
                subs += a[x - 1] != b_[y - 1]
                x, y = x - 1, y - 1
            elif x > 0 and dp[x, y] == dp[x - 1, y] + 1:
                dels += 1
                x -= 1
            else:
                ins += 1
                y -= 1
        out[i] = [dp[len(a), len(b_)], subs, ins, dels]
    return out
