"""Acoustic frontend: framing, log-mel filterbank, deltas, CMVN.

The reference delegates feature extraction to an offline companion repo
(``hirofumi0810/asr_preprocessing``: wav -> 25ms/10ms framing -> 40-dim
log-mel fbank (+ energy) -> delta/delta-delta -> per-utterance CMVN ->
``.npy`` files; see SURVEY.md §2.9). Here the frontend is in-framework and
TPU-native: the window, DFT, and mel projection are folded into dense
matrices built once at trace time, so the whole pipeline is

    gather (framing) -> matmul (cos DFT) / matmul (sin DFT) -> square-add
    -> matmul (mel) -> log -> conv (deltas) -> masked mean/var (CMVN)

i.e. three MXU matmuls plus VPU elementwise work — no FFT op, no host
round-trips, fully fusable under one ``jit``. All shapes are static; the
number of valid frames is carried separately as ``feat_len``.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class FrontendConfig(NamedTuple):
    """Static frontend hyperparameters (hashable so it can be a jit static arg)."""

    sample_rate: int = 16000
    frame_length_ms: float = 25.0
    frame_step_ms: float = 10.0
    num_mels: int = 40
    feature_type: str = "fbank"  # "fbank" | "mfcc" (reference `feature` key)
    num_ceps: int = 13  # MFCC coefficients kept after the DCT
    fft_length: int = 512
    preemphasis: float = 0.97
    use_energy: bool = True  # append log frame energy => num_mels + 1 dims
    window: str = "hamming"  # "hamming" | "hann" | "povey" | "rect"
    lower_edge_hz: float = 20.0
    upper_edge_hz: float | None = None  # default: nyquist - 400
    add_deltas: bool = True  # append delta + delta-delta (3x feature dim)
    delta_window: int = 2
    cmvn: str = "utterance"  # "utterance" | "speaker" | "none"; "speaker" is
    # mask-only here — corpus-level stats are applied by the task pipeline
    # (frontend/speaker_cmvn.py), not per batch
    cmvn_var_norm: bool = True
    log_floor: float = 1e-10

    @property
    def frame_length(self) -> int:
        return int(self.sample_rate * self.frame_length_ms / 1000.0)

    @property
    def frame_step(self) -> int:
        return int(self.sample_rate * self.frame_step_ms / 1000.0)

    @property
    def base_dim(self) -> int:
        n = self.num_ceps if self.feature_type == "mfcc" else self.num_mels
        return n + (1 if self.use_energy else 0)

    @property
    def feature_dim(self) -> int:
        return self.base_dim * (3 if self.add_deltas else 1)


def _window_fn(name: str, n: int) -> np.ndarray:
    t = np.arange(n, dtype=np.float64)
    if name == "hamming":
        w = 0.54 - 0.46 * np.cos(2 * np.pi * t / (n - 1))
    elif name == "hann":
        w = 0.5 - 0.5 * np.cos(2 * np.pi * t / (n - 1))
    elif name == "povey":
        w = (0.5 - 0.5 * np.cos(2 * np.pi * t / (n - 1))) ** 0.85
    elif name == "rect":
        w = np.ones(n)
    else:
        raise ValueError(f"unknown window {name!r}")
    return w.astype(np.float64)


def _hz_to_mel(hz):
    return 2595.0 * np.log10(1.0 + np.asarray(hz) / 700.0)


def _mel_to_hz(mel):
    return 700.0 * (10.0 ** (np.asarray(mel) / 2595.0) - 1.0)


@functools.lru_cache(maxsize=None)
def _dft_mats(cfg: FrontendConfig, pad_rows: int = 0):
    """Window-folded real-DFT matrices: frames @ C, frames @ S give re/im parts.

    ``pad_rows`` appends zero rows so the matrices consume ``_frame_blocks``'s
    [..., nblk*frame_step] layout directly (the over-read tail columns are
    annihilated by the zeros). Cached as *numpy* (never jnp): converting to a
    jnp array inside a jit trace would cache a tracer and leak it into
    unrelated traces.
    """
    n, nfft = cfg.frame_length, cfg.fft_length
    bins = nfft // 2 + 1
    w = _window_fn(cfg.window, n)
    k = np.arange(bins)[None, :]  # [1, bins]
    t = np.arange(n)[:, None]  # [n, 1]
    ang = 2.0 * np.pi * t * k / nfft
    cos_m = (np.cos(ang) * w[:, None]).astype(np.float32)  # [n, bins]
    sin_m = (-np.sin(ang) * w[:, None]).astype(np.float32)
    if pad_rows:
        cos_m = np.pad(cos_m, ((0, pad_rows), (0, 0)))
        sin_m = np.pad(sin_m, ((0, pad_rows), (0, 0)))
    return cos_m, sin_m


@functools.lru_cache(maxsize=None)
def _mel_matrix(cfg: FrontendConfig) -> np.ndarray:
    """Triangular mel filterbank, [num_fft_bins, num_mels] (HTK-style). Numpy-cached."""
    nfft, sr = cfg.fft_length, cfg.sample_rate
    bins = nfft // 2 + 1
    upper = cfg.upper_edge_hz if cfg.upper_edge_hz is not None else sr / 2.0 - 400.0
    mel_lo, mel_hi = _hz_to_mel(cfg.lower_edge_hz), _hz_to_mel(upper)
    mel_pts = np.linspace(mel_lo, mel_hi, cfg.num_mels + 2)
    hz_pts = _mel_to_hz(mel_pts)
    bin_hz = np.arange(bins) * sr / nfft
    fb = np.zeros((bins, cfg.num_mels), dtype=np.float64)
    for m in range(cfg.num_mels):
        left, center, right = hz_pts[m], hz_pts[m + 1], hz_pts[m + 2]
        up = (bin_hz - left) / max(center - left, 1e-12)
        down = (right - bin_hz) / max(right - center, 1e-12)
        fb[:, m] = np.maximum(0.0, np.minimum(up, down))
    return fb.astype(np.float32)


def num_frames(num_samples, cfg: FrontendConfig):
    """Frame count for a signal of ``num_samples`` (works traced or static)."""
    return jnp.maximum(0, 1 + (num_samples - cfg.frame_length) // cfg.frame_step)


def frame_signal(wav: jnp.ndarray, cfg: FrontendConfig) -> jnp.ndarray:
    """[..., N] samples -> [..., T, frame_length] overlapping frames (gather)."""
    n = wav.shape[-1]
    if n < cfg.frame_length:
        raise ValueError(
            f"padded waveform length {n} is shorter than one frame "
            f"({cfg.frame_length} samples); pad batches to >= frame_length"
        )
    t_frames = max(0, 1 + (n - cfg.frame_length) // cfg.frame_step)
    idx = (
        np.arange(t_frames)[:, None] * cfg.frame_step
        + np.arange(cfg.frame_length)[None, :]
    )
    return wav[..., idx]


def _frame_blocks(wav: jnp.ndarray, cfg: FrontendConfig) -> jnp.ndarray:
    """[..., N] -> [..., T, nblk*frame_step] frames WITHOUT a gather.

    TPU gathers are slow (measured ~3 ms for [32, 192k] -> [32, 1198, 400]
    vs ~0.3 ms of DMA floor), so framing is decomposed into a block reshape
    plus ``nblk = ceil(frame_length/frame_step)`` static slices: frame t's
    samples [t*step, t*step+length) lie inside blocks t..t+nblk-1 of a
    [N/step, step] reshape. The trailing ``nblk*step - frame_length``
    columns of each row hold samples from beyond the frame (NOT zeros);
    consumers fold that away via zero rows in the DFT matrices
    (``_dft_mats`` pads) or by slicing ``[..., :frame_length]``.
    Bit-identical to ``frame_signal`` on the shared columns.
    """
    n = wav.shape[-1]
    if n < cfg.frame_length:
        raise ValueError(
            f"padded waveform length {n} is shorter than one frame "
            f"({cfg.frame_length} samples); pad batches to >= frame_length"
        )
    step, fl = cfg.frame_step, cfg.frame_length
    t_frames = max(0, 1 + (n - fl) // step)
    nblk = -(-fl // step)
    blocks_needed = t_frames + nblk - 1
    total = blocks_needed * step
    if total > n:
        wav = jnp.pad(wav, [(0, 0)] * (wav.ndim - 1) + [(0, total - n)])
    else:
        wav = wav[..., :total]
    a = wav.reshape(*wav.shape[:-1], blocks_needed, step)
    parts = [a[..., k : k + t_frames, :] for k in range(nblk)]
    return jnp.concatenate(parts, axis=-1)  # [..., T, nblk*step]


def preemphasize(wav: jnp.ndarray, coeff: float, context=None) -> jnp.ndarray:
    """x[t] - coeff*x[t-1]; x[0] uses itself (= (1-c)*x[0]) like the
    reference preprocessing, or ``context`` [..., 1] — the sample
    immediately BEFORE this buffer — when given (streaming continuation:
    chunk boundaries then preemphasize exactly like the unchunked signal).
    """
    if coeff == 0.0:
        return wav
    prev = wav[..., :1] if context is None else context
    first = wav[..., :1] - coeff * prev
    rest = wav[..., 1:] - coeff * wav[..., :-1]
    return jnp.concatenate([first, rest], axis=-1)


@functools.lru_cache(maxsize=None)
def _dct_matrix(cfg: FrontendConfig) -> np.ndarray:
    """Orthonormal DCT-II matrix [num_mels, num_ceps] for MFCC. Numpy-cached."""
    n, k = cfg.num_mels, cfg.num_ceps
    mat = np.cos(np.pi / n * (np.arange(n)[:, None] + 0.5) * np.arange(k)[None, :])
    mat *= np.sqrt(2.0 / n)
    mat[:, 0] *= 1.0 / np.sqrt(2.0)
    return mat.astype(np.float32)


def log_mel_spectrogram(wav: jnp.ndarray, cfg: FrontendConfig,
                        preemph_context=None) -> jnp.ndarray:
    """[..., N] float32 waveform -> [..., T, base_dim] log-mel or MFCC
    (+ log-energy).

    TPU note: the window is folded into the DFT matrices, so this lowers to
    two MXU matmuls + one mel matmul (+ one DCT matmul for MFCC); XLA fuses
    the square/add/log in between.
    """
    wav = preemphasize(wav.astype(jnp.float32), cfg.preemphasis, preemph_context)
    frames = _frame_blocks(wav, cfg)  # [..., T, nblk*step] (tail cols over-read)
    cos_m, sin_m = _dft_mats(cfg, pad_rows=frames.shape[-1] - cfg.frame_length)
    re = jnp.matmul(frames, cos_m, preferred_element_type=jnp.float32)
    im = jnp.matmul(frames, sin_m, preferred_element_type=jnp.float32)
    power = re * re + im * im  # [..., T, bins]
    mel = jnp.matmul(power, _mel_matrix(cfg), preferred_element_type=jnp.float32)
    logmel = jnp.log(jnp.maximum(mel, cfg.log_floor))
    if cfg.feature_type == "mfcc":
        logmel = jnp.matmul(logmel, _dct_matrix(cfg), preferred_element_type=jnp.float32)
    elif cfg.feature_type != "fbank":
        raise ValueError(f"unknown feature_type {cfg.feature_type!r}")
    if cfg.use_energy:
        valid = frames[..., : cfg.frame_length]  # drop the over-read tail
        energy = jnp.sum(valid * valid, axis=-1, keepdims=True)
        logmel = jnp.concatenate([jnp.log(jnp.maximum(energy, cfg.log_floor)), logmel], axis=-1)
    return logmel


def add_deltas(feats: jnp.ndarray, window: int = 2) -> jnp.ndarray:
    """Append delta and delta-delta along the feature axis.

    Standard regression deltas: d_t = sum_k k*(x_{t+k} - x_{t-k}) / (2*sum k^2),
    with edge replication padding (matches the usual HTK/python_speech_features
    behaviour the reference's offline features used).
    """

    def delta(x):
        denom = 2.0 * sum(k * k for k in range(1, window + 1))
        pad = [(0, 0)] * (x.ndim - 2) + [(window, window), (0, 0)]
        xp = jnp.pad(x, pad, mode="edge")
        t = x.shape[-2]
        out = jnp.zeros_like(x)
        for k in range(1, window + 1):
            plus = jax.lax.slice_in_dim(xp, window + k, window + k + t, axis=-2)
            minus = jax.lax.slice_in_dim(xp, window - k, window - k + t, axis=-2)
            out = out + k * (plus - minus)
        return out / denom

    d1 = delta(feats)
    d2 = delta(d1)
    return jnp.concatenate([feats, d1, d2], axis=-1)


def cmvn_utterance(
    feats: jnp.ndarray, feat_len: jnp.ndarray, var_norm: bool = True
) -> jnp.ndarray:
    """Per-utterance cepstral mean (and variance) normalization over valid frames.

    feats: [..., T, D]; feat_len: [...] valid frame counts. Padded frames are
    excluded from the statistics and zeroed on output (so downstream padding
    masks stay trivially correct).
    """
    t = feats.shape[-2]
    mask = (
        jnp.arange(t)[:, None] < jnp.asarray(feat_len)[..., None, None]
    ).astype(feats.dtype)  # [..., T, 1]
    denom = jnp.maximum(jnp.sum(mask, axis=-2, keepdims=True), 1.0)
    mean = jnp.sum(feats * mask, axis=-2, keepdims=True) / denom
    out = feats - mean
    if var_norm:
        var = jnp.sum((out * mask) ** 2, axis=-2, keepdims=True) / denom
        out = out * jax.lax.rsqrt(var + 1e-8)
    return out * mask


@functools.partial(jax.jit, static_argnames=("cfg",))
def extract_features(
    wav: jnp.ndarray, wav_len: jnp.ndarray, cfg: FrontendConfig = FrontendConfig(),
    preemph_context=None,
):
    """Full frontend: [..., N] waveform + valid-sample counts -> features.

    Returns ``(feats [..., T, feature_dim], feat_len [...])``. Everything is
    static-shaped; T is derived from the padded waveform length.
    ``preemph_context`` [..., 1]: the sample before this buffer (streaming —
    see ``preemphasize``).
    """
    feats = log_mel_spectrogram(wav, cfg, preemph_context)
    feat_len = num_frames(jnp.asarray(wav_len), cfg)
    if cfg.add_deltas:
        feats = add_deltas(feats, cfg.delta_window)
    if cfg.cmvn == "utterance":
        feats = cmvn_utterance(feats, feat_len, cfg.cmvn_var_norm)
    else:
        t = feats.shape[-2]
        mask = (jnp.arange(t)[:, None] < jnp.asarray(feat_len)[..., None, None]).astype(
            feats.dtype
        )
        feats = feats * mask
    return feats, feat_len
