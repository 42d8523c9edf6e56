"""Offline corpus preparation: wav files -> per-utterance ``.npy`` features.

The reference consumed corpora preprocessed by its companion repo
``hirofumi0810/asr_preprocessing`` (SURVEY.md §2.9: offline framing, fbank/
MFCC, deltas, per-utterance or per-speaker CMVN, one ``.npy`` per utterance).
This framework normally extracts features on-device per batch, but its
precomputed-feature input mode (``data_root:`` configs) expects that same
on-disk layout — this CLI produces it with the SAME fused-matmul frontend
(``frontend/features.py``), so offline and online features are identical.

    python -m tensorflow_end2end_speech_recognition_tpu.bin.prepare \
        <out_root> <split> --wav-scp scp.tsv \
        [--feature fbank] [--input-size 40] [--no-delta] [--no-energy] \
        [--cmvn utterance|speaker|none] [--batch 16]

``scp.tsv`` lines: ``utt_id<TAB>wav_path<TAB>text`` or
``utt_id<TAB>wav_path<TAB>speaker<TAB>text``. Wavs must be mono 16-bit PCM
at the frontend sample rate. Output:

    <out_root>/<split>/feats/<utt_id>.npy    float32 [T, D]
    <out_root>/<split>/transcripts.tsv       utt_id<TAB>[speaker<TAB>]text
"""

from __future__ import annotations

import argparse
import wave
from pathlib import Path

import numpy as np


def read_wav(path: str | Path, expect_rate: int) -> np.ndarray:
    """Mono 16-bit PCM wav -> float32 in [-1, 1]."""
    with wave.open(str(path), "rb") as w:
        if w.getframerate() != expect_rate:
            raise ValueError(
                f"{path}: sample rate {w.getframerate()} != frontend rate "
                f"{expect_rate} (resampling is out of scope; re-record or "
                f"resample offline)"
            )
        if w.getsampwidth() != 2:
            raise ValueError(f"{path}: only 16-bit PCM supported")
        raw = np.frombuffer(w.readframes(w.getnframes()), np.int16)
        if w.getnchannels() > 1:
            raw = raw.reshape(-1, w.getnchannels()).mean(axis=1).astype(np.int16)
    return raw.astype(np.float32) / 32768.0


def parse_scp(path: str | Path):
    """[(utt_id, wav_path, speaker|None, text)] from a scp tsv."""
    rows = []
    for line in Path(path).read_text().splitlines():
        if not line.strip():
            continue
        cols = line.split("\t")
        if len(cols) == 3:
            rows.append((cols[0], cols[1], None, cols[2]))
        elif len(cols) >= 4:
            rows.append((cols[0], cols[1], cols[2], "\t".join(cols[3:])))
        else:
            raise ValueError(f"bad scp line (need >=3 tab columns): {line!r}")
    return rows


def extract_batched(wavs: list[np.ndarray], frontend, batch: int):
    """Raw frontend features (no CMVN) per utterance, device-batched.

    Pads each batch to a whole second so XLA compiles a handful of shapes,
    not one per utterance length.
    """
    import jax.numpy as jnp

    from ..frontend import extract_features

    fe = frontend._replace(cmvn="none")
    out = []
    for lo in range(0, len(wavs), batch):
        group = wavs[lo : lo + batch]
        lens = np.asarray([len(w) for w in group], np.int32)
        pad_to = max(
            fe.frame_length,
            -(-int(lens.max()) // fe.sample_rate) * fe.sample_rate,
        )
        mat = np.zeros((len(group), pad_to), np.float32)
        for i, w in enumerate(group):
            mat[i, : len(w)] = w
        feats, flen = extract_features(jnp.asarray(mat), jnp.asarray(lens), fe)
        feats, flen = np.asarray(feats), np.asarray(flen)
        out.extend(feats[i, : flen[i]] for i in range(len(group)))
    return out


def apply_cmvn(feats: list[np.ndarray], speakers: list, mode: str, var_norm=True):
    """Offline CMVN exactly as the reference's preprocessing did it."""
    if mode == "none":
        return feats
    if mode == "utterance":
        out = []
        for f in feats:
            mu = f.mean(axis=0, keepdims=True)
            sd = f.std(axis=0, keepdims=True) + 1e-8 if var_norm else 1.0
            out.append(((f - mu) / sd).astype(np.float32))
        return out
    if mode == "speaker":
        stats: dict = {}
        for f, s in zip(feats, speakers):
            n, su, sq = stats.get(s, (0, 0.0, 0.0))
            stats[s] = (n + len(f), su + f.sum(axis=0), sq + (f**2).sum(axis=0))
        norms = {}
        for s, (n, su, sq) in stats.items():
            mu = su / n
            sd = np.sqrt(np.maximum(sq / n - mu**2, 0.0)) + 1e-8 if var_norm else 1.0
            norms[s] = (mu, sd)
        return [((f - norms[s][0]) / norms[s][1]).astype(np.float32)
                for f, s in zip(feats, speakers)]
    raise ValueError(f"unknown cmvn mode {mode!r}")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("out_root")
    ap.add_argument("split")
    ap.add_argument("--wav-scp", required=True)
    ap.add_argument("--feature", choices=("fbank", "mfcc"), default="fbank")
    ap.add_argument("--input-size", type=int, default=40)
    ap.add_argument("--no-delta", action="store_true")
    ap.add_argument("--no-energy", action="store_true")
    ap.add_argument("--cmvn", choices=("utterance", "speaker", "none"),
                    default="utterance")
    ap.add_argument("--sample-rate", type=int, default=16000)
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args(argv)

    from ..utils.jax_setup import setup

    setup()
    from ..frontend import FrontendConfig

    fe = FrontendConfig(
        feature_type=args.feature,
        num_mels=args.input_size,
        use_energy=not args.no_energy,
        add_deltas=not args.no_delta,
        sample_rate=args.sample_rate,
        cmvn="none",  # CMVN is applied offline below (reference semantics)
    )
    rows = parse_scp(args.wav_scp)
    if args.cmvn == "speaker" and any(s is None for _, _, s, _ in rows):
        raise ValueError("--cmvn speaker needs 4-column scp lines with speaker ids")
    wavs = [read_wav(p, args.sample_rate) for _, p, _, _ in rows]
    feats = extract_batched(wavs, fe, args.batch)
    feats = apply_cmvn(feats, [s for _, _, s, _ in rows], args.cmvn)

    out = Path(args.out_root) / args.split
    (out / "feats").mkdir(parents=True, exist_ok=True)
    lines = []
    for (utt, _, spk, text), f in zip(rows, feats):
        np.save(out / "feats" / f"{utt}.npy", f.astype(np.float32))
        lines.append(f"{utt}\t{spk}\t{text}" if spk else f"{utt}\t{text}")
    (out / "transcripts.tsv").write_text("\n".join(lines) + "\n")
    dim = feats[0].shape[1] if feats else 0
    print(f"prepared {len(rows)} utterances -> {out} (feature dim {dim}, "
          f"cmvn {args.cmvn})")


if __name__ == "__main__":
    main()
