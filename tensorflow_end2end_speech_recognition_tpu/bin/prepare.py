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


def extract_group(wavs: list[np.ndarray], fe):
    """Raw frontend features (no CMVN) for one batch of waveforms.

    Pads the batch to a whole second so XLA compiles a handful of shapes,
    not one per utterance length.
    """
    import jax.numpy as jnp

    from ..frontend import extract_features

    lens = np.asarray([len(w) for w in wavs], np.int32)
    pad_to = max(
        fe.frame_length,
        -(-int(lens.max()) // fe.sample_rate) * fe.sample_rate,
    )
    mat = np.zeros((len(wavs), pad_to), np.float32)
    for i, w in enumerate(wavs):
        mat[i, : len(w)] = w
    feats, flen = extract_features(jnp.asarray(mat), jnp.asarray(lens), fe)
    feats, flen = np.asarray(feats), np.asarray(flen)
    return [feats[i, : flen[i]].astype(np.float32) for i in range(len(wavs))]


def cmvn_utterance_np(f: np.ndarray, var_norm: bool = True) -> np.ndarray:
    mu = f.mean(axis=0, keepdims=True)
    sd = (f.std(axis=0, keepdims=True) + 1e-8) if var_norm else 1.0
    return ((f - mu) / sd).astype(np.float32)


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

    out = Path(args.out_root) / args.split
    (out / "feats").mkdir(parents=True, exist_ok=True)

    # Memory-bounded: only one batch of waveforms/features is resident at a
    # time (real corpora are hundreds of hours). Per-utterance/none CMVN
    # writes final features directly; per-speaker CMVN writes raw features
    # while accumulating running speaker sums, then normalizes each file in
    # a second pass.
    spk_stats: dict = {}
    dim = 0
    for lo in range(0, len(rows), args.batch):
        group = rows[lo : lo + args.batch]
        wavs = [read_wav(p, args.sample_rate) for _, p, _, _ in group]
        feats = extract_group(wavs, fe)
        for (utt, _, spk, _), f in zip(group, feats):
            if args.cmvn == "utterance":
                f = cmvn_utterance_np(f)
            elif args.cmvn == "speaker":
                n, su, sq = spk_stats.get(spk, (0, 0.0, 0.0))
                spk_stats[spk] = (
                    n + len(f), su + f.sum(axis=0), sq + (f**2).sum(axis=0)
                )
            np.save(out / "feats" / f"{utt}.npy", f)
            dim = f.shape[1]

    if args.cmvn == "speaker":
        norms = {}
        for s, (n, su, sq) in spk_stats.items():
            mu = su / n
            sd = np.sqrt(np.maximum(sq / n - mu**2, 0.0)) + 1e-8
            norms[s] = (mu, sd)
        for utt, _, spk, _ in rows:
            path = out / "feats" / f"{utt}.npy"
            f = np.load(path)
            mu, sd = norms[spk]
            np.save(path, ((f - mu) / sd).astype(np.float32))

    lines = [f"{utt}\t{spk}\t{text}" if spk else f"{utt}\t{text}"
             for utt, _, spk, text in rows]
    (out / "transcripts.tsv").write_text("\n".join(lines) + "\n")
    print(f"prepared {len(rows)} utterances -> {out} (feature dim {dim}, "
          f"cmvn {args.cmvn})")


if __name__ == "__main__":
    main()
