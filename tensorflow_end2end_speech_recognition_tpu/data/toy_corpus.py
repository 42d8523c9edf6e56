"""Deterministic synthetic speech corpus for tests, smoke training, and bench.

No real corpora exist in this environment (the reference consumed offline
TIMIT/CSJ/LibriSpeech features; SURVEY.md §2.9), so this module synthesizes a
learnable audio->label task: every unit in the tokenizer's inventory is
rendered as a unit-specific "formant" chord (2 sines + mild noise) of
unit-specific duration. An utterance is a concatenation of such segments,
so a CTC/attention model can genuinely learn the alignment and drive PER
towards zero — the same role the reference's bundled sample utterance played
in its convergence smoke tests (SURVEY.md §3.5).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .tokenizers import Tokenizer, build_tokenizer


@dataclass
class Utterance:
    name: str
    wav: np.ndarray  # float32 [num_samples] (or [T, D] precomputed features)
    label_ids: list
    text: str
    sub_ids: list | None = None  # multitask sub-task labels (e.g. phones under chars)
    speaker: str | None = None  # per-speaker CMVN grouping (SURVEY.md §2.9)


class ToyCorpus:
    def __init__(
        self,
        label_type: str = "phone61",
        num_utts: int = 128,
        min_units: int = 3,
        max_units: int = 10,
        sample_rate: int = 16000,
        seed: int = 0,
        noise: float = 0.02,
        vocab_size: int | None = None,  # restrict labels to the first N units
        num_speakers: int = 4,  # speakers differ by gain (CMVN-removable)
    ):
        self.label_type = label_type
        self.sample_rate = sample_rate
        words = None
        if label_type.startswith(("word", "bpe")):
            # word/subword units need a corpus-derived vocabulary; the toy
            # corpus supplies a fixed word list (each maps to a formant chord).
            # Words are repeated in the learning text so BPE pair counts pass
            # the >=2 threshold and merges are actually learned (a once-each
            # list degenerates BPE to bare characters).
            words = [f"w{i:02d}" for i in range(40)]
            self.tokenizer = build_tokenizer(
                label_type, corpus_texts=[" ".join(words * 3)]
            )
        else:
            self.tokenizer: Tokenizer = build_tokenizer(label_type)
        rng = np.random.RandomState(seed)
        v = self.tokenizer.num_units
        draw_v = min(vocab_size, v) if vocab_size else v
        # unit-specific formant pairs spread over [200, 3800] Hz, co-prime-ish
        f1 = 200.0 + 3000.0 * rng.permutation(v) / max(v - 1, 1)
        f2 = 500.0 + 3300.0 * rng.permutation(v) / max(v - 1, 1)
        dur = rng.randint(int(0.06 * sample_rate), int(0.12 * sample_rate), size=v)
        if label_type.startswith(("word", "bpe")):
            # a word/subword unit is SPOKEN over its characters: scale its
            # duration with character count (marker ▁ excluded) so toy frame/
            # label ratios match real speech (~0.08 s per char). Without this
            # a multi-char unit rendered at single-phone duration makes
            # stacked+pyramid configs CTC-infeasible on the toy corpus while
            # they are perfectly feasible on real corpora.
            n_chars = np.array(
                [max(1, len(u.lstrip("▁"))) for u in self.tokenizer.units]
            )
            dur = dur * n_chars
        self._unit_params = (f1, f2, dur)
        # per-speaker loudness: a multiplicative gain shifts log-features by a
        # speaker-specific constant, which per-speaker CMVN removes exactly
        gains = 0.5 + rng.rand(max(num_speakers, 1)) * 1.5
        self.utterances: list[Utterance] = []
        for i in range(num_utts):
            n_units = rng.randint(min_units, max_units + 1)
            if label_type.startswith("bpe"):
                # BPE labels come from ENCODING word sequences (as real
                # transcripts do), not from uniform draws over the unit
                # inventory — uniform draws over-represent rare single-char
                # units that real BPE label sequences almost never contain
                text = " ".join(
                    words[j] for j in rng.randint(0, len(words), size=n_units)
                )
                ids = self.tokenizer.encode_text(text)
            else:
                ids = rng.randint(0, draw_v, size=n_units).tolist()
                text = " ".join(self.tokenizer.units[j] for j in ids)
            wav = self._render(ids, rng, noise)
            spk = i % max(num_speakers, 1)
            self.utterances.append(
                Utterance(
                    f"toy{i:05d}", (wav * gains[spk]).astype(np.float32), ids, text,
                    speaker=f"spk{spk:02d}",
                )
            )

    def _render(self, ids, rng, noise) -> np.ndarray:
        f1, f2, dur = self._unit_params
        sr = self.sample_rate
        segs = []
        for j in ids:
            n = int(dur[j])
            t = np.arange(n) / sr
            env = np.hanning(n)  # soften segment boundaries
            seg = env * (0.6 * np.sin(2 * np.pi * f1[j] * t) + 0.4 * np.sin(2 * np.pi * f2[j] * t))
            segs.append(seg)
        wav = np.concatenate(segs) + noise * rng.randn(sum(int(dur[j]) for j in ids))
        return wav.astype(np.float32)
