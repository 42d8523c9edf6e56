"""On-disk corpus loader: per-utterance ``.npy`` feature files + transcripts.

This is the reference's actual input mode (SURVEY.md §2.6/§2.9: the offline
``asr_preprocessing`` repo emitted one ``.npy`` feature matrix per utterance
plus label files; ``utils/dataset/base.py`` lazily np.load-ed them). Layout
expected under ``data_root``:

    <data_root>/<split>/feats/<utt_id>.npy      float32 [T, D]
    <data_root>/<split>/transcripts.tsv         utt_id<TAB>token token ...
                                            or  utt_id<TAB>speaker<TAB>tokens
                                                (3 columns => per-speaker CMVN
                                                grouping available)

Tokens are looked up in the tokenizer (phones/words) or, for character
tokenizers, the transcript text is encoded directly. Features are loaded
eagerly into RAM here (these corpora fit; swap for mmap if needed) and flow
through the same bucketed ``Dataset`` with ``input_kind='features'``.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from .tokenizers import Tokenizer
from .toy_corpus import Utterance


def read_transcripts(data_root: str | Path, split: str) -> list[str]:
    """Transcript texts of one split (e.g. to learn a BPE vocabulary)."""
    tsv = Path(data_root) / split / "transcripts.tsv"
    texts = []
    for line in tsv.read_text().splitlines():
        if line.strip():
            texts.append(line.split("\t")[-1])
    return texts


def available_splits(data_root: str | Path) -> list[str]:
    """Split names on disk (subdirs holding a transcripts.tsv), sorted.

    The reference's corpora carried multiple eval sets — LibriSpeech
    dev_clean/dev_other/test_clean/test_other, CSJ eval1/2/3 (SURVEY.md
    §2.6/§3.3) — so the split inventory is discovered, not hard-coded.
    """
    root = Path(data_root)
    if not root.is_dir():
        raise FileNotFoundError(f"data_root {root} is not a directory")
    return sorted(p.name for p in root.iterdir() if (p / "transcripts.tsv").exists())


def pick_split(splits: list[str], *prefixes: str) -> str | None:
    """First split exactly matching, then first by prefix, in prefix order."""
    for pre in prefixes:
        if pre in splits:
            return pre
    for pre in prefixes:
        for s in splits:
            if s.startswith(pre):
                return s
    return None


def load_npy_split(data_root: str | Path, split: str, tokenizer: Tokenizer,
                   load_features: bool = True) -> list[Utterance]:
    """``load_features=False`` skips the per-utterance .npy reads (labels/
    transcripts only — e.g. LM training needs token ids, not tens of GB of
    acoustic features)."""
    root = Path(data_root) / split
    tsv = root / "transcripts.tsv"
    if not tsv.exists():
        raise FileNotFoundError(f"missing {tsv}")
    utts: list[Utterance] = []
    for line in tsv.read_text().splitlines():
        if not line.strip():
            continue
        parts = line.split("\t", 2)
        if len(parts) == 3:
            utt_id, speaker, text = parts
        else:
            utt_id, text = parts
            speaker = None
        if load_features:
            feat_path = root / "feats" / f"{utt_id}.npy"
            feats = np.load(feat_path).astype(np.float32)
            if feats.ndim != 2:
                raise ValueError(f"{feat_path}: expected [T, D] features, got {feats.shape}")
        else:
            feats = np.zeros((0, 1), np.float32)
        if hasattr(tokenizer, "encode_text"):  # char / word / BPE tokenizers
            ids = tokenizer.encode_text(text)
        else:  # phone / raw-unit inventories: space-separated tokens
            ids = tokenizer.encode(text.split())
        utts.append(Utterance(utt_id, feats, ids, text, speaker=speaker))
    if not utts:
        raise ValueError(f"no utterances in {tsv}")
    return utts
