"""Edit-distance metrics: PER / CER / WER and S/I/D alignment counts.

Reference parity: ``utils/evaluation/edit_distance.py`` (compute_cer /
compute_wer via python-Levenshtein, wer_align S/I/D counts; SURVEY.md §2.7).
Metric definitions must match exactly — BASELINE.json requires WER parity.
Host-side (eval only), as in the reference.
"""

from __future__ import annotations

import Levenshtein


def compute_cer(ref: str, hyp: str, normalize: bool = True) -> float:
    """Character error rate between strings."""
    d = Levenshtein.distance(ref, hyp)
    return d / max(len(ref), 1) if normalize else float(d)


def compute_wer(ref: str, hyp: str, normalize: bool = True) -> float:
    """Word error rate; words are whitespace tokens."""
    r, h = ref.split(), hyp.split()
    d = _token_edit_distance(r, h)
    return d / max(len(r), 1) if normalize else float(d)


def compute_per(ref_tokens: list[str], hyp_tokens: list[str], normalize: bool = True) -> float:
    """Phone error rate over token lists."""
    d = _token_edit_distance(ref_tokens, hyp_tokens)
    return d / max(len(ref_tokens), 1) if normalize else float(d)


def _token_edit_distance(ref: list[str], hyp: list[str]) -> int:
    # map tokens to single chars so Levenshtein's C implementation does the work
    vocab = {}
    def enc(seq):
        return "".join(chr(0x100 + vocab.setdefault(t, len(vocab))) for t in seq)
    return Levenshtein.distance(enc(ref), enc(hyp))


def wer_align(ref: list[str], hyp: list[str]) -> dict:
    """Substitution/insertion/deletion counts from a Levenshtein alignment."""
    vocab = {}
    enc = lambda seq: "".join(chr(0x100 + vocab.setdefault(t, len(vocab))) for t in seq)
    ops = Levenshtein.editops(enc(ref), enc(hyp))
    counts = {"sub": 0, "ins": 0, "del": 0}
    for op, _, _ in ops:
        counts[{"replace": "sub", "insert": "ins", "delete": "del"}[op]] += 1
    counts["hits"] = len(ref) - counts["sub"] - counts["del"]
    return counts
