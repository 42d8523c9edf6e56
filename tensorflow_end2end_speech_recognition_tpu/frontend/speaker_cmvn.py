"""Per-speaker CMVN: corpus-level speaker statistics + batch application.

The reference's offline frontend normalized features with per-utterance *or
per-speaker* mean/variance (SURVEY.md §2.9, ``asr_preprocessing``). Here the
speaker statistics are computed once per run in a device-batched sweep over
the corpus (waveform corpora run the jitted frontend with CMVN disabled;
precomputed-feature corpora accumulate straight from the stored frames), and
the per-utterance (mean, inv-std) rows ride each batch so normalization stays
inside the jitted step.
"""

from __future__ import annotations

import numpy as np

GLOBAL_KEY = "<global>"  # fallback stats for utterances without a speaker id


def compute_speaker_stats(
    utterances,
    frontend_cfg=None,
    batch_size: int = 16,
) -> dict[str, tuple[np.ndarray, np.ndarray]]:
    """{speaker: (mean [D], inv_std [D])} float32, plus a ``GLOBAL_KEY`` row.

    ``frontend_cfg`` set: utterances carry waveforms; features are extracted
    on device with CMVN disabled (one bucketed sweep, a handful of compiled
    shapes). ``frontend_cfg`` None: utterances carry [T, D] features already.
    """
    sums: dict[str, np.ndarray] = {}
    sqs: dict[str, np.ndarray] = {}
    counts: dict[str, int] = {}

    def accumulate(speaker, frames: np.ndarray):
        s = speaker or GLOBAL_KEY
        f = frames.astype(np.float64)
        if s not in sums:
            sums[s] = f.sum(0)
            sqs[s] = (f * f).sum(0)
            counts[s] = f.shape[0]
        else:
            sums[s] += f.sum(0)
            sqs[s] += (f * f).sum(0)
            counts[s] += f.shape[0]

    if frontend_cfg is None:
        for u in utterances:
            accumulate(u.speaker, u.wav)
    else:
        import jax.numpy as jnp

        from ..data.dataset import Dataset
        from .features import extract_features

        cfg = frontend_cfg._replace(cmvn="none")
        by_name = {u.name: u for u in utterances}
        ds = Dataset(utterances, batch_size, sort_utt=True)
        for batch in ds.batches(0):
            feats, feat_len = extract_features(
                jnp.asarray(batch["inputs"]), jnp.asarray(batch["input_len"]), cfg
            )
            feats = np.asarray(feats)
            feat_len = np.asarray(feat_len)
            for i, name in enumerate(batch["names"]):
                if name is None:  # batch filler duplicate
                    continue
                accumulate(by_name[name].speaker, feats[i, : feat_len[i]])

    stats: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    g_sum = np.zeros_like(next(iter(sums.values())))
    g_sq = np.zeros_like(g_sum)
    g_n = 0
    for s in sums:
        g_sum += sums[s]
        g_sq += sqs[s]
        g_n += counts[s]
    # GLOBAL_KEY must hold CORPUS-WIDE stats even when some utterances were
    # accumulated under it (speakerless rows): unseen-speaker eval utterances
    # fall back to it, and normalizing them with an arbitrary speakerless
    # subset's statistics would produce off-scale features.
    for s in list(sums) + [GLOBAL_KEY]:
        total, sq, n = (
            (g_sum, g_sq, g_n) if s == GLOBAL_KEY else (sums[s], sqs[s], counts[s])
        )
        mean = total / max(n, 1)
        var = np.maximum(sq / max(n, 1) - mean * mean, 0.0)
        stats[s] = (
            mean.astype(np.float32),
            (1.0 / np.sqrt(var + 1e-8)).astype(np.float32),
        )
    return stats


def batch_cmvn_rows(stats, utterances) -> tuple[np.ndarray, np.ndarray]:
    """Stack per-utterance (mean, inv_std) rows -> ([B, D], [B, D])."""
    means, inv_stds = [], []
    for u in utterances:
        key = u.speaker if u.speaker in stats else GLOBAL_KEY
        m, r = stats[key]
        means.append(m)
        inv_stds.append(r)
    return np.stack(means), np.stack(inv_stds)
