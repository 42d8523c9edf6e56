"""Bucketed, length-sorted batching over utterances (host side of the pipeline).

Reference behaviour being re-provided (``utils/dataset/base.py``, SURVEY.md
§2.6/§3.4): length-sorted batches for the first ``sort_stop_epoch`` epochs
(curriculum + padding efficiency), shuffled after; zero-padding to the batch
max; ``-1``-padded dense labels. TPU-first differences:

- **Static shapes**: every batch's time axis is padded up to a bucket bound
  from a fixed ladder, and label length to a fixed ladder, so XLA compiles a
  handful of programs instead of one per shape (SURVEY.md §5.7).
- Batches are dicts of numpy arrays ready for ``jax.device_put``; the
  device-side work (frontend, stacking, splicing) happens inside the jitted
  step, not here.
- Utterances may carry raw waveforms (in-framework frontend) or precomputed
  feature matrices (the reference's ``.npy`` consumption mode).
"""

from __future__ import annotations

import numpy as np

from .toy_corpus import Utterance


def bucket_ladder(lengths, num_buckets: int = 4, multiple: int = 512):
    """Quantile-based ladder of padded lengths, rounded up to ``multiple``."""
    lengths = np.asarray(lengths)
    qs = np.quantile(lengths, np.linspace(1.0 / num_buckets, 1.0, num_buckets))
    ladder = sorted({int(-(-q // multiple) * multiple) for q in qs})
    if ladder[-1] < lengths.max():
        ladder[-1] = int(-(-int(lengths.max()) // multiple) * multiple)
    return ladder


def pad_to_ladder(n: int, ladder) -> int:
    for b in ladder:
        if n <= b:
            return b
    return ladder[-1]


class Dataset:
    """Iterator factory over utterance batches with reference-like semantics."""

    def __init__(
        self,
        utterances: list[Utterance],
        batch_size: int,
        sort_utt: bool = True,
        sort_stop_epoch: int | None = None,
        seed: int = 0,
        num_wav_buckets: int = 4,
        num_label_buckets: int = 3,
        input_kind: str = "auto",  # "wav" | "features" | "auto" (by ndim)
        cmvn_stats: dict | None = None,  # speaker -> (mean, inv_std); batches
        # then carry per-utterance cmvn_mean/cmvn_inv_std rows (SURVEY.md §2.9)
        max_frames_per_batch: int | None = None,  # activation-memory guard:
        # reference `base.py` halved batch_size for very long utterances
        # (SURVEY.md §2.6 dataset base). TPU-first version: when a batch's
        # padded frames x rows exceed this budget, emit FEWER rows (halved
        # until it fits) rather than growing memory — row counts stay
        # powers-of-two fractions of batch_size so XLA compiles at most
        # log2(B) extra programs (static shapes preserved per batch).
        min_batch_rows: int = 1,  # floor for the reduction (keep divisibility
        # by grad-accum / data-mesh factors; train/loop.py sets this)
        samples_per_frame: int = 1,  # wav-mode unit conversion so the budget
        # is always in FRAMES (the reference's unit); frontend frame_step
    ):
        if not utterances:
            raise ValueError("empty dataset")
        self.utterances = list(utterances)
        self.cmvn_stats = cmvn_stats
        self.batch_size = batch_size
        self.max_frames_per_batch = max_frames_per_batch
        self.min_batch_rows = max(1, min_batch_rows)
        self.samples_per_frame = max(1, samples_per_frame)
        self.sort_utt = sort_utt
        self.sort_stop_epoch = sort_stop_epoch if sort_stop_epoch is not None else (1 << 30)
        self.seed = seed
        if input_kind == "auto":
            input_kind = "wav" if utterances[0].wav.ndim == 1 else "features"
        self.input_kind = input_kind
        if input_kind == "wav":
            lens = [len(u.wav) for u in self.utterances]
        else:
            lens = [u.wav.shape[0] for u in self.utterances]  # frames
        self._input_lens = np.asarray(lens)
        self.wav_ladder = bucket_ladder(
            lens, num_wav_buckets, multiple=512 if input_kind == "wav" else 16
        )
        label_lens = [len(u.label_ids) for u in self.utterances]
        self.label_ladder = bucket_ladder(label_lens, num_label_buckets, multiple=8)
        # multitask sub labels get their own static ladder: per-batch-max
        # padding would make every distinct sub width a fresh XLA program
        # (remote compiles run 3-460 s — recompiles would dwarf training)
        sub_lens = [len(u.sub_ids) for u in self.utterances if u.sub_ids is not None]
        self.sub_label_ladder = (
            bucket_ladder(sub_lens, num_label_buckets, multiple=8) if sub_lens else None
        )
        if max_frames_per_batch is None:
            self.num_batches = -(-len(self.utterances) // batch_size)
        else:
            # real per-epoch count from the sorted-order extents (exact for
            # curriculum epochs; post-curriculum block shuffles keep batches
            # length-homogeneous so the count stays representative)
            order = np.argsort(self._input_lens, kind="stable")
            self.num_batches = len(self._batch_extents(order))

    def __len__(self):
        return len(self.utterances)

    def batches(self, epoch: int = 0):
        """Yield batch dicts for one epoch.

        Length-sorted while ``epoch < sort_stop_epoch`` (ascending input
        length, like the reference's curriculum), shuffled afterwards —
        but batches are always formed from contiguous sorted runs so that
        same-bucket utterances batch together (padding efficiency).
        """
        order = np.argsort(self._input_lens, kind="stable")
        rng = np.random.RandomState(self.seed + epoch)
        if not self.sort_utt or epoch >= self.sort_stop_epoch:
            # after the curriculum: vary batch *composition* per epoch, not
            # just batch order (the reference reshuffled utterances). Shuffle
            # within blocks of a few batches of the sorted order so batches
            # stay length-homogeneous (padding efficiency) while their
            # membership changes every epoch.
            block = max(self.batch_size * 4, 1)
            for s in range(0, len(order), block):
                rng.shuffle(order[s : s + block])
            shuffle_batches = True
        else:
            shuffle_batches = False
        extents = self._batch_extents(order)
        if shuffle_batches:
            rng.shuffle(extents)  # shuffle batch order, keep bucketing
        for start, rows in extents:
            idx = order[start : start + rows]
            yield self._make_batch(idx, rows)

    def _batch_extents(self, order):
        """List of ``(start, rows)`` batch slices of the epoch ordering.

        ``rows == batch_size`` everywhere unless ``max_frames_per_batch`` is
        set, in which case long-utterance batches halve their row count until
        ``padded_frames * rows`` fits the budget (down to ``min_batch_rows``).
        """
        extents = []
        i, n = 0, len(order)
        while i < n:
            rows = self.batch_size
            if self.max_frames_per_batch is not None:
                while True:
                    idx = order[i : i + rows]
                    t_pad = pad_to_ladder(
                        int(self._input_lens[idx].max()), self.wav_ladder
                    )
                    frames = -(-t_pad // self.samples_per_frame)
                    if frames * rows <= self.max_frames_per_batch:
                        break
                    if rows <= self.min_batch_rows:
                        break
                    # halve, then round DOWN to a multiple of min_batch_rows:
                    # every emitted row count must stay divisible by
                    # grad_accum_steps * num_devices (train/accum.py and the
                    # DP mesh both hard-require it), and batch_size //
                    # min_batch_rows is not necessarily a power of two
                    # (e.g. batch_size=24, min_batch_rows=8 -> 12 would break
                    # accum mid-epoch)
                    rows = max(
                        self.min_batch_rows,
                        (rows // 2) // self.min_batch_rows * self.min_batch_rows,
                    )
            extents.append((i, rows))
            i += rows
        return extents

    def _make_batch(self, idx, rows: int | None = None):
        utts = [self.utterances[i] for i in idx]
        b = rows if rows is not None else self.batch_size
        in_lens = [self._input_lens[i] for i in idx]
        t_pad = pad_to_ladder(max(in_lens), self.wav_ladder)
        u_pad = pad_to_ladder(max(len(u.label_ids) for u in utts), self.label_ladder)
        # short final batch: repeat earlier utterances (reference semantics:
        # batch is full-size; duplicates carry real data so loss stays
        # well-defined; eval dedups via name=None)
        fill = [utts[(j - len(utts)) % len(utts)] for j in range(len(utts), b)]
        all_utts = utts + fill
        # multithreaded C++ pad+gather (pure-numpy fallback inside)
        from .native import batch_assemble

        inputs, input_len = batch_assemble([u.wav for u in all_utts], t_pad)
        labels = np.full((b, u_pad), -1, dtype=np.int32)
        label_len = np.zeros((b,), dtype=np.int32)
        has_sub = all_utts[0].sub_ids is not None
        if has_sub:
            su_pad = max(8, pad_to_ladder(
                max(len(u.sub_ids) for u in all_utts), self.sub_label_ladder
            ))
            labels_sub = np.full((b, su_pad), -1, dtype=np.int32)
            label_len_sub = np.zeros((b,), dtype=np.int32)
        names = []
        for j, u in enumerate(all_utts):
            labels[j, : len(u.label_ids)] = u.label_ids
            label_len[j] = len(u.label_ids)
            if has_sub:
                labels_sub[j, : len(u.sub_ids)] = u.sub_ids
                label_len_sub[j] = len(u.sub_ids)
            names.append(u.name if j < len(utts) else None)
        # duplicate-fill rows get weight 0: the loss's weighted batch mean
        # (ops/losses.py batch_mean) then matches the corpus distribution
        # exactly (eval already dedups via name=None)
        weight = np.zeros((b,), dtype=np.float32)
        weight[: len(utts)] = 1.0
        batch = {
            "inputs": inputs,
            "labels": labels,
            "input_len": input_len,
            "label_len": label_len,
            "weight": weight,
            "names": names,
        }
        if has_sub:
            batch["labels_sub"] = labels_sub
            batch["label_len_sub"] = label_len_sub
        if self.cmvn_stats is not None:
            from ..frontend.speaker_cmvn import batch_cmvn_rows

            mean, inv_std = batch_cmvn_rows(self.cmvn_stats, all_utts)
            batch["cmvn_mean"] = mean
            batch["cmvn_inv_std"] = inv_std
        return batch
