"""Corpus-level PER/CER/WER evaluation loops.

Reference parity: ``experiments/<corpus>/metrics/{ctc,attention}.py``
``do_eval_per/do_eval_cer/do_eval_wer`` (SURVEY.md §2.7): iterate a dataset,
run the decode op, map indices to tokens, fold TIMIT phones to 39 before
scoring, accumulate corpus-level error rates. Decode runs on device in
batches; only the tiny integer results cross to the host.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..data.tokenizers import PhoneTokenizer, Tokenizer
from .edit_distance import compute_per


def ids_to_tokens(ids, tokenizer: Tokenizer) -> list[str]:
    return tokenizer.decode([int(i) for i in ids])


def scoring_tokens(ref_ids, hyp_ids, tokenizer: Tokenizer, label_type: str):
    """Scoring-unit token sequences + ref-length denominator.

    The SINGLE place that maps label ids to the units errors are counted
    over (fold TIMIT phones to 39, detokenize BPE to words, split chars) —
    shared by ``score_pair`` and ``evaluate_ctc`` so the two paths cannot
    drift apart.
    """
    ref = ids_to_tokens(ref_ids, tokenizer)
    hyp = ids_to_tokens(hyp_ids, tokenizer)
    if label_type.startswith("phone") and isinstance(tokenizer, PhoneTokenizer):
        ref = tokenizer.fold_for_scoring(ref)
        hyp = tokenizer.fold_for_scoring(hyp)
    elif label_type.startswith("bpe"):
        # subword units score as WER over the detokenized words
        detok = lambda seq: "".join(seq).replace("▁", " ").split()
        ref, hyp = detok(ref), detok(hyp)
    elif not label_type.startswith("word"):
        # character scoring: units are the characters of the joined string
        ref = list("".join(ref))
        hyp = list("".join(hyp))
    return ref, hyp, max(len(ref), 1)


def score_pair(ref_ids, hyp_ids, tokenizer: Tokenizer, label_type: str):
    """Returns (edit_distance_numerator, ref_length_denominator)."""
    ref, hyp, denom = scoring_tokens(ref_ids, hyp_ids, tokenizer, label_type)
    return compute_per(ref, hyp, normalize=False), denom


def word_tokens(ref_ids, hyp_ids, tokenizer: Tokenizer, label_type: str):
    """Word-level token sequences for label types whose primary units are
    sub-word (characters), or None when no word readout applies.

    The reference's LibriSpeech eval reported WER even for character models
    (``do_eval_wer`` joins the decoded characters and splits on space,
    SURVEY.md §2.7); phone models have no word segmentation and BPE/word
    models already score at the word level in ``scoring_tokens``.
    """
    if label_type not in ("character", "character_capital_divide"):
        return None
    join = getattr(tokenizer, "decode_text", None)
    if join is None:
        return None
    return join(ref_ids).split(), join(hyp_ids).split()


def eval_counts(eval_step, params, dataset, tokenizer: Tokenizer, label_type: str,
                epoch: int = 0, to_device=None, row_slice=None) -> np.ndarray:
    """Raw corpus count vector for a (slice of a) dataset.

    Returns ``[edit, sub, ins, del, ref_len, num_utts, loss_sum,
    w_edit, w_sub, w_ins, w_del, w_ref_len]`` (float64): primary-unit
    counts first, then word-level counts for character models (zero
    elsewhere — BPE/word models already count words in the primary slots).
    Scoring is CHUNKED per batch (one ``levenshtein_batch`` call each), so
    host memory stays O(batch), not O(corpus) (VERDICT r3 weak #6).

    ``row_slice`` (pod-scale eval): a hook slicing each host batch to this
    process's rows BEFORE device transfer — counts from all processes sum to
    the full-set counts, so the final rates are identical to single-process
    (SURVEY.md §2.10; VERDICT r2 #5).
    """
    from ..data.native import levenshtein_batch

    total = np.zeros(12, np.float64)
    for batch in dataset.batches(epoch):
        if row_slice is not None:
            batch = row_slice(batch)
        if to_device is not None:
            jbatch = to_device(batch)
        else:
            jbatch = {k: jnp.asarray(v) for k, v in batch.items() if k != "names"}
        decoded, dec_len, nll = eval_step(params, jbatch)
        # one fetch per batch: per-row float(nll[i]) would be a blocking
        # device round trip per utterance on the remote backend
        decoded, dec_len, nll = (np.asarray(x) for x in (decoded, dec_len, nll))
        refs, hyps, wrefs, whyps = [], [], [], []
        for i, name in enumerate(batch["names"]):
            if name is None:  # batch filler
                continue
            ref_ids = [j for j in batch["labels"][i] if j >= 0]
            hyp_ids = decoded[i][: dec_len[i]]
            r, h, n = _scoring_tokens(ref_ids, hyp_ids, tokenizer, label_type)
            refs.append(r)
            hyps.append(h)
            w = word_tokens(ref_ids, hyp_ids, tokenizer, label_type)
            if w is not None:
                wr, wh = w
                vocab = {}
                enc = lambda seq: [vocab.setdefault(t, len(vocab)) for t in seq]
                wrefs.append(enc(wr))
                whyps.append(enc(wh))
            total[4] += n
            total[5] += 1
            total[6] += float(nll[i])
        if refs:
            counts = levenshtein_batch(refs, hyps)
            total[0:4] += counts[:, 0:4].sum(axis=0)
        if wrefs:
            wcounts = levenshtein_batch(wrefs, whyps)
            total[7:11] += wcounts[:, 0:4].sum(axis=0)
            total[11] += sum(max(len(r), 1) for r in wrefs)
    return total


def rates_from_counts(counts: np.ndarray) -> dict:
    """Count vector (``eval_counts``) -> the reported rate dict."""
    counts = np.asarray(counts, np.float64)
    if counts.shape[0] == 7:  # pre-round-4 vector, no word slots
        counts = np.concatenate([counts, np.zeros(5)])
    (edit, sub, ins, dele, ref_len, n_utts, loss_sum,
     w_edit, _w_sub, _w_ins, _w_del, w_ref_len) = counts
    total_len = max(ref_len, 1.0)
    out = {
        "error_rate": edit / total_len,
        "loss": loss_sum / n_utts if n_utts else float("nan"),
        "sub_rate": sub / total_len,
        "ins_rate": ins / total_len,
        "del_rate": dele / total_len,
        "num_utts": int(n_utts),
    }
    if w_ref_len > 0:  # word-level readout for character models
        out["wer"] = w_edit / w_ref_len
    return out


def evaluate_ctc(eval_step, params, dataset, tokenizer: Tokenizer, label_type: str,
                 epoch: int = 0, to_device=None, multihost: bool | None = None):
    """Run decode over a dataset; returns error rate, loss, and S/I/D counts.

    The substitution/insertion/deletion decomposition mirrors the reference's
    ``wer_align`` reporting and uses the C++ batched Levenshtein.

    ``to_device``: optional batch-placement hook — a DP training loop passes
    its mesh-sharded placement so eval batches match the params' sharding.

    ``multihost`` (default: auto when ``jax.process_count() > 1``): pod-scale
    eval — each process decodes only its OWN row slice of every batch with
    plain local device placement (params are lifted to a process-local
    replica), then the tiny per-process count vectors are summed across
    hosts. Rates are bit-identical to a single process scoring the full set;
    the per-host decode cost is 1/P and no feature bytes cross DCN.
    """
    import jax

    use_mh = (jax.process_count() > 1) if multihost is None else multihost
    row_slice = None
    if use_mh:
        from ..parallel.multihost import local_replica, process_slice

        params = local_replica(params)
        to_device = None  # process-local rows ride plain local placement
        row_slice = process_slice
    counts = eval_counts(
        eval_step, params, dataset, tokenizer, label_type, epoch,
        to_device=to_device, row_slice=row_slice,
    )
    if use_mh:
        from ..parallel.multihost import allreduce_counts

        counts = allreduce_counts(counts)
    return rates_from_counts(counts)


def _scoring_tokens(ref_ids, hyp_ids, tokenizer: Tokenizer, label_type: str):
    """Integerized scoring-unit sequences (for the C++ batched Levenshtein)."""
    ref, hyp, denom = scoring_tokens(ref_ids, hyp_ids, tokenizer, label_type)
    vocab = {}
    enc = lambda seq: [vocab.setdefault(t, len(vocab)) for t in seq]
    return enc(ref), enc(hyp), denom
