"""Tests for tokenizers, frame ops, toy corpus, and bucketed dataset."""

import numpy as np
import jax.numpy as jnp

from tensorflow_end2end_speech_recognition_tpu.data import (
    CharTokenizer,
    Dataset,
    PhoneTokenizer,
    ToyCorpus,
    build_tokenizer,
    fold_phones,
    phone_inventory,
    splice_frames,
    stack_frames,
)


def test_phone_inventories():
    assert len(phone_inventory("phone61")) == 61
    assert len(phone_inventory("phone48")) == 48
    assert len(phone_inventory("phone39")) == 39
    folded = fold_phones(["q", "bcl", "ao", "ix", "iy"], "phone39")
    assert folded == ["sil", "sil", "aa", "ih", "iy"]


def test_fold_for_scoring_covers_phone48_and_squeezes_sil():
    # phone48 closure symbols vcl/cl must land in the 39 set as sil, and
    # folding-created adjacent sil runs are squeezed (so phone48 and phone61
    # models score over the same 39-symbol space)
    tok48 = PhoneTokenizer("phone48")
    folded = tok48.fold_for_scoring(["vcl", "b", "cl", "sil", "ih", "sil", "sil"])
    assert folded == ["sil", "b", "sil", "ih", "sil"]
    for p in folded:
        assert p in phone_inventory("phone39"), p
    tok61 = PhoneTokenizer("phone61")
    folded61 = tok61.fold_for_scoring(["bcl", "pau", "ao", "q", "h#"])
    assert folded61 == ["sil", "aa", "sil"]
    # non-sil repeats are NOT squeezed (only folding-artifact sil runs are)
    assert tok61.fold_for_scoring(["iy", "iy"]) == ["iy", "iy"]


def test_dataset_batch_composition_varies_after_sort_stop_epoch():
    corpus = ToyCorpus(num_utts=64, vocab_size=6, seed=2)
    ds = Dataset(corpus.utterances, batch_size=8, sort_utt=True, sort_stop_epoch=1)
    def compositions(epoch):
        return [frozenset(n for n in b["names"] if n is not None) for b in ds.batches(epoch)]
    # curriculum epoch: deterministic length-sorted composition
    assert compositions(0) == compositions(0)
    # post-curriculum epochs: composition must differ between epochs
    c1, c2 = compositions(1), compositions(2)
    assert set(c1) != set(c2)
    # and still cover every utterance exactly once
    all_names = set().union(*c1)
    assert len(all_names) == 64


def test_dataset_max_frames_per_batch_guard():
    """Long-utterance batches shrink their row count to fit the frame budget
    (SURVEY.md §2.6 dynamic batch reduction), while coverage and the
    weight-0 fill convention are preserved."""
    corpus = ToyCorpus(num_utts=48, vocab_size=6, seed=3)
    base = Dataset(corpus.utterances, batch_size=8)
    # pick a budget that forces the longest bucket to halve at least once
    # (wav samples -> frames at the 160-sample hop the loop passes down)
    spf = 160
    top_frames = -(-base.wav_ladder[-1] // spf)
    budget = top_frames * 4  # top bucket fits at most 4 rows
    ds = Dataset(
        corpus.utterances, batch_size=8, sort_stop_epoch=1,
        max_frames_per_batch=budget, min_batch_rows=2, samples_per_frame=spf,
    )
    seen, reduced = [], False
    for b in ds.batches(0):
        rows = b["inputs"].shape[0]
        frames = -(-b["inputs"].shape[1] // spf)
        assert rows in (2, 4, 8)
        assert frames * rows <= budget or rows == 2
        if rows < 8:
            reduced = True
        seen += [n for n in b["names"] if n is not None]
    assert reduced, "budget was chosen to force at least one reduction"
    assert sorted(seen) == sorted(u.name for u in corpus.utterances)
    # shuffled epochs keep coverage too
    seen2 = [n for b in ds.batches(5) for n in b["names"] if n is not None]
    assert sorted(seen2) == sorted(seen)
    # default path is unchanged: every batch at full rows
    assert all(b["inputs"].shape[0] == 8 for b in base.batches(0))


def test_dataset_reduced_rows_stay_divisible_by_min_batch_rows():
    """ADVICE r4 (medium): with batch_size=24 and min_batch_rows=8 (e.g.
    grad_accum_steps=8), naive halving would emit 12-row batches that break
    accum_value_and_grad's divisibility check mid-epoch. Every reduced row
    count must be a multiple of min_batch_rows."""
    corpus = ToyCorpus(num_utts=72, vocab_size=6, seed=4)
    base = Dataset(corpus.utterances, batch_size=24)
    spf = 160
    top_frames = -(-base.wav_ladder[-1] // spf)
    budget = top_frames * 10  # top bucket fits at most 10 rows -> must drop to 8
    ds = Dataset(
        corpus.utterances, batch_size=24, sort_stop_epoch=1,
        max_frames_per_batch=budget, min_batch_rows=8, samples_per_frame=spf,
    )
    seen, row_counts = [], set()
    for b in ds.batches(0):
        rows = b["inputs"].shape[0]
        assert rows % 8 == 0, rows
        row_counts.add(rows)
        seen += [n for n in b["names"] if n is not None]
    assert 8 in row_counts, "budget was chosen to force a reduction"
    assert sorted(seen) == sorted(u.name for u in corpus.utterances)
    # num_batches reflects the real split count (ADVICE r4 low: it used to
    # be a stale undercount once long batches split)
    assert ds.num_batches == len(list(ds.batches(0)))
    assert base.num_batches == -(-72 // 24)


def test_char_tokenizer_roundtrip():
    tok = CharTokenizer()
    ids = tok.encode_text("hello world")
    assert tok.decode_text(ids) == "hello world"
    assert tok.num_units == 28
    assert tok.blank_id == 28

    cap = CharTokenizer(capital_divide=True)
    ids = cap.encode_text("hello world")
    assert cap.decode_text(ids) == "hello world"


def test_word_tokenizer_unk():
    tok = build_tokenizer("word_freq2", corpus_texts=["a a b b c", "a b"])
    ids = tok.encode_text("a c d")
    assert tok.decode_text(ids).split() == ["a", "<unk>", "<unk>"]


def test_stack_frames():
    feats = jnp.arange(2 * 9 * 2, dtype=jnp.float32).reshape(2, 9, 2)
    out, new_len = stack_frames(feats, jnp.asarray([9, 5]), num_stack=3, num_skip=3)
    assert out.shape == (2, 3, 6)
    np.testing.assert_array_equal(np.asarray(new_len), [3, 2])
    # window 0 of utt 0 = frames 0,1,2 concatenated
    np.testing.assert_allclose(np.asarray(out[0, 0]), [0, 1, 2, 3, 4, 5])
    # identity case
    same, same_len = stack_frames(feats, jnp.asarray([9, 5]), 1, 1)
    np.testing.assert_allclose(np.asarray(same), np.asarray(feats))


def test_splice_frames():
    feats = jnp.arange(1 * 4 * 1, dtype=jnp.float32).reshape(1, 4, 1)
    out = splice_frames(feats, splice=1)
    assert out.shape == (1, 4, 3)
    np.testing.assert_allclose(np.asarray(out[0, 0]), [0, 0, 1])  # zero left edge
    np.testing.assert_allclose(np.asarray(out[0, 2]), [1, 2, 3])


def test_toy_corpus_and_dataset():
    corpus = ToyCorpus(label_type="phone61", num_utts=20, seed=3)
    assert len(corpus.utterances) == 20
    # deterministic across constructions
    corpus2 = ToyCorpus(label_type="phone61", num_utts=20, seed=3)
    np.testing.assert_array_equal(corpus.utterances[5].wav, corpus2.utterances[5].wav)

    ds = Dataset(corpus.utterances, batch_size=8, sort_stop_epoch=1, seed=0)
    shapes = set()
    names_seen = set()
    for batch in ds.batches(epoch=0):
        assert batch["inputs"].shape[0] == 8
        assert batch["inputs"].shape[1] % 512 == 0
        shapes.add(batch["inputs"].shape)
        for n, il, ll in zip(batch["names"], batch["input_len"], batch["label_len"]):
            if n is not None:
                names_seen.add(n)
            assert il > 0 and ll > 0
    assert names_seen == {u.name for u in corpus.utterances}
    # bucketing bounds the number of distinct shapes
    assert len(shapes) <= 4

    # epoch 0 sorted ascending: first batch strictly shorter than last
    b = list(ds.batches(epoch=0))
    assert b[0]["input_len"].max() <= b[-1]["input_len"].max()

    # labels padded with -1
    assert (b[0]["labels"] >= -1).all()


def test_bpe_tokenizer_learns_merges_and_roundtrips():
    from tensorflow_end2end_speech_recognition_tpu.data.tokenizers import BPETokenizer

    texts = ["the cat sat on the mat", "the cat ate the rat", "a cat and a rat sat"]
    tok = BPETokenizer(texts, num_merges=40)
    # frequent words collapse into few subwords
    assert len(tok._encode_word("the")) <= 2
    assert len(tok._encode_word("cat")) <= 2
    ids = tok.encode_text("the cat sat on the mat")
    assert tok.decode_text(ids) == "the cat sat on the mat"
    # unseen-but-composable words still encode from characters
    ids2 = tok.encode_text("that")
    assert tok.decode_text(ids2) == "that"
    # factory + toy corpus integration
    tok2 = build_tokenizer("bpe_20", corpus_texts=texts)
    assert tok2.num_units > 0
    corpus = ToyCorpus(label_type="bpe_30", num_utts=4, seed=1)
    u = corpus.utterances[0]
    assert corpus.tokenizer.decode_text(u.label_ids) == u.text.replace("▁", " ").strip() or len(u.label_ids) > 0


def test_bpe_scoring_is_word_level():
    from tensorflow_end2end_speech_recognition_tpu.data.tokenizers import BPETokenizer
    from tensorflow_end2end_speech_recognition_tpu.utils.metrics import score_pair

    tok = BPETokenizer(["hello world", "hello there"], num_merges=30)
    ref = tok.encode_text("hello world")
    hyp = tok.encode_text("hello there")
    err, denom = score_pair(ref, hyp, tok, "bpe_30")
    assert denom == 2  # two ref words
    assert err == 1  # one substituted word


def test_bpe_unknown_symbols_map_to_unk():
    from tensorflow_end2end_speech_recognition_tpu.data.tokenizers import BPETokenizer

    tok = BPETokenizer(["abc abd"], num_merges=10)
    ids = tok.encode_text("abz")  # 'z' never seen in training text
    assert len(ids) == len(tok._encode_word("abz"))  # nothing dropped
    assert tok.unit_to_idx[tok.unk] in ids


def test_prefetch_preserves_order_and_propagates_errors():
    from tensorflow_end2end_speech_recognition_tpu.data.prefetch import prefetch

    assert list(prefetch(iter(range(20)), depth=3)) == list(range(20))

    def boom():
        yield 1
        raise ValueError("producer failed")

    it = prefetch(boom(), depth=2)
    assert next(it) == 1
    import pytest

    with pytest.raises(ValueError, match="producer failed"):
        list(it)


def test_short_final_batch_weights_and_weighted_loss():
    """Duplicate-fill rows carry weight 0, and the weighted train loss equals
    the loss over just the real utterances (no duplicate bias)."""
    import jax

    from tensorflow_end2end_speech_recognition_tpu.data import Dataset, ToyCorpus
    from tensorflow_end2end_speech_recognition_tpu.frontend import FrontendConfig
    from tensorflow_end2end_speech_recognition_tpu.models.ctc import CTCConfig
    from tensorflow_end2end_speech_recognition_tpu.models.encoders import EncoderConfig
    from tensorflow_end2end_speech_recognition_tpu.train.ctc_task import (
        CTCTaskConfig,
        forward_loss,
        init_params,
    )

    corpus = ToyCorpus(num_utts=10, vocab_size=5, min_units=2, max_units=3, seed=4)
    ds = Dataset(corpus.utterances, batch_size=8, sort_utt=True,
                 num_wav_buckets=1, num_label_buckets=1)
    batches = list(ds.batches(0))
    assert len(batches) == 2
    short = batches[1]  # 2 real rows + 6 fill
    np.testing.assert_array_equal(short["weight"][:2], 1.0)
    np.testing.assert_array_equal(short["weight"][2:], 0.0)
    assert [n is None for n in short["names"]] == [False] * 2 + [True] * 6

    task = CTCTaskConfig(
        model=CTCConfig(
            encoder=EncoderConfig(encoder_type="blstm", num_units=8, num_layers=1),
            num_classes=corpus.tokenizer.num_units,
        ),
        frontend=FrontendConfig(add_deltas=False, use_energy=False),
    )
    params = init_params(jax.random.PRNGKey(0), task)
    jb = {k: jnp.asarray(v) for k, v in short.items() if k != "names"}
    loss_w, _ = forward_loss(params, task, jb, train=False)
    # reference: mean loss over ONLY the real rows (weightless 2-row batch)
    jb2 = {k: v[:2] for k, v in jb.items() if k != "weight"}
    loss_ref, _ = forward_loss(params, task, jb2, train=False)
    np.testing.assert_allclose(float(loss_w), float(loss_ref), rtol=1e-5)


def test_prefetch_abandonment_does_not_leak_worker():
    import threading
    import time

    from tensorflow_end2end_speech_recognition_tpu.data.prefetch import prefetch

    produced = []

    def gen():
        for i in range(1000):
            produced.append(i)
            yield i

    before = threading.active_count()
    it = prefetch(gen(), depth=2)
    assert next(it) == 0
    it.close()  # consumer abandons mid-stream
    time.sleep(0.5)
    # the producer must have stopped (bounded production, thread exited)
    assert len(produced) < 20
    assert threading.active_count() <= before + 1  # worker gone (or exiting)


def test_prefetch_propagates_producer_error():
    from tensorflow_end2end_speech_recognition_tpu.data.prefetch import prefetch

    def gen():
        yield 1
        raise RuntimeError("producer died")

    it = prefetch(gen(), depth=2)
    assert next(it) == 1
    import pytest

    with pytest.raises(RuntimeError, match="producer died"):
        list(it)


def test_unit_file_preserves_space_units_and_crlf(tmp_path):
    from tensorflow_end2end_speech_recognition_tpu.data.tokenizers import load_unit_file

    p = tmp_path / "units.txt"
    p.write_bytes(b"a\r\n \r\nb\r\n")  # CRLF file with a space unit
    tok = load_unit_file(str(p))
    assert tok.units == ["a", " ", "b"]  # space kept, no \r residue


def test_capital_divide_nonletter_initial_words_round_trip():
    from tensorflow_end2end_speech_recognition_tpu.data.tokenizers import CharTokenizer

    tok = CharTokenizer(capital_divide=True)
    ids = tok.encode_text("go 4th now")
    # '4' is not in the inventory; the boundary marker lands on 't'
    assert tok.decode_text(ids) == "go th now"
