"""Hard benchmark corpus (data/hard_corpus.py) + word-level WER readout.

The easy toy corpus saturated (multiple families at err 0.0000 —
BASELINE.md round 3), so the hard profile is the quality benchmark going
forward: these tests pin its determinism, label/transcript consistency
across unit systems, the fit() wiring of ``toy_profile: hard``, and the
word-WER counts that character models now report (reference
``do_eval_wer``, SURVEY.md §2.7).
"""

import numpy as np
import pytest

from tensorflow_end2end_speech_recognition_tpu.data.hard_corpus import (
    _ALPHABET,
    HardCorpus,
)


def test_deterministic_and_distinct_seeds():
    a = HardCorpus(label_type="character", num_utts=4, seed=3)
    b = HardCorpus(label_type="character", num_utts=4, seed=3)
    c = HardCorpus(label_type="character", num_utts=4, seed=4)
    assert np.array_equal(a.utterances[0].wav, b.utterances[0].wav)
    assert a.utterances[0].label_ids == b.utterances[0].label_ids
    assert not np.array_equal(a.utterances[0].wav, c.utterances[0].wav)


def test_char_labels_match_transcript():
    c = HardCorpus(label_type="character", num_utts=6, seed=0)
    for u in c.utterances:
        assert c.tokenizer.decode_text(u.label_ids) == u.text
        assert u.speaker is not None


def test_phone_labels_map_letters():
    c = HardCorpus(label_type="phone61", num_utts=4, seed=0)
    inv = c.tokenizer.units
    for u in c.utterances:
        letters = [ch for ch in u.text if ch != " "]
        assert len(u.label_ids) == len(letters)
        for ch, i in zip(letters, u.label_ids):
            assert inv[i] == inv[_ALPHABET.index(ch)]


def test_word_and_bpe_labels_roundtrip():
    for lt in ("word_freq5", "bpe_60"):
        c = HardCorpus(label_type=lt, num_utts=4, seed=1)
        for u in c.utterances:
            assert c.tokenizer.decode_text(u.label_ids) == u.text


def test_confusable_pairs_share_f1():
    c = HardCorpus(label_type="character", num_utts=1, seed=0, confusability=0.1)
    f1, f2 = c._f1, c._f2
    for p in range(len(_ALPHABET) // 2):
        assert f1[2 * p] == f1[2 * p + 1]
        np.testing.assert_allclose(f2[2 * p + 1] / f2[2 * p], 1.1)


def test_durations_and_noise():
    c = HardCorpus(label_type="character", num_utts=16, seed=2)
    durs = np.asarray([len(u.wav) / c.sample_rate for u in c.utterances])
    n_letters = np.asarray([sum(ch != " " for ch in u.text) for u in c.utterances])
    # duration grows with letter count but with rate variance (not a pure cue)
    assert np.corrcoef(durs, n_letters)[0, 1] > 0.7
    assert durs.max() < 8.0  # bounded for batch padding
    # noise floor: silence regions are not exactly zero
    assert float(np.min(np.abs(c.utterances[0].wav))) >= 0.0
    assert float(np.std(c.utterances[0].wav[:50])) > 0.0


def test_max_utt_seconds_split_is_lossless():
    """``max_utt_seconds`` splits long scripts at pause midpoints: parts are
    verbatim slices of the uncut waveform (identical rng consumption, so the
    capped corpus renders the SAME audio) whose word transcripts concatenate
    back to the full script."""
    from collections import defaultdict

    kw = dict(label_type="character", num_utts=12, seed=5,
              min_units=8, max_units=12)
    full = HardCorpus(**kw)
    cap_s = 2.0
    capped = HardCorpus(**kw, max_utt_seconds=cap_s)
    sr = capped.sample_rate
    assert all(len(u.wav) <= cap_s * sr for u in capped.utterances)
    assert len(capped.utterances) > len(full.utterances)  # something split
    groups = defaultdict(list)
    for u in capped.utterances:
        groups[u.name[:9]].append(u)  # parts share the "hardNNNNN" prefix
    for fu in full.utterances:
        parts = groups[fu.name[:9]]
        assert " ".join(p.text for p in parts) == fu.text
        np.testing.assert_array_equal(
            np.concatenate([p.wav for p in parts]), fu.wav
        )
        assert all(p.speaker == fu.speaker for p in parts)


def test_max_utt_seconds_bounds_timit_frames():
    """The timit_ctc_blstm setting (3.9 s, num_stack 1) must keep every
    utterance under the T=400 composition boundary (BASELINE.md r4-r5)."""
    c = HardCorpus(label_type="phone61", num_utts=32, seed=0,
                   min_units=4, max_units=10, max_utt_seconds=3.9)
    frames = max(int(np.ceil(len(u.wav) / (0.010 * c.sample_rate)))
                 for u in c.utterances)
    assert frames <= 390
    assert all(u.label_ids for u in c.utterances)


def test_max_utt_seconds_wired_through_config():
    from tensorflow_end2end_speech_recognition_tpu.train.loop import (
        build_corpus_splits,
    )
    from tensorflow_end2end_speech_recognition_tpu.utils.config import (
        ExperimentConfig,
    )

    exp = ExperimentConfig(
        model_type="ctc", label_type="character", encoder_type="blstm",
        toy_profile="hard", toy_num_utts=8, toy_min_units=6, toy_max_units=10,
        max_utt_seconds=1.5,
    )
    train, dev, test, _ = build_corpus_splits(exp)
    for u in train + dev + test:
        assert len(u.wav) <= 1.5 * 16000
    # the shipped TIMIT config carries the boundary cap
    cfg = ExperimentConfig.from_yaml("configs/timit_ctc_blstm.yml")
    assert cfg.max_utt_seconds == 3.9
    # easy profile: tolerated with a warning, corpus unaffected
    easy = ExperimentConfig(
        model_type="ctc", label_type="phone61", encoder_type="blstm",
        toy_num_utts=4, max_utt_seconds=1.5,
    )
    with pytest.warns(UserWarning, match="max_utt_seconds"):
        build_corpus_splits(easy)


def test_lexicon_words_forces_sublexical_bpe():
    """With a lexicon larger than the BPE merge vocabulary, units must be
    genuinely sub-lexical (more tokens than words per utterance) — the
    round-5 fix for the supervision-starved bpe benchmark configs; and the
    knob must plumb through the config."""
    c = HardCorpus(label_type="bpe_60", num_utts=8, seed=1, num_words=200)
    assert len(c.lexicon) == 200
    for u in c.utterances:
        n_words = len(u.text.split())
        assert len(u.label_ids) > n_words  # sub-lexical units
        assert c.tokenizer.decode_text(u.label_ids) == u.text

    from tensorflow_end2end_speech_recognition_tpu.train.loop import (
        build_corpus_splits,
    )
    from tensorflow_end2end_speech_recognition_tpu.utils.config import (
        ExperimentConfig,
    )

    exp = ExperimentConfig(
        model_type="ctc", label_type="character", encoder_type="blstm",
        toy_profile="hard", toy_num_utts=64, toy_lexicon_words=70,
    )
    train, dev, test, _ = build_corpus_splits(exp)
    words = {w for u in train + dev + test for w in u.text.split()}
    assert len(words) > 50  # default lexicon is 50; the knob grew it


def test_fit_hard_profile_end_to_end(tmp_path):
    from tensorflow_end2end_speech_recognition_tpu.train.loop import fit
    from tensorflow_end2end_speech_recognition_tpu.utils.config import (
        ExperimentConfig,
    )

    exp = ExperimentConfig(
        model_type="ctc", label_type="character", encoder_type="blstm",
        num_units=16, num_layers=1, batch_size=4, num_epoch=1,
        toy_profile="hard", toy_num_utts=12, toy_min_units=1, toy_max_units=2,
        use_delta=False, use_energy=False,
    )
    summary = fit(exp, str(tmp_path / "m"), print_fn=lambda *a: None)
    assert np.isfinite(summary["train_loss"])


def test_harder_profile_tightens_pairs_and_speakers():
    """VERDICT r4 #6 headroom tier: ``toy_profile: harder`` must produce a
    DIFFERENT corpus (tighter F2 gap, more speakers) through the fit()
    plumbing, not just accept the string."""
    from tensorflow_end2end_speech_recognition_tpu.train.loop import (
        build_corpus_splits,
    )
    from tensorflow_end2end_speech_recognition_tpu.utils.config import (
        ExperimentConfig,
    )

    kw = dict(label_type="character", toy_num_utts=40, toy_min_units=1,
              toy_max_units=2)
    hard = ExperimentConfig(toy_profile="hard", **kw)
    harder = ExperimentConfig(toy_profile="harder", **kw)
    tr_h, _, _, _ = build_corpus_splits(hard)
    tr_hh, _, _, _ = build_corpus_splits(harder)
    # different corpus (the speaker-inventory size shifts the RNG stream)
    assert not np.array_equal(tr_h[0].wav, tr_hh[0].wav)
    # the harder tier draws from a 32-speaker inventory (hard: 16)
    spk = {u.speaker for u in tr_hh}
    assert any(int(s[3:]) >= 16 for s in spk)
    # direct corpus check: the within-pair F2 ratio halves
    c_hard = HardCorpus(label_type="character", num_utts=1, seed=0)
    c_harder = HardCorpus(label_type="character", num_utts=1, seed=0,
                          confusability=0.05)
    r_hard = c_hard._f2[1] / c_hard._f2[0]
    r_harder = c_harder._f2[1] / c_harder._f2[0]
    assert abs(r_hard - 1.10) < 1e-9 and abs(r_harder - 1.05) < 1e-9


def test_fit_rejects_unknown_profile(tmp_path):
    from tensorflow_end2end_speech_recognition_tpu.train.loop import (
        build_corpus_splits,
    )
    from tensorflow_end2end_speech_recognition_tpu.utils.config import (
        ExperimentConfig,
    )

    exp = ExperimentConfig(toy_profile="nope")
    with pytest.raises(ValueError, match="toy_profile"):
        build_corpus_splits(exp)


# ---- word-level WER readout (utils/metrics.py) --------------------------


def test_word_tokens_char_only():
    from tensorflow_end2end_speech_recognition_tpu.data.tokenizers import (
        CharTokenizer,
        PhoneTokenizer,
    )
    from tensorflow_end2end_speech_recognition_tpu.utils.metrics import word_tokens

    tok = CharTokenizer()
    ref = tok.encode_text("ab cd")
    hyp = tok.encode_text("ab ce")
    w = word_tokens(ref, hyp, tok, "character")
    assert w == (["ab", "cd"], ["ab", "ce"])
    assert word_tokens([0], [0], PhoneTokenizer(), "phone61") is None


def test_rates_include_wer_for_char_models():
    from tensorflow_end2end_speech_recognition_tpu.utils.metrics import (
        rates_from_counts,
    )

    # 2 char edits over 20 chars; 1 word edit over 4 words
    counts = np.asarray([2, 2, 0, 0, 20, 2, 1.0, 1, 1, 0, 0, 4], np.float64)
    m = rates_from_counts(counts)
    assert m["error_rate"] == pytest.approx(0.1)
    assert m["wer"] == pytest.approx(0.25)
    # legacy 7-vector stays accepted (no word slots -> no wer key)
    m7 = rates_from_counts(counts[:7])
    assert "wer" not in m7 and m7["error_rate"] == pytest.approx(0.1)


def test_eval_counts_reports_wer_end_to_end():
    """evaluate_ctc on a tiny char model returns a wer key, and the chunked
    per-batch scoring equals whole-corpus scoring by construction (counts
    are sums)."""
    import jax

    from tensorflow_end2end_speech_recognition_tpu.data.dataset import Dataset
    from tensorflow_end2end_speech_recognition_tpu.frontend import FrontendConfig
    from tensorflow_end2end_speech_recognition_tpu.models.ctc import CTCConfig
    from tensorflow_end2end_speech_recognition_tpu.models.encoders import (
        EncoderConfig,
    )
    from tensorflow_end2end_speech_recognition_tpu.train.ctc_task import (
        CTCTaskConfig,
        init_params,
        make_eval_step,
    )
    from tensorflow_end2end_speech_recognition_tpu.utils.metrics import evaluate_ctc

    corpus = HardCorpus(label_type="character", num_utts=6, seed=5,
                        min_units=1, max_units=2)
    task = CTCTaskConfig(
        model=CTCConfig(
            encoder=EncoderConfig(encoder_type="lstm", num_units=16, num_layers=1),
            num_classes=corpus.tokenizer.num_units,
        ),
        frontend=FrontendConfig(add_deltas=False, use_energy=False),
    )
    params = init_params(jax.random.PRNGKey(0), task)
    ds = Dataset(corpus.utterances, 4)
    m = evaluate_ctc(make_eval_step(task), params, ds, corpus.tokenizer,
                     "character")
    assert "wer" in m and 0.0 <= m["wer"] <= 2.0
    assert m["num_utts"] == 6
