"""Attention beam search: agreement with greedy at W=1, beam invariants,
LM fusion effect, joint rescoring."""

import jax
import jax.numpy as jnp
import numpy as np

from tensorflow_end2end_speech_recognition_tpu.decoding.attention_beam import (
    attention_beam_search,
)
from tensorflow_end2end_speech_recognition_tpu.decoding.joint_rescoring import joint_rescore
from tensorflow_end2end_speech_recognition_tpu.models.attention import AttentionConfig
from tensorflow_end2end_speech_recognition_tpu.models.encoders import EncoderConfig
from tensorflow_end2end_speech_recognition_tpu.models.lm import LMConfig, init_lm
from tensorflow_end2end_speech_recognition_tpu.models.seq2seq import (
    Seq2SeqConfig,
    greedy_decode,
    init_seq2seq,
)


def _cfg(**kw):
    return Seq2SeqConfig(
        encoder=EncoderConfig(encoder_type="blstm", num_units=8, num_layers=1),
        attention=AttentionConfig(attention_type="hybrid", attention_dim=6, conv_width=3, conv_num_channels=2),
        num_classes=5,
        decoder_num_units=8,
        embedding_dim=4,
        max_decode_length=6,
        **kw,
    )


def _setup(cfg, b=2, t=10, d=7, seed=0):
    params = init_seq2seq(jax.random.PRNGKey(seed), cfg, input_dim=d)
    feats = jax.random.normal(jax.random.PRNGKey(seed + 1), (b, t, d))
    feat_len = jnp.asarray([t] * (b - 1) + [t - 3])
    return params, feats, feat_len


def test_beam1_matches_greedy():
    cfg = _cfg()
    params, feats, feat_len = _setup(cfg)
    g = greedy_decode(params, cfg, feats, feat_len)
    r = attention_beam_search(params, cfg, feats, feat_len, beam_width=1)
    for i in range(feats.shape[0]):
        greedy_toks = [int(x) for x in np.asarray(g.predicted_ids[i]) if x != cfg.eos_id]
        beam_toks = [int(x) for x in np.asarray(r.tokens[i, 0][: int(r.lengths[i, 0])])]
        assert beam_toks == greedy_toks, (beam_toks, greedy_toks)


def test_beam_scores_sorted_and_finite():
    cfg = _cfg()
    params, feats, feat_len = _setup(cfg)
    r = attention_beam_search(params, cfg, feats, feat_len, beam_width=4, length_penalty=0.6)
    s = np.asarray(r.scores)
    assert np.all(np.diff(s, axis=1) <= 1e-5)  # best-first
    assert np.all(np.isfinite(s))
    # wider beam's best raw score >= narrow beam's (search can only improve)
    r1 = attention_beam_search(params, cfg, feats, feat_len, beam_width=1)
    assert np.all(np.asarray(r.raw_scores[:, 0]) >= np.asarray(r1.raw_scores[:, 0]) - 1e-5)


def test_lm_fusion_changes_scores():
    cfg = _cfg()
    params, feats, feat_len = _setup(cfg)
    lm_cfg = LMConfig(vocab=cfg.vocab, num_units=8, embedding_dim=4)
    lm_params = init_lm(jax.random.PRNGKey(9), lm_cfg)
    r0 = attention_beam_search(params, cfg, feats, feat_len, beam_width=3)
    r1 = attention_beam_search(
        params, cfg, feats, feat_len, beam_width=3,
        lm_params=lm_params, lm_cfg=lm_cfg, lm_weight=0.5,
    )
    assert not np.allclose(np.asarray(r0.scores), np.asarray(r1.scores))


def test_joint_rescoring_reranks():
    cfg = _cfg(ctc_loss_weight=0.3)
    params, feats, feat_len = _setup(cfg)
    r = attention_beam_search(params, cfg, feats, feat_len, beam_width=4)
    rr = joint_rescore(r, ctc_weight=0.3, blank_id=cfg.num_classes)
    assert rr.tokens.shape == r.tokens.shape
    s = np.asarray(rr.scores)
    assert np.all(np.diff(s, axis=1) <= 1e-5)
    # the sets of hypotheses are identical; only ranking may change
    for i in range(r.tokens.shape[0]):
        a = {tuple(np.asarray(r.tokens[i, j])) for j in range(4)}
        bset = {tuple(np.asarray(rr.tokens[i, j])) for j in range(4)}
        assert a == bset


def test_joint_rescore_keeps_lm_term():
    """The shallow-fusion LM contribution (raw - att) must survive re-ranking."""
    import numpy as np

    from tensorflow_end2end_speech_recognition_tpu.decoding.attention_beam import (
        BeamSearchResult,
    )

    b, w, u, t, c = 1, 2, 3, 6, 5
    rng = np.random.RandomState(0)
    # identical hypotheses -> identical CTC and attention scores; only the
    # LM term differs, so it alone must decide the ranking
    tok = np.tile(np.asarray([[0, 1, 2]], np.int32), (w, 1))[None]
    logits = jnp.asarray(rng.randn(b, t, c).astype(np.float32))
    att = jnp.asarray([[-5.0, -5.0]])
    raw = jnp.asarray([[-6.0, -4.0]])  # beam 1 has the better LM score
    res = BeamSearchResult(
        tokens=jnp.asarray(tok), lengths=jnp.full((b, w), u, jnp.int32),
        scores=raw, raw_scores=raw, att_scores=att,
        ctc_logits=logits, ctc_logit_len=jnp.full((b,), t, jnp.int32),
    )
    rr = joint_rescore(res, ctc_weight=0.3, blank_id=c - 1)
    # beam with the better LM term must rank first
    assert float(rr.raw_scores[0, 0]) == -4.0
    assert float(rr.scores[0, 0]) > float(rr.scores[0, 1])


def test_early_exit_invariant_to_max_decode_length():
    """The while_loop early exit must make decode results independent of
    max_decode_length once every hypothesis has emitted EOS: finished beams
    extend their own EOS at +0 log-prob and history/length updates are gated
    on was_finished, so the truncated steps provably change nothing."""
    cfg = _cfg()
    params, feats, feat_len = _setup(cfg)
    # bias the output projection toward EOS so hypotheses finish after a
    # few (varying) steps, well before the longer budget
    params = dict(params)
    params["out_proj"] = dict(params["out_proj"])
    params["out_proj"]["b"] = params["out_proj"]["b"].at[cfg.eos_id].add(2.0)

    rs = attention_beam_search(params, cfg, feats, feat_len, beam_width=3, max_len=6)
    rl = attention_beam_search(params, cfg, feats, feat_len, beam_width=3, max_len=24)
    assert np.all(np.asarray(rl.lengths) < 6), "precondition: all beams finish early"
    np.testing.assert_array_equal(np.asarray(rs.lengths), np.asarray(rl.lengths))
    np.testing.assert_allclose(np.asarray(rs.scores), np.asarray(rl.scores), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(rs.tokens), np.asarray(rl.tokens[..., :6]))

    gs = greedy_decode(params, cfg, feats, feat_len, max_len=6)
    gl = greedy_decode(params, cfg, feats, feat_len, max_len=24)
    ps, pl = np.asarray(gs.predicted_ids), np.asarray(gl.predicted_ids)
    assert np.all(np.any(ps == cfg.eos_id, axis=1)), "precondition: greedy finishes early"
    np.testing.assert_array_equal(ps, pl[:, :6])
    # rows past the exit step keep the EOS fill consumers never read past
    assert np.all(pl[:, 6:] == cfg.eos_id)


def test_unroll_bit_exact():
    """The decode-loop unroll (k steps per while_loop iteration — the round-5
    per-iteration-overhead lever) must be bit-exact vs unroll=1, both when
    hypotheses run the full budget and when EOS fires early (so up to k-1
    dead steps actually execute inside the last unrolled iteration)."""
    cfg = _cfg()._replace(max_decode_length=12)
    params, feats, feat_len = _setup(cfg)
    for bias in (0.0, 2.0):  # full-length run / early-EOS run
        p = dict(params)
        p["out_proj"] = dict(p["out_proj"])
        p["out_proj"]["b"] = p["out_proj"]["b"].at[cfg.eos_id].add(bias)
        r1 = attention_beam_search(p, cfg, feats, feat_len, beam_width=3, unroll=1)
        for k in (3, 4, 6, None):  # None = auto
            rk = attention_beam_search(p, cfg, feats, feat_len, beam_width=3, unroll=k)
            np.testing.assert_array_equal(np.asarray(r1.tokens), np.asarray(rk.tokens))
            np.testing.assert_array_equal(np.asarray(r1.lengths), np.asarray(rk.lengths))
            np.testing.assert_array_equal(np.asarray(r1.scores), np.asarray(rk.scores))
            np.testing.assert_array_equal(
                np.asarray(r1.raw_scores), np.asarray(rk.raw_scores))
        g1 = greedy_decode(p, cfg, feats, feat_len, unroll=1)
        for k in (3, 4, 6, None):
            gk = greedy_decode(p, cfg, feats, feat_len, unroll=k)
            np.testing.assert_array_equal(
                np.asarray(g1.predicted_ids), np.asarray(gk.predicted_ids))
            np.testing.assert_array_equal(
                np.asarray(g1.logits), np.asarray(gk.logits))
            np.testing.assert_array_equal(
                np.asarray(g1.attention_weights), np.asarray(gk.attention_weights))


def test_unroll_must_divide_max_len():
    import pytest

    cfg = _cfg()._replace(max_decode_length=10)
    params, feats, feat_len = _setup(cfg)
    with pytest.raises(ValueError):
        attention_beam_search(params, cfg, feats, feat_len, beam_width=2, unroll=4)
    with pytest.raises(ValueError):
        greedy_decode(params, cfg, feats, feat_len, unroll=3)


def test_beam_eval_nll_matches_greedy_eval_nll():
    """bin/eval.py's "loss" column must mean the same thing (teacher-forced
    per-utterance NLL) for greedy and beam eval steps (VERDICT r2 #9)."""
    from tensorflow_end2end_speech_recognition_tpu.train import att_task

    cfg = _cfg()
    task = att_task.AttTaskConfig(model=cfg, frontend=None, feature_dim=7)
    params, feats, feat_len = _setup(cfg)
    batch = {
        "inputs": feats, "input_len": feat_len,
        "labels": jnp.asarray([[1, 2, -1], [0, 3, 2]], jnp.int32),
        "label_len": jnp.asarray([2, 3], jnp.int32),
    }
    _, _, nll_greedy = att_task.make_eval_step(task)(params, batch)
    _, _, nll_beam = att_task.make_beam_eval_step(task, beam_width=3)(params, batch)
    np.testing.assert_allclose(np.asarray(nll_greedy), np.asarray(nll_beam), rtol=1e-5)
    assert np.all(np.asarray(nll_beam) > 0)
