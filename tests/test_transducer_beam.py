"""Transducer beam search: exhaustive-oracle optimality, greedy dominance."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np

from tensorflow_end2end_speech_recognition_tpu.decoding.transducer_beam import (
    transducer_beam_search,
)
from tensorflow_end2end_speech_recognition_tpu.decoding.transducer_greedy import (
    transducer_greedy_decode,
)
from tensorflow_end2end_speech_recognition_tpu.models.encoders import EncoderConfig
from tensorflow_end2end_speech_recognition_tpu.models.transducer import (
    TransducerConfig,
    init_transducer,
    joint_logits,
    pred_initial_states,
    predict,
)


def _tiny_cfg(num_classes=2, s=2):
    return TransducerConfig(
        encoder=EncoderConfig(encoder_type="lstm", num_units=8, num_layers=1),
        num_classes=num_classes, pred_num_units=8, embedding_dim=4, joint_dim=8,
        max_symbols_per_frame=s,
    )


def _path_score(params, cfg, f_row, emissions):
    """Score one alignment: per-frame label runs, each frame ends in blank."""
    states = pred_initial_states(cfg, 1)
    g, states = predict(
        params, cfg, jnp.full((1, 1), cfg.blank_id, jnp.int32), initial_states=states
    )
    g = g[:, 0]
    score = 0.0
    for t, labs in enumerate(emissions):
        for k in labs:
            lp = jax.nn.log_softmax(joint_logits(params, f_row[t][None], g))
            score += float(lp[0, k])
            g, states = predict(
                params, cfg, jnp.full((1, 1), k, jnp.int32), initial_states=states
            )
            g = g[:, 0]
        lp = jax.nn.log_softmax(joint_logits(params, f_row[t][None], g))
        score += float(lp[0, cfg.blank_id])
    return score


def test_beam_matches_exhaustive_best_path():
    cfg = _tiny_cfg(num_classes=2, s=2)
    params = init_transducer(jax.random.PRNGKey(0), cfg, 5)
    rng = np.random.RandomState(0)
    t = 2
    f_proj = jnp.asarray(rng.randn(1, t, cfg.joint_dim).astype(np.float32))
    enc_len = jnp.asarray([t], jnp.int32)

    # exhaustive: per frame emit 0..s labels from {0,1}, then blank
    runs = [()]
    for r in (1, 2):
        runs += list(itertools.product(range(cfg.num_classes), repeat=r))
    best_score, best_seq = -np.inf, None
    for emis in itertools.product(runs, repeat=t):
        sc = _path_score(params, cfg, f_proj[0], emis)
        if sc > best_score:
            best_score, best_seq = sc, [k for labs in emis for k in labs]

    res = transducer_beam_search(params, cfg, f_proj, enc_len, beam_width=16)
    got = list(np.asarray(res.tokens[0, 0][: int(res.lengths[0, 0])]))
    np.testing.assert_allclose(float(res.scores[0, 0]), best_score, rtol=1e-5)
    assert got == best_seq, (got, best_seq)


def test_beam_top_score_dominates_greedy():
    cfg = _tiny_cfg(num_classes=5, s=3)
    params = init_transducer(jax.random.PRNGKey(1), cfg, 5)
    rng = np.random.RandomState(1)
    b, t = 3, 6
    f_proj = jnp.asarray(rng.randn(b, t, cfg.joint_dim).astype(np.float32))
    enc_len = jnp.asarray([t, 4, 2], jnp.int32)

    dec, dec_len = transducer_greedy_decode(params, cfg, f_proj, enc_len)
    res = transducer_beam_search(params, cfg, f_proj, enc_len, beam_width=8)
    # beams sorted best-first
    sc = np.asarray(res.scores)
    assert np.all(np.diff(sc, axis=1) <= 1e-6)
    # replay each row's greedy alignment and compare path scores
    for i in range(b):
        n = int(enc_len[i])
        # reconstruct the greedy per-frame emission runs by re-running the
        # frame loop (greedy emits deterministically)
        from tensorflow_end2end_speech_recognition_tpu.decoding.transducer_greedy import (
            decode_frame,
            decoder_init,
        )

        carry = decoder_init(params, cfg, 1)
        emis = []
        for tt in range(n):
            carry, em = decode_frame(
                params, cfg, carry, f_proj[i, tt][None], jnp.asarray([True])
            )
            emis.append(tuple(int(x) for x in np.asarray(em[0]) if x >= 0))
        g_score = _path_score(params, cfg, f_proj[i], emis)
        assert float(res.scores[i, 0]) >= g_score - 1e-5, (i, float(res.scores[i, 0]), g_score)
        # and the greedy sequence's tokens match some consistency: lengths
        assert int(res.lengths[i, 0]) <= n * cfg.max_symbols_per_frame


def test_beam_respects_enc_len_and_padding():
    cfg = _tiny_cfg(num_classes=3, s=2)
    params = init_transducer(jax.random.PRNGKey(2), cfg, 5)
    rng = np.random.RandomState(2)
    f_proj = jnp.asarray(rng.randn(2, 5, cfg.joint_dim).astype(np.float32))
    # row 1 sees only 2 frames: its result must equal a 2-frame-only search
    res_full = transducer_beam_search(
        params, cfg, f_proj, jnp.asarray([5, 2], jnp.int32), beam_width=4
    )
    res_cut = transducer_beam_search(
        params, cfg, f_proj[1:, :2], jnp.asarray([2], jnp.int32), beam_width=4
    )
    np.testing.assert_allclose(
        np.asarray(res_full.scores[1]), np.asarray(res_cut.scores[0]), rtol=1e-5
    )
    n = int(res_full.lengths[1, 0])
    np.testing.assert_array_equal(
        np.asarray(res_full.tokens[1, 0, :n]), np.asarray(res_cut.tokens[0, 0, :n])
    )
    # -1 padding beyond each hypothesis length
    toks, lens = np.asarray(res_full.tokens), np.asarray(res_full.lengths)
    for i in range(2):
        assert np.all(toks[i, 0, lens[i, 0]:] == -1)


def test_beam_emits_full_symbol_budget_runs():
    """Regression (review finding): label runs using the FULL per-frame
    symbol budget must be committable — at max_symbols_per_frame=1 the beam
    must still emit labels and dominate greedy."""
    cfg = _tiny_cfg(num_classes=4, s=1)
    params = init_transducer(jax.random.PRNGKey(3), cfg, 5)
    rng = np.random.RandomState(3)
    f_proj = jnp.asarray(rng.randn(2, 6, cfg.joint_dim).astype(np.float32))
    enc_len = jnp.asarray([6, 6], jnp.int32)
    dec, dec_len = transducer_greedy_decode(params, cfg, f_proj, enc_len)
    res = transducer_beam_search(params, cfg, f_proj, enc_len, beam_width=4)
    for i in range(2):
        g = list(np.asarray(dec[i][: int(dec_len[i])]))
        if not g:
            continue
        # greedy found labels, so a non-degenerate hypothesis exists; the
        # beam's top hypothesis must be live (pre-fix it was the empty
        # blank-only path with score _NEG + lp sums)
        assert int(res.lengths[i, 0]) > 0 or float(res.scores[i, 0]) > -1e29
    # and the exhaustive oracle at s=1: beam == best single-emission path
    from itertools import product

    f1 = f_proj[:1, :2]
    best_score, best_seq = -np.inf, None
    runs = [(), (0,), (1,), (2,), (3,)]
    for emis in product(runs, repeat=2):
        sc = _path_score(params, cfg, f1[0], emis)
        if sc > best_score:
            best_score, best_seq = sc, [k for labs in emis for k in labs]
    res1 = transducer_beam_search(
        params, cfg, f1, jnp.asarray([2], jnp.int32), beam_width=16
    )
    np.testing.assert_allclose(float(res1.scores[0, 0]), best_score, rtol=1e-5)
    assert list(np.asarray(res1.tokens[0, 0][: int(res1.lengths[0, 0])])) == best_seq


def _lm(num_classes, seed=7):
    from tensorflow_end2end_speech_recognition_tpu.models.lm import (
        LMConfig,
        init_lm,
    )

    lm_cfg = LMConfig(vocab=num_classes + 2, num_units=8, embedding_dim=4)
    return init_lm(jax.random.PRNGKey(seed), lm_cfg), lm_cfg


def _fusion(params_lm, lm_cfg, cfg):
    from tensorflow_end2end_speech_recognition_tpu.models.lm import make_fusion_lm

    return make_fusion_lm(
        params_lm, lm_cfg, sos_id=lm_cfg.vocab - 2,
        num_ctc_classes=cfg.vocab_with_blank,
    )


def _lm_prefix_sum(params_lm, lm_cfg, labels):
    """sum_i log p_lm(l_i | sos, l_<i) for a flat label sequence."""
    from tensorflow_end2end_speech_recognition_tpu.models.lm import (
        lm_init_state,
        lm_step,
    )

    state = lm_init_state(lm_cfg, 1)
    state, logp = lm_step(
        params_lm, lm_cfg, state, jnp.asarray([lm_cfg.vocab - 2], jnp.int32)
    )
    total = 0.0
    for k in labels:
        total += float(logp[0, k])
        state, logp = lm_step(params_lm, lm_cfg, state, jnp.asarray([k], jnp.int32))
    return total


def test_beam_lm_fusion_matches_exhaustive_fused_oracle():
    """Shallow fusion: the fused beam's top hypothesis equals the exhaustive
    best path under AM + w * LM (LM charged per emitted label, not blanks).

    The weight is NEGATIVE by design: an alignment's AM score always pays
    exactly T blank factors plus per-label factors <= 0, so with a tiny
    random joint the AM-best path is the empty one for any input — and an
    empty winner would never read the LM. A negative weight makes label
    emissions profitable, forcing a multi-token winner whose selection
    exercises the fused scoring AND the carried LM state across tokens;
    the arithmetic under test is sign-blind.
    """
    cfg = _tiny_cfg(num_classes=2, s=2)
    params = init_transducer(jax.random.PRNGKey(0), cfg, 5)
    (lm_params, lm_cfg), lm_weight = _lm(cfg.num_classes), -2.0
    fusion = _fusion(lm_params, lm_cfg, cfg)
    rng = np.random.RandomState(0)
    t = 2
    f_proj = jnp.asarray(rng.randn(1, t, cfg.joint_dim).astype(np.float32))
    enc_len = jnp.asarray([t], jnp.int32)

    runs = [()]
    for r in (1, 2):
        runs += list(itertools.product(range(cfg.num_classes), repeat=r))
    best_score, best_seq = -np.inf, None
    for emis in itertools.product(runs, repeat=t):
        flat = [k for labs in emis for k in labs]
        sc = _path_score(params, cfg, f_proj[0], emis) \
            + lm_weight * _lm_prefix_sum(lm_params, lm_cfg, flat)
        if sc > best_score:
            best_score, best_seq = sc, flat

    res = transducer_beam_search(
        params, cfg, f_proj, enc_len, beam_width=16,
        fusion_lm=fusion, lm_weight=lm_weight,
    )
    got = list(np.asarray(res.tokens[0, 0][: int(res.lengths[0, 0])]))
    np.testing.assert_allclose(float(res.scores[0, 0]), best_score, rtol=1e-5)
    assert got == best_seq, (got, best_seq)
    # the winning hypothesis emits labels, so the LM term is genuinely
    # exercised (an empty path would make the oracle equality vacuous)
    assert len(best_seq) > 0
    res0 = transducer_beam_search(params, cfg, f_proj, enc_len, beam_width=16)
    assert abs(float(res0.scores[0, 0]) - best_score) > 1e-4


def test_beam_lm_fusion_zero_weight_is_identity():
    """fusion_lm attached with lm_weight=0 must not perturb the search."""
    cfg = _tiny_cfg(num_classes=3, s=2)
    params = init_transducer(jax.random.PRNGKey(4), cfg, 5)
    lm_params, lm_cfg = _lm(cfg.num_classes)
    fusion = _fusion(lm_params, lm_cfg, cfg)
    rng = np.random.RandomState(4)
    f_proj = jnp.asarray(rng.randn(2, 4, cfg.joint_dim).astype(np.float32))
    enc_len = jnp.asarray([4, 3], jnp.int32)
    a = transducer_beam_search(params, cfg, f_proj, enc_len, beam_width=4)
    b = transducer_beam_search(params, cfg, f_proj, enc_len, beam_width=4,
                               fusion_lm=fusion, lm_weight=0.0)
    np.testing.assert_array_equal(np.asarray(a.tokens), np.asarray(b.tokens))
    np.testing.assert_allclose(np.asarray(a.scores), np.asarray(b.scores), rtol=1e-6)


def test_transducer_beam_eval_step_with_lm_runs():
    """make_beam_eval_step(lm=...) fuses (no warning) and decodes."""
    from tensorflow_end2end_speech_recognition_tpu.frontend import FrontendConfig
    from tensorflow_end2end_speech_recognition_tpu.train.transducer_task import (
        TransducerTaskConfig,
        init_params,
        make_beam_eval_step,
    )

    cfg = _tiny_cfg(num_classes=4, s=2)
    task = TransducerTaskConfig(
        model=cfg, frontend=FrontendConfig(add_deltas=False, use_energy=False),
        num_stack=3, num_skip=3,
    )
    params = init_params(jax.random.PRNGKey(5), task)
    lm = _lm(cfg.num_classes)
    rng = np.random.RandomState(5)
    batch = {
        "inputs": jnp.asarray(rng.randn(2, 4096).astype(np.float32) * 0.1),
        "input_len": jnp.full((2,), 4096, jnp.int32),
        "labels": jnp.asarray(rng.randint(0, 4, (2, 3)).astype(np.int32)),
        "label_len": jnp.full((2,), 3, jnp.int32),
    }
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        step = make_beam_eval_step(task, beam_width=4, lm=lm, lm_weight=0.4)
        dec, dec_len, nll = step(params, batch)
    assert dec.shape[0] == 2 and np.all(np.isfinite(np.asarray(nll)))
