"""LSTM LM: step/sequence consistency, prefix scoring, trainability."""

import jax
import jax.numpy as jnp
import numpy as np

from tensorflow_end2end_speech_recognition_tpu.models.lm import (
    LMConfig,
    init_lm,
    lm_init_state,
    lm_prefix_logp,
    lm_sequence_nll,
    lm_step,
)
from tensorflow_end2end_speech_recognition_tpu.train.lm_task import (
    LMTaskConfig,
    init_params,
    make_train_step,
)
from tensorflow_end2end_speech_recognition_tpu.train.optimizer import build_optimizer


def test_step_matches_sequence_nll():
    cfg = LMConfig(vocab=9, num_units=8, embedding_dim=4)
    params = init_lm(jax.random.PRNGKey(0), cfg)
    tokens = jnp.asarray([[1, 3, 2]])
    lengths = jnp.asarray([3])
    sos = cfg.vocab - 2
    nll = float(lm_sequence_nll(params, cfg, tokens, lengths, sos_id=sos)[0])
    # manual: step through [sos, 1, 3, 2], accumulate logp of 1, 3, 2, <eos>
    # (the eos step IS supervised — fusion reads the eos column)
    state = lm_init_state(cfg, 1)
    total = 0.0
    prev = jnp.asarray([sos])
    targets = [1, 3, 2, cfg.vocab - 1]
    for t in range(4):
        state, logp = lm_step(params, cfg, state, prev)
        total -= float(logp[0, targets[t]])
        prev = jnp.asarray([targets[t]])
    np.testing.assert_allclose(nll, total, rtol=1e-5)


def test_prefix_logp_matches_steps():
    cfg = LMConfig(vocab=7, num_units=6, embedding_dim=3)
    params = init_lm(jax.random.PRNGKey(1), cfg)
    sos = cfg.vocab - 2
    prefixes = jnp.asarray([[[0, 2, -1, -1], [1, -1, -1, -1]]])  # [1, 2, 4]
    lengths = jnp.asarray([[2, 1]])
    out = lm_prefix_logp(params, cfg, prefixes, lengths, sos_id=sos)
    assert out.shape == (1, 2, 7)
    # beam 0: sos -> 0 -> 2, distribution after
    state = lm_init_state(cfg, 1)
    for tok in (sos, 0, 2):
        state, logp = lm_step(params, cfg, state, jnp.asarray([tok]))
    np.testing.assert_allclose(np.asarray(out[0, 0]), np.asarray(logp[0]), atol=1e-5)


def test_lm_learns_bigram_structure():
    """Deterministic next-token data: LM per-token nll must fall toward 0."""
    cfg = LMConfig(vocab=8, num_units=16, embedding_dim=8)
    task = LMTaskConfig(model=cfg)
    params = init_params(jax.random.PRNGKey(0), task)
    opt = build_optimizer("adam", 5.0)
    opt_state = opt.init(params)
    step = make_train_step(task, opt)
    # cyclic sequences 0,1,2,...: fully predictable after the first token
    labels = jnp.asarray([[(i + s) % 6 for i in range(10)] for s in range(4)], jnp.int32)
    batch = {"labels": labels, "label_len": jnp.full((4,), 10, jnp.int32)}
    first = None
    rng = jax.random.PRNGKey(2)
    for i in range(120):
        rng, sub = jax.random.split(rng)
        params, opt_state, aux = step(params, opt_state, batch, 1e-2, sub)
        if first is None:
            first = float(aux["loss"])
    last = float(aux["loss"])
    assert last < 0.3 * first, (first, last)
