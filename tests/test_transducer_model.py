"""Transducer model + task: shapes, gradients, greedy decode, convergence."""

import jax
import jax.numpy as jnp
import numpy as np

from tensorflow_end2end_speech_recognition_tpu.data import Dataset, ToyCorpus
from tensorflow_end2end_speech_recognition_tpu.decoding.transducer_greedy import (
    transducer_greedy_decode,
)
from tensorflow_end2end_speech_recognition_tpu.frontend import FrontendConfig
from tensorflow_end2end_speech_recognition_tpu.models.encoders import EncoderConfig
from tensorflow_end2end_speech_recognition_tpu.models.transducer import (
    TransducerConfig,
    encode,
    predict,
)
from tensorflow_end2end_speech_recognition_tpu.train.optimizer import build_optimizer
from tensorflow_end2end_speech_recognition_tpu.train.transducer_task import (
    TransducerTaskConfig,
    forward_loss,
    init_params,
    make_eval_step,
    make_train_step,
)
from tensorflow_end2end_speech_recognition_tpu.utils.edit_distance import compute_per


def _task(tok_units, encoder_type="lstm", num_units=32):
    return TransducerTaskConfig(
        model=TransducerConfig(
            encoder=EncoderConfig(encoder_type=encoder_type, num_units=num_units,
                                  num_layers=1),
            num_classes=tok_units,
            pred_num_units=32, embedding_dim=16, joint_dim=32,
        ),
        frontend=FrontendConfig(add_deltas=False, use_energy=False),
        num_stack=3,
        num_skip=3,
    )


def _jbatch(ds):
    batch = next(ds.batches(0))
    return batch, {k: jnp.asarray(v) for k, v in batch.items() if k != "names"}


def test_forward_loss_finite_and_grads_flow():
    corpus = ToyCorpus(num_utts=4, vocab_size=5, min_units=2, max_units=4, seed=0)
    ds = Dataset(corpus.utterances, batch_size=4, num_wav_buckets=1, num_label_buckets=1)
    _, jbatch = _jbatch(ds)
    task = _task(corpus.tokenizer.num_units)
    params = init_params(jax.random.PRNGKey(0), task)
    (loss, aux), grads = jax.value_and_grad(
        lambda p: forward_loss(p, task, jbatch, train=True, rng=jax.random.PRNGKey(1)),
        has_aux=True,
    )(params)
    assert np.isfinite(float(loss)) and float(loss) > 0
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    for path, g in flat:
        assert np.all(np.isfinite(np.asarray(g))), path
    # every component must receive gradient (encoder, embed, pred, joint)
    norms = {jax.tree_util.keystr(p): float(jnp.abs(g).max()) for p, g in flat}
    for key in ("embed", "pred_proj", "enc_proj", "out"):
        assert any(key in k and v > 0 for k, v in norms.items()), (key, norms)


def test_greedy_decode_shapes_and_range():
    corpus = ToyCorpus(num_utts=4, vocab_size=5, min_units=2, max_units=4, seed=1)
    ds = Dataset(corpus.utterances, batch_size=4, num_wav_buckets=1, num_label_buckets=1)
    _, jbatch = _jbatch(ds)
    task = _task(corpus.tokenizer.num_units)
    params = init_params(jax.random.PRNGKey(0), task)
    from tensorflow_end2end_speech_recognition_tpu.train.ctc_task import device_pipeline

    feats, feat_len = device_pipeline(task, jbatch)
    out = encode(params, task.model, feats, feat_len)
    decoded, dec_len = transducer_greedy_decode(params, task.model, out.f_proj, out.enc_len)
    b, t = out.f_proj.shape[0], out.f_proj.shape[1]
    s = task.model.max_symbols_per_frame
    assert decoded.shape == (b, t * s)
    d = np.asarray(decoded)
    n = np.asarray(dec_len)
    for i in range(b):
        assert n[i] <= t * s
        assert np.all(d[i, : n[i]] >= 0) and np.all(d[i, : n[i]] < task.model.num_classes)
        assert np.all(d[i, n[i]:] == -1)


def test_prediction_net_step_equals_sequence():
    """Stepping the prediction net token-by-token with carried state must
    equal the full-sequence pass (the decode/streaming contract)."""
    cfg = TransducerConfig(
        encoder=EncoderConfig(encoder_type="lstm", num_units=8, num_layers=1),
        num_classes=6, pred_num_units=8, embedding_dim=4, joint_dim=8,
        pred_num_layers=2,
    )
    from tensorflow_end2end_speech_recognition_tpu.models.transducer import (
        init_transducer,
        pred_initial_states,
    )

    params = init_transducer(jax.random.PRNGKey(0), cfg, 13)
    tokens = jnp.asarray([[6, 1, 3, 0, 2], [6, 5, 5, 4, 6]], jnp.int32)
    g_full, _ = predict(params, cfg, tokens)
    states = pred_initial_states(cfg, 2)
    outs = []
    for u in range(tokens.shape[1]):
        g, states = predict(params, cfg, tokens[:, u : u + 1], initial_states=states)
        outs.append(g[:, 0])
    g_step = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(g_full), np.asarray(g_step),
                               rtol=1e-5, atol=1e-6)


def test_transducer_learns_toy_task():
    corpus = ToyCorpus(num_utts=12, vocab_size=6, min_units=2, max_units=4, seed=7)
    tok = corpus.tokenizer
    ds = Dataset(corpus.utterances, batch_size=12, num_wav_buckets=1, num_label_buckets=1)
    task = _task(tok.num_units)
    params = init_params(jax.random.PRNGKey(0), task)
    opt = build_optimizer("adam", clip_grad_norm=5.0)
    opt_state = opt.init(params)
    train_step = make_train_step(task, opt)
    eval_step = make_eval_step(task)

    batch, jbatch = _jbatch(ds)
    first_loss = None
    rng = jax.random.PRNGKey(1)
    # transducers align slower than CTC early on (the prediction net and
    # blank bias co-train): measured PER trajectory on this task is 0.97 @
    # 100 steps, 0.31 @ 200, 0.02 @ 300, 0.0 @ 400
    for step in range(300):
        rng, sub = jax.random.split(rng)
        params, opt_state, aux = train_step(params, opt_state, jbatch, 3e-3, sub)
        if first_loss is None:
            first_loss = float(aux["loss"])
    last_loss = float(aux["loss"])
    assert np.isfinite(last_loss)
    assert last_loss < 0.1 * first_loss, (first_loss, last_loss)

    decoded, dec_len, nll = eval_step(params, jbatch)
    assert np.all(np.isfinite(np.asarray(nll)))
    pers = []
    for i in range(len(batch["names"])):
        if batch["names"][i] is None:
            continue
        ref = [tok.units[j] for j in batch["labels"][i] if j >= 0]
        hyp = tok.decode(np.asarray(decoded[i][: int(dec_len[i])]))
        pers.append(compute_per(ref, hyp))
    assert np.mean(pers) < 0.35, pers


def test_fit_transducer_end_to_end(tmp_path):
    """model_type: transducer trains through the generic loop/eval harness."""
    from tensorflow_end2end_speech_recognition_tpu.train.loop import fit
    from tensorflow_end2end_speech_recognition_tpu.utils.config import ExperimentConfig

    exp = ExperimentConfig(
        model_type="transducer", label_type="phone61", encoder_type="lstm",
        num_units=16, num_layers=1, pred_num_units=16, joint_dim=16,
        embedding_dim=8, batch_size=8, num_epoch=2, toy_num_utts=24,
        toy_max_units=4, use_delta=False, use_energy=False,
    )
    summary = fit(exp, str(tmp_path / "m"), log_every=100, print_fn=lambda *a: None)
    assert np.isfinite(summary["train_loss"])
    assert summary["epochs"] == 2


def test_beam_eval_step_loss_matches_greedy_eval():
    """The beam eval's third output is the teacher-forced nll, same metric
    as the greedy eval step (truthful loss label across decode modes)."""
    from tensorflow_end2end_speech_recognition_tpu.train.transducer_task import (
        make_beam_eval_step,
    )

    corpus = ToyCorpus(num_utts=4, vocab_size=5, min_units=2, max_units=4, seed=4)
    ds = Dataset(corpus.utterances, batch_size=4, num_wav_buckets=1, num_label_buckets=1)
    _, jbatch = _jbatch(ds)
    task = _task(corpus.tokenizer.num_units)
    params = init_params(jax.random.PRNGKey(0), task)
    _, _, nll_g = make_eval_step(task)(params, jbatch)
    dec, dlen, nll_b = make_beam_eval_step(task, beam_width=4)(params, jbatch)
    np.testing.assert_allclose(np.asarray(nll_g), np.asarray(nll_b), rtol=1e-5)
    assert dec.shape[0] == 4 and dlen.shape == (4,)
