"""Pallas CTC kernel vs the scan implementation (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from tensorflow_end2end_speech_recognition_tpu.ops.ctc import ctc_loss
from tensorflow_end2end_speech_recognition_tpu.ops.pallas.ctc_kernel import (
    _ctc_fwd_impl,
    ctc_loss_pallas,
)


def _case(b=3, t=16, u=5, c=7, seed=0):
    rng = np.random.RandomState(seed)
    logits = jnp.asarray(rng.randn(b, t, c).astype(np.float32) * 2)
    logit_len = jnp.asarray(([t, t - 4, t - 9] * b)[:b])
    labels = np.full((b, u), -1, np.int32)
    label_len = np.asarray(([u, u - 2, 1] * b)[:b])
    for i in range(b):
        labels[i, : label_len[i]] = rng.randint(0, c - 1, label_len[i])
    return logits, logit_len, jnp.asarray(labels), jnp.asarray(label_len), c - 1


def test_pallas_loss_matches_scan_interpret():
    logits, logit_len, labels, label_len, blank = _case()
    loss_p, grad_p = _ctc_fwd_impl(logits, logit_len, labels, label_len, blank, interpret=True)
    loss_s = ctc_loss(logits, logit_len, labels, label_len, blank, impl="scan")
    np.testing.assert_allclose(np.asarray(loss_p), np.asarray(loss_s), rtol=1e-4, atol=1e-4)


def test_pallas_grad_matches_scan_interpret():
    logits, logit_len, labels, label_len, blank = _case(seed=3)
    _, grad_p = _ctc_fwd_impl(logits, logit_len, labels, label_len, blank, interpret=True)
    grad_s = jax.grad(
        lambda l: ctc_loss(l, logit_len, labels, label_len, blank, "scan").sum()
    )(logits)
    np.testing.assert_allclose(np.asarray(grad_p), np.asarray(grad_s), atol=2e-3)


def test_pallas_repeated_labels_interpret():
    c, blank = 5, 4
    rng = np.random.RandomState(1)
    logits = jnp.asarray(rng.randn(1, 12, c).astype(np.float32))
    labels = jnp.asarray([[2, 2, 1, 1]])
    lens = jnp.asarray([12])
    llen = jnp.asarray([4])
    loss_p, _ = _ctc_fwd_impl(logits, lens, labels, llen, blank, interpret=True)
    loss_s = ctc_loss(logits, lens, labels, llen, blank, "scan")
    np.testing.assert_allclose(np.asarray(loss_p), np.asarray(loss_s), rtol=1e-4)


def test_pallas_ctc_vmem_fit_guard():
    from tensorflow_end2end_speech_recognition_tpu.ops.ctc import pallas_ctc_fits

    # flagship shapes comfortably fit; hard-corpus TIMIT T~500 routes to
    # scan (T=502 crashed the worker right after the round-5 preflight
    # passed 512 — the cap is back at the only boundary that has held, 400)
    assert pallas_ctc_fits(400, 29, 40)
    assert not pallas_ctc_fits(500, 29, 48)
    assert not pallas_ctc_fits(513, 29, 48)
    assert not pallas_ctc_fits(1000, 29, 200)
    # CSJ-kanji-scale vocab at long T overflows -> scan fallback
    assert not pallas_ctc_fits(1000, 3000, 100)
    # very long unstacked utterance with a long transcript
    assert not pallas_ctc_fits(3000, 29, 400)


def test_pallas_fwd_only_matches_scan_interpret():
    from tensorflow_end2end_speech_recognition_tpu.ops.pallas.ctc_kernel import (
        ctc_loss_pallas_fwd_only,
    )

    for seed in (0, 3):
        logits, logit_len, labels, label_len, blank = _case(seed=seed)
        loss_f = ctc_loss_pallas_fwd_only(
            logits, logit_len, labels, label_len, blank, interpret=True
        )
        loss_s = ctc_loss(logits, logit_len, labels, label_len, blank, impl="scan")
        np.testing.assert_allclose(np.asarray(loss_f), np.asarray(loss_s), rtol=1e-4, atol=1e-4)


def test_pallas_fwd_only_repeated_labels_interpret():
    from tensorflow_end2end_speech_recognition_tpu.ops.pallas.ctc_kernel import (
        ctc_loss_pallas_fwd_only,
    )

    c, blank = 5, 4
    rng = np.random.RandomState(1)
    logits = jnp.asarray(rng.randn(1, 12, c).astype(np.float32))
    labels = jnp.asarray([[2, 2, 1, 1]])
    loss_f = ctc_loss_pallas_fwd_only(
        logits, jnp.asarray([12]), labels, jnp.asarray([4]), blank, interpret=True
    )
    loss_s = ctc_loss(logits, jnp.asarray([12]), labels, jnp.asarray([4]), blank, "scan")
    np.testing.assert_allclose(np.asarray(loss_f), np.asarray(loss_s), rtol=1e-4)


def test_pallas_fwd_fits_admits_more_than_fused():
    from tensorflow_end2end_speech_recognition_tpu.ops.ctc import (
        pallas_ctc_fits,
        pallas_ctc_fwd_fits,
    )

    assert pallas_ctc_fwd_fits(400, 29, 40)
    # the fused kernel obeys the train-composition boundary (400); the
    # fwd-only kernel has its own cap (2400, probed separately each round
    # per ADVICE r4 — round-5 preflight ladder green through 2400)
    assert not pallas_ctc_fits(2400, 29, 250)
    assert pallas_ctc_fwd_fits(2400, 29, 250)
    assert not pallas_ctc_fwd_fits(2401, 29, 250)
    assert not pallas_ctc_fwd_fits(1000, 3000, 300)


def test_need_grad_false_scan_path_equals_default():
    # need_grad only changes the impl routing, never the value
    logits, logit_len, labels, label_len, blank = _case(seed=7)
    a = ctc_loss(logits, logit_len, labels, label_len, blank, impl="scan")
    b = ctc_loss(logits, logit_len, labels, label_len, blank, impl="scan", need_grad=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
