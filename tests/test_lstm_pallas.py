"""Pallas LSTM layer kernel vs the lax.scan reference path (values + grads)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tensorflow_end2end_speech_recognition_tpu.models.rnn import (
    RNNSpec,
    bidirectional_scan,
    init_bidirectional,
    init_rnn_params,
    rnn_scan,
)


def _data(b=4, t=7, d=5, h=8, seed=0):
    rng = np.random.RandomState(seed)
    xs = jnp.asarray(rng.randn(b, t, d).astype(np.float32))
    lengths = jnp.asarray([t, t - 2, 3, 1][:b])
    spec_scan = RNNSpec(cell="lstm", num_units=h, impl="scan")
    spec_pl = RNNSpec(cell="lstm", num_units=h, impl="pallas")
    params = init_rnn_params(jax.random.PRNGKey(seed), spec_scan, d)
    return xs, lengths, spec_scan, spec_pl, params


def test_forward_matches_scan():
    xs, lengths, spec_scan, spec_pl, params = _data()
    ys_ref, (h_ref, c_ref) = rnn_scan(params, spec_scan, xs, lengths)
    ys_pl, (h_pl, _) = rnn_scan(params, spec_pl, xs, lengths)
    np.testing.assert_allclose(np.asarray(ys_pl), np.asarray(ys_ref), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_pl), np.asarray(h_ref), rtol=1e-5, atol=1e-5)


def test_forward_matches_scan_reverse():
    xs, lengths, spec_scan, spec_pl, params = _data(seed=1)
    ys_ref, _ = rnn_scan(params, spec_scan, xs, lengths, reverse=True)
    ys_pl, _ = rnn_scan(params, spec_pl, xs, lengths, reverse=True)
    np.testing.assert_allclose(np.asarray(ys_pl), np.asarray(ys_ref), rtol=1e-5, atol=1e-5)


def test_gradients_match_scan():
    xs, lengths, spec_scan, spec_pl, params = _data(seed=2)

    def loss(params, xs, spec):
        ys, _ = rnn_scan(params, spec, xs, lengths)
        # position-weighted sum so every timestep gets a distinct cotangent
        w = jnp.arange(ys.size, dtype=jnp.float32).reshape(ys.shape) / ys.size
        return jnp.sum(ys * w)

    g_ref = jax.grad(loss, argnums=(0, 1))(params, xs, spec_scan)
    g_pl = jax.grad(loss, argnums=(0, 1))(params, xs, spec_pl)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pl)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5)


def test_bidirectional_matches_scan():
    b, t, d, h = 3, 6, 4, 8
    rng = np.random.RandomState(3)
    xs = jnp.asarray(rng.randn(b, t, d).astype(np.float32))
    lengths = jnp.asarray([t, 4, 2])
    spec_scan = RNNSpec(cell="lstm", num_units=h, impl="scan")
    spec_pl = RNNSpec(cell="lstm", num_units=h, impl="pallas")
    params = init_bidirectional(jax.random.PRNGKey(4), spec_scan, d)
    y_ref = bidirectional_scan(params, spec_scan, xs, lengths)
    y_pl = bidirectional_scan(params, spec_pl, xs, lengths)
    np.testing.assert_allclose(np.asarray(y_pl), np.asarray(y_ref), rtol=1e-5, atol=1e-5)


def test_auto_falls_back_when_ineligible():
    # peephole / projection / clip variants must use the scan path
    assert not RNNSpec(cell="lstm", num_units=8, use_peephole=True).pallas_eligible
    assert not RNNSpec(cell="lstm", num_units=8, num_proj=4).pallas_eligible
    assert not RNNSpec(cell="lstm", num_units=8, clip_activation=5.0).pallas_eligible
    assert not RNNSpec(cell="gru", num_units=8).pallas_eligible
    assert RNNSpec(cell="lstm", num_units=8).pallas_eligible


def test_block_scaling_and_vmem_fit_guard():
    from tensorflow_end2end_speech_recognition_tpu.ops.pallas.lstm_kernel import (
        _scale_kt,
        pallas_fits,
    )

    # tuned anchor (B=32, H=512) keeps the tuned block size
    assert _scale_kt(8, 400, 32, 512) == 8
    assert _scale_kt(4, 400, 32, 512) == 4
    # bigger batches shrink the block to hold the VMEM footprint constant
    assert _scale_kt(4, 400, 64, 512) == 2
    assert _scale_kt(4, 400, 128, 512) == 1
    # never below one step, never above the sequence length
    assert _scale_kt(8, 2, 32, 512) == 2
    assert _scale_kt(4, 400, 1024, 512) == 1
    # smaller widths don't grow past the tuned value
    assert _scale_kt(8, 400, 32, 64) == 8

    assert pallas_fits(32, 512) and pallas_fits(128, 512) and pallas_fits(256, 256)
    assert not pallas_fits(256, 512)  # kt=1 still busts scoped VMEM
    assert not pallas_fits(32, 1024)  # [H,4H] weights alone too big
    # sequence-length cap: multi-layer programs combining kernels past the
    # boundary crash the remote compiler/worker; 400 is the only value that
    # has held across rounds 4-5 (see pallas_fits docstring)
    assert pallas_fits(32, 512, t=400)
    assert not pallas_fits(32, 512, t=401)
    assert not pallas_fits(32, 512, t=512)
    assert not pallas_fits(32, 512, t=1198)


def test_bf16_streams_match_f32(
):
    """compute_dtype='bfloat16' Pallas path: bf16 HBM streams, f32 gate math.

    The carried recurrence stays full f32 in VMEM — only the xproj input,
    ys/cs residuals, and dxproj cotangent streams round to bf16 — so values
    and grads track the f32 scan reference within bf16 rounding tolerance.
    """
    b, t, d, h = 3, 9, 4, 8
    rng = np.random.RandomState(7)
    xs = jnp.asarray(rng.randn(b, t, d).astype(np.float32))
    lengths = jnp.asarray([t, 5, 2])
    spec_ref = RNNSpec(cell="lstm", num_units=h, impl="scan")
    spec_bf = RNNSpec(cell="lstm", num_units=h, impl="pallas",
                      compute_dtype="bfloat16")
    assert spec_bf.pallas_eligible  # round-5: bf16 is Pallas-eligible now
    params = init_bidirectional(jax.random.PRNGKey(8), spec_ref, d)

    def loss(params, xs, spec):
        ys = bidirectional_scan(params, spec, xs, lengths)
        w = jnp.arange(ys.size, dtype=jnp.float32).reshape(ys.shape) / ys.size
        return jnp.sum(ys.astype(jnp.float32) * w)

    y_ref = bidirectional_scan(params, spec_ref, xs, lengths)
    y_bf = bidirectional_scan(params, spec_bf, xs, lengths)
    assert y_bf.dtype == jnp.bfloat16  # streams (and output) are bf16
    np.testing.assert_allclose(
        np.asarray(y_bf, dtype=np.float32), np.asarray(y_ref),
        rtol=2e-2, atol=2e-2,
    )
    g_ref = jax.grad(loss, argnums=(0, 1))(params, xs, spec_ref)
    g_bf = jax.grad(loss, argnums=(0, 1))(params, xs, spec_bf)
    for a, bb in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_bf)):
        np.testing.assert_allclose(
            np.asarray(bb, dtype=np.float32), np.asarray(a, dtype=np.float32),
            rtol=5e-2, atol=3e-2,
        )


def test_bf16_streams_match_f32_unidirectional():
    b, t, d, h = 3, 8, 4, 8
    rng = np.random.RandomState(9)
    xs = jnp.asarray(rng.randn(b, t, d).astype(np.float32))
    lengths = jnp.asarray([t, 6, 3])
    spec_ref = RNNSpec(cell="lstm", num_units=h, impl="scan")
    spec_bf = RNNSpec(cell="lstm", num_units=h, impl="pallas",
                      compute_dtype="bfloat16")
    params = init_rnn_params(jax.random.PRNGKey(10), spec_ref, d)
    ys_ref, (h_ref, _) = rnn_scan(params, spec_ref, xs, lengths)
    ys_bf, (h_bf, _) = rnn_scan(params, spec_bf, xs, lengths)
    assert ys_bf.dtype == jnp.bfloat16 and h_bf.dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(ys_bf, dtype=np.float32), np.asarray(ys_ref),
        rtol=2e-2, atol=2e-2,
    )
    np.testing.assert_allclose(
        np.asarray(h_bf), np.asarray(h_ref), rtol=2e-2, atol=2e-2,
    )
