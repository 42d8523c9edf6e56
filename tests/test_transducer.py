"""RNN-T loss: oracle equality, path enumeration, gradients, logprob fusion."""

import jax
import jax.numpy as jnp
import numpy as np

from tensorflow_end2end_speech_recognition_tpu.ops.transducer import (
    rnnt_loss_from_logprobs,
    transducer_logprobs,
)


def _oracle(lp_blank, lp_label, t_len, u_len):
    """Reference DP in float64 numpy with explicit loops."""
    bsz = lp_blank.shape[0]
    out = []
    for b in range(bsz):
        tb, ub = int(t_len[b]), int(u_len[b])
        alpha = np.full((tb, ub + 1), -np.inf)
        alpha[0, 0] = 0.0
        for t in range(tb):
            for u in range(ub + 1):
                if t == 0 and u == 0:
                    continue
                cands = []
                if t > 0:
                    cands.append(alpha[t - 1, u] + lp_blank[b, t - 1, u])
                if u > 0:
                    cands.append(alpha[t, u - 1] + lp_label[b, t, u - 1])
                alpha[t, u] = np.logaddexp.reduce(cands)
        out.append(-(alpha[tb - 1, ub] + lp_blank[b, tb - 1, ub]))
    return np.asarray(out)


def _random_logprobs(rng, b, t, u1):
    """Normalized-ish blank/label log-prob pair (values don't need to sum
    to 1 for the DP equality tests)."""
    lp_blank = np.log(rng.uniform(0.05, 0.9, (b, t, u1))).astype(np.float32)
    lp_label = np.log(rng.uniform(0.05, 0.9, (b, t, u1))).astype(np.float32)
    return lp_blank, lp_label


def test_loss_matches_dp_oracle_ragged():
    rng = np.random.RandomState(0)
    b, t, u1 = 5, 7, 5
    lp_blank, lp_label = _random_logprobs(rng, b, t, u1)
    t_len = np.asarray([7, 5, 1, 3, 7], np.int32)
    u_len = np.asarray([4, 2, 0, 4, 1], np.int32)
    got = np.asarray(
        rnnt_loss_from_logprobs(
            jnp.asarray(lp_blank), jnp.asarray(lp_label),
            jnp.asarray(t_len), jnp.asarray(u_len),
        )
    )
    want = _oracle(lp_blank, lp_label, t_len, u_len)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_loss_matches_exhaustive_path_enumeration():
    """Sum over every monotone lattice path must equal exp(-loss)."""
    from itertools import combinations_with_replacement

    rng = np.random.RandomState(1)
    b, t, u = 1, 4, 2
    lp_blank, lp_label = _random_logprobs(rng, b, t, u + 1)
    # a path = interleaving of (t-1) horizontal blanks before the final
    # frame... enumerate by choosing at which time index each of the u
    # emissions happens (emissions at time ti, nondecreasing): a path visits
    # (t,u) cells; prob = prod lp_label[t_i, i] * prod lp_blank at the
    # horizontal moves * final blank. Horizontal moves happen at each time
    # step t -> t+1 from the u reached at that point.
    total = 0.0
    for emit_times in combinations_with_replacement(range(t), u):
        p = 0.0
        for i, ti in enumerate(emit_times):
            p += lp_label[0, ti, i]
        # u(t) = number of emissions at times < =... horizontal move t->t+1
        # occurs at label count u_t = #{i: emit_times[i] <= t}
        for tt in range(t - 1):
            u_tt = sum(1 for x in emit_times if x <= tt)
            p += lp_blank[0, tt, u_tt]
        p += lp_blank[0, t - 1, u]  # terminal blank
        total += np.exp(p)
    loss = float(
        rnnt_loss_from_logprobs(
            jnp.asarray(lp_blank), jnp.asarray(lp_label),
            jnp.asarray([t], np.int32), jnp.asarray([u], np.int32),
        )[0]
    )
    np.testing.assert_allclose(np.exp(-loss), total, rtol=1e-5)


def test_loss_zero_labels_is_blank_chain():
    rng = np.random.RandomState(2)
    lp_blank, lp_label = _random_logprobs(rng, 1, 5, 3)
    loss = float(
        rnnt_loss_from_logprobs(
            jnp.asarray(lp_blank), jnp.asarray(lp_label),
            jnp.asarray([5], np.int32), jnp.asarray([0], np.int32),
        )[0]
    )
    want = -lp_blank[0, :, 0].sum()
    np.testing.assert_allclose(loss, want, rtol=1e-5)


def test_loss_gradients_match_finite_differences():
    rng = np.random.RandomState(3)
    b, t, u1 = 2, 5, 4
    lp_blank, lp_label = _random_logprobs(rng, b, t, u1)
    t_len = jnp.asarray([5, 3], np.int32)
    u_len = jnp.asarray([3, 2], np.int32)

    def f(lpb, lpl):
        return jnp.sum(rnnt_loss_from_logprobs(lpb, lpl, t_len, u_len))

    g_b, g_l = jax.grad(f, argnums=(0, 1))(
        jnp.asarray(lp_blank), jnp.asarray(lp_label)
    )
    assert np.all(np.isfinite(np.asarray(g_b)))
    assert np.all(np.isfinite(np.asarray(g_l)))
    eps = 1e-3
    for (bi, ti, ui) in [(0, 1, 1), (1, 0, 0), (0, 4, 3)]:
        for which, g in (("blank", g_b), ("label", g_l)):
            lpb, lpl = lp_blank.copy(), lp_label.copy()
            tgt = lpb if which == "blank" else lpl
            tgt[bi, ti, ui] += eps
            up = float(f(jnp.asarray(lpb), jnp.asarray(lpl)))
            tgt[bi, ti, ui] -= 2 * eps
            dn = float(f(jnp.asarray(lpb), jnp.asarray(lpl)))
            fd = (up - dn) / (2 * eps)
            np.testing.assert_allclose(
                float(g[bi, ti, ui]), fd, rtol=5e-3, atol=5e-4,
            )
    # grads in the invalid region (t >= t_len for row 1) are zero
    np.testing.assert_allclose(np.asarray(g_b)[1, 3:], 0.0, atol=1e-8)


def test_transducer_logprobs_match_dense_joint():
    rng = np.random.RandomState(4)
    b, t, u1, j, v1 = 2, 6, 4, 8, 5
    f_enc = jnp.asarray(rng.randn(b, t, j).astype(np.float32))
    g_pred = jnp.asarray(rng.randn(b, u1, j).astype(np.float32))
    w = jnp.asarray(rng.randn(j, v1).astype(np.float32) * 0.3)
    bias = jnp.asarray(rng.randn(v1).astype(np.float32) * 0.1)
    labels = jnp.asarray(rng.randint(0, v1 - 1, (b, u1 - 1)).astype(np.int32))
    blank = v1 - 1

    lp_b, lp_l = transducer_logprobs(f_enc, g_pred, w, bias, labels, blank)

    # dense reference: materialize the full joint
    z = jnp.tanh(f_enc[:, :, None, :] + g_pred[:, None, :, :])
    logits = jnp.einsum("btuj,jv->btuv", z, w) + bias
    logp = jax.nn.log_softmax(logits, axis=-1)
    np.testing.assert_allclose(
        np.asarray(lp_b), np.asarray(logp[..., blank]), rtol=1e-4, atol=1e-5
    )
    lab_u = jnp.pad(labels, ((0, 0), (0, 1)))
    want_l = jnp.take_along_axis(
        logp, lab_u[:, None, :, None].repeat(t, 1), axis=-1
    )[..., 0]
    np.testing.assert_allclose(
        np.asarray(lp_l), np.asarray(want_l), rtol=1e-4, atol=1e-5
    )
