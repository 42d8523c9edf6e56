"""RNN-Transducer (RNN-T) loss: log-space lattice forward, TPU-first.

A beyond-the-reference extension (the reference stops at CTC / attention /
joint CTC-attention — SURVEY.md §2): the transducer is the natural
streaming E2E model, and this framework's streaming runtime (causal
encoders, carried per-row state) is exactly its habitat.

Graves 2012 recursion over the [T, U+1] lattice:

    alpha[0, 0] = 0
    alpha[t, u] = logaddexp(alpha[t-1, u] + lp_blank[t-1, u],
                            alpha[t, u-1] + lp_label[t, u-1])
    -log p(y|x) = -(alpha[T-1, U] + lp_blank[T-1, U])

TPU shape of the computation: the u-dependency inside one time row is a
first-order linear recurrence in the log semiring —
``x_u = logaddexp(a_u, m_u + x_{u-1})`` — which ``lax.associative_scan``
evaluates in O(log U) depth, fully vectorized over [B, U+1]. The outer
``lax.scan`` walks T only. No per-step gathers, no [B,T,U] alpha tensor:
the carry is one [B, U+1] row, rows past each utterance's ``t_len`` carry
through unchanged (the same ragged-batch idiom as ``ops/ctc.py``), and the
loss reads the final carry at ``u_len``.

The [B, T, U+1, V] joint-logits tensor is never materialized either:
``transducer_logprobs`` reduces each time slice to the two numbers the
lattice needs (blank / next-label log-prob) inside a checkpointed scan, so
peak memory is one [B, U+1, V] slice and the backward rematerializes it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG = -1e30  # finite -inf: keeps logaddexp gradients NaN-free (ops/ctc.py)


def _log_linear_recurrence(m, a):
    """x_u = logaddexp(a_u, m_u + x_{u-1}) with x_{-1} = -inf, along axis -1.

    Log-semiring linear recurrence via associative_scan: element (m, a)
    represents f(x) = logaddexp(a, m + x); composition (left-then-right)
    is (m_l + m_r, logaddexp(a_r, m_r + a_l)).
    """

    def combine(lhs, rhs):
        ml, al = lhs
        mr, ar = rhs
        return ml + mr, jnp.logaddexp(ar, mr + al)

    _, x = jax.lax.associative_scan(combine, (m, a), axis=-1)
    return x


def rnnt_loss_from_logprobs(lp_blank, lp_label, t_len, u_len):
    """Negative log-likelihood per row.

    lp_blank: [B, T, U+1] log P(blank | t, u)
    lp_label: [B, T, U+1] log P(y_{u+1} | t, u) (entries at u >= u_len are
        ignored; pass anything finite or ``-1e30``)
    t_len:    [B] valid encoder frames (>= 1)
    u_len:    [B] label lengths (0 <= u_len <= U)
    """
    b, t, u1 = lp_blank.shape
    u_idx = jnp.arange(u1)[None, :]
    valid_u = u_idx <= u_len[:, None]  # lattice rows above u_len unreachable
    emit_ok = u_idx < u_len[:, None]  # can only emit the u_len real labels
    lp_label = jnp.where(emit_ok[:, None, :], lp_label, _NEG)

    # t = 0 row: pure emission chain = shifted cumsum of lp_label[:, 0]
    row0 = jnp.concatenate(
        [jnp.zeros((b, 1), lp_blank.dtype),
         jnp.cumsum(lp_label[:, 0, :-1], axis=-1)],
        axis=-1,
    )
    alpha0 = jnp.where(valid_u, jnp.maximum(row0, _NEG), _NEG)

    # time-major slices for the scan over t = 1..T-1
    xs = (
        jnp.swapaxes(lp_blank[:, :-1, :], 0, 1),  # lp_blank[t-1]
        jnp.swapaxes(lp_label[:, 1:, :], 0, 1),  # lp_label[t]
        (jnp.arange(1, t)[:, None] < t_len[None, :]),  # row t still valid
    )

    def step(alpha_prev, inp):
        lpb_tm1, lpl_t, t_ok = inp
        arrive_blank = alpha_prev + lpb_tm1  # horizontal transition
        m = jnp.concatenate(  # m_u = lp_label[t, u-1]; u=0 has no emitter
            [jnp.full((b, 1), _NEG, lpl_t.dtype), lpl_t[:, :-1]], axis=-1
        )
        alpha_t = _log_linear_recurrence(m, jnp.maximum(arrive_blank, _NEG))
        alpha_t = jnp.where(valid_u, alpha_t, _NEG)
        alpha = jnp.where(t_ok[:, None], alpha_t, alpha_prev)
        return alpha, None

    alpha_fin, _ = jax.lax.scan(jax.checkpoint(step), alpha0, xs)

    # terminal blank at (t_len-1, u_len)
    t_last = jnp.clip(t_len - 1, 0, t - 1)
    lpb_last = jnp.take_along_axis(
        lp_blank, t_last[:, None, None], axis=1
    )[:, 0]  # [B, U+1]
    total = jnp.take_along_axis(alpha_fin + lpb_last, u_len[:, None], axis=1)[:, 0]
    return -jnp.maximum(total, _NEG)


def transducer_logprobs(
    f_enc,  # [B, T, J] encoder contribution (already projected to joint dim)
    g_pred,  # [B, U+1, J] prediction-network contribution (projected)
    w_out,  # [J, V+1] joint output weights (blank last, CTC convention)
    b_out,  # [V+1]
    labels,  # [B, U] int32 (-1 padded)
    blank_id: int,
):
    """Per-lattice-node blank/label log-probs without the [B,T,U,V] tensor.

    The joint is the standard additive form ``tanh(f_t + g_u) @ w_out``;
    a scan over T keeps one [B, U+1, V] slice live, reduces it to the two
    channels the loss needs, and ``jax.checkpoint`` rematerializes in the
    backward instead of saving T slices.
    """
    labels_safe = jnp.where(labels >= 0, labels, 0)
    # label index for each lattice row u (u = U reads a dummy; masked in loss)
    lab_u = jnp.pad(labels_safe, ((0, 0), (0, 1)))  # [B, U+1]

    def one_t(_, f_t):
        z = jnp.tanh(f_t[:, None, :] + g_pred)  # [B, U+1, J]
        logits = (
            jnp.matmul(z, w_out, preferred_element_type=jnp.float32) + b_out
        )  # [B, U+1, V+1]
        lse = jax.scipy.special.logsumexp(logits, axis=-1)
        lp_b = logits[..., blank_id] - lse
        lp_l = (
            jnp.take_along_axis(logits, lab_u[..., None], axis=-1)[..., 0] - lse
        )
        return None, (lp_b, lp_l)

    _, (lp_blank, lp_label) = jax.lax.scan(
        jax.checkpoint(one_t), None, jnp.swapaxes(f_enc, 0, 1)
    )
    return jnp.swapaxes(lp_blank, 0, 1), jnp.swapaxes(lp_label, 0, 1)


def rnnt_loss(f_enc, g_pred, w_out, b_out, labels, t_len, u_len, blank_id):
    """Full RNN-T nll [B] from projected encoder/prediction activations."""
    lp_blank, lp_label = transducer_logprobs(
        f_enc, g_pred, w_out, b_out, labels, blank_id
    )
    return rnnt_loss_from_logprobs(lp_blank, lp_label, t_len, u_len)
