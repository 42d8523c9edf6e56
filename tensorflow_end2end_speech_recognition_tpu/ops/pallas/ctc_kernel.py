"""Pallas TPU kernel: fused CTC forward-backward (loss + gradient).

This is the TPU-native replacement for the reference's C++
``CTCLossCalculator`` (``tf.nn.ctc_loss``, CPU-only in TF1 — SURVEY.md §2.8),
named explicitly by BASELINE.json's north star. One kernel instance per
utterance (grid over B) computes, entirely in VMEM:

1. log-softmax over the logits row ``[T, C]``;
2. ``LPZ = lp @ onehot(z)`` — ONE MXU matmul replaces the per-step label
   gather of the lattice recursion (``z`` is the blank-interleaved label
   row, ``S = 2U+1`` lanes);
3. forward pass: ``alpha[t] = lse3(alpha[t-1], shift1, shift2+skip) +
   LPZ[t]`` — a lane-shifted log-sum-exp per step, VPU work only;
4. backward pass fused with the gradient: running ``beta`` row plus
   ``gamma[t] = alpha[t] + beta[t] - LPZ[t] - logp_total`` written in place
   over the alpha buffer;
5. ``grad = y - exp(gamma) @ onehot(z)^T`` — the second MXU matmul scatters
   lattice posteriors back to classes; pad frames masked to zero.

Ragged lengths are handled by predication (``logit_len``/``label_len`` ride
the scalar-prefetch path), so one compiled program serves a whole bucket.
The public entry ``ctc_loss_pallas`` is a ``jax.custom_vjp`` whose backward
is just a scale of the kernel-produced gradient — the lattice is never
re-materialized and autodiff never unrolls the scan.

Numerics match ``ops.ctc.ctc_loss(impl='scan')`` (same log-space recursion);
tests compare loss and grads against it and optax.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _lse3(a, b, c):
    m = jnp.maximum(jnp.maximum(a, b), c)
    m_safe = jnp.maximum(m, _NEG)
    out = m_safe + jnp.log(
        jnp.exp(a - m_safe) + jnp.exp(b - m_safe) + jnp.exp(c - m_safe)
    )
    return jnp.maximum(out, _NEG)


def _shift_lanes(row, n):
    """Shift a [1, S] row right by n lanes, filling with -inf."""
    fill = jnp.full((1, n), _NEG, row.dtype)
    return jnp.concatenate([fill, row[:, :-n]], axis=-1)


def _ctc_kernel(
    # scalar prefetch
    logit_len_ref,  # [B] int32
    label_len_ref,  # [B] int32
    # inputs (blocked per program)
    logits_ref,  # [1, T, C]
    z_ref,  # [1, 1, S]
    skip_ref,  # [1, 1, S] additive mask: 0 where s-2 skip allowed else -inf
    # outputs
    loss_ref,  # [1, 1, 1]
    grad_ref,  # [1, T, C]
    # scratch
    alpha_ref,  # [T, S] f32
    onehot_ref,  # [S, C] f32
    lpz_ref,  # [T, S] f32
    lp_ref,  # [T, C] f32
    beta_ref,  # [1, S]
):
    i = pl.program_id(0)
    t_len = logit_len_ref[i]
    u_len = label_len_ref[i]
    T = logits_ref.shape[1]
    C = logits_ref.shape[2]
    S = z_ref.shape[2]

    # ---- log softmax (masked lanes beyond real C were pre-filled with -inf)
    logits = logits_ref[0]  # [T, C]
    row_max = jnp.max(logits, axis=-1, keepdims=True)
    shifted = logits - row_max
    lp = shifted - jnp.log(jnp.sum(jnp.exp(shifted), axis=-1, keepdims=True))
    lp_ref[:] = lp

    # ---- one-hot(z): [S, C] and LPZ = lp @ onehot^T  -> [T, S]
    z_row = z_ref[0, 0]  # [S]
    class_ids = jax.lax.broadcasted_iota(jnp.int32, (S, C), 1)
    onehot = (z_row[:, None] == class_ids).astype(jnp.float32)  # [S, C]
    onehot_ref[:] = onehot
    lpz_ref[:] = jax.lax.dot_general(
        lp, onehot,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [T, S]

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)

    # ---- forward alpha
    # alpha_0: lane 0 = lp(blank at t0) = lpz[0,0]; lane 1 = lpz[0,1] if U>0
    lpz0 = lpz_ref[0][None, :]  # [1, S]
    init_mask = (lane == 0) | ((lane == 1) & (u_len > 0))
    alpha_ref[0, :] = jnp.where(init_mask, lpz0, _NEG)[0]
    skip_add = skip_ref[0]  # [1, S]

    def fwd_body(t, _):
        prev = alpha_ref[t - 1, :][None, :]
        stay = prev
        diag = _shift_lanes(prev, 1)
        skip = _shift_lanes(prev, 2) + skip_add
        new = _lse3(stay, diag, skip) + lpz_ref[t, :][None, :]
        new = jnp.maximum(new, _NEG)
        # frames past logit_len: copy previous row (keeps final read simple)
        new = jnp.where(t < t_len, new, prev)
        alpha_ref[t, :] = new[0]
        return 0

    jax.lax.fori_loop(1, T, fwd_body, 0)

    # ---- loss: -lse(alpha[last, 2U], alpha[last, 2U-1])
    last = alpha_ref[T - 1, :][None, :]
    end_blank_lane = 2 * u_len
    end_label_lane = jnp.maximum(2 * u_len - 1, 0)
    end_mask = (lane == end_blank_lane) | ((lane == end_label_lane) & (u_len > 0))
    ends = jnp.where(end_mask, last, _NEG)
    m = jnp.max(ends)
    logp_total = m + jnp.log(jnp.sum(jnp.exp(ends - m)))
    loss_ref[0] = jnp.broadcast_to(-logp_total, (1, 1))

    # ---- backward beta fused with gamma (written over alpha buffer)
    # emission at the LAST REAL frame (t_len-1), not the padded T-1
    last_lpz = lpz_ref[jnp.maximum(t_len - 1, 0), :][None, :]
    beta_init = jnp.where(end_mask, last_lpz, _NEG)
    beta_ref[:] = beta_init

    def bwd_body(k, _):
        t = T - 1 - k
        is_real = t < t_len  # row participates in the lattice

        @pl.when(is_real)
        def _():
            beta = beta_ref[:]  # [1, S], includes emission at t
            # gamma[t] = alpha[t] + beta[t] - lpz[t] - logp_total
            gamma = alpha_ref[t, :][None, :] + beta - lpz_ref[t, :][None, :] - logp_total
            alpha_ref[t, :] = jnp.maximum(gamma, _NEG)[0]

            @pl.when(t > 0)
            def _():
                # beta[t-1, s] = lse(beta[t,s], beta[t,s+1], beta[t,s+2]*skip(s+2)) + lpz[t-1, s]
                stay = beta
                diag = jnp.concatenate([beta[:, 1:], jnp.full((1, 1), _NEG)], axis=-1)
                skip_shift = jnp.concatenate([beta[:, 2:], jnp.full((1, 2), _NEG)], axis=-1)
                skip_allowed = jnp.concatenate(
                    [skip_add[:, 2:], jnp.full((1, 2), _NEG)], axis=-1
                )
                new = _lse3(stay, diag, skip_shift + skip_allowed) + lpz_ref[t - 1, :][None, :]
                beta_ref[:] = jnp.maximum(new, _NEG)

        @pl.when(jnp.logical_not(is_real))
        def _():
            # pad frame: gamma row is dead
            alpha_ref[t, :] = jnp.full((S,), _NEG)

        return 0

    jax.lax.fori_loop(0, T, bwd_body, 0)

    # ---- grad = y - exp(gamma) @ onehot   (pad frames -> 0)
    gamma_p = jnp.exp(jnp.minimum(alpha_ref[:], 40.0))  # [T, S] probabilities
    contrib = jax.lax.dot_general(
        gamma_p, onehot_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [T, C]
    y = jnp.exp(lp_ref[:])
    t_ids = jax.lax.broadcasted_iota(jnp.int32, (T, C), 0)
    grad = jnp.where(t_ids < t_len, y - contrib, 0.0)
    grad_ref[0] = grad


def _prepare(labels, label_len, blank_id, s_pad):
    """Blank-interleaved labels z [B, S_pad] + additive skip mask [B, S_pad]."""
    b, u = labels.shape
    z = jnp.full((b, s_pad), blank_id, jnp.int32)
    safe = jnp.where(labels >= 0, labels, blank_id).astype(jnp.int32)
    z = z.at[:, 1 : 2 * u + 1 : 2].set(safe)
    prev2 = jnp.pad(z[:, :-2], ((0, 0), (2, 0)), constant_values=blank_id)
    lane = jnp.arange(s_pad)[None, :]
    is_label = (lane % 2 == 1) & (lane < 2 * label_len[:, None])
    can_skip = is_label & (z != prev2)
    skip_add = jnp.where(can_skip, 0.0, _NEG).astype(jnp.float32)
    return z, skip_add


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def ctc_loss_pallas(logits, logit_len, labels, label_len, blank_id):
    loss, _ = _ctc_fwd_impl(logits, logit_len, labels, label_len, blank_id)
    return loss


def _ctc_fwd_impl(logits, logit_len, labels, label_len, blank_id, interpret=False):
    b, t, c = logits.shape
    u = labels.shape[1]
    c_pad = _round_up(c, 128)
    s_pad = _round_up(2 * u + 1, 128)
    if c_pad != c:
        logits = jnp.pad(logits, ((0, 0), (0, 0), (0, c_pad - c)), constant_values=_NEG)
    z, skip_add = _prepare(labels, label_len, blank_id, s_pad)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, t, c_pad), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s_pad), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s_pad), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 1), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, c_pad), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((t, s_pad), jnp.float32),  # alpha / gamma
            pltpu.VMEM((s_pad, c_pad), jnp.float32),  # onehot
            pltpu.VMEM((t, s_pad), jnp.float32),  # lpz
            pltpu.VMEM((t, c_pad), jnp.float32),  # lp
            pltpu.VMEM((1, s_pad), jnp.float32),  # beta row
        ],
    )
    loss, grad = pl.pallas_call(
        _ctc_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, t, c_pad), jnp.float32),
        ],
        interpret=interpret,
    )(
        logit_len.astype(jnp.int32),
        label_len.astype(jnp.int32),
        logits.astype(jnp.float32),
        z[:, None, :],
        skip_add[:, None, :],
    )
    return loss[:, 0, 0], grad[:, :, :c]


def _ctc_vjp_fwd(logits, logit_len, labels, label_len, blank_id):
    loss, grad = _ctc_fwd_impl(logits, logit_len, labels, label_len, blank_id)
    return loss, (grad,)


def _ctc_vjp_bwd(blank_id, res, g):
    (grad,) = res
    return (g[:, None, None] * grad, None, None, None)


ctc_loss_pallas.defvjp(_ctc_vjp_fwd, _ctc_vjp_bwd)


# ---------------------------------------------------------------------------
# Forward-only variant: alpha recursion + loss, NO beta/gradient pass.
#
# Eval/decode paths (greedy/beam eval nll, joint CTC rescoring) never use the
# gradient, but the fused kernel above always pays for it — the reference's
# tf.nn.ctc_loss likewise skipped the grad outside training (SURVEY.md §2.8).
# Dropping the backward halves the lattice work and shrinks VMEM to one
# running alpha ROW (no [T, S] alpha buffer, no [T, C] grad output), so
# larger (T, C, U) shapes fit than the fused kernel admits.
# ---------------------------------------------------------------------------


def _ctc_fwd_only_kernel(
    # scalar prefetch
    logit_len_ref,  # [B] int32
    label_len_ref,  # [B] int32
    # inputs
    logits_ref,  # [1, T, C]
    z_ref,  # [1, 1, S]
    skip_ref,  # [1, 1, S]
    # outputs
    loss_ref,  # [1, 1, 1]
    # scratch
    lpz_ref,  # [T, S] f32
):
    i = pl.program_id(0)
    t_len = logit_len_ref[i]
    u_len = label_len_ref[i]
    T = logits_ref.shape[1]
    C = logits_ref.shape[2]
    S = z_ref.shape[2]

    logits = logits_ref[0]  # [T, C]
    row_max = jnp.max(logits, axis=-1, keepdims=True)
    shifted = logits - row_max
    lp = shifted - jnp.log(jnp.sum(jnp.exp(shifted), axis=-1, keepdims=True))

    z_row = z_ref[0, 0]  # [S]
    class_ids = jax.lax.broadcasted_iota(jnp.int32, (S, C), 1)
    onehot = (z_row[:, None] == class_ids).astype(jnp.float32)  # [S, C]
    lpz_ref[:] = jax.lax.dot_general(
        lp, onehot,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [T, S]

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
    lpz0 = lpz_ref[0][None, :]
    init_mask = (lane == 0) | ((lane == 1) & (u_len > 0))
    alpha0 = jnp.where(init_mask, lpz0, _NEG)
    skip_add = skip_ref[0]  # [1, S]

    def fwd_body(t, alpha):
        stay = alpha
        diag = _shift_lanes(alpha, 1)
        skip = _shift_lanes(alpha, 2) + skip_add
        new = _lse3(stay, diag, skip) + lpz_ref[t, :][None, :]
        new = jnp.maximum(new, _NEG)
        return jnp.where(t < t_len, new, alpha)

    alpha = jax.lax.fori_loop(1, T, fwd_body, alpha0)

    end_blank_lane = 2 * u_len
    end_label_lane = jnp.maximum(2 * u_len - 1, 0)
    end_mask = (lane == end_blank_lane) | ((lane == end_label_lane) & (u_len > 0))
    ends = jnp.where(end_mask, alpha, _NEG)
    m = jnp.max(ends)
    logp_total = m + jnp.log(jnp.sum(jnp.exp(ends - m)))
    loss_ref[0] = jnp.broadcast_to(-logp_total, (1, 1))


def ctc_loss_pallas_fwd_only(logits, logit_len, labels, label_len, blank_id,
                             interpret=False):
    """Loss-only CTC: [B] nll with no gradient support (eval/decode paths)."""
    b, t, c = logits.shape
    u = labels.shape[1]
    c_pad = _round_up(c, 128)
    s_pad = _round_up(2 * u + 1, 128)
    if c_pad != c:
        logits = jnp.pad(logits, ((0, 0), (0, 0), (0, c_pad - c)), constant_values=_NEG)
    z, skip_add = _prepare(labels, label_len, blank_id, s_pad)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, t, c_pad), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s_pad), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s_pad), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 1), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((t, s_pad), jnp.float32),  # lpz
        ],
    )
    loss = pl.pallas_call(
        _ctc_fwd_only_kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((b, 1, 1), jnp.float32)],
        interpret=interpret,
    )(
        logit_len.astype(jnp.int32),
        label_len.astype(jnp.int32),
        logits.astype(jnp.float32),
        z[:, None, :],
        skip_add[:, None, :],
    )
    return loss[0][:, 0, 0]
