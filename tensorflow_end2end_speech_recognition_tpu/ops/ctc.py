"""CTC loss: log-space forward(-backward) recursion over the blank-expanded
label lattice, plus greedy collapse utilities.

Replaces the reference's ``tf.nn.ctc_loss`` -> C++ ``CTCLossCalculator``
call (``models/ctc/ctc.py:~compute_loss``; SURVEY.md §2.8) — which in TF1 ran
**on the host CPU even with a GPU attached** — with an on-device recursion:

- labels ``[B, U]`` (-1 padded) are expanded to ``z = [blank, l1, blank, ...]``
  of static width ``S = 2U+1``;
- ``lax.scan`` over time carries ``alpha [B, S]`` in log space; the two/three
  -way lattice transitions are vectorized shifts (VPU), the per-step label
  probability gather is one ``take_along_axis``;
- rows past each utterance's ``logit_len`` carry alpha through unchanged, so
  one static-shape program serves ragged batches;
- gradients flow through the scan via autodiff (XLA rematerializes); the
  Pallas fused forward-backward kernel plugs in behind the same signature
  (``impl='pallas'``) when available.

``impl='optax'`` delegates to ``optax.ctc_loss`` and is used as a
cross-implementation oracle in tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


def _expand_labels(labels: jnp.ndarray, blank_id: int):
    """[B, U] -> blank-interleaved [B, 2U+1] plus 'can skip' transition mask."""
    b, u = labels.shape
    s = 2 * u + 1
    z = jnp.full((b, s), blank_id, dtype=labels.dtype)
    z = z.at[:, 1::2].set(jnp.where(labels >= 0, labels, blank_id))
    # skip transition s-2 -> s allowed iff z_s is a real label differing from z_{s-2}
    prev2 = jnp.pad(z[:, :-2], ((0, 0), (2, 0)), constant_values=blank_id)
    is_label = jnp.zeros((b, s), bool).at[:, 1::2].set(labels >= 0)
    can_skip = is_label & (z != prev2)
    return z, can_skip


def _shift_right(x, fill=_NEG_INF, n=1):
    return jnp.pad(x[:, :-n], ((0, 0), (n, 0)), constant_values=fill)


def pallas_ctc_fwd_fits(t: int, c: int, u: int) -> bool:
    """VMEM guard for the forward-only kernel (no [T,S] alpha buffer, no
    [T,C] grad output — just logits, the transient lp, lpz, and the onehot),
    so it admits larger shapes than the fused loss+grad kernel."""
    if t > _PALLAS_T_CAP_FWD:
        return False
    c_pad = -(-c // 128) * 128
    s_pad = -(-(2 * u + 1) // 128) * 128
    vmem = 4 * (2 * t * c_pad + t * s_pad + s_pad * c_pad + 3 * s_pad)
    return vmem <= 12 * 1024 * 1024


# Per-round toolchain boundary, shared with the LSTM kernel (ops/pallas/
# lstm_kernel.pallas_fits). History: round 4 isolated the fused CTC
# kernel at T~500 as a TPU-worker crasher inside fit() programs and
# capped at the measured-good 400; the round-5 preflight re-probed the
# ctc and full train-step ladders — including the exact round-4
# timit_ctc_blstm fit() crasher — green through T=512 and the cap was
# raised... and the first real T=502 fit() of the round crashed the
# worker the same day. The preflight is a point sample of a flaky
# boundary; 400 is the only value that has held across rounds 4-5.
_PALLAS_T_CAP = 400

# Distinct cap for the FORWARD-ONLY kernel (ADVICE r4): it runs in eval
# programs outside the fragile multi-kernel train composition. The
# round-5 preflight probed it separately (--families ctc_fwd) and
# measured T=400..2400 all green, restoring the round-3 admission.
_PALLAS_T_CAP_FWD = 2400


def pallas_ctc_fits(t: int, c: int, u: int) -> bool:
    """Scoped-VMEM guard for the fused CTC kernel's per-utterance block.

    The kernel holds ``t x c_pad`` (logits, lp, grad) and ``t x s_pad``
    (alpha, lpz) panels plus the ``s_pad x c_pad`` one-hot in VMEM
    (ops/pallas/ctc_kernel.py). Large vocabularies (CSJ kanji ~3k classes)
    or very long unstacked utterances overflow the ~16 MB scoped budget —
    which the remote TPU compiler reports as a hard compile-helper crash,
    not an error (same failure class as the LSTM kernel at B>=64) — so
    route oversized shapes to the lax.scan implementation. ``t`` is also
    capped at the per-round compiler boundary (``_PALLAS_T_CAP``).
    """
    if t > _PALLAS_T_CAP:
        return False
    c_pad = -(-c // 128) * 128
    s_pad = -(-(2 * u + 1) // 128) * 128
    vmem = 4 * (3 * t * c_pad + 2 * t * s_pad + s_pad * c_pad + s_pad)
    return vmem <= 12 * 1024 * 1024


def ctc_loss(
    logits: jnp.ndarray,  # [B, T, C] raw (pre-softmax), blank at blank_id
    logit_len: jnp.ndarray,  # [B]
    labels: jnp.ndarray,  # [B, U] int, -1 padded
    label_len: jnp.ndarray,  # [B]
    blank_id: int | None = None,
    impl: str = "auto",
    need_grad: bool = True,
) -> jnp.ndarray:
    """Per-utterance negative log-likelihood, [B]. ``blank_id`` defaults to C-1.

    ``impl='auto'`` uses the fused Pallas forward-backward kernel on TPU
    (4.5x faster than the scan at LS-960 shapes, loss+grad in one pass) and
    the pure-JAX scan elsewhere. ``need_grad=False`` (eval/decode callers)
    routes to the forward-only kernel — the backward lattice pass and the
    gradient are skipped entirely, as the reference's ``tf.nn.ctc_loss`` did
    outside training (SURVEY.md §2.8). Differentiating the ``need_grad=False``
    Pallas path raises; pass the default when gradients may be taken.
    """
    c = logits.shape[-1]
    if blank_id is None:
        blank_id = c - 1
    if impl == "auto":
        import jax as _jax

        t, u = logits.shape[1], labels.shape[1]
        if _jax.default_backend() != "tpu":
            impl = "scan"
        elif not need_grad and pallas_ctc_fwd_fits(t, c, u):
            impl = "pallas_fwd"
        elif pallas_ctc_fits(t, c, u):
            impl = "pallas"
        else:
            impl = "scan"
    if impl == "pallas_fwd":
        from .pallas.ctc_kernel import ctc_loss_pallas_fwd_only

        return ctc_loss_pallas_fwd_only(logits, logit_len, labels, label_len, blank_id)
    if impl == "optax":
        import optax

        # optax.ctc_loss uses blank_id=0 semantics via argument; paddings are
        # 1.0 at pad positions.
        b, t, _ = logits.shape
        logit_pad = (jnp.arange(t)[None, :] >= logit_len[:, None]).astype(jnp.float32)
        u = labels.shape[1]
        label_pad = (jnp.arange(u)[None, :] >= label_len[:, None]).astype(jnp.float32)
        safe_labels = jnp.where(labels >= 0, labels, 0)
        return optax.ctc_loss(logits, logit_pad, safe_labels, label_pad, blank_id=blank_id)
    if impl == "pallas":
        from .pallas.ctc_kernel import ctc_loss_pallas

        return ctc_loss_pallas(logits, logit_len, labels, label_len, blank_id)
    if impl != "scan":
        raise ValueError(f"unknown ctc impl {impl!r}")

    b, t, _ = logits.shape
    u = labels.shape[1]
    s = 2 * u + 1
    compute_dtype = jnp.promote_types(logits.dtype, jnp.float32)
    log_probs = jax.nn.log_softmax(logits.astype(compute_dtype), axis=-1)
    z, can_skip = _expand_labels(labels, blank_id)
    skip_fill = jnp.where(can_skip, 0.0, _NEG_INF)

    alpha0 = jnp.full((b, s), _NEG_INF)
    alpha0 = alpha0.at[:, 0].set(log_probs[:, 0, blank_id])
    first_label_lp = jnp.take_along_axis(log_probs[:, 0], z[:, 1:2], axis=-1)[:, 0]
    alpha0 = alpha0.at[:, 1].set(jnp.where(label_len > 0, first_label_lp, _NEG_INF))

    time_idx = jnp.arange(1, t)

    def step(alpha, ti):
        lp_t = jnp.take_along_axis(log_probs[:, ti], z, axis=-1)  # [B, S]
        stay = alpha
        diag = _shift_right(alpha, n=1)
        skip = _shift_right(alpha, n=2) + skip_fill
        merged = jnp.logaddexp(jnp.logaddexp(stay, diag), skip) + lp_t
        merged = jnp.maximum(merged, _NEG_INF)  # keep -inf finite-ish
        active = (ti < logit_len)[:, None]
        return jnp.where(active, merged, alpha), None

    alpha_final, _ = jax.lax.scan(step, alpha0, time_idx)

    # terminal states: s = 2*label_len (final blank) and 2*label_len - 1
    end_blank = jnp.take_along_axis(alpha_final, (2 * label_len)[:, None], axis=1)[:, 0]
    end_label_idx = jnp.maximum(2 * label_len - 1, 0)[:, None]
    end_label = jnp.take_along_axis(alpha_final, end_label_idx, axis=1)[:, 0]
    end_label = jnp.where(label_len > 0, end_label, _NEG_INF)
    return -jnp.logaddexp(end_blank, end_label)


def ctc_posteriors(logits: jnp.ndarray) -> jnp.ndarray:
    """Per-frame class posteriors (the reference's ``posteriors()`` op)."""
    return jax.nn.softmax(logits, axis=-1)
