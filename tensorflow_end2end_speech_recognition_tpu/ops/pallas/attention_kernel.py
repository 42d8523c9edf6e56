"""Pallas TPU kernel: fused location-aware attention step.

BASELINE.json's north star names "the location-aware attention softmax"
as a Pallas kernel target. This fuses one decoder attention read —

    S[k, t] = prev_align[t + k - W//2]         (alignment window, W taps)
    f       = S^T @ conv_w                     (location features, MXU)
    pre     = enc_keys + f @ w_loc + q + b     (additive energies)
    e       = tanh(pre) @ v * sharpening + mask
    align   = softmax_T(e)
    context = align^T @ enc_out                (MXU)

— into one VMEM-resident program per batch row (grid over B). The alignment
window matrix is materialized as W row-shifted copies of the previous
alignment (row writes, sublane-indexed), so the 1-D convolution becomes a
single [T, W] x [W, C] matmul instead of T gathers.

Used for the ``location``/``hybrid`` scorer at decode time.
``location_attend_fused`` adds a custom VJP (forward = this kernel,
backward = autodiff of an XLA restatement of the same math) so the fused
read is safe to differentiate through. Training does NOT use it — measured
round 3 (BASELINE.md): under the decoder scan's ``jax.checkpoint`` the
custom VJP runs the kernel forward twice plus a full reference recompute,
making the train step 1.9x slower than letting XLA differentiate the
unfused graph. Semantics match ``models.attention.attend`` (tested against
it, grads included). The query projection ``q = dec_state @ W_dec`` stays
outside (tiny batched matmul).
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


def _attention_kernel(
    keys_ref,  # [1, T, A] enc @ W_k (+ b folded in)
    enc_ref,  # [1, T, H]
    q_ref,  # [1, 1, A] dec_state @ W_dec
    align_prev_ref,  # [1, 1, T]
    mask_ref,  # [1, 1, T] additive: 0 valid / -1e30 pad
    conv_ref,  # [Wp, C] taps (zero-padded rows)
    wloc_ref,  # [C, A]
    v_ref,  # [A, 1]
    # outputs
    ctx_ref,  # [1, 1, H]
    align_ref,  # [1, 1, T]
    # scratch
    smat_ref,  # [Wp, T] shifted alignment rows
    *,
    conv_width: int,
    sharpening: float,
):
    T = keys_ref.shape[1]
    Wp = smat_ref.shape[0]
    # SAME-conv left offset: XLA pads (W-1)//2 on the left for even widths
    # too — W//2 would shift the window one frame for even conv widths and
    # silently diverge from the unfused attend() path
    half = (conv_width - 1) // 2
    prev = align_prev_ref[0]  # [1, T]
    t_iota = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
    smat_ref[:] = jnp.zeros_like(smat_ref)  # padded tap rows must be zero

    def write_row(k, _):
        # row k holds prev_align shifted so smat[k, t] = prev[t + k - half]
        shift = k - half
        rolled = pltpu.roll(prev, -shift, axis=1)
        src = t_iota + shift
        valid = (src >= 0) & (src < T)
        smat_ref[k, :] = jnp.where(valid, rolled, 0.0)[0]
        return 0

    jax.lax.fori_loop(0, conv_width, write_row, 0)

    f = jax.lax.dot_general(
        smat_ref[:], conv_ref[:],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [T, C]
    loc = jax.lax.dot_general(
        f, wloc_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [T, A]
    pre = keys_ref[0] + loc + q_ref[0]  # [T, A] (+ broadcast [1, A])
    e = jax.lax.dot_general(
        jnp.tanh(pre), v_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [T, 1]
    e = e * sharpening + mask_ref[0].reshape(T, 1)
    m = jnp.max(e, axis=0, keepdims=True)
    ex = jnp.exp(e - m)
    align = ex / jnp.sum(ex, axis=0, keepdims=True)  # [T, 1]
    ctx = jax.lax.dot_general(
        align, enc_ref[0],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [1, H]
    ctx_ref[0] = ctx
    align_ref[0] = align.reshape(1, T)


def location_attend_pallas(
    enc_keys: jnp.ndarray,  # [B, T, A] — precompute_keys output + bias
    enc_out: jnp.ndarray,  # [B, T, H]
    q: jnp.ndarray,  # [B, A] dec_state @ W_dec
    prev_align: jnp.ndarray,  # [B, T]
    enc_mask: jnp.ndarray,  # [B, T] bool
    conv_w: jnp.ndarray,  # [W, 1, C] (same layout as attend's params["conv"])
    w_loc: jnp.ndarray,  # [C, A]
    v: jnp.ndarray,  # [A]
    sharpening: float = 1.0,
    interpret: bool = False,
):
    """Fused location/hybrid attention read. Returns (context, align)."""
    b, t, a = enc_keys.shape
    h = enc_out.shape[-1]
    w, _, c = conv_w.shape
    t_pad = _round_up(t, 128)
    a_pad = _round_up(a, 128)
    h_pad = _round_up(h, 128)
    c_pad = _round_up(c, 128)
    w_pad = _round_up(max(w, 8), 8)

    keys_p = jnp.pad(enc_keys, ((0, 0), (0, t_pad - t), (0, a_pad - a)))
    enc_p = jnp.pad(enc_out, ((0, 0), (0, t_pad - t), (0, h_pad - h)))
    q_p = jnp.pad(q, ((0, 0), (0, a_pad - a)))[:, None, :]
    align_p = jnp.pad(prev_align, ((0, 0), (0, t_pad - t)))[:, None, :]
    mask_add = jnp.where(enc_mask, 0.0, _NEG)
    mask_p = jnp.pad(mask_add, ((0, 0), (0, t_pad - t)), constant_values=_NEG)[:, None, :]
    conv_p = jnp.pad(conv_w[:, 0, :], ((0, w_pad - w), (0, c_pad - c)))
    wloc_p = jnp.pad(w_loc, ((0, c_pad - c), (0, a_pad - a)))
    v_p = jnp.pad(v, (0, a_pad - a))[:, None]

    kernel = functools.partial(
        _attention_kernel, conv_width=w, sharpening=sharpening
    )
    ctx, align = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, t_pad, a_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, h_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, a_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w_pad, c_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c_pad, a_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((a_pad, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, h_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, h_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, t_pad), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((w_pad, t_pad), jnp.float32)],
        interpret=interpret,
    )(keys_p, enc_p, q_p, align_p, mask_p, conv_p, wloc_p, v_p)
    return ctx[:, 0, :h], align[:, 0, :t]


def _reference_math(keys_in, enc_out, q, prev_align, enc_mask, conv_w, w_loc,
                    v, sharpening):
    """Pure-XLA restatement of the kernel's math (the backward's source).

    Must stay semantically identical to ``_attention_kernel``: keys_in has
    the bias folded in, the conv is SAME with the (W-1)//2 left offset XLA
    uses, masking is additive (-1e30) BEFORE the softmax.
    """
    f = jax.lax.conv_general_dilated(
        prev_align[..., None], conv_w,
        window_strides=(1,), padding="SAME",
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32,
    )  # [B, T, C]
    pre = keys_in + jnp.matmul(f, w_loc, preferred_element_type=jnp.float32)
    pre = pre + q[:, None, :]
    e = jnp.einsum("bta,a->bt", jnp.tanh(pre), v) * sharpening
    e = e + jnp.where(enc_mask, 0.0, _NEG)
    align = jax.nn.softmax(e, axis=-1)
    ctx = jnp.einsum("bt,bth->bh", align, enc_out)
    return ctx, align


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def location_attend_fused(keys_in, enc_out, q, prev_align, enc_mask, conv_w,
                          w_loc, v, sharpening=1.0, interpret=False):
    """Differentiable fused attention read (forward = the Pallas kernel).

    The backward is ``jax.vjp`` of ``_reference_math`` — plain XLA, one
    recomputed unfused forward per step — rather than a hand-derived Pallas
    backward, which is exactly the composition class that crashed the
    remote compiler in round 2 (BASELINE.md long-sequence notes). This
    makes any decode-path use safe to differentiate through (e.g. MWER-style
    losses over beam outputs). The teacher-forced training scan deliberately
    does NOT route here — measured 1.9x slower there (see module docstring /
    BASELINE.md round 3).
    """
    return location_attend_pallas(
        keys_in, enc_out, q, prev_align, enc_mask, conv_w, w_loc, v,
        sharpening, interpret=interpret,
    )


def _fused_fwd(keys_in, enc_out, q, prev_align, enc_mask, conv_w, w_loc, v,
               sharpening, interpret):
    out = location_attend_pallas(
        keys_in, enc_out, q, prev_align, enc_mask, conv_w, w_loc, v,
        sharpening, interpret=interpret,
    )
    return out, (keys_in, enc_out, q, prev_align, enc_mask, conv_w, w_loc, v)


def _fused_bwd(sharpening, interpret, res, cts):
    keys_in, enc_out, q, prev_align, enc_mask, conv_w, w_loc, v = res
    _, vjp = jax.vjp(
        lambda *a: _reference_math(*a, sharpening), keys_in, enc_out, q,
        prev_align, enc_mask, conv_w, w_loc, v,
    )
    return vjp(cts)  # enc_mask's cotangent is float0 (bool), as required


location_attend_fused.defvjp(_fused_fwd, _fused_bwd)
