"""Recurrent cores: fused-gate LSTM / GRU scans, uni- and bidirectional.

The reference picked among five TF1 cell implementations via the
``lstm_impl`` config key (``models/encoders/core/blstm.py``: BasicLSTMCell,
LSTMCell w/ peephole+cell_clip+num_proj, LSTMBlockCell, LSTMBlockFusedCell,
CudnnLSTM — SURVEY.md §2.5/§2.8). On TPU there is exactly one right shape
for this computation, so there is one implementation:

- the input projection ``x_t @ W_x`` for **all** timesteps is hoisted out of
  the recurrence into a single ``[B*T, D] @ [D, 4H]`` matmul (MXU-sized,
  batched, fusable with neighbours);
- ``lax.scan`` carries only the genuinely sequential part,
  ``h_{t-1} @ W_h + precomputed_t`` plus elementwise gates (VPU);
- padding is handled by carrying state through masked steps unchanged, so
  final states equal the state at each utterance's true length and outputs
  in the pad region are zero.

Feature parity knobs from the reference's LSTMCell path (``use_peephole``,
``clip_activation`` -> cell clip, ``num_proj`` -> recurrent projection) are
kept as config options.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class RNNSpec(NamedTuple):
    """Static spec for one recurrent layer."""

    cell: str = "lstm"  # "lstm" | "gru"
    num_units: int = 256
    num_proj: int | None = None  # LSTM recurrent projection dim
    use_peephole: bool = False
    clip_activation: float | None = None  # cell-state clip (reference LSTMCell)
    forget_bias: float = 1.0
    compute_dtype: str = "float32"  # "bfloat16": scan path runs gate matmuls
    # on the MXU at 2x rate with f32 accumulation (carries/outputs f32);
    # Pallas path streams xproj/residuals/cotangents in bf16 (halved HBM
    # traffic — the measured binding cost at B>=64) while carried state and
    # ALL gate math stay f32 in VMEM
    impl: str = "auto"  # "auto" | "scan" | "pallas": "pallas" = VMEM-resident
    # layer kernel (ops/pallas/lstm_kernel.py) for the plain-LSTM fast path;
    # "auto" picks it on TPU when eligible

    @property
    def pallas_eligible(self) -> bool:
        return (
            self.cell == "lstm"
            and not self.use_peephole
            and not self.num_proj
            and not self.clip_activation
            and self.compute_dtype in ("float32", "bfloat16")
        )

    @property
    def stream_dtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32

    @property
    def out_dim(self) -> int:
        return self.num_proj or self.num_units


def _uniform(key, shape, scale):
    return jax.random.uniform(key, shape, jnp.float32, -scale, scale)


def init_rnn_params(key, spec: RNNSpec, input_dim: int, param_init: float = 0.1):
    h = spec.num_units
    r = spec.out_dim  # recurrent input dim (after projection if any)
    keys = jax.random.split(key, 5)
    if spec.cell == "lstm":
        p = {
            "wx": _uniform(keys[0], (input_dim, 4 * h), param_init),
            "wh": _uniform(keys[1], (r, 4 * h), param_init),
            "b": jnp.zeros((4 * h,), jnp.float32),
        }
        if spec.use_peephole:
            p["peephole"] = _uniform(keys[2], (3, h), param_init)  # i, f, o
        if spec.num_proj:
            p["wproj"] = _uniform(keys[3], (h, spec.num_proj), param_init)
        return p
    if spec.cell == "gru":
        return {
            "wx": _uniform(keys[0], (input_dim, 3 * h), param_init),
            "wh_zr": _uniform(keys[1], (r, 2 * h), param_init),
            "wh_n": _uniform(keys[2], (r, h), param_init),
            "b": jnp.zeros((3 * h,), jnp.float32),
        }
    raise ValueError(f"unknown cell {spec.cell!r}")


def _lstm_step(spec: RNNSpec, params, carry, xproj_t, mask_t):
    """One fused LSTM step. carry=(h, c); xproj_t already includes W_x x_t + b."""
    h_prev, c_prev = carry
    if spec.compute_dtype == "bfloat16":
        gates = xproj_t + jnp.matmul(
            h_prev.astype(jnp.bfloat16), params["wh"].astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
    else:
        gates = xproj_t + jnp.matmul(h_prev, params["wh"], preferred_element_type=jnp.float32)
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    if spec.use_peephole:
        pi, pf, po = params["peephole"]
        i = i + pi * c_prev
        f = f + pf * c_prev
    i = jax.nn.sigmoid(i)
    f = jax.nn.sigmoid(f + spec.forget_bias)
    g = jnp.tanh(g)
    c = f * c_prev + i * g
    if spec.clip_activation:
        c = jnp.clip(c, -spec.clip_activation, spec.clip_activation)
    if spec.use_peephole:
        o = o + po * c
    o = jax.nn.sigmoid(o)
    h = o * jnp.tanh(c)
    if spec.num_proj:
        h = jnp.matmul(h, params["wproj"], preferred_element_type=jnp.float32)
    # masked steps: carry previous state through, emit zeros
    h = jnp.where(mask_t, h, h_prev)
    c = jnp.where(mask_t, c, c_prev)
    return (h, c), jnp.where(mask_t, h, 0.0)


def _gru_step(spec: RNNSpec, params, carry, xproj_t, mask_t):
    (h_prev,) = carry
    x_zr, x_n = xproj_t[..., : 2 * spec.num_units], xproj_t[..., 2 * spec.num_units :]
    zr = x_zr + jnp.matmul(h_prev, params["wh_zr"], preferred_element_type=jnp.float32)
    z, r = jnp.split(jax.nn.sigmoid(zr), 2, axis=-1)
    n = jnp.tanh(x_n + jnp.matmul(r * h_prev, params["wh_n"], preferred_element_type=jnp.float32))
    h = (1.0 - z) * n + z * h_prev
    h = jnp.where(mask_t, h, h_prev)
    return (h,), jnp.where(mask_t, h, 0.0)


def _flip_valid(x, lengths):
    """Reverse each row's valid prefix in time; identity on the pad tail."""
    t = x.shape[1]
    idx = jnp.arange(t)[None, :]
    src = jnp.where(idx < lengths[:, None], lengths[:, None] - 1 - idx, idx)
    return jnp.take_along_axis(x, src.reshape(src.shape + (1,) * (x.ndim - 2)), axis=1)


def rnn_scan(
    params,
    spec: RNNSpec,
    xs: jnp.ndarray,  # [B, T, D]
    lengths: jnp.ndarray,  # [B]
    reverse: bool = False,
    initial_state=None,  # LSTM: (h, c); GRU: (h,) — streaming chunk carry
):
    """Run one recurrent layer. Returns (outputs [B, T, out_dim], final_state).

    ``reverse=True`` processes each utterance back-to-front *respecting its
    true length* (pad frames contribute nothing because masked steps carry
    state unchanged, and the pad region sits at the start of the reversed
    walk only for full-length rows — we instead keep time order and mask, so
    reversed outputs align with forward indices).

    ``initial_state`` resumes the recurrence from a carried state (streaming
    inference over chunks; ``streaming.py``). Because masked steps carry
    state unchanged, the returned final_state is the state at each row's
    true length — feed it back as the next chunk's ``initial_state``. The
    scan path is used unconditionally in this mode (chunks are short; the
    Pallas layer kernel assumes zero initial state).
    """
    b, t, _ = xs.shape
    h = spec.num_units
    # hoisted input projection: one big MXU matmul over all timesteps
    xproj = jnp.matmul(xs, params["wx"], preferred_element_type=jnp.float32) + params["b"]
    mask = (jnp.arange(t)[None, :] < lengths[:, None])[..., None]  # [B, T, 1]

    if reverse:
        # flip only the valid prefix of each row (pad frames are zero and
        # masked anyway) — shared _flip_valid invariant
        xproj = _flip_valid(xproj, lengths)

    if spec.impl == "pallas" and not spec.pallas_eligible:
        raise ValueError(
            "impl='pallas' requires the plain-LSTM fast path (no peephole/"
            "num_proj/cell-clip/GRU); use impl='auto' or 'scan'"
        )
    use_pallas = initial_state is None and (
        spec.impl == "pallas"
        or (spec.impl == "auto" and spec.pallas_eligible and jax.default_backend() == "tpu")
    )
    if use_pallas and spec.pallas_eligible:
        from ..ops.pallas.lstm_kernel import lstm_layer_pallas, pallas_fits

        if jax.default_backend() == "tpu" and not pallas_fits(b, spec.num_units, t):
            use_pallas = False  # scoped VMEM won't fit — fall through to scan
    if use_pallas and spec.pallas_eligible:
        ys = lstm_layer_pallas(
            xproj.astype(spec.stream_dtype), params["wh"],
            mask[..., 0].astype(jnp.float32), spec.forget_bias,
        )
        # final h = output at each row's last valid step (zeros for empty
        # rows); the kernel does not materialize the final cell state — use
        # impl="scan" if a caller ever needs it (none do today)
        last = jnp.clip(lengths - 1, 0, t - 1)
        h_fin = jnp.take_along_axis(ys, last[:, None, None], axis=1)[:, 0]
        h_fin = h_fin.astype(jnp.float32)  # stream dtype may be bf16
        if reverse:
            ys = _flip_valid(ys, lengths)
        return ys, (h_fin, None)

    step = _lstm_step if spec.cell == "lstm" else _gru_step
    if initial_state is not None:
        carry0 = initial_state
    elif spec.cell == "lstm":
        carry0 = (jnp.zeros((b, spec.out_dim)), jnp.zeros((b, h)))
    else:
        carry0 = (jnp.zeros((b, h)),)

    def body(carry, inp):
        xproj_t, mask_t = inp
        return step(spec, params, carry, xproj_t, mask_t)

    # Per-step rematerialization: the scan backward otherwise stores every
    # gate activation per step and becomes HBM-bandwidth bound — recomputing
    # gates in the backward halves fwd+bwd time at LS-960 shapes
    # (113.6 ms -> 60.9 ms measured). Grad-free forwards are unaffected.
    body = jax.checkpoint(body)

    carry, ys = jax.lax.scan(
        body,
        carry0,
        (jnp.swapaxes(xproj, 0, 1), jnp.swapaxes(mask, 0, 1)),
        unroll=8,  # amortize while-loop overhead; the per-step matmul is
        # far below MXU saturation so iteration latency dominates
    )
    ys = jnp.swapaxes(ys, 0, 1)  # [B, T, out]
    if reverse:
        ys = _flip_valid(ys, lengths)
    return ys, carry


def init_bidirectional(key, spec: RNNSpec, input_dim: int, param_init: float = 0.1):
    kf, kb = jax.random.split(key)
    return {
        "fwd": init_rnn_params(kf, spec, input_dim, param_init),
        "bwd": init_rnn_params(kb, spec, input_dim, param_init),
    }


def bidirectional_scan(params, spec: RNNSpec, xs, lengths):
    """Concatenated forward+backward outputs, [B, T, 2*out_dim].

    Scan path: deliberately two independent ``lax.scan``s — the directions
    have no data dependency, so XLA overlaps their while-loops on device.
    Measured on the LS-960-shape benchmark this beats both a batch-stacked
    single scan (-13%) and a block-diagonal stacked-weight single scan (-5%).

    Pallas path: ONE fused kernel advancing both directions per grid step
    (ops/pallas/lstm_kernel.lstm_bidi_pallas) — two separate pallas calls
    would serialize on the core, losing exactly the overlap the two scans
    get; fusing restores it with VMEM-resident weights/state.
    """
    if spec.impl == "pallas" and not spec.pallas_eligible:
        raise ValueError(
            "impl='pallas' requires the plain-LSTM fast path (no peephole/"
            "num_proj/cell-clip/GRU); use impl='auto' or 'scan'"
        )
    use_pallas = spec.impl == "pallas" or (
        spec.impl == "auto" and spec.pallas_eligible and jax.default_backend() == "tpu"
    )
    if use_pallas and spec.pallas_eligible:
        from ..ops.pallas.lstm_kernel import pallas_fits

        if jax.default_backend() == "tpu" and not pallas_fits(
            xs.shape[0], spec.num_units, xs.shape[1]
        ):
            use_pallas = False  # scoped VMEM won't fit — two-scan path instead
    if use_pallas and spec.pallas_eligible:
        from ..ops.pallas.lstm_kernel import lstm_bidi_pallas

        b, t, _ = xs.shape
        sdt = spec.stream_dtype
        if spec.compute_dtype == "bfloat16":
            # bf16 input projections: 2x MXU rate on the hoisted matmul AND
            # halved kernel stream traffic (xproj in, ys/cs residuals,
            # dxproj out); gate math inside the kernel stays f32
            mm = lambda p: jnp.matmul(
                xs.astype(sdt), p["wx"].astype(sdt),
                preferred_element_type=jnp.float32,
            ) + p["b"]
        else:
            mm = lambda p: jnp.matmul(xs, p["wx"], preferred_element_type=jnp.float32) + p["b"]
        xproj_f = mm(params["fwd"]).astype(sdt)
        xproj_b = _flip_valid(mm(params["bwd"]).astype(sdt), lengths)
        mask = (jnp.arange(t)[None, :] < lengths[:, None]).astype(jnp.float32)
        ys_f, ys_b = lstm_bidi_pallas(
            xproj_f, xproj_b, params["fwd"]["wh"], params["bwd"]["wh"],
            mask, spec.forget_bias,
        )
        return jnp.concatenate([ys_f, _flip_valid(ys_b, lengths)], axis=-1)
    fwd, _ = rnn_scan(params["fwd"], spec, xs, lengths, reverse=False)
    bwd, _ = rnn_scan(params["bwd"], spec, xs, lengths, reverse=True)
    return jnp.concatenate([fwd, bwd], axis=-1)


def dropout(key, x, keep_prob: float, train: bool):
    """Inverted dropout matching the reference's DropoutWrapper(output_keep_prob)."""
    if not train or keep_prob >= 1.0:
        return x
    keep = jax.random.bernoulli(key, keep_prob, x.shape)
    return jnp.where(keep, x / keep_prob, 0.0)
