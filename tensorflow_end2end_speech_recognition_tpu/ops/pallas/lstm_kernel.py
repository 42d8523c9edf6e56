"""Pallas LSTM layer kernel: VMEM-resident weights/state, custom VJP.

Replaces the ``lax.scan`` recurrence of ``models/rnn.py`` (the TPU-native
equivalent of the reference's fused-cell ``lstm_impl`` options,
``models/encoders/core/blstm.py`` — SURVEY.md §2.5/§2.8) for the plain-LSTM
fast path (no peephole / projection / cell clip).

Design (one kernel invocation = one layer-direction):

- The input projection ``x @ Wx + b`` for ALL timesteps is computed outside
  as one big MXU matmul (as the scan path already does) and streamed into
  the kernel one timestep block at a time (Pallas double-buffers the DMA).
- All streamed tensors are TIME-MAJOR ``[T, B, ...]`` so each grid step's
  block has MXU/VPU-aligned trailing dims (B divisible by 8, feature dim by
  128); the wrapper swaps axes around the call (XLA folds the transposes
  into neighbouring matmul layouts).
- The recurrent weight ``Wh [H, 4H]`` sits in VMEM for the whole sequence;
  the carried ``h/c [B, H]`` live in VMEM scratch — zero HBM traffic for
  state or weights inside the time loop, unlike the scan whose carry
  round-trips HBM every unrolled block.
- Grid = (T,); TPU grid steps run sequentially on the core, so scratch
  carries the recurrence.
- Backward: a second kernel walks the grid reversed, recomputes the gates
  from the streamed ``xproj`` and the saved ``h`` sequence (the same
  recompute trade ``jax.checkpoint`` makes on the scan body), carries
  ``dh/dc`` in scratch, and streams out ``dxproj`` (= dgates). ``dWh``,
  ``dWx`` and ``db`` all factor as single large contractions over [T*B] of
  ``dxproj`` against saved streams, computed OUTSIDE the kernel where the
  MXU runs at full row occupancy — keeping them in the kernel tripled the
  serial matmul chain and blew the scoped-VMEM budget.

Masking follows ``rnn_scan``: masked (pad) steps carry state through
unchanged and emit zeros; masks are monotone per row (length masks), which
the backward's ``h_prev = ys[t-1]`` read relies on.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gates_fwd(gates, hdim, forget_bias):
    i = jax.nn.sigmoid(gates[:, :hdim])
    f = jax.nn.sigmoid(gates[:, hdim : 2 * hdim] + forget_bias)
    g = jnp.tanh(gates[:, 2 * hdim : 3 * hdim])
    o = jax.nn.sigmoid(gates[:, 3 * hdim :])
    return i, f, g, o


def _fwd_kernel(forget_bias, xproj_ref, wh_ref, mask_ref, ys_ref, cs_ref, h_scr, c_scr):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)
        c_scr[:] = jnp.zeros_like(c_scr)

    hdim = h_scr.shape[-1]
    # unrolled sub-steps within the block: amortizes grid/DMA overhead the
    # same way unroll=8 does for the lax.scan path
    for k in range(xproj_ref.shape[0]):
        h_prev, c_prev = h_scr[:], c_scr[:]
        # xproj may stream in bf16 (stream dtype = xproj dtype); carried
        # state and gate math stay f32 — only the HBM streams round
        gates = xproj_ref[k].astype(jnp.float32) + jnp.dot(
            h_prev, wh_ref[:], preferred_element_type=jnp.float32
        )
        i, f, g, o = _gates_fwd(gates, hdim, forget_bias)
        c = f * c_prev + i * g
        h = o * jnp.tanh(c)
        m = mask_ref[k]  # [B, 1]
        h = jnp.where(m > 0, h, h_prev)
        c = jnp.where(m > 0, c, c_prev)
        h_scr[:] = h
        c_scr[:] = c
        ys_ref[k] = (h * m).astype(ys_ref.dtype)
        cs_ref[k] = c.astype(cs_ref.dtype)


def _bwd_kernel(
    forget_bias,
    xproj_ref,  # [K, B, 4H] block
    wh_ref,  # [H, 4H]
    mask_ref,  # [K, B, 1]
    ys_prev_ref,  # [K, B, H]: ys shifted by one step (row k = h_{t_k - 1})
    cs_ref,  # [K, B, H] at t
    cs_prev_ref,  # [K, B, H]: cs shifted by one step
    gys_ref,  # [K, B, H] at t
    dxproj_ref,  # out [K, B, 4H]
    dh_scr,  # [B, H]
    dc_scr,  # [B, H]
):
    # dWh is NOT accumulated here: dWh = sum_t h_{t-1}^T dgates_t factors as
    # one big MXU matmul over the streamed dxproj output, computed outside —
    # that removes 2 of the 3 serial matmuls per step and the [H, 4H]
    # accumulator from VMEM, keeping the kernel inside the default scoped
    # VMEM budget.
    @pl.when(pl.program_id(0) == 0)
    def _():
        dh_scr[:] = jnp.zeros_like(dh_scr)
        dc_scr[:] = jnp.zeros_like(dc_scr)

    hdim = dh_scr.shape[-1]
    for k in reversed(range(xproj_ref.shape[0])):
        # streamed residuals may be bf16 (stream dtype); compute in f32
        h_prev = ys_prev_ref[k].astype(jnp.float32)
        c_prev = cs_prev_ref[k].astype(jnp.float32)
        c_t = cs_ref[k].astype(jnp.float32)
        m = mask_ref[k] > 0  # [B, 1]

        # recompute gate activations (the remat trade)
        gates = xproj_ref[k].astype(jnp.float32) + jnp.dot(
            h_prev, wh_ref[:], preferred_element_type=jnp.float32
        )
        i, f, g, o = _gates_fwd(gates, hdim, forget_bias)

        dh_total = gys_ref[k].astype(jnp.float32) * m + dh_scr[:]
        tc = jnp.tanh(c_t)
        do = dh_total * tc
        dc_total = dc_scr[:] + dh_total * o * (1.0 - tc * tc)
        di = dc_total * g
        dg = dc_total * i
        df = dc_total * c_prev
        dc_prev = dc_total * f
        dgates = jnp.concatenate(
            [
                di * i * (1.0 - i),
                df * f * (1.0 - f),
                dg * (1.0 - g * g),
                do * o * (1.0 - o),
            ],
            axis=-1,
        )
        dgates = jnp.where(m, dgates, 0.0)
        dxproj_ref[k] = dgates.astype(dxproj_ref.dtype)
        dh_prev = jax.lax.dot_general(
            dgates, wh_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # masked steps pass grads straight through (h_t = h_{t-1}, c_t = c_{t-1})
        dh_scr[:] = jnp.where(m, dh_prev, dh_total)
        dc_scr[:] = jnp.where(m, dc_prev, dc_scr[:])


def _interpret() -> bool:
    # CPU (tests) runs the kernels in interpreter mode; TPU compiles them
    return jax.default_backend() != "tpu"


_BLOCK_T = 8  # fwd timesteps per grid step (DMA/grid overhead amortization)
_BLOCK_T_BWD = 4  # backward streams more tensors; stay inside default VMEM

# Block sizes above are tuned at B=32, H=512 — the measured-good scoped-VMEM
# footprint. Larger batches (or widths) must shrink the time-block so each
# block's resident bytes stay at that anchor; beyond the point where even a
# one-step block busts the budget, the caller must use the lax.scan path
# (the remote TPU compiler hard-crashes on scoped-VMEM overflow rather than
# erroring: B=64 bidi-backward was the repro).
_ANCHOR_ROWS = 32 * 512  # b*h of the tuned configuration


def _scale_kt(base: int, t: int, b: int, h: int) -> int:
    return max(1, min(base, (base * _ANCHOR_ROWS) // max(b * h, 1), t))


def _common_t_pad(t: int, b: int, h: int, bases: tuple) -> int:
    """One T padding shared by a layer's forward AND backward kernels.

    Round-4 finding: a full train-step program whose bidi FORWARD pads T
    (kt=4: 286->288) while its BACKWARD does not (kt=2: 286==286) faults
    the TPU worker at runtime — 2/2 reproductions at T=286, while the
    same program at T=288 (both aligned) and T=411/213/145 (both padded)
    runs clean, and each kernel ALONE is fine at T=286. Mosaic's grids
    are sound either way per-kernel, so this is a composition-level
    toolchain fault (the class CLAUDE.md documents); padding both passes
    to the lcm of their block sizes removes the mixed case everywhere at
    the cost of at most one extra (masked) block step.
    """
    import math

    m = math.lcm(*(_scale_kt(base, t, b, h) for base in bases))
    return -(-t // m) * m


def pallas_fits(b: int, h: int, t: int | None = None) -> bool:
    """True if the layer kernels fit scoped VMEM at these shapes.

    The binding constraints are the backward kernels at kt=1 (streams scale
    with b*h; anchor kt=4 at b*h=32*512) and the VMEM-resident [H, 4H]
    weights (4 MB each at H=512; the bidirectional kernels hold two).

    The sequence-length cap is empirical and has MOVED between rounds as
    the remote toolchain changed: round 3 measured 2-layer pyramidal grad
    OK at T=800 (crash at T=1198) and set the cap there; round 4 saw BOTH
    hard-corpus TIMIT rows (per-layer T=502) hard-crash the TPU WORKER
    mid-train and re-capped to 400; the round-5 preflight
    (benchmarks/compiler_boundary_probe.py) measured the lstm, ctc, and
    full train-step composition ladders — plus the round-4 fit() crasher
    itself — green through T=512 and the cap was raised to 512 — and then
    the very first T=502 fit() of the round (timit_ctc_blstm, same day)
    crashed the worker at the first train-step loss fetch. The preflight
    is a point sample of a flaky boundary; 400 is the only cap that has
    held across every session of rounds 4-5, so the cap is 400 for keeps.
    Longer sequences ride the lax.scan path (0.77x the kernel's rate),
    which compiles and runs at every tested shape.
    """
    if t is not None and t > 400:
        return False
    return b * h <= 4 * _ANCHOR_ROWS and h <= 512


def _pad_t(x, t_pad):
    t = x.shape[0]
    if t == t_pad:
        return x
    return jnp.pad(x, [(0, t_pad - t)] + [(0, 0)] * (x.ndim - 1))


def _fwd_call(xproj_tm, wh, mask_tm, forget_bias: float):
    t, b, g4 = xproj_tm.shape
    h = g4 // 4
    sdt = xproj_tm.dtype  # stream dtype (bf16 streams under compute_dtype)
    isz = jnp.dtype(sdt).itemsize
    kt = _scale_kt(_BLOCK_T, t, b, h)
    t_pad = _common_t_pad(t, b, h, (_BLOCK_T, _BLOCK_T_BWD))
    nb = t_pad // kt
    xproj_tm = _pad_t(xproj_tm, t_pad)
    mask_tm = _pad_t(mask_tm, t_pad)  # pad rows are masked: state carries
    kernel = functools.partial(_fwd_kernel, float(forget_bias))
    step = lambda i: (i, 0, 0)
    const = lambda i: (0, 0)
    ys, cs = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((kt, b, g4), step, memory_space=pltpu.VMEM),
            pl.BlockSpec((h, g4), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((kt, b, 1), step, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((kt, b, h), step, memory_space=pltpu.VMEM),
            pl.BlockSpec((kt, b, h), step, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_pad, b, h), sdt),
            jax.ShapeDtypeStruct((t_pad, b, h), sdt),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, h), jnp.float32),
            pltpu.VMEM((b, h), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * g4 * t_pad + 12 * b * g4 * t_pad,
            bytes_accessed=(xproj_tm.size + 2 * t_pad * b * h) * isz + h * g4 * 4,
            transcendentals=4 * b * g4 * t_pad,
        ),
        interpret=_interpret(),
    )(xproj_tm, wh, mask_tm)
    return ys[:t], cs[:t]


def _shift_one(x):
    """[T, B, H] -> row t holds x[t-1], row 0 zeros (h_{t-1}/c_{t-1} streams)."""
    return jnp.pad(x[:-1], ((1, 0), (0, 0), (0, 0)))


def _bwd_call(xproj_tm, wh, mask_tm, ys, cs, gys_tm, forget_bias: float):
    t, b, g4 = xproj_tm.shape
    h = g4 // 4
    sdt = xproj_tm.dtype
    isz = jnp.dtype(sdt).itemsize
    gys_tm = gys_tm.astype(sdt)  # cotangent streams at the stream dtype
    kt = _scale_kt(_BLOCK_T_BWD, t, b, h)
    t_pad = _common_t_pad(t, b, h, (_BLOCK_T, _BLOCK_T_BWD))
    nb = t_pad // kt
    ins = [
        _pad_t(xproj_tm, t_pad),
        wh,
        _pad_t(mask_tm, t_pad),
        _pad_t(_shift_one(ys), t_pad),
        _pad_t(cs, t_pad),
        _pad_t(_shift_one(cs), t_pad),
        _pad_t(gys_tm, t_pad),
    ]
    kernel = functools.partial(_bwd_kernel, float(forget_bias))
    rev = lambda i: (nb - 1 - i, 0, 0)
    const = lambda i: (0, 0)
    tm_spec = lambda d: pl.BlockSpec((kt, b, d), rev, memory_space=pltpu.VMEM)
    dxproj = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            tm_spec(g4),
            pl.BlockSpec((h, g4), const, memory_space=pltpu.VMEM),
            tm_spec(1),
            tm_spec(h),  # h_{t-1} (shifted ys)
            tm_spec(h),  # c_t
            tm_spec(h),  # c_{t-1} (shifted cs)
            tm_spec(h),  # g_ys
        ],
        out_specs=tm_spec(g4),
        out_shape=jax.ShapeDtypeStruct((t_pad, b, g4), sdt),
        scratch_shapes=[
            pltpu.VMEM((b, h), jnp.float32),
            pltpu.VMEM((b, h), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * g4 * t_pad + 30 * b * g4 * t_pad,
            bytes_accessed=(2 * xproj_tm.size + 6 * t_pad * b * h) * isz + h * g4 * 4,
            transcendentals=5 * b * g4 * t_pad,
        ),
        interpret=_interpret(),
    )(*ins)
    dxproj = dxproj[:t]
    # dWh = sum_t h_{t-1}^T @ dgates_t as ONE MXU-efficient contraction over
    # the [T*B] axis (the kernel streams dgates out; h_{t-1} = shifted ys)
    dwh = jax.lax.dot_general(
        _shift_one(ys), dxproj, (((0, 1), (0, 1)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return dxproj, dwh


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def lstm_layer_pallas(xproj, wh, mask, forget_bias: float = 1.0):
    """Masked LSTM layer over precomputed input projections.

    xproj: [B, T, 4H] (= x @ Wx + b), wh: [H, 4H], mask: [B, T] float
    (monotone per row). Returns masked hidden states ys [B, T, H].
    """
    ys, _ = _fwd_call(
        jnp.swapaxes(xproj, 0, 1), wh, jnp.swapaxes(mask, 0, 1)[..., None], forget_bias
    )
    return jnp.swapaxes(ys, 0, 1)


def _vjp_fwd(xproj, wh, mask, forget_bias):
    xproj_tm = jnp.swapaxes(xproj, 0, 1)
    mask_tm = jnp.swapaxes(mask, 0, 1)[..., None]
    ys, cs = _fwd_call(xproj_tm, wh, mask_tm, forget_bias)
    return jnp.swapaxes(ys, 0, 1), (xproj_tm, wh, mask_tm, ys, cs)


def _vjp_bwd(forget_bias, res, gys):
    xproj_tm, wh, mask_tm, ys, cs = res
    dxproj, dwh = _bwd_call(
        xproj_tm, wh, mask_tm, ys, cs, jnp.swapaxes(gys, 0, 1), forget_bias
    )
    return jnp.swapaxes(dxproj, 0, 1), dwh, None


lstm_layer_pallas.defvjp(_vjp_fwd, _vjp_bwd)


# ---------------------------------------------------------------------------
# Fused bidirectional kernel: both directions advance in ONE grid walk, so
# their independent recurrent matmul chains pipeline into the MXU and hide
# each other's latency. Two separate pallas_calls cannot overlap (custom
# calls serialize on the core), which is exactly where the two-lax.scan XLA
# path wins by overlapping its while-loops — this kernel restores that
# overlap AND keeps weights/state VMEM-resident. The backward direction's
# inputs arrive already valid-prefix-reversed (the rnn.py wrapper reuses its
# _flip_valid gather), so both directions share one monotone mask.
# ---------------------------------------------------------------------------


def _bidi_fwd_kernel(
    forget_bias,
    xf_ref, xb_ref,  # [K, B, 4H] each
    whf_ref, whb_ref,  # [H, 4H] each
    mask_ref,  # [K, B, 1]
    ysf_ref, ysb_ref, csf_ref, csb_ref,  # [K, B, H] outs
    hf_scr, cf_scr, hb_scr, cb_scr,  # [B, H] carried state
):
    @pl.when(pl.program_id(0) == 0)
    def _():
        for s in (hf_scr, cf_scr, hb_scr, cb_scr):
            s[:] = jnp.zeros_like(s)

    hdim = hf_scr.shape[-1]
    for k in range(xf_ref.shape[0]):
        m = mask_ref[k]
        # issue both directions' matmuls back-to-back: independent chains.
        # Streamed xproj may be bf16 (stream_dtype): the add with the f32
        # dot upcasts; the carried state and all gate math stay f32, so the
        # recurrence itself is full-precision — only the HBM streams round.
        gates_f = xf_ref[k].astype(jnp.float32) + jnp.dot(
            hf_scr[:], whf_ref[:], preferred_element_type=jnp.float32
        )
        gates_b = xb_ref[k].astype(jnp.float32) + jnp.dot(
            hb_scr[:], whb_ref[:], preferred_element_type=jnp.float32
        )
        for gates, h_scr, c_scr, ys_ref, cs_ref in (
            (gates_f, hf_scr, cf_scr, ysf_ref, csf_ref),
            (gates_b, hb_scr, cb_scr, ysb_ref, csb_ref),
        ):
            h_prev, c_prev = h_scr[:], c_scr[:]
            i, f, g, o = _gates_fwd(gates, hdim, forget_bias)
            c = f * c_prev + i * g
            h = o * jnp.tanh(c)
            h = jnp.where(m > 0, h, h_prev)
            c = jnp.where(m > 0, c, c_prev)
            h_scr[:] = h
            c_scr[:] = c
            ys_ref[k] = (h * m).astype(ys_ref.dtype)
            cs_ref[k] = c.astype(cs_ref.dtype)


def _bidi_bwd_kernel(
    forget_bias,
    xf_ref, xb_ref,
    whf_ref, whb_ref,
    mask_ref,
    ysf_prev_ref, ysb_prev_ref,  # shifted h streams
    csf_ref, csb_ref,
    csf_prev_ref, csb_prev_ref,  # shifted c streams
    gysf_ref, gysb_ref,
    dxf_ref, dxb_ref,  # out [K, B, 4H]
    dhf_scr, dcf_scr, dhb_scr, dcb_scr,
):
    # dWh_f/dWh_b are reduced outside from the streamed dxf/dxb (see
    # _bwd_kernel) — keeps this kernel's VMEM inside the default budget
    @pl.when(pl.program_id(0) == 0)
    def _():
        for s in (dhf_scr, dcf_scr, dhb_scr, dcb_scr):
            s[:] = jnp.zeros_like(s)

    hdim = dhf_scr.shape[-1]
    for k in reversed(range(xf_ref.shape[0])):
        m = mask_ref[k] > 0
        for (x_ref, wh_ref, ysp_ref, cs_ref, csp_ref, gys_ref, dx_ref,
             dh_scr, dc_scr) in (
            (xf_ref, whf_ref, ysf_prev_ref, csf_ref, csf_prev_ref, gysf_ref,
             dxf_ref, dhf_scr, dcf_scr),
            (xb_ref, whb_ref, ysb_prev_ref, csb_ref, csb_prev_ref, gysb_ref,
             dxb_ref, dhb_scr, dcb_scr),
        ):
            # streamed residuals may be bf16 (stream_dtype); compute in f32
            h_prev = ysp_ref[k].astype(jnp.float32)
            c_prev = csp_ref[k].astype(jnp.float32)
            gates = x_ref[k].astype(jnp.float32) + jnp.dot(
                h_prev, wh_ref[:], preferred_element_type=jnp.float32
            )
            i, f, g, o = _gates_fwd(gates, hdim, forget_bias)
            dh_total = gys_ref[k].astype(jnp.float32) * m + dh_scr[:]
            tc = jnp.tanh(cs_ref[k].astype(jnp.float32))
            do = dh_total * tc
            dc_total = dc_scr[:] + dh_total * o * (1.0 - tc * tc)
            dgates = jnp.concatenate(
                [
                    dc_total * g * i * (1.0 - i),
                    dc_total * c_prev * f * (1.0 - f),
                    dc_total * i * (1.0 - g * g),
                    do * o * (1.0 - o),
                ],
                axis=-1,
            )
            dgates = jnp.where(m, dgates, 0.0)
            dx_ref[k] = dgates.astype(dx_ref.dtype)
            dh_prev = jax.lax.dot_general(
                dgates, wh_ref[:], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dh_scr[:] = jnp.where(m, dh_prev, dh_total)
            dc_scr[:] = jnp.where(m, dc_total * f, dc_scr[:])


# block sizes chosen so each kernel's resident weights + double-buffered
# streams fit the default 16 MB scoped-VMEM budget at H=512 (raising the
# budget via CompilerParams compiled but caused runtime TPU faults in large
# programs — keep inside the default)
_BLOCK_T_BIDI = 4
# bwd kt=2, not 4: measured perf-identical (headline bench 693 vs 697
# utts/s; layer microbench flat at B=64 too — benchmarks/lstm_kt_sweep.py)
# but kt=4's backward hits an 18.38M > 16M scoped-VMEM overflow when the
# kernel is compiled inside the attention-decoder training program
# (round-3 cap_raise_probe; same kernel alone or in the CTC program fits).
# kt=2 gives every measured composition headroom.
_BLOCK_T_BIDI_BWD = 2


def _bidi_fwd_call(xf, xb, whf, whb, mask_tm, forget_bias: float):
    t, b, g4 = xf.shape
    h = g4 // 4
    sdt = xf.dtype  # stream dtype (bf16 streams under compute_dtype)
    isz = jnp.dtype(sdt).itemsize
    kt = _scale_kt(_BLOCK_T_BIDI, t, b, h)
    t_pad = _common_t_pad(t, b, h, (_BLOCK_T_BIDI, _BLOCK_T_BIDI_BWD))
    nb = t_pad // kt
    xf, xb, mask_tm = _pad_t(xf, t_pad), _pad_t(xb, t_pad), _pad_t(mask_tm, t_pad)
    kernel = functools.partial(_bidi_fwd_kernel, float(forget_bias))
    step = lambda i: (i, 0, 0)
    const = lambda i: (0, 0)
    tm = lambda d: pl.BlockSpec((kt, b, d), step, memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((h, g4), const, memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[tm(g4), tm(g4), wspec, wspec, tm(1)],
        out_specs=[tm(h)] * 4,
        out_shape=[jax.ShapeDtypeStruct((t_pad, b, h), sdt)] * 4,
        scratch_shapes=[pltpu.VMEM((b, h), jnp.float32)] * 4,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * g4 * t_pad + 24 * b * g4 * t_pad,
            bytes_accessed=(2 * xf.size + 4 * t_pad * b * h) * isz + 2 * h * g4 * 4,
            transcendentals=8 * b * g4 * t_pad,
        ),
        interpret=_interpret(),
    )(xf, xb, whf, whb, mask_tm)
    ysf, ysb, csf, csb = (o[:t] for o in outs)
    return ysf, ysb, csf, csb


def _bidi_bwd_call(xf, xb, whf, whb, mask_tm, ysf, ysb, csf, csb, gysf, gysb,
                   forget_bias: float):
    t, b, g4 = xf.shape
    h = g4 // 4
    sdt = xf.dtype
    isz = jnp.dtype(sdt).itemsize
    gysf, gysb = gysf.astype(sdt), gysb.astype(sdt)
    kt = _scale_kt(_BLOCK_T_BIDI_BWD, t, b, h)
    t_pad = _common_t_pad(t, b, h, (_BLOCK_T_BIDI, _BLOCK_T_BIDI_BWD))
    nb = t_pad // kt
    pad = lambda x: _pad_t(x, t_pad)
    ins = [
        pad(xf), pad(xb), whf, whb, pad(mask_tm),
        pad(_shift_one(ysf)), pad(_shift_one(ysb)),
        pad(csf), pad(csb),
        pad(_shift_one(csf)), pad(_shift_one(csb)),
        pad(gysf), pad(gysb),
    ]
    kernel = functools.partial(_bidi_bwd_kernel, float(forget_bias))
    rev = lambda i: (nb - 1 - i, 0, 0)
    const = lambda i: (0, 0)
    tm = lambda d: pl.BlockSpec((kt, b, d), rev, memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((h, g4), const, memory_space=pltpu.VMEM)
    dxf, dxb = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[tm(g4), tm(g4), wspec, wspec, tm(1)] + [tm(h)] * 8,
        out_specs=[tm(g4), tm(g4)],
        out_shape=[
            jax.ShapeDtypeStruct((t_pad, b, g4), sdt),
            jax.ShapeDtypeStruct((t_pad, b, g4), sdt),
        ],
        scratch_shapes=[pltpu.VMEM((b, h), jnp.float32)] * 4,
        cost_estimate=pl.CostEstimate(
            flops=8 * b * h * g4 * t_pad + 60 * b * g4 * t_pad,
            bytes_accessed=(4 * xf.size + 12 * t_pad * b * h) * isz + 2 * h * g4 * 4,
            transcendentals=10 * b * g4 * t_pad,
        ),
        interpret=_interpret(),
    )(*ins)
    dxf, dxb = dxf[:t], dxb[:t]
    # dWh per direction: one big contraction over [T*B] (MXU-efficient)
    contract = lambda hs, dg: jax.lax.dot_general(
        _shift_one(hs), dg, (((0, 1), (0, 1)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return dxf, dxb, contract(ysf, dxf), contract(ysb, dxb)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def lstm_bidi_pallas(xproj_f, xproj_b, wh_f, wh_b, mask, forget_bias: float = 1.0):
    """Fused bidirectional LSTM layer over precomputed input projections.

    xproj_f/xproj_b: [B, T, 4H] (xproj_b already valid-prefix-reversed),
    wh_*: [H, 4H], mask: [B, T] float (monotone). Returns
    (ys_f, ys_b_reversed_order) each [B, T, H]; the caller un-reverses ys_b.
    """
    outs = _bidi_fwd_call(
        jnp.swapaxes(xproj_f, 0, 1), jnp.swapaxes(xproj_b, 0, 1),
        wh_f, wh_b, jnp.swapaxes(mask, 0, 1)[..., None], forget_bias,
    )
    return jnp.swapaxes(outs[0], 0, 1), jnp.swapaxes(outs[1], 0, 1)


def _bidi_vjp_fwd(xproj_f, xproj_b, wh_f, wh_b, mask, forget_bias):
    xf = jnp.swapaxes(xproj_f, 0, 1)
    xb = jnp.swapaxes(xproj_b, 0, 1)
    mask_tm = jnp.swapaxes(mask, 0, 1)[..., None]
    ysf, ysb, csf, csb = _bidi_fwd_call(xf, xb, wh_f, wh_b, mask_tm, forget_bias)
    res = (xf, xb, wh_f, wh_b, mask_tm, ysf, ysb, csf, csb)
    return (jnp.swapaxes(ysf, 0, 1), jnp.swapaxes(ysb, 0, 1)), res


def _bidi_vjp_bwd(forget_bias, res, gys):
    xf, xb, wh_f, wh_b, mask_tm, ysf, ysb, csf, csb = res
    gysf, gysb = (jnp.swapaxes(g, 0, 1) for g in gys)
    dxf, dxb, dwhf, dwhb = _bidi_bwd_call(
        xf, xb, wh_f, wh_b, mask_tm, ysf, ysb, csf, csb, gysf, gysb, forget_bias
    )
    return (
        jnp.swapaxes(dxf, 0, 1), jnp.swapaxes(dxb, 0, 1), dwhf, dwhb, None,
    )


lstm_bidi_pallas.defvjp(_bidi_vjp_fwd, _bidi_vjp_bwd)
