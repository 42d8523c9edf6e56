"""On-device RNN-T greedy decoding (frame-synchronous best path).

Standard transducer greedy: at each encoder frame, emit argmax labels —
advancing the prediction network after each — until blank wins or the
per-frame symbol cap is hit, then move to the next frame. Everything is a
static-shape ``lax.scan`` over frames with a fixed inner emission unroll;
the emission grid [B, T', S] compacts with the same cumsum scatter as
``ctc_greedy.py``. The (prediction-state, g) carry is exactly what the
streaming runtime persists between chunks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.transducer import (
    TransducerConfig,
    joint_logits,
    pred_initial_states,
    predict,
)


def _pred_step(params, cfg, states, token):
    """Advance the prediction net one token. token: [B] -> (g [B, J], states)."""
    g, new_states = predict(params, cfg, token[:, None], initial_states=states)
    return g[:, 0], new_states


def _where_state(emit, new, old):
    pick = lambda n, o: jnp.where(emit.reshape((-1,) + (1,) * (n.ndim - 1)), n, o)
    return jax.tree.map(pick, new, old)


def decoder_init(params, cfg: TransducerConfig, batch_size: int):
    """Initial (g, prediction states) — the SOS(blank) step."""
    return _pred_step(
        params, cfg, pred_initial_states(cfg, batch_size),
        jnp.full((batch_size,), cfg.blank_id, jnp.int32),
    )


def decode_frame(params, cfg: TransducerConfig, carry, f_t, frame_ok,
                 max_symbols: int | None = None):
    """One frame's emissions. carry=(g, states); f_t [B, J]; frame_ok [B].

    Returns (carry, emitted [B, S] with -1 in non-emitting slots). Shared
    by offline decode and the streaming chunk step.
    """
    s = max_symbols or cfg.max_symbols_per_frame
    g, states = carry
    blank = cfg.blank_id
    active = frame_ok
    emits = []
    for _ in range(s):
        logits = joint_logits(params, f_t, g)
        k = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        emit = active & (k != blank)
        g_new, st_new = _pred_step(params, cfg, states, jnp.where(emit, k, blank))
        g = jnp.where(emit[:, None], g_new, g)
        states = _where_state(emit, st_new, states)
        emits.append(jnp.where(emit, k, -1))
        active = emit
    return (g, states), jnp.stack(emits, axis=-1)


def transducer_greedy_decode(params, cfg: TransducerConfig, f_proj, enc_len,
                             max_symbols: int | None = None):
    """[B, T', J] joint-space encoder activations -> (-1-padded ids, lengths).

    Output width is T'*S; lengths count emitted symbols per row.
    """
    b, t, _ = f_proj.shape
    s = max_symbols or cfg.max_symbols_per_frame
    carry0 = decoder_init(params, cfg, b)
    frame_ok = (jnp.arange(t)[:, None] < enc_len[None, :])  # [T, B]

    def frame(carry, inp):
        f_t, ok = inp
        return decode_frame(params, cfg, carry, f_t, ok, max_symbols=s)

    _, em = jax.lax.scan(frame, carry0, (jnp.swapaxes(f_proj, 0, 1), frame_ok))
    em = jnp.swapaxes(em, 0, 1).reshape(b, t * s)  # [B, T*S]
    from .ctc_greedy import compact_rows

    return compact_rows(em, em >= 0)
