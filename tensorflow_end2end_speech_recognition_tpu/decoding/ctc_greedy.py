"""On-device CTC greedy decoding (best-path collapse).

Replaces the reference's ``tf.nn.ctc_greedy_decoder`` (C++ CPU kernel; SURVEY
§2.8) with a fully vectorized device program: argmax per frame, then a
dedup/de-blank compaction done with a cumulative-sum scatter — no host
round-trip, no ragged shapes (outputs are ``-1``-padded ``[B, T]``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def compact_rows(values: jnp.ndarray, keep: jnp.ndarray, fill: int = -1):
    """Left-pack each row's kept entries: cumsum scatter, -1 beyond length.

    ``values``/``keep``: [B, N]. Returns (packed [B, N] ``fill``-padded,
    lengths [B]). The shared emission-compaction idiom of every decoder
    (CTC greedy collapse, transducer emission grids, streaming steps).
    """
    n = values.shape[1]
    pos = jnp.cumsum(keep, axis=1) - 1  # target slot per kept entry
    pos = jnp.where(keep, pos, n)  # dropped entries scatter out of range

    def compact(row_ids, row_pos):
        return jnp.full((n,), fill, row_ids.dtype).at[row_pos].set(
            row_ids, mode="drop"
        )

    return jax.vmap(compact)(values, pos), jnp.sum(keep, axis=1).astype(jnp.int32)


def ctc_greedy_decode(logits: jnp.ndarray, logit_len: jnp.ndarray, blank_id: int):
    """[B, T, C] logits -> (decoded [B, T] -1-padded, lengths [B])."""
    ids = jnp.argmax(logits, axis=-1)  # [B, T]
    b, t = ids.shape
    prev = jnp.pad(ids[:, :-1], ((0, 0), (1, 0)), constant_values=-1)
    valid = jnp.arange(t)[None, :] < logit_len[:, None]
    keep = (ids != prev) & (ids != blank_id) & valid
    return compact_rows(ids, keep)
