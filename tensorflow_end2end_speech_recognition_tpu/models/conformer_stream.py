"""Chunked (streaming) execution of chunk-causal conformer/transformer stacks.

The offline stack with ``left_context >= 0`` (models/conformer.py) is
causal by construction: per-query attention windows of self + L past
frames and a left-padded depthwise conv. This module runs the SAME math one chunk
at a time with a bounded per-layer cache, so the chunked outputs equal the
offline outputs exactly (tests assert bit-closeness):

- **KV cache** per layer: the last L keys and values ([B, L, d] each,
  right-aligned). Keys are cached POST-rotation (rotary) — a key's RoPE
  angle depends only on its own global position, fixed at creation — so
  cached entries are reused verbatim, the standard KV-cache property.
- **Conv cache** per layer (conformer blocks): the last k-1 post-GLU conv
  inputs ([B, k-1, d]). Initial zeros reproduce the offline causal conv's
  left zero-padding exactly.
- **Global offset** ``enc_seen`` [B]: frames already consumed per row, so
  absolute sinusoids / rotary angles are computed at true stream
  positions; paused rows (n_new == 0) freeze bit-exactly — every cache
  update is a per-row shift by that row's n_new.

Rows are independent (the ``streaming.py`` slot-multiplexing contract):
each step takes xs [B, F, D] with per-row valid counts n_new [B]; garbage
positions past n_new never enter a cache and never reach a valid query's
window. ``pos_encoding="relative"`` is rejected by ``streaming._validate``
(its rel-shift needs square score matrices); absolute and rotary stream.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .conformer import (
    ConformerSpec,
    _dense,
    _dtype_of,
    _ff,
    _ln,
    _moe_ff,
    _posenc_at,
    _rope_at,
)


def conformer_cache_init(spec: ConformerSpec, batch_size: int):
    """Zeroed stream cache: (enc_seen [B], per-layer (k, v[, conv]) tuples)."""
    if spec.left_context < 0:
        raise ValueError(
            "streaming a conformer/transformer needs left_context >= 0 "
            "(the bidirectional stack has an unbounded window)"
        )
    b, d, L = batch_size, spec.dim, spec.left_context
    layers = []
    for _ in range(spec.num_layers):
        kv = (jnp.zeros((b, L, d), jnp.float32), jnp.zeros((b, L, d), jnp.float32))
        if spec.block == "transformer":
            layers.append(kv)
        else:
            layers.append(kv + (jnp.zeros((b, spec.conv_kernel_size - 1, d),
                                          jnp.float32),))
    return (jnp.zeros((batch_size,), jnp.int32), tuple(layers))


def _shift_in(cache, new, n_new):
    """Per-row append of ``new[:, :n_new]`` to a right-aligned cache.

    cache [B, W, d], new [B, F, d] (positions >= n_new are garbage and are
    never selected), n_new [B] -> [B, W, d]. Row b's result holds the last
    W entries of concat(cache[b], new[b, :n_new[b]]), right-aligned.
    """
    w = cache.shape[1]
    buf = jnp.concatenate([cache, new], axis=1)  # [B, W+F, d]
    pos = jnp.arange(w)[None, :]
    src = jnp.clip(pos + n_new[:, None], 0, buf.shape[1] - 1)
    return jnp.take_along_axis(buf, src[..., None], axis=1)


def _stream_attend(p, x, spec, kc, vc, enc_seen, n_new):
    """One MHSA over [cache, chunk] keys; returns (out, new_k_cache, new_v_cache)."""
    b, f, d = x.shape
    h = spec.num_heads
    dh = d // h
    L = spec.left_context
    dt = _dtype_of(spec)
    y = _ln(p["ln"], x)
    q = _dense(p["q"], y, dt)
    k = _dense(p["k"], y, dt)
    v = _dense(p["v"], y, dt)
    gpos = enc_seen[:, None] + jnp.arange(f)[None, :]  # [B, F] global
    heads = lambda z, t: z.reshape(b, t, h, dh).transpose(0, 2, 1, 3)
    qh = heads(q, f)
    kh = heads(k, f)
    if spec.pos_encoding == "rotary":
        qh = _rope_at(qh, gpos)
        kh = _rope_at(kh, gpos)
    # zero garbage chunk positions BEFORE caching (masked in attention too,
    # but the cache must stay clean for future steps)
    chunk_ok = (jnp.arange(f)[None, :] < n_new[:, None])[..., None]
    k_flat = kh.transpose(0, 2, 1, 3).reshape(b, f, d) * chunk_ok
    v_flat = v * chunk_ok
    new_kc = _shift_in(kc, k_flat, n_new)
    new_vc = _shift_in(vc, v_flat, n_new)

    keys = jnp.concatenate([kc, k_flat], axis=1)  # [B, L+F, d]
    vals = jnp.concatenate([vc, v_flat], axis=1)
    kh_all = heads(keys, L + f)
    vh_all = heads(vals, L + f)
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", qh.astype(dt), kh_all.astype(dt),
        preferred_element_type=jnp.float32,
    ) / jnp.sqrt(jnp.float32(dh))
    # key validity: rel = key position relative to the chunk start
    # (cache keys rel in [-L, -1], chunk keys rel = local index)
    rel = jnp.arange(L + f)[None, :] - L  # [1, L+F]
    qi = jnp.arange(f)[:, None]  # [F, 1]
    dist = qi[None] - rel[:, None, :]  # [B?, F, L+F] via broadcast below
    cache_len = jnp.minimum(enc_seen, L)  # [B]
    key_ok = jnp.where(
        rel < 0, rel >= -cache_len[:, None], rel < n_new[:, None]
    )  # [B, L+F]
    win = (dist >= 0) & (dist <= L)  # [1→B, F, L+F]
    m = win & key_ok[:, None, :]
    scores = jnp.where(m[:, None], scores, -1e30)
    att = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", att.astype(dt), vh_all.astype(dt),
        preferred_element_type=jnp.float32,
    )
    out = out.transpose(0, 2, 1, 3).reshape(b, f, d)
    return _dense(p["o"], out, dt), new_kc, new_vc


def _stream_conv(p, x, spec, yc, n_new):
    """Causal conv module over [cache, chunk]; returns (out, new_conv_cache)."""
    b, f, d = x.shape
    kk = spec.conv_kernel_size
    dt = _dtype_of(spec)
    y = _ln(p["ln"], x)
    y = _dense(p["pw1"], y, dt)
    a, g = jnp.split(y, 2, axis=-1)
    y = a * jax.nn.sigmoid(g)
    y = y * (jnp.arange(f)[None, :] < n_new[:, None])[..., None]
    new_yc = _shift_in(yc, y, n_new)
    buf = jnp.concatenate([yc, y], axis=1)  # [B, k-1+F, d]
    out = jnp.zeros_like(y)
    for i in range(kk):  # tap k-1 = self, tap 0 = oldest (= offline causal)
        out = out + buf[:, i : i + f, :] * p["dw"][i, 0]
    out = jax.nn.swish(_ln(p["norm"], out))
    return _dense(p["pw2"], out, dt), new_yc


def conformer_stream_step(params, spec: ConformerSpec, cache, xs, n_new):
    """One chunk through the stack: (cache, xs [B,F,D], n_new [B]) ->
    (outputs [B,F,dim], new_cache). Positions >= n_new[b] are garbage in
    and out; downstream consumers mask by n_new exactly as the offline
    callers mask by lengths."""
    enc_seen, layer_caches = cache
    b, f, _ = xs.shape
    dt = _dtype_of(spec)
    mask = jnp.arange(f)[None, :] < n_new[:, None]
    x = _dense(params["proj"], xs, dt)
    if spec.pos_encoding == "absolute":
        gpos = enc_seen[:, None] + jnp.arange(f)[None, :]
        x = x + _posenc_at(gpos, spec.dim)
    x = x * mask[..., None]

    new_caches = []
    if spec.block == "transformer":
        for li, p in enumerate(params["layers"]):
            kc, vc = layer_caches[li]
            a, nkc, nvc = _stream_attend(p["mhsa"], x, spec, kc, vc,
                                         enc_seen, n_new)
            x = x + a
            if "moe" in p:
                x = x + _moe_ff(p["moe"], x, mask, spec)[0]
            else:
                x = x + _ff(p["ff"], x, dt)
            new_caches.append((nkc, nvc))
        x = _ln(params["ln_out"], x)
    else:
        for li, p in enumerate(params["layers"]):
            kc, vc, yc = layer_caches[li]
            x = x + 0.5 * _ff(p["ff1"], x, dt)
            a, nkc, nvc = _stream_attend(p["mhsa"], x, spec, kc, vc,
                                         enc_seen, n_new)
            x = x + a
            c, nyc = _stream_conv(p["conv"], x, spec, yc, n_new)
            x = x + c
            if "moe" in p:
                x = x + 0.5 * _moe_ff(p["moe"], x, mask, spec)[0]
            else:
                x = x + 0.5 * _ff(p["ff2"], x, dt)
            x = _ln(p["ln"], x)
            new_caches.append((nkc, nvc, nyc))
    out = x * mask[..., None]
    return out, (enc_seen + n_new, tuple(new_caches))
