"""Attention scorers: content / location / hybrid / dot-product / Luong family.

Rebuilds the reference's ``models/attention/decoders/attention_layer.py``
(SURVEY.md §2.4): energy functions selected by ``attention_type`` with
sharpening temperature and sigmoid smoothing options. TPU-first shape: the
encoder-side projection ``enc @ W_k`` is precomputed **once per utterance**
(one big MXU matmul) and reused by every decoder step inside the scan; the
per-step work is a rank-1 broadcast add + tanh + a thin matvec (VPU), plus a
1-D conv over the previous alignment for the location terms.

Scorer keys: ``content`` (Bahdanau additive), ``location`` (Chorowski conv
features), ``hybrid`` (content + location — the reference's location-aware
config), ``dot_product``, ``scaled_dot``, ``luong_dot``, ``luong_general``,
``luong_concat``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

ATTENTION_TYPES = (
    "content", "location", "hybrid", "dot_product", "scaled_dot",
    "luong_dot", "luong_general", "luong_concat",
)


class AttentionConfig(NamedTuple):
    attention_type: str = "hybrid"
    attention_dim: int = 128
    conv_num_channels: int = 10
    conv_width: int = 101  # odd; centered conv over previous alignment
    sharpening_factor: float = 1.0
    sigmoid_smoothing: bool = False

    @property
    def uses_content(self) -> bool:
        return self.attention_type in ("content", "hybrid")

    @property
    def uses_location(self) -> bool:
        return self.attention_type in ("location", "hybrid")

    @property
    def additive(self) -> bool:
        return self.attention_type in ("content", "location", "hybrid", "luong_concat")


def _uniform(key, shape, scale=0.1):
    return jax.random.uniform(key, shape, jnp.float32, -scale, scale)


def init_attention(key, cfg: AttentionConfig, enc_dim: int, dec_dim: int, scale=0.1):
    if cfg.attention_type not in ATTENTION_TYPES:
        raise ValueError(
            f"unknown attention_type {cfg.attention_type!r}; expected {ATTENTION_TYPES}"
        )
    k = iter(jax.random.split(key, 8))
    p = {}
    a = cfg.attention_dim
    if cfg.additive:
        p["w_dec"] = _uniform(next(k), (dec_dim, a), scale)
        p["v"] = _uniform(next(k), (a,), scale)
        p["b"] = jnp.zeros((a,), jnp.float32)
        if cfg.uses_content or cfg.attention_type == "luong_concat":
            p["w_enc"] = _uniform(next(k), (enc_dim, a), scale)
        if cfg.uses_location:
            p["conv"] = _uniform(next(k), (cfg.conv_width, 1, cfg.conv_num_channels), scale)
            p["w_loc"] = _uniform(next(k), (cfg.conv_num_channels, a), scale)
    elif cfg.attention_type == "luong_general":
        p["w_gen"] = _uniform(next(k), (dec_dim, enc_dim), scale)
    elif cfg.attention_type in ("dot_product", "scaled_dot", "luong_dot"):
        if dec_dim != enc_dim:
            # reference required matching dims; we add the standard fix-up
            p["w_gen"] = _uniform(next(k), (dec_dim, enc_dim), scale)
    return p


def precompute_keys(params, cfg: AttentionConfig, enc_out: jnp.ndarray):
    """Per-utterance encoder projection, hoisted out of the decoder scan."""
    if cfg.additive and "w_enc" in params:
        return jnp.matmul(enc_out, params["w_enc"], preferred_element_type=jnp.float32)
    return enc_out


def attend(
    params,
    cfg: AttentionConfig,
    enc_out: jnp.ndarray,  # [B, T, He]
    enc_keys: jnp.ndarray,  # precompute_keys output
    enc_mask: jnp.ndarray,  # [B, T] bool
    dec_state: jnp.ndarray,  # [B, Hd]
    prev_align: jnp.ndarray,  # [B, T]
    fused: bool = False,  # Pallas kernel read (differentiable: custom VJP
    # runs the kernel forward, XLA-reference backward)
):
    """One attention read. Returns (context [B, He], align [B, T])."""
    def _fused_fits():
        # scoped-VMEM fit guard (same crash class as the LSTM/CTC kernels:
        # overflow hard-crashes the remote compile helper): the kernel holds
        # [t, A] keys + [t, He] values per row in VMEM
        rnd = lambda x: -(-x // 128) * 128
        t_pad = rnd(enc_out.shape[1])
        vmem = 4 * t_pad * (rnd(cfg.attention_dim) + rnd(enc_out.shape[2]) + 8)
        return vmem <= 12 * 1024 * 1024

    if (
        fused
        and cfg.uses_location
        and not cfg.sigmoid_smoothing
        and jax.default_backend() == "tpu"
        and _fused_fits()
    ):
        from ..ops.pallas.attention_kernel import location_attend_fused

        keys_in = (
            enc_keys + params["b"]
            if cfg.uses_content
            else jnp.broadcast_to(params["b"], enc_keys.shape[:2] + (cfg.attention_dim,))
        )
        q = jnp.matmul(dec_state, params["w_dec"], preferred_element_type=jnp.float32)
        return location_attend_fused(
            keys_in, enc_out, q, prev_align, enc_mask,
            params["conv"], params["w_loc"], params["v"], cfg.sharpening_factor,
        )
    if cfg.additive:
        pre = params["b"]
        if "w_enc" in params:
            pre = pre + enc_keys  # [B, T, A]
        q = jnp.matmul(dec_state, params["w_dec"], preferred_element_type=jnp.float32)
        pre = pre + q[:, None, :]
        if cfg.uses_location:
            f = jax.lax.conv_general_dilated(
                prev_align[..., None], params["conv"],
                window_strides=(1,), padding="SAME",
                dimension_numbers=("NWC", "WIO", "NWC"),
                preferred_element_type=jnp.float32,
            )  # [B, T, C]
            pre = pre + jnp.matmul(f, params["w_loc"], preferred_element_type=jnp.float32)
        energies = jnp.einsum("bta,a->bt", jnp.tanh(pre), params["v"])
    else:
        q = dec_state
        if "w_gen" in params:
            q = jnp.matmul(q, params["w_gen"], preferred_element_type=jnp.float32)
        energies = jnp.einsum("bth,bh->bt", enc_out, q)
        if cfg.attention_type == "scaled_dot":
            energies = energies / jnp.sqrt(jnp.asarray(enc_out.shape[-1], jnp.float32))

    energies = energies * cfg.sharpening_factor
    neg = jnp.asarray(-1e30, energies.dtype)
    energies = jnp.where(enc_mask, energies, neg)
    if cfg.sigmoid_smoothing:
        sig = jax.nn.sigmoid(energies) * enc_mask
        align = sig / jnp.maximum(jnp.sum(sig, axis=-1, keepdims=True), 1e-8)
    else:
        align = jax.nn.softmax(energies, axis=-1)
    context = jnp.einsum("bt,bth->bh", align, enc_out)
    return context, align
