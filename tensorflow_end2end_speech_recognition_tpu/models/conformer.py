"""Conformer (Gulati et al. 2020) and Transformer (Vaswani et al. 2017)
encoder blocks — TPU-first extensions.

Beyond the reference's encoder zoo (SURVEY.md §2.5 stops at BLSTM/VGG/CNN),
but the natural modern encoders for this framework: every op here is
parallel over the time axis — feed-forwards, multi-head self-attention,
and (conformer) a depthwise-conv module are all large batched matmuls /
convs that fill the MXU, with none of the serial per-step chain that
latency-bounds the recurrent encoders. Selected via ``encoder_type:
conformer`` / ``encoder_type: transformer`` and usable by every model
family (CTC, attention, joint) through the same ``EncoderOutput`` contract.

``block="conformer"`` layers are macaron: ½FF → MHSA → conv → ½FF → LN.
``block="transformer"`` layers are pre-LN: x += MHSA(LN x); x += FF(LN x),
with one final stack LayerNorm (the standard pre-LN arrangement, which
trains without warmup-critical post-LN instabilities).

Simplifications vs the papers, documented: absolute sinusoidal positions
(not relative — fine at these sequence lengths), LayerNorm in the conv
module instead of BatchNorm (no cross-batch state to manage under jit;
a standard substitution).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .rnn import dropout


class ConformerSpec(NamedTuple):
    dim: int = 256
    num_layers: int = 8
    num_heads: int = 4
    conv_kernel_size: int = 15
    ff_expansion: int = 4
    compute_dtype: str = "float32"  # "bfloat16": big matmuls at 2x MXU rate,
    # f32 accumulation/residuals (unlike the LSTM, these are not latency-bound)
    block: str = "conformer"  # "conformer" (macaron+conv) | "transformer" (pre-LN)
    # "conv": grouped lax.conv (fast single-device/DP path — measured 71.8 vs
    # 87.3 ms/step at 8x512 for the alternative). "shifts": k padded slices x
    # elementwise FMAs — required on 2-D (data x model) meshes, where XLA's
    # SPMD partitioner silently produces a ZERO kernel gradient for grouped
    # convolutions (measured on this toolchain; 1-D DP meshes are fine).
    # train/loop.py + utils/config.py route this on num_model_shards.
    depthwise_impl: str = "conv"
    # Mixture-of-Experts feed-forward (models/moe docstring below): > 1
    # replaces the block's FINAL FF (transformer's ff, conformer's ff2) with
    # a top-k-gated expert bank whose stacked weights shard over an
    # ``expert`` mesh axis (parallel/ep.py). 0/1 = dense FF.
    moe_experts: int = 0
    moe_top_k: int = 2
    moe_aux_weight: float = 1e-2  # Switch-style load-balance loss weight
    # "absolute": sinusoidal posenc added at stack entry (the documented
    # round-2 simplification). "relative": Transformer-XL / Conformer-paper
    # relative-position MHSA — scores (q+u)·k + rel_shift((q+v)·r) with a
    # learned projection r of sinusoidal relative embeddings and per-head
    # u/v biases; length-generalizing and the paper's actual scheme, but
    # MEASURED 1.8-2.0x the train step on TPU (the [B,h,T,2T-1] BD term —
    # BASELINE.md round 3). "rotary": RoPE — q/k rotated per position before
    # the scores; relative semantics at ~the absolute cost (no extra
    # matmuls, no learned position params). Prefer rotary on TPU.
    pos_encoding: str = "absolute"
    # -1: full bidirectional attention + SAME-padded conv (offline). >= 0:
    # CHUNK-CAUSAL — each query attends itself + at most `left_context`
    # past frames, and the depthwise conv is left-padded only (no future) so
    # the stack streams with a bounded per-layer cache
    # (models/conformer_stream.py); train offline with the same masks and
    # the chunked decode equals the offline decode exactly.
    left_context: int = -1

    def validate(self):
        """Raise a clear config error instead of an opaque in-jit reshape."""
        if self.dim % self.num_heads:
            raise ValueError(
                f"conformer dim {self.dim} must be divisible by num_heads "
                f"{self.num_heads}"
            )
        if self.dim % 2:
            raise ValueError(
                f"conformer dim {self.dim} must be even (sinusoidal posenc "
                f"pairs sin/cos channels)"
            )
        if self.pos_encoding not in ("absolute", "relative", "rotary"):
            raise ValueError(
                f"pos_encoding must be 'absolute', 'relative' or 'rotary', "
                f"got {self.pos_encoding!r}"
            )
        if self.pos_encoding == "rotary" and (self.dim // self.num_heads) % 2:
            raise ValueError(
                f"rotary needs an even head dim, got "
                f"{self.dim}/{self.num_heads} = {self.dim // self.num_heads}"
            )


def _xavier(key, fin, fout):
    s = jnp.sqrt(6.0 / (fin + fout))
    return jax.random.uniform(key, (fin, fout), jnp.float32, -s, s)


def _dense_init(key, fin, fout):
    return {"w": _xavier(key, fin, fout), "b": jnp.zeros((fout,), jnp.float32)}


def _dtype_of(spec: "ConformerSpec"):
    return jnp.bfloat16 if spec.compute_dtype == "bfloat16" else jnp.float32


def _dense(p, x, dt=jnp.float32):
    return (
        jnp.matmul(x.astype(dt), p["w"].astype(dt), preferred_element_type=jnp.float32)
        + p["b"]
    )


def _ln_init(d):
    return {"g": jnp.ones((d,), jnp.float32), "b": jnp.zeros((d,), jnp.float32)}


def _ln(p, x, eps=1e-6):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["g"] + p["b"]


def _ff_init(key, spec: ConformerSpec):
    k1, k2 = jax.random.split(key)
    e = spec.dim * spec.ff_expansion
    return {"ln": _ln_init(spec.dim), "in": _dense_init(k1, spec.dim, e),
            "out": _dense_init(k2, e, spec.dim)}


def _ff(p, x, dt):
    y = _ln(p["ln"], x)
    y = jax.nn.swish(_dense(p["in"], y, dt))
    return _dense(p["out"], y, dt)


def _moe_init(key, spec: ConformerSpec):
    """Mixture-of-Experts FF: router [d, E] + STACKED expert weights.

    The leading expert axis is the sharding handle: ``parallel/ep.py``
    places ``in``/``out`` leaves as ``P("expert", ...)`` so each chip holds
    E/S experts (and their optimizer moments) — the parameter-scaling axis
    for the FF, the way ``tp`` is for attention.
    """
    kr, k1, k2 = jax.random.split(key, 3)
    d, e, n = spec.dim, spec.dim * spec.ff_expansion, spec.moe_experts
    s_in = jnp.sqrt(6.0 / (d + e))
    s_out = jnp.sqrt(6.0 / (e + d))
    return {
        "ln": _ln_init(d),
        # small router init: near-uniform initial gates (standard practice —
        # early routing should be driven by the aux loss, not init noise)
        "router": {"w": 0.01 * jax.random.normal(kr, (d, n), jnp.float32)},
        "in": {
            "w": jax.random.uniform(k1, (n, d, e), jnp.float32, -s_in, s_in),
            "b": jnp.zeros((n, e), jnp.float32),
        },
        "out": {
            "w": jax.random.uniform(k2, (n, e, d), jnp.float32, -s_out, s_out),
            "b": jnp.zeros((n, d), jnp.float32),
        },
    }


def _moe_ff(p, x, mask, spec: ConformerSpec):
    """Top-k-gated MoE feed-forward; returns (out [B,T,d], aux_loss scalar).

    Dense-evaluation dispatch, the GSPMD-exact formulation: every expert
    runs on every token ([E, B, T, ff] activations) and the gate matrix
    (zero outside the top-k) combines them. No capacity factor, no token
    dropping, no sorting — static shapes, and under an ``expert``-sharded
    mesh each chip computes only its LOCAL E/S experts over all tokens
    (the combine einsum contracts the expert axis; XLA inserts the
    cross-expert reduce). At ep = E shards the per-chip FF FLOPs equal the
    dense model's with E x the parameters. Single-chip E>4 at production
    shapes pays E x FF compute — the expert axis is a SCALE-OUT feature;
    bound E or shard it. Aux loss is the Switch-Transformer load balancer
    (E * sum_e fraction_e * mean_prob_e over REAL frames; 1.0 = balanced).
    """
    dt = _dtype_of(spec)
    n = spec.moe_experts
    k = min(spec.moe_top_k, n)
    y = _ln(p["ln"], x)
    logits = jnp.matmul(y, p["router"]["w"], preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)  # [B, T, E] f32 routing
    if k < n:
        top_vals = jax.lax.top_k(probs, k)[0]
        gates = jnp.where(probs >= top_vals[..., -1:], probs, 0.0)
        gates = gates / jnp.maximum(jnp.sum(gates, -1, keepdims=True), 1e-9)
    else:
        gates = probs
    h = (
        jnp.einsum("btd,edf->ebtf", y.astype(dt), p["in"]["w"].astype(dt),
                   preferred_element_type=jnp.float32)
        + p["in"]["b"][:, None, None, :]
    )
    h = jax.nn.swish(h)
    o = (
        jnp.einsum("ebtf,efd->ebtd", h.astype(dt), p["out"]["w"].astype(dt),
                   preferred_element_type=jnp.float32)
        + p["out"]["b"][:, None, None, :]
    )
    out = jnp.einsum("ebtd,bte->btd", o, gates)
    m = mask.astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(m), 1.0)
    frac = jnp.sum(
        jax.nn.one_hot(jnp.argmax(probs, -1), n) * m[..., None], (0, 1)
    ) / denom
    mean_p = jnp.sum(probs * m[..., None], (0, 1)) / denom
    aux = n * jnp.sum(frac * mean_p)
    return out, aux


def _mhsa_init(key, spec: ConformerSpec):
    kq, kk, kv, ko, kp = jax.random.split(key, 5)
    d = spec.dim
    p = {
        "ln": _ln_init(d),
        "q": _dense_init(kq, d, d), "k": _dense_init(kk, d, d),
        "v": _dense_init(kv, d, d), "o": _dense_init(ko, d, d),
    }
    if spec.pos_encoding == "relative":
        h, dh = spec.num_heads, d // spec.num_heads
        p["pos"] = {"w": _xavier(kp, d, d)}  # projects rel sinusoids, no bias
        # zero-init content/position biases: at init the scores are the pure
        # content attention, and pos_u/pos_v learn the global/positional
        # offsets ("u"/"v" in the Transformer-XL paper; prefixed here —
        # "v" already names the value projection)
        p["pos_u"] = jnp.zeros((h, dh), jnp.float32)
        p["pos_v"] = jnp.zeros((h, dh), jnp.float32)
    return p


def _rel_posemb(t, d):
    """Sinusoids for relative offsets t-1 .. -(t-1): [2t-1, d]; row k is
    offset (t-1-k), matching ``_rel_shift``'s output convention."""
    pos = jnp.arange(t - 1, -t, -1, dtype=jnp.float32)[:, None]
    i = jnp.arange(d // 2, dtype=jnp.float32)[None, :]
    ang = pos / jnp.power(10000.0, 2.0 * i / d)
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


def _rope_at(x, pos):
    """Rotary embedding on [B, h, T, dh] at explicit GLOBAL positions
    ``pos`` [B, T] (float/int) — the streaming step rotates each chunk at
    its true stream offsets so cached keys stay consistent across chunks."""
    b, h, t, dh = x.shape
    inv = jnp.power(10000.0, -2.0 * jnp.arange(dh // 2, dtype=jnp.float32) / dh)
    theta = pos.astype(jnp.float32)[:, None, :, None] * inv  # [B, 1, T, dh/2]
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    x1, x2 = x[..., 0::2], x[..., 1::2]
    r1 = x1 * cos - x2 * sin
    r2 = x1 * sin + x2 * cos
    return jnp.stack([r1, r2], axis=-1).reshape(b, h, t, dh)


def _rope(x):
    """Rotary position embedding on [B, h, T, dh] (dh even): each channel
    pair (2i, 2i+1) rotates by pos / 10000^(2i/dh). Dot products of rotated
    q/k depend on positions only through their OFFSET — relative semantics
    with zero extra matmuls and no learned position parameters."""
    b, h, t, dh = x.shape
    pos = jnp.broadcast_to(jnp.arange(t, dtype=jnp.float32)[None], (b, t))
    return _rope_at(x, pos)


def _posenc_at(pos, d):
    """Sinusoidal absolute embeddings at explicit positions [B, T] -> [B, T, d]
    (the streaming twin of ``_posenc``; same formula at global offsets)."""
    p = pos.astype(jnp.float32)[..., None]
    i = jnp.arange(d // 2, dtype=jnp.float32)[None, None, :]
    ang = p / jnp.power(10000.0, 2.0 * i / d)
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


def _rel_shift(x):
    """[B, h, T, 2T-1] -> [B, h, T, T] with out[..., i, j] = x[..., i,
    (T-1) - i + j] — the Transformer-XL pad-reshape trick (static shapes,
    no gather; oracle-equality tested)."""
    b, h, t, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 0)))  # [B, h, T, 2T]
    x = x.reshape(b, h, 2 * t, t)
    x = x[:, :, 1:, :].reshape(b, h, t, 2 * t - 1)
    return x[..., :t]


def _mhsa(p, x, mask, spec: ConformerSpec):
    b, t, d = x.shape
    h = spec.num_heads
    dh = d // h
    dt = _dtype_of(spec)
    y = _ln(p["ln"], x)
    split = lambda z: z.reshape(b, t, h, dh).transpose(0, 2, 1, 3)  # [B,h,T,dh]
    q = split(_dense(p["q"], y, dt))
    k = split(_dense(p["k"], y, dt))
    v = split(_dense(p["v"], y, dt))
    if "pos" in p:
        # Transformer-XL relative attention: (q+u)·k + rel_shift((q+v)·r)
        r = jnp.matmul(
            _rel_posemb(t, d).astype(dt), p["pos"]["w"].astype(dt),
            preferred_element_type=jnp.float32,
        )  # [2T-1, d]
        r = r.reshape(2 * t - 1, h, dh).transpose(1, 0, 2)  # [h, 2T-1, dh]
        ac = jnp.einsum(
            "bhqd,bhkd->bhqk", (q + p["pos_u"][None, :, None, :]).astype(dt),
            k.astype(dt), preferred_element_type=jnp.float32,
        )
        bd = jnp.einsum(
            "bhqd,hkd->bhqk", (q + p["pos_v"][None, :, None, :]).astype(dt),
            r.astype(dt), preferred_element_type=jnp.float32,
        )
        scores = ac + _rel_shift(bd)
    else:
        if spec.pos_encoding == "rotary":
            q, k = _rope(q), _rope(k)
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q.astype(dt), k.astype(dt),
            preferred_element_type=jnp.float32,
        )
    scores = scores / jnp.sqrt(jnp.float32(dh))
    scores = jnp.where(mask[:, None, None, :], scores, -1e30)  # mask keys
    if spec.left_context >= 0:
        # chunk-causal window: self + at most left_context past frames
        i = jnp.arange(t)[:, None]
        j = jnp.arange(t)[None, :]
        win = (j <= i) & (i - j <= spec.left_context)
        scores = jnp.where(win[None, None], scores, -1e30)
    att = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", att.astype(dt), v.astype(dt),
        preferred_element_type=jnp.float32,
    )
    out = out.transpose(0, 2, 1, 3).reshape(b, t, d)
    return _dense(p["o"], out, dt)


def _conv_init(key, spec: ConformerSpec):
    k1, k2, k3 = jax.random.split(key, 3)
    d = spec.dim
    s = jnp.sqrt(6.0 / (spec.conv_kernel_size + d))
    return {
        "ln": _ln_init(d),
        "pw1": _dense_init(k1, d, 2 * d),  # GLU halves back to d
        "dw": jax.random.uniform(
            k2, (spec.conv_kernel_size, 1, d), jnp.float32, -s, s
        ),
        "norm": _ln_init(d),
        "pw2": _dense_init(k3, d, d),
    }


def _depthwise_shifts(w, y, causal=False):
    """Depthwise temporal conv as shift-multiply-accumulate.

    ``w``: [k, 1, d]; ``y``: [B, T, d]. Bit-equivalent to
    ``conv_general_dilated(..., feature_group_count=d, padding="SAME")``
    (or the ``((k-1, 0),)`` left-pad when ``causal``) but stated as k
    padded slices x elementwise FMAs, which the SPMD partitioner handles
    exactly (see ``ConformerSpec.depthwise_impl``). Measured 87.3 vs the
    grouped conv's 71.8 ms/step at 8x512 single-chip — hence only the
    model-parallel path pays for it.
    """
    k, t = w.shape[0], y.shape[1]
    # causal: all pad on the left (kernel tap k-1 is "self", 0 the oldest)
    lo = (k - 1) if causal else (k - 1) // 2
    yp = jnp.pad(y, ((0, 0), (lo, k - 1 - lo), (0, 0)))
    out = jnp.zeros_like(y)
    for i in range(k):
        out = out + yp[:, i : i + t, :] * w[i, 0]
    return out


def _conv_module(p, x, mask, spec: ConformerSpec):
    dt = _dtype_of(spec)
    y = _ln(p["ln"], x)
    y = _dense(p["pw1"], y, dt)  # [B, T, 2d]
    a, g = jnp.split(y, 2, axis=-1)
    y = a * jax.nn.sigmoid(g)  # GLU
    y = y * mask[..., None]  # pad frames must not leak through the conv
    causal = spec.left_context >= 0
    if spec.depthwise_impl == "shifts":
        y = _depthwise_shifts(p["dw"], y, causal=causal)
    else:
        k = p["dw"].shape[0]
        y = jax.lax.conv_general_dilated(
            y, p["dw"], window_strides=(1,),
            padding=((k - 1, 0),) if causal else "SAME",
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=spec.dim,
            preferred_element_type=jnp.float32,
        )
    y = jax.nn.swish(_ln(p["norm"], y))
    return _dense(p["pw2"], y, dt)


def init_conformer(key, spec: ConformerSpec, input_dim: int):
    spec.validate()
    keys = jax.random.split(key, spec.num_layers + 1)
    moe = spec.moe_experts and spec.moe_experts > 1
    layers = []
    for i in range(spec.num_layers):
        k1, k2, k3, k4 = jax.random.split(keys[i], 4)
        if spec.block == "transformer":
            layers.append({
                "mhsa": _mhsa_init(k2, spec),
                **({"moe": _moe_init(k4, spec)} if moe
                   else {"ff": _ff_init(k4, spec)}),
            })
        else:
            layers.append({
                "ff1": _ff_init(k1, spec),
                "mhsa": _mhsa_init(k2, spec),
                "conv": _conv_init(k3, spec),
                **({"moe": _moe_init(k4, spec)} if moe
                   else {"ff2": _ff_init(k4, spec)}),
                "ln": _ln_init(spec.dim),
            })
    params = {"proj": _dense_init(keys[-1], input_dim, spec.dim), "layers": layers}
    if spec.block == "transformer":
        params["ln_out"] = _ln_init(spec.dim)  # final pre-LN stack norm
    return params


def _posenc(t, d):
    pos = jnp.arange(t, dtype=jnp.float32)[:, None]
    i = jnp.arange(d // 2, dtype=jnp.float32)[None, :]
    ang = pos / jnp.power(10000.0, 2.0 * i / d)
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)  # [T, d]


def apply_conformer(
    params, spec: ConformerSpec, xs, lengths, train=False, rng=None,
    keep_prob: float = 1.0, shard_fn=None, return_aux: bool = False,
):
    """[B, T, D] -> [B, T, dim]; pad frames zeroed, lengths unchanged.

    ``shard_fn`` (optional): applied to the [B, T, dim] activations at the
    stack entry and after every block — the sequence-parallel hook
    (``parallel/sp.py`` passes a ``with_sharding_constraint`` pinning rows
    over ``data`` and time over ``seq``; GSPMD derives the attention
    gathers and conv halos from it). Identity when None.

    ``return_aux``: also return the mean per-layer MoE load-balance loss
    (0.0 for dense stacks) as ``(x, aux)`` — requested by ``apply_encoder``
    whenever ``moe_experts > 1`` so the train tasks can add it.
    """
    b, t, _ = xs.shape
    dt = _dtype_of(spec)
    sf = shard_fn if shard_fn is not None else (lambda z: z)
    mask = jnp.arange(t)[None, :] < lengths[:, None]  # [B, T]
    x = _dense(params["proj"], xs, dt)
    if spec.pos_encoding == "absolute":
        # absolute sinusoids at stack entry; relative/rotary stacks inject
        # position inside each MHSA (rel-shift scores / rotated q,k)
        x = x + _posenc(t, spec.dim)[None]
    x = sf(x)
    n = len(params["layers"])
    drop_keys = jax.random.split(rng, 4 * n) if (train and rng is not None) else None
    aux_total = jnp.float32(0.0)

    def drop(z, i):
        if drop_keys is None:
            return z
        return dropout(drop_keys[i], z, keep_prob, train)

    def final_ff(p, x, li):
        # the block's final FF: dense, or the top-k expert bank
        if "moe" in p:
            y, aux = _moe_ff(p["moe"], x, mask, spec)
            return y, aux
        return _ff(p[("ff" if spec.block == "transformer" else "ff2")], x, dt), 0.0

    if spec.block == "transformer":
        for li, p in enumerate(params["layers"]):
            x = x + drop(_mhsa(p["mhsa"], x, mask, spec), 4 * li + 1)
            y, aux = final_ff(p, x, li)
            aux_total = aux_total + aux
            x = sf(x + drop(y, 4 * li + 3))
        x = _ln(params["ln_out"], x)
    else:
        for li, p in enumerate(params["layers"]):
            x = x + 0.5 * drop(_ff(p["ff1"], x, dt), 4 * li)
            x = x + drop(_mhsa(p["mhsa"], x, mask, spec), 4 * li + 1)
            x = x + drop(_conv_module(p["conv"], x, mask, spec), 4 * li + 2)
            y, aux = final_ff(p, x, li)
            aux_total = aux_total + aux
            x = x + 0.5 * drop(y, 4 * li + 3)
            x = sf(_ln(p["ln"], x))
    out = x * mask[..., None]
    if return_aux:
        return out, spec.moe_aux_weight * aux_total / n
    return out
