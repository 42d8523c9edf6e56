"""Relative-position MHSA (Transformer-XL / Conformer-paper scheme).

Correctness bars: the pad-reshape ``_rel_shift`` equals an explicit-gather
oracle; the rel-pos scores equal a naive per-offset restatement; zeroed
position parameters reduce to pure content attention; relative attention
is shift-equivariant where absolute is not; the full stack trains e2e.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorflow_end2end_speech_recognition_tpu.models.conformer import (
    ConformerSpec,
    _mhsa,
    _mhsa_init,
    _rel_posemb,
    _rel_shift,
    apply_conformer,
    init_conformer,
)


def _spec(**kw):
    base = dict(dim=16, num_layers=2, num_heads=2, conv_kernel_size=5,
                pos_encoding="relative")
    base.update(kw)
    return ConformerSpec(**base)


def test_rel_shift_matches_gather_oracle():
    b, h, t = 2, 3, 5
    x = jnp.asarray(np.random.RandomState(0).randn(b, h, t, 2 * t - 1)
                    .astype(np.float32))
    got = _rel_shift(x)
    want = np.zeros((b, h, t, t), np.float32)
    for i in range(t):
        for j in range(t):
            want[:, :, i, j] = np.asarray(x)[:, :, i, (t - 1) - i + j]
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)


def test_rel_posemb_convention():
    """Row k of the embedding table is relative offset (t-1-k): row t-1 is
    offset 0, whose sinusoids are sin(0)=0 / cos(0)=1."""
    t, d = 4, 8
    emb = np.asarray(_rel_posemb(t, d))
    assert emb.shape == (2 * t - 1, d)
    np.testing.assert_allclose(emb[t - 1, : d // 2], 0.0, atol=1e-6)
    np.testing.assert_allclose(emb[t - 1, d // 2 :], 1.0, atol=1e-6)


def test_relative_scores_match_naive_offsets():
    """_mhsa's shifted BD term equals the naive (q_i+v)·r_{i-j} gather."""
    spec = _spec(num_layers=1)
    p = _mhsa_init(jax.random.PRNGKey(0), spec)
    p["pos_u"] = jax.random.normal(jax.random.PRNGKey(1), p["pos_u"].shape) * 0.1
    p["pos_v"] = jax.random.normal(jax.random.PRNGKey(2), p["pos_v"].shape) * 0.1
    b, t, d = 2, 6, spec.dim
    h, dh = spec.num_heads, spec.dim // spec.num_heads
    x = jnp.asarray(np.random.RandomState(3).randn(b, t, d).astype(np.float32))
    mask = jnp.ones((b, t), bool)
    got = _mhsa(p, x, mask, spec)

    # naive restatement with explicit per-offset gathers
    from tensorflow_end2end_speech_recognition_tpu.models.conformer import (
        _dense,
        _ln,
    )

    y = _ln(p["ln"], x)
    split = lambda z: z.reshape(b, t, h, dh).transpose(0, 2, 1, 3)
    q, k, v = (split(_dense(p[n], y)) for n in ("q", "k", "v"))
    r = (_rel_posemb(t, d) @ p["pos"]["w"]).reshape(2 * t - 1, h, dh)
    scores = np.zeros((b, h, t, t), np.float32)
    for i in range(t):
        for j in range(t):
            k_idx = (t - 1) - i + j  # row for offset i-j
            scores[:, :, i, j] = np.asarray(
                jnp.einsum("bhd,bhd->bh", q[:, :, i] + p["pos_u"][None], k[:, :, j])
                + jnp.einsum("bhd,hd->bh", q[:, :, i] + p["pos_v"][None],
                             r[k_idx])
            )
    att = jax.nn.softmax(jnp.asarray(scores) / np.sqrt(dh), axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", att, v).transpose(0, 2, 1, 3).reshape(b, t, d)
    want = _dense(p["o"], out)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_zero_pos_params_reduce_to_content_attention():
    spec = _spec(num_layers=1)
    p = _mhsa_init(jax.random.PRNGKey(0), spec)
    p["pos"]["w"] = jnp.zeros_like(p["pos"]["w"])  # pos_u/pos_v already zero
    x = jnp.asarray(np.random.RandomState(0).randn(2, 5, 16).astype(np.float32))
    mask = jnp.arange(5)[None, :] < jnp.asarray([5, 3])[:, None]
    got = _mhsa(p, x, mask, spec)
    abs_spec = _spec(num_layers=1, pos_encoding="absolute")
    p_abs = {k: v for k, v in p.items() if k not in ("pos", "pos_u", "pos_v")}
    want = _mhsa(p_abs, x, mask, abs_spec)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_relative_stack_wiring_and_grads():
    """init_conformer creates pos/u/v per layer for relative stacks (and
    not for absolute ones); gradients flow to all three."""
    spec = _spec(block="transformer")
    params = init_conformer(jax.random.PRNGKey(0), spec, 20)
    for lp in params["layers"]:
        assert {"pos", "pos_u", "pos_v"} <= set(lp["mhsa"])
    abs_params = init_conformer(
        jax.random.PRNGKey(0), spec._replace(pos_encoding="absolute"), 20
    )
    assert "pos" not in abs_params["layers"][0]["mhsa"]

    xs = jnp.asarray(np.random.RandomState(0).randn(2, 8, 20).astype(np.float32))
    g = jax.grad(
        lambda p: jnp.sum(apply_conformer(p, spec, xs, jnp.asarray([8, 5])) ** 2)
    )(params)
    m = g["layers"][0]["mhsa"]
    assert float(np.abs(np.asarray(m["pos"]["w"])).max()) > 0
    assert float(np.abs(np.asarray(m["pos_u"])).max()) > 0
    assert float(np.abs(np.asarray(m["pos_v"])).max()) > 0


def test_rope_scores_depend_only_on_offset():
    """With identical content at every position, rotated-q·rotated-k scores
    must form a Toeplitz matrix (pure function of the offset i-j)."""
    from tensorflow_end2end_speech_recognition_tpu.models.conformer import _rope

    rng = np.random.RandomState(0)
    t, dh = 7, 8
    u = rng.randn(dh).astype(np.float32)
    w = rng.randn(dh).astype(np.float32)
    q = _rope(jnp.broadcast_to(jnp.asarray(u), (1, 1, t, dh)))
    k = _rope(jnp.broadcast_to(jnp.asarray(w), (1, 1, t, dh)))
    s = np.asarray(jnp.einsum("bhqd,bhkd->bhqk", q, k))[0, 0]
    for off in range(-(t - 1), t):
        diag = np.diagonal(s, offset=off)
        np.testing.assert_allclose(diag, diag[0], atol=1e-5)
    # and the scores genuinely VARY with offset (not constant)
    assert np.abs(s[0, 0] - s[0, t - 1]) > 1e-3


def test_rope_preserves_norm():
    from tensorflow_end2end_speech_recognition_tpu.models.conformer import _rope

    x = jnp.asarray(np.random.RandomState(1).randn(2, 3, 5, 8).astype(np.float32))
    r = _rope(x)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(r), axis=-1),
        np.linalg.norm(np.asarray(x), axis=-1), rtol=1e-5,
    )


def test_fit_rotary_conformer_end_to_end(tmp_path):
    from tensorflow_end2end_speech_recognition_tpu.train.loop import fit
    from tensorflow_end2end_speech_recognition_tpu.utils.config import ExperimentConfig

    exp = ExperimentConfig(
        model_type="ctc", label_type="phone61", encoder_type="conformer",
        num_units=16, num_layers=1, num_heads=2, conv_kernel_size=5,
        pos_encoding="rotary",
        batch_size=8, num_epoch=2, toy_num_utts=24, toy_max_units=4,
        use_delta=False, use_energy=False,
    )
    summary = fit(exp, str(tmp_path / "m"), log_every=100, print_fn=lambda *a: None)
    assert np.isfinite(summary["train_loss"])


def test_fit_relative_conformer_end_to_end(tmp_path):
    from tensorflow_end2end_speech_recognition_tpu.train.loop import fit
    from tensorflow_end2end_speech_recognition_tpu.utils.config import ExperimentConfig

    exp = ExperimentConfig(
        model_type="ctc", label_type="phone61", encoder_type="conformer",
        num_units=16, num_layers=1, num_heads=2, conv_kernel_size=5,
        pos_encoding="relative",
        batch_size=8, num_epoch=2, toy_num_utts=24, toy_max_units=4,
        use_delta=False, use_energy=False,
    )
    summary = fit(exp, str(tmp_path / "m"), log_every=100, print_fn=lambda *a: None)
    assert np.isfinite(summary["train_loss"])


def test_validate_rejects_bad_pos_encoding():
    with pytest.raises(ValueError, match="pos_encoding"):
        ConformerSpec(dim=16, num_heads=2, pos_encoding="alibi").validate()
    with pytest.raises(ValueError, match="even head dim"):
        # dh = 18/2 = 9: rotary needs channel pairs
        ConformerSpec(dim=18, num_heads=2, pos_encoding="rotary").validate()
