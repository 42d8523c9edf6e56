"""CTC prefix beam search: device implementation vs slow host reference."""

import math

import jax.numpy as jnp
import numpy as np

from tensorflow_end2end_speech_recognition_tpu.decoding.ctc_prefix_beam import (
    ctc_prefix_beam_search,
)


def host_prefix_beam(log_probs, blank, beam_width):
    """Textbook Hannun prefix beam search with dicts (host oracle)."""
    T, C = log_probs.shape
    NEG = -float("inf")

    def lse(*xs):
        xs = [x for x in xs if x != NEG]
        if not xs:
            return NEG
        m = max(xs)
        return m + math.log(sum(math.exp(x - m) for x in xs))

    beams = {(): (0.0, NEG)}  # prefix -> (pb, pnb)
    for t in range(T):
        new = {}
        for prefix, (pb, pnb) in beams.items():
            total = lse(pb, pnb)
            # blank
            npb, npnb = new.get(prefix, (NEG, NEG))
            new[prefix] = (lse(npb, total + log_probs[t, blank]), npnb)
            # repeat last (stays same prefix)
            if prefix:
                c = prefix[-1]
                npb, npnb = new[prefix]
                new[prefix] = (npb, lse(npnb, pnb + log_probs[t, c]))
            for c in range(C):
                if c == blank:
                    continue
                ext = prefix + (c,)
                base = pb if (prefix and c == prefix[-1]) else total
                npb, npnb = new.get(ext, (NEG, NEG))
                new[ext] = (npb, lse(npnb, base + log_probs[t, c]))
        beams = dict(
            sorted(new.items(), key=lambda kv: -lse(*kv[1]))[:beam_width]
        )
    return [(p, lse(*v)) for p, v in sorted(beams.items(), key=lambda kv: -lse(*kv[1]))]


def test_matches_host_reference():
    rng = np.random.RandomState(0)
    b, t, c = 3, 12, 6
    logits = rng.randn(b, t, c).astype(np.float32) * 2
    logit_len = np.array([12, 9, 5])
    blank = c - 1
    W = 8
    prefixes, lengths, scores = ctc_prefix_beam_search(
        jnp.asarray(logits), jnp.asarray(logit_len), blank,
        beam_width=W, top_k_classes=c - 1,
    )
    log_probs = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    for i in range(b):
        ref = host_prefix_beam(log_probs[i, : logit_len[i]], blank, W)
        got_best = tuple(int(x) for x in np.asarray(prefixes[i, 0][: int(lengths[i, 0])]))
        assert got_best == ref[0][0], (got_best, ref[0][0])
        np.testing.assert_allclose(float(scores[i, 0]), ref[0][1], rtol=1e-3, atol=1e-3)
        # top-3 sets should agree too (ordering near-ties can differ)
        got3 = {
            tuple(int(x) for x in np.asarray(prefixes[i, j][: int(lengths[i, j])]))
            for j in range(3)
        }
        ref3 = {p for p, _ in ref[:3]}
        assert len(got3 & ref3) >= 2, (got3, ref3)


def test_blank_dominated_underfull_beam_matches_host():
    """Regression: when live candidates < beam_width (blank-dominated input,
    wide beam), duplicate beam slots used to carry a live prefix's full
    merged mass and double-count it on later frames, inflating scores by
    ~log(duplicates)."""
    rng = np.random.RandomState(7)
    t, c = 10, 6
    blank = c - 1
    logits = rng.randn(1, t, c).astype(np.float32)
    logits[..., blank] += 4.0  # blank dominates every frame
    W = 20  # far more slots than live prefixes on early frames
    prefixes, lengths, scores = ctc_prefix_beam_search(
        jnp.asarray(logits), jnp.asarray([t]), blank, beam_width=W, top_k_classes=c - 1
    )
    log_probs = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    ref = host_prefix_beam(log_probs[0], blank, W)
    got_best = tuple(int(x) for x in np.asarray(prefixes[0, 0][: int(lengths[0, 0])]))
    assert got_best == ref[0][0], (got_best, ref[0][0])
    # the bug inflated the best score by ~log(4); require a tight match
    np.testing.assert_allclose(float(scores[0, 0]), ref[0][1], rtol=1e-3, atol=1e-3)
    # every reported beam score must match the oracle's score for that prefix
    ref_scores = dict(ref)
    for j in range(W):
        p = tuple(int(x) for x in np.asarray(prefixes[0, j][: int(lengths[0, j])]))
        s = float(scores[0, j])
        if s < -1e20:  # dead slot
            continue
        assert p in ref_scores, (j, p)
        np.testing.assert_allclose(s, ref_scores[p], rtol=1e-3, atol=1e-3)


def test_beam1_matches_greedyish():
    """W-K exactness sanity: tiny case where one path dominates."""
    c, blank = 3, 2
    seq = [0, 0, 2, 1]
    logits = np.full((1, 4, c), -8.0, np.float32)
    for t, s in enumerate(seq):
        logits[0, t, s] = 8.0
    prefixes, lengths, scores = ctc_prefix_beam_search(
        jnp.asarray(logits), jnp.asarray([4]), blank, beam_width=4, top_k_classes=2
    )
    best = [int(x) for x in np.asarray(prefixes[0, 0][: int(lengths[0, 0])])]
    assert best == [0, 1]
    assert float(scores[0, 0]) > -0.1  # dominant path, prob ~1


def test_lm_fusion_changes_ranking():
    """An LM that hates class 0 should flip a near-tie away from 0."""
    c, blank = 3, 2
    logits = np.zeros((1, 2, c), np.float32)
    logits[0, :, 0] = 0.1  # acoustically 0 slightly preferred over 1
    logits[0, :, blank] = -5.0

    def lm_fn(prefixes, lengths):
        lp = jnp.zeros(prefixes.shape[:2] + (c,))
        return lp.at[..., 0].set(-5.0)  # LM penalizes 0

    p0, l0, s0 = ctc_prefix_beam_search(
        jnp.asarray(logits), jnp.asarray([2]), blank, beam_width=4, top_k_classes=2
    )
    p1, l1, s1 = ctc_prefix_beam_search(
        jnp.asarray(logits), jnp.asarray([2]), blank, beam_width=4, top_k_classes=2,
        lm_logp_fn=lm_fn, lm_weight=1.0,
    )
    best0 = int(p0[0, 0, 0])
    best1 = int(p1[0, 0, 0])
    assert best0 == 0 and best1 == 1


def test_carried_fusion_matches_full_recompute():
    """The carried-state FusionLM path (O(T) LM steps) must produce the same
    beams and scores as the legacy full-prefix-recompute path (O(T*L))."""
    import jax

    from tensorflow_end2end_speech_recognition_tpu.models.lm import (
        LMConfig,
        init_lm,
        lm_prefix_logp,
        make_fusion_lm,
    )

    n_units = 5  # CTC classes = units + blank
    c = n_units + 1
    blank = n_units
    cfg = LMConfig(vocab=n_units + 2, num_units=8, embedding_dim=4)  # +sos/eos
    lm_params = init_lm(jax.random.PRNGKey(3), cfg)
    sos = n_units  # lm vocab layout: units, sos, eos

    rng = np.random.RandomState(11)
    logits = rng.randn(2, 9, c).astype(np.float32) * 1.5
    logit_len = np.array([9, 6])

    def legacy_fn(prefixes, lengths):
        lp = lm_prefix_logp(lm_params, cfg, prefixes, lengths, sos_id=sos)
        units = lp[..., :n_units]
        return jnp.concatenate([units, jnp.zeros_like(units[..., :1])], -1)

    fused = make_fusion_lm(lm_params, cfg, sos_id=sos, num_ctc_classes=c)

    args = (jnp.asarray(logits), jnp.asarray(logit_len), blank)
    kw = dict(beam_width=6, top_k_classes=n_units, lm_weight=0.5)
    p0, l0, s0 = ctc_prefix_beam_search(*args, lm_logp_fn=legacy_fn, **kw)
    p1, l1, s1 = ctc_prefix_beam_search(*args, fusion_lm=fused, **kw)
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), rtol=1e-4, atol=1e-4)
    # and fusion actually changed the ranking vs no LM somewhere
    p2, _, _ = ctc_prefix_beam_search(*args, beam_width=6, top_k_classes=n_units)
    assert not np.array_equal(np.asarray(p1), np.asarray(p2))


def test_beam_state_avals_stable_under_threading():
    """Threading the state through a jitted advance must not retrace.

    beam_init once shipped weak-typed pb/pnb leaves (jnp.full without an
    explicit dtype); the first advance strengthened them, so every jitted
    streaming driver compiled its chunk program TWICE — measured as
    100-800 ms/chunk of phantom "dispatch overhead" on the remote backend
    (BASELINE.md round 3). Lock the aval stability down.
    """
    import jax

    from tensorflow_end2end_speech_recognition_tpu.decoding.ctc_prefix_beam import (
        beam_advance,
        beam_init,
    )

    state = beam_init(2, 4, 30)
    logits = jnp.asarray(np.random.RandomState(0).randn(2, 5, 8), jnp.float32)
    vl = jnp.full((2,), 5, jnp.int32)
    adv = jax.jit(lambda st, lg: beam_advance(st, lg, vl, 7))
    s = adv(state, logits)
    for name, a, b in zip(state._fields, state, s):
        if a is None:
            continue
        assert a.dtype == b.dtype and a.aval.weak_type == b.aval.weak_type, name
    s = adv(s, logits)
    s = adv(s, logits)
    assert adv._cache_size() == 1
