"""SpecAugment masking invariants and plot-utility outputs."""

import jax
import jax.numpy as jnp
import numpy as np

from tensorflow_end2end_speech_recognition_tpu.frontend import (
    SpecAugmentConfig,
    spec_augment,
)
from tensorflow_end2end_speech_recognition_tpu.utils.plot import (
    plot_attention_weights,
    plot_ctc_posteriors,
    plot_training_curves,
)


def test_spec_augment_masks_but_preserves_rest():
    cfg = SpecAugmentConfig(freq_mask_width=4, num_freq_masks=2, num_time_masks=2)
    feats = jnp.ones((3, 50, 20))
    feat_len = jnp.asarray([50, 30, 10])
    out = spec_augment(jax.random.PRNGKey(0), feats, feat_len, cfg)
    a = np.asarray(out)
    # masking only ever zeroes; never changes surviving values
    assert set(np.unique(a)).issubset({0.0, 1.0})
    # something was actually masked, but not everything
    assert 0.0 < a.mean() < 1.0
    # different keys give different masks
    b = np.asarray(spec_augment(jax.random.PRNGKey(1), feats, feat_len, cfg))
    assert not np.array_equal(a, b)


def test_plot_utilities_write_files(tmp_path):
    (tmp_path / "metrics.csv").write_text(
        "epoch,step,train_loss,dev_error_rate,lr,utts_per_sec\n"
        "0,5,10.0,1.0,0.001,100\n1,10,5.0,0.8,0.001,120\n"
    )
    outs = plot_training_curves(tmp_path)
    assert all(p.exists() for p in outs)

    rng = np.random.RandomState(0)
    post = np.abs(rng.rand(30, 6))
    post /= post.sum(-1, keepdims=True)
    p = plot_ctc_posteriors(post, tmp_path / "spikes.png", blank_id=5, unit_names=list("abcde"))
    assert p.exists() and p.stat().st_size > 1000

    w = np.abs(rng.rand(8, 20))
    w /= w.sum(-1, keepdims=True)
    p = plot_attention_weights(w, tmp_path / "att.png", hyp_tokens=list("abcdefgh"))
    assert p.exists() and p.stat().st_size > 1000


def test_spec_augment_time_masks_land_on_valid_frames():
    """Time masks stay inside each row's valid region and widths span the
    full {0..max_w} range uniformly-ish (the old randint%(max_w+1) skewed
    small)."""
    cfg = SpecAugmentConfig(freq_mask_width=0, num_freq_masks=0,
                            num_time_masks=1, time_mask_frac=0.2)
    feats = jnp.ones((4, 40, 8))
    feat_len = jnp.asarray([40, 40, 20, 20])
    widths = []
    for s in range(100):
        out = np.asarray(spec_augment(jax.random.PRNGKey(s), feats, feat_len, cfg))
        masked = out[..., 0] == 0.0  # [B, T] time-mask footprint
        for row, n in zip(masked, np.asarray(feat_len)):
            # nothing masked in the pad region
            assert not row[n:].any()
            widths.append(int(row.sum()))
    widths = np.asarray(widths)
    # max_w = 8 (len 40) / 4 (len 20); both extremes must occur, and the
    # distribution must not be clumped at tiny widths
    assert widths.max() >= 7
    assert (widths == 0).any()
    assert widths.mean() > 1.5
