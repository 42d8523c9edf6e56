"""Decode RTF with LM shallow fusion at W=20: carried vs legacy vs no-LM."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tensorflow_end2end_speech_recognition_tpu.utils.jax_setup import setup
setup()
import time
import jax, jax.numpy as jnp, numpy as np
from tensorflow_end2end_speech_recognition_tpu.decoding.ctc_prefix_beam import ctc_prefix_beam_search
from tensorflow_end2end_speech_recognition_tpu.models.lm import LMConfig, init_lm, lm_prefix_logp, make_fusion_lm

b, t, c = 32, 400, 29  # LS-960 char shapes, 12 s utterances
audio_seconds = b * 12.0
blank = c - 1
rng = np.random.RandomState(0)
logits = jnp.asarray(rng.randn(b, t, c).astype(np.float32))
logit_len = jnp.full((b,), t, jnp.int32)
lm_cfg = LMConfig(vocab=c + 1, num_units=256, embedding_dim=128)  # units+sos/eos
lm_params = init_lm(jax.random.PRNGKey(0), lm_cfg)
sos = c - 1

def legacy_fn(prefixes, lengths):
    lp = lm_prefix_logp(lm_params, lm_cfg, prefixes, lengths, sos_id=sos)
    units = lp[..., : c - 1]
    return jnp.concatenate([units, jnp.zeros_like(units[..., :1])], -1)

fused = make_fusion_lm(lm_params, lm_cfg, sos_id=sos, num_ctc_classes=c)

variants = {
    "no_lm": dict(),
    "carried": dict(fusion_lm=fused, lm_weight=0.3),
    "legacy": dict(lm_logp_fn=legacy_fn, lm_weight=0.3),
}
for name, kw in variants.items():
    @jax.jit
    def run(logits):
        p, l, s = ctc_prefix_beam_search(logits, logit_len, blank, beam_width=20, top_k_classes=16, **kw)
        return p[:, 0], l[:, 0], s[:, 0]
    p, l, s = run(logits); float(s.sum())
    t0 = time.perf_counter()
    for _ in range(5):
        p, l, s = run(logits)
    float(s.sum())
    dt = (time.perf_counter() - t0) / 5
    print(f"{name}: {dt*1e3:.1f} ms/batch  RTF {dt/audio_seconds:.2e}  ({audio_seconds/dt:.0f}x realtime/chip)")
