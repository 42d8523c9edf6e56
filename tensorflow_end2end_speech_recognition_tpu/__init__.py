"""TPU-native end-to-end speech recognition framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
``hirofumi0810/tensorflow_end2end_speech_recognition`` (TF1-era CTC /
attention / joint CTC-attention ASR). Nothing here is a translation of the
reference: the compute path is functional JAX traced once under ``jit``,
the acoustic frontend is fused XLA matmuls, encoders are ``lax.scan`` RNNs
with fused gate projections, CTC loss is a log-space forward-backward with
a Pallas kernel option, and decoding (greedy / CTC prefix beam / attention
beam / joint rescoring) runs on-device with batched hypothesis tensors.

Package layout (see SURVEY.md for the reference component inventory):

- ``frontend``  acoustic features: framing, log-mel fbank, deltas, CMVN
- ``data``      tokenizers, frame stacking/splicing, bucketed datasets
- ``models``    encoders (BLSTM/pBLSTM/VGG/CNN), attention scorers, decoders
- ``ops``       CTC forward-backward (pure-JAX + Pallas), label smoothing
- ``decoding``  greedy collapse, CTC prefix beam, attention beam, rescoring
- ``parallel``  mesh construction + data-parallel sharding helpers
- ``train``     optimizers, LR plateau controller, jitted steps, loops
- ``utils``     config (reference-shaped YAML), edit distance, metrics
- ``bin``       train / eval / decode entry points
"""

__version__ = "0.1.0"
