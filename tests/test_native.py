"""C++ host runtime: batch assembler and batched Levenshtein vs oracles."""

import numpy as np
import Levenshtein

from tensorflow_end2end_speech_recognition_tpu.data.native import (
    batch_assemble,
    have_native,
    levenshtein_batch,
)


def test_native_library_builds_and_loads():
    assert have_native(), "C++ toolchain present in this environment; lib must build"


def test_batch_assemble_matches_numpy():
    rng = np.random.RandomState(0)
    utts = [rng.randn(n).astype(np.float32) for n in (5, 9, 3)]
    out, lens = batch_assemble(utts, t_pad=12)
    assert out.shape == (3, 12)
    np.testing.assert_array_equal(lens, [5, 9, 3])
    for i, u in enumerate(utts):
        np.testing.assert_array_equal(out[i, : len(u)], u)
        assert np.all(out[i, len(u) :] == 0)
    # 2-D feature mode
    feats = [rng.randn(n, 4).astype(np.float32) for n in (2, 6)]
    out2, lens2 = batch_assemble(feats, t_pad=8)
    assert out2.shape == (2, 8, 4)
    np.testing.assert_array_equal(out2[0, :2], feats[0])
    assert np.all(out2[0, 2:] == 0)


def test_levenshtein_batch_matches_library():
    rng = np.random.RandomState(1)
    refs, hyps = [], []
    for _ in range(40):
        refs.append(rng.randint(0, 10, rng.randint(1, 15)).tolist())
        hyps.append(rng.randint(0, 10, rng.randint(0, 15)).tolist())
    out = levenshtein_batch(refs, hyps)
    for i in range(40):
        enc = lambda seq: "".join(chr(0x100 + t) for t in seq)
        expected = Levenshtein.distance(enc(refs[i]), enc(hyps[i]))
        assert out[i, 0] == expected, (i, refs[i], hyps[i], out[i])
        # distance decomposes into S+I+D
        assert out[i, 0] == out[i, 1] + out[i, 2] + out[i, 3]


def test_levenshtein_edge_cases():
    out = levenshtein_batch([[1, 2, 3]], [[]])
    np.testing.assert_array_equal(out[0], [3, 0, 0, 3])  # all deletions
    out = levenshtein_batch([[]], [[7, 8]])
    np.testing.assert_array_equal(out[0], [2, 0, 2, 0])  # all insertions
    out = levenshtein_batch([[5, 5]], [[5, 5]])
    np.testing.assert_array_equal(out[0], [0, 0, 0, 0])
