"""TensorBoard event writer (utils/tb_events.py).

Format correctness is validated two ways: CRC32C against the RFC 3720
test vector (cheap), and a full read-back of a written file through
TensorFlow's own ``summary_iterator`` (the authoritative decoder for the
tfevents format — one TF import, so exactly one such test).
"""

import numpy as np

from tensorflow_end2end_speech_recognition_tpu.utils.tb_events import (
    EventWriter,
    _crc32c,
    _masked_crc,
    _varint,
)


def test_crc32c_test_vector():
    # RFC 3720 / Castagnoli reference vector
    assert _crc32c(b"123456789") == 0xE3069283
    assert _crc32c(b"") == 0
    assert 0 <= _masked_crc(b"abc") <= 0xFFFFFFFF


def test_varint():
    assert _varint(0) == b"\x00"
    assert _varint(1) == b"\x01"
    assert _varint(300) == b"\xac\x02"


def test_tf_reads_back_events(tmp_path):
    import pytest

    tf = pytest.importorskip("tensorflow")

    w = EventWriter(tmp_path)
    w.write_scalars(1, {"train/loss": 1.5, "train/lr": 1e-3})
    w.write_scalars(20, {"dev/error_rate": 0.25})
    w.close()

    events = list(tf.compat.v1.train.summary_iterator(str(w.path)))
    assert events[0].file_version == "brain.Event:2"
    scalars = {}
    for e in events[1:]:
        for v in e.summary.value:
            scalars[(e.step, v.tag)] = v.simple_value
    assert scalars[(1, "train/loss")] == np.float32(1.5)
    assert scalars[(1, "train/lr")] == np.float32(1e-3)
    assert scalars[(20, "dev/error_rate")] == np.float32(0.25)


def test_fit_writes_event_files(tmp_path):
    from tensorflow_end2end_speech_recognition_tpu.train.loop import fit
    from tensorflow_end2end_speech_recognition_tpu.utils.config import (
        ExperimentConfig,
    )

    exp = ExperimentConfig(
        model_type="ctc", label_type="phone61", encoder_type="blstm",
        num_units=16, num_layers=1, batch_size=4, num_epoch=1,
        toy_num_utts=8, toy_max_units=4, use_delta=False, use_energy=False,
    )
    fit(exp, str(tmp_path / "m"), log_every=1, print_fn=lambda *a: None)
    files = list((tmp_path / "m" / "events").glob("events.out.tfevents.*"))
    assert len(files) == 1 and files[0].stat().st_size > 0
