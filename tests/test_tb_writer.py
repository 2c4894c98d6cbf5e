"""tfevents writer: files must be readable by the real tensorboard loader."""
import glob

import numpy as np

from rtfs_net_tpu.system.tb_writer import TensorBoardLogger, crc32c


def test_crc32c_known_vectors():
    # standard CRC32C test vectors
    assert crc32c(b"") == 0x0
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"\x00" * 32) == 0x8A9136AA


def test_events_readable_by_tensorboard(tmp_path):
    logger = TensorBoardLogger(str(tmp_path), name="exp")
    for step in range(5):
        logger.add_scalar("train_loss", -float(step), step)
    logger.add_scalar("val_loss", 1.5, 0)
    logger.log_hyperparams({"optim": {"lr": 1e-3}, "none_val": None})
    logger.finalize()

    files = glob.glob(str(tmp_path / "exp" / "version_0" / "events.out.tfevents.*"))
    assert len(files) == 1

    # decode with tensorboard's own Event proto (ground truth for format)
    import struct
    from tensorboard.compat.proto.event_pb2 import Event

    raw = open(files[0], "rb").read()
    events, off = [], 0
    while off < len(raw):
        (ln,) = struct.unpack("<Q", raw[off:off + 8])
        off += 12  # len + len-crc
        ev = Event()
        ev.ParseFromString(raw[off:off + ln])
        events.append(ev)
        off += ln + 4  # payload + payload-crc
    assert events[0].file_version == "brain.Event:2"
    scalars = {}
    for ev in events:
        if ev.HasField("summary"):
            for v in ev.summary.value:
                scalars.setdefault(v.tag, []).append((ev.step, v.simple_value))
    assert [s for s, _ in scalars["train_loss"]] == [0, 1, 2, 3, 4]
    np.testing.assert_allclose([v for _, v in scalars["train_loss"]],
                               [0, -1, -2, -3, -4])
    assert scalars["val_loss"] == [(0, 1.5)]


def test_rank_guard(tmp_path):
    logger = TensorBoardLogger(str(tmp_path), name="exp", rank=1)
    logger.add_scalar("x", 1.0, 0)
    logger.log_hyperparams({"a": 1})
    assert not list(tmp_path.glob("**/events.*"))


def test_histogram_event(tmp_path):
    import struct
    from tensorboard.compat.proto.event_pb2 import Event
    from rtfs_net_tpu.system.tb_writer import TensorBoardLogger

    logger = TensorBoardLogger(str(tmp_path), name="h")
    vals = np.random.default_rng(0).standard_normal(1000)
    logger.add_histogram("weights", vals, 3)
    logger.finalize()
    f = next((tmp_path / "h" / "version_0").glob("events.out.tfevents.*"))
    raw = f.read_bytes()
    events, off = [], 0
    while off < len(raw):
        (ln,) = struct.unpack("<Q", raw[off:off + 8]); off += 12
        ev = Event(); ev.ParseFromString(raw[off:off + ln])
        events.append(ev); off += ln + 4
    histos = [v for ev in events if ev.HasField("summary")
              for v in ev.summary.value if v.HasField("histo")]
    assert len(histos) == 1
    h = histos[0].histo
    assert h.num == 1000
    np.testing.assert_allclose(h.sum, vals.sum(), rtol=1e-6)
    assert abs(sum(h.bucket) - 1000) < 1e-6
