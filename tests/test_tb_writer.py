"""Round-trip tests for the first-party tfevents writer (utils/tb_writer.py)
against the installed tensorboard's event-file loader — the same consumer
the reference's tensorboardX output feeds (SURVEY.md §5.5)."""

import glob
import os
import struct
import zlib

import numpy as np
import pytest

from deepfepe_tpu.utils.tb_writer import TBWriter, crc32c, encode_png

tb_loader = pytest.importorskip(
    "tensorboard.backend.event_processing.event_file_loader"
)


def _load_events(path):
    # RawEventFileLoader: modern tensorboard's EventFileLoader migrates
    # simple_value/histo/image into generic tensors (data_compat); parsing
    # the raw records checks the wire bytes we actually wrote.
    from tensorboard.compat.proto import event_pb2

    return [
        event_pb2.Event.FromString(rec)
        for rec in tb_loader.RawEventFileLoader(path).Load()
    ]


def test_crc32c_known_vectors():
    # RFC 3720 test vectors for CRC32C (Castagnoli).
    assert crc32c(b"") == 0x0
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(bytes(32)) == 0x8A9136AA


def test_scalar_roundtrip(tmp_path):
    w = TBWriter(str(tmp_path))
    w.add_scalar("train/loss", 1.5, step=3)
    w.add_scalar("train/loss", 0.25, step=4)
    w.add_scalar("val/err_q", 12.0, step=4)
    w.close()
    events = _load_events(w.path)
    assert events[0].file_version == "brain.Event:2"
    scalars = [
        (e.step, v.tag, v.simple_value)
        for e in events
        for v in e.summary.value
        if v.HasField("simple_value")
    ]
    assert (3, "train/loss", 1.5) in scalars
    assert (4, "train/loss", 0.25) in scalars
    assert (4, "val/err_q", 12.0) in scalars


def test_histogram_roundtrip(tmp_path):
    w = TBWriter(str(tmp_path))
    vals = np.arange(100, dtype=np.float64)
    w.add_histogram("weights", vals, step=7)
    w.close()
    (ev,) = [e for e in _load_events(w.path) if e.summary.value]
    v = ev.summary.value[0]
    h = v.histo
    assert v.tag == "weights" and ev.step == 7
    assert h.num == 100 and h.min == 0.0 and h.max == 99.0
    assert h.sum == vals.sum() and h.sum_squares == np.square(vals).sum()
    assert sum(h.bucket) == 100
    assert len(h.bucket_limit) == len(h.bucket)


def _decode_png_filter0(data):
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    pos, idat, w, h, color = 8, b"", None, None, None
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        typ = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        if typ == b"IHDR":
            w, h, depth, color = struct.unpack(">IIBB", body[:10])
            assert depth == 8
        elif typ == b"IDAT":
            idat += body
        pos += 12 + ln
    raw = zlib.decompress(idat)
    c = {0: 1, 2: 3, 6: 4}[color]
    stride = 1 + w * c
    rows = [raw[r * stride + 1 : (r + 1) * stride] for r in range(h)]
    return np.frombuffer(b"".join(rows), np.uint8).reshape(h, w, c)


def test_image_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(12, 17, 3), dtype=np.uint8)
    w = TBWriter(str(tmp_path))
    w.add_image("heatmap", img, step=1)
    w.close()
    (ev,) = [e for e in _load_events(w.path) if e.summary.value]
    im = ev.summary.value[0].image
    assert (im.height, im.width, im.colorspace) == (12, 17, 3)
    np.testing.assert_array_equal(
        _decode_png_filter0(im.encoded_image_string), img
    )


def test_float_grayscale_image(tmp_path):
    img = np.linspace(0, 1, 20, dtype=np.float32).reshape(4, 5)
    decoded = _decode_png_filter0(encode_png(img))
    assert decoded.shape == (4, 5, 1)
    np.testing.assert_array_equal(
        decoded[:, :, 0], (img * 255 + 0.5).astype(np.uint8)
    )


@pytest.mark.slow
def test_trainer_writes_tb(tmp_path):
    """MetricLogger with tb enabled mirrors JSONL scalars into tfevents."""
    from deepfepe_tpu.train.loop import MetricLogger

    logger = MetricLogger(
        str(tmp_path / "metrics.jsonl"), tb_dir=str(tmp_path / "runs")
    )
    logger.log(0, "train", {"loss": 2.0, "loss_F": 1.0})
    logger.log(1, "val", {"err_q": 0.5})
    logger.close()
    files = glob.glob(str(tmp_path / "runs" / "events.out.tfevents.*"))
    assert len(files) == 1
    scalars = {
        (e.step, v.tag): v.simple_value
        for e in _load_events(files[0])
        for v in e.summary.value
        if v.HasField("simple_value")
    }
    assert scalars[(0, "train/loss")] == 2.0
    assert scalars[(0, "train/loss_F")] == 1.0
    assert scalars[(1, "val/err_q")] == 0.5


@pytest.mark.slow
def test_validate_logs_histograms_and_strip(tmp_path):
    """Trainer.validate emits weight/residual histograms + a weight-strip
    image to the TB sink (ref: Train_model_pipeline.py:772-815, 998-1035)."""
    import jax
    from deepfepe_tpu.data import SyntheticPairs
    from deepfepe_tpu.models import DeepFNet
    from deepfepe_tpu.train import Config, Trainer

    cfg = Config()
    cfg.model.if_quality = True
    cfg.training.val_batches = 1
    net = DeepFNet(depth=2, image_size=(376, 1241), if_quality=True)
    trainer = Trainer(net, cfg, save_dir=str(tmp_path / "run"))
    gen = SyntheticPairs(good_num=64, seed=0)
    trainer.init_state(gen.batch(8))
    trainer.validate([gen.batch(8)])
    trainer.logger.close()

    files = glob.glob(str(tmp_path / "run" / "runs" / "events.out.tfevents.*"))
    assert len(files) == 1
    kinds = {
        (v.tag, v.WhichOneof("value"))
        for e in _load_events(files[0])
        for v in e.summary.value
    }
    assert ("val/weights", "histo") in kinds
    assert ("val/epi_res", "histo") in kinds
    assert ("val/residual", "histo") in kinds
    assert ("val/weights_strip", "image") in kinds
