"""Native C++ data-plane tests: TFRecord framing + Example parsing vs
TensorFlow's own reader/parser, CRC corruption detection, and the TF-free
pipeline producing identical batches to the tf.data backend."""

import numpy as np
import pytest

from video_prediction_tpu import native
from video_prediction_tpu.configs.hparams import DatasetHparams
from video_prediction_tpu.data import get_dataset_class

from test_data import _patched, write_bair_fixture

tf = pytest.importorskip("tensorflow")

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no g++ / prebuilt native library"
)


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("native_bair") / "train"
    d.mkdir(parents=True)
    truth = write_bair_fixture(str(d / "traj_0.tfrecord"))
    return str(d), truth


class TestReaderParser:
    def test_records_match_tf(self, fixture_dir):
        d, _ = fixture_dir
        path = f"{d}/traj_0.tfrecord"
        ours = list(native.read_records(path))
        theirs = [r.numpy() for r in tf.data.TFRecordDataset(path)]
        assert len(ours) == len(theirs) == 4
        assert ours == theirs

    def test_parse_matches_tf(self, fixture_dir):
        d, truth = fixture_dir
        path = f"{d}/traj_0.tfrecord"
        rec = next(iter(native.read_records(path)))
        feats = native.parse_example(rec)
        # bytes feature -> raw frame bytes
        img0 = np.frombuffer(feats["0/image_aux1/encoded"][0], np.uint8).reshape(8, 8, 3)
        np.testing.assert_array_equal(img0, truth[0][0])
        # float features
        ref = tf.io.parse_single_example(
            rec, {"0/action": tf.io.FixedLenFeature([4], tf.float32)}
        )
        np.testing.assert_allclose(feats["0/action"], ref["0/action"].numpy())

    def test_iter_examples_matches_parse_example(self, fixture_dir):
        """The batched zero-copy path (tfr_next_chunk + tfrex_parse_view +
        tfrex_pack) yields the same feature dicts as the per-record API."""
        d, _ = fixture_dir
        path = f"{d}/traj_0.tfrecord"
        old = [native.parse_example(r) for r in native.read_records(path)]
        new = list(native.iter_examples(path))
        assert len(old) == len(new) == 4
        for o, n in zip(old, new):
            assert set(o) == set(n)
            for k, ov in o.items():
                if isinstance(ov, list):  # bytes feature (views in new path)
                    assert [bytes(v) for v in ov] == [bytes(v) for v in n[k]]
                else:
                    np.testing.assert_array_equal(ov, np.asarray(n[k]))

    def test_iter_examples_chunk_boundaries(self, fixture_dir):
        """Tiny chunk limits (1 record / few bytes per chunk) must not
        change the stream."""
        d, _ = fixture_dir
        path = f"{d}/traj_0.tfrecord"
        full = [bytes(v[0]) for ex in native.iter_examples(path) for v in [ex["0/image_aux1/encoded"]]]
        for kw in ({"max_records": 1}, {"max_bytes": 1}, {"max_records": 3}):
            got = [
                bytes(ex["0/image_aux1/encoded"][0])
                for ex in native.iter_examples(path, **kw)
            ]
            assert got == full, kw

    def test_iter_examples_crc_corruption(self, fixture_dir, tmp_path):
        d, _ = fixture_dir
        raw = open(f"{d}/traj_0.tfrecord", "rb").read()
        bad = raw[:40] + bytes([raw[40] ^ 0xFF]) + raw[41:]
        p = tmp_path / "bad_iter.tfrecord"
        p.write_bytes(bad)
        with pytest.raises(IOError, match="CRC"):
            list(native.iter_examples(str(p)))

    def test_crc_corruption_detected(self, fixture_dir, tmp_path):
        d, _ = fixture_dir
        raw = open(f"{d}/traj_0.tfrecord", "rb").read()
        # flip a byte inside the first record's payload
        bad = raw[:40] + bytes([raw[40] ^ 0xFF]) + raw[41:]
        p = tmp_path / "bad.tfrecord"
        p.write_bytes(bad)
        with pytest.raises(IOError, match="CRC"):
            list(native.read_records(str(p)))
        # verify_crc=False reads it anyway (framing intact)
        assert len(list(native.read_records(str(p), verify_crc=False))) == 4

    def test_missing_file(self):
        with pytest.raises(FileNotFoundError):
            next(native.read_records("/nonexistent.tfrecord"))

    def test_fuzz_corrupt_files_never_crash(self, fixture_dir, tmp_path):
        """Adversarial-bytes fuzz of the C++ reader (the r2 hardening:
        wire lengths are bounds-checked against remaining size, not via
        pointer arithmetic that can overflow — native/tfrecord.cc). Each
        mutation must yield records or raise IOError — the process
        surviving 200 corrupt files IS the assertion (an OOB read in the
        ctypes-loaded library would crash pytest)."""
        d, _ = fixture_dir
        raw = open(f"{d}/traj_0.tfrecord", "rb").read()
        rng = np.random.RandomState(0)
        p = tmp_path / "fuzz.tfrecord"
        for trial in range(200):
            buf = bytearray(raw)
            op = trial % 4
            if op == 0:  # flip 1-8 random bytes (hits length fields too)
                for _ in range(rng.randint(1, 9)):
                    buf[rng.randint(len(buf))] ^= rng.randint(1, 256)
            elif op == 1:  # truncate anywhere (mid-header, mid-payload)
                buf = buf[: rng.randint(len(buf))]
            elif op == 2:  # splice random garbage at a random offset
                at = rng.randint(len(buf))
                buf = buf[:at] + bytes(rng.bytes(rng.randint(1, 64))) + buf[at:]
            else:  # overwrite a length field with a huge value
                at = rng.randint(max(1, len(buf) - 12))
                buf[at : at + 8] = (2**63 - rng.randint(1, 1000)).to_bytes(8, "little")
            p.write_bytes(bytes(buf))
            gather_keys = ["0/image_aux1/encoded", "0/action", "nope"]
            for verify_crc in (True, False):
                # the batched zero-copy paths must be equally crash-proof
                try:
                    list(native.iter_examples(str(p), verify_crc=verify_crc))
                except (IOError, ValueError):
                    pass
                try:
                    list(native.iter_gathered(str(p), gather_keys, verify_crc=verify_crc))
                except (IOError, ValueError):
                    pass
                try:
                    records = list(native.read_records(str(p), verify_crc=verify_crc))
                except (IOError, ValueError):
                    continue
                # parsed records must also never crash the Example walker
                for rec in records:
                    try:
                        native.parse_example(rec)
                    except ValueError:
                        pass

    def test_fuzz_corrupt_example_protos_never_crash(self, fixture_dir):
        """Same for the Example proto walker: mutated payloads parse or
        raise ValueError, never read out of bounds."""
        d, _ = fixture_dir
        rec = next(iter(native.read_records(f"{d}/traj_0.tfrecord")))
        rng = np.random.RandomState(1)
        for _ in range(200):
            buf = bytearray(rec)
            for _ in range(rng.randint(1, 6)):
                buf[rng.randint(len(buf))] ^= rng.randint(1, 256)
            try:
                native.parse_example(bytes(buf[: rng.randint(1, len(buf) + 1)]))
            except ValueError:
                pass


class TestNativePipeline:
    def test_batches_match_tf_backend(self, fixture_dir):
        # test mode: no shuffle, offset 0 -> both backends must agree exactly
        d, _ = fixture_dir
        cls = _patched(get_dataset_class("bair"))
        hp = DatasetHparams(context_frames=2, sequence_length=12, use_state=True)
        ds = cls(d, mode="test", hparams=hp)
        b_tf = next(ds.make_iterator(2, backend="tf"))
        b_nat = next(ds.make_iterator(2, backend="native"))
        assert set(b_tf) == set(b_nat) == {"images", "actions", "states"}
        for k in b_tf:
            np.testing.assert_array_equal(b_tf[k], b_nat[k])

    def test_decode_pool_matches_serial(self, fixture_dir, monkeypatch):
        """VP_DATA_DECODE_WORKERS>1 (threaded frame decode, tf.data's
        num_parallel_calls role) must produce bit-identical batches."""
        d, _ = fixture_dir
        cls = _patched(get_dataset_class("bair"))
        hp = DatasetHparams(context_frames=2, sequence_length=12, use_state=True)
        ds = cls(d, mode="test", hparams=hp)
        serial = next(ds.make_iterator(2, backend="native"))
        monkeypatch.setenv("VP_DATA_DECODE_WORKERS", "4")
        pooled = next(ds.make_iterator(2, backend="native"))
        for k in serial:
            np.testing.assert_array_equal(serial[k], pooled[k])

    def test_time_shift_contiguous_quantized(self, fixture_dir):
        d, truth = fixture_dir
        cls = _patched(get_dataset_class("bair"))
        hp = DatasetHparams(sequence_length=10, time_shift=3)
        ds = cls(d, mode="test", hparams=hp)
        batch = next(ds.make_iterator(1, backend="native"))
        # eval: contiguous window starting at 0 (no frame skipping)
        np.testing.assert_array_equal(batch["images"][0], truth[0][0:10])
        # train: contiguous windows at offsets that are multiples of 3
        ds = cls(d, mode="train", hparams=hp, seed=0)
        it = ds.make_iterator(1, backend="native")
        valid = [
            {off: t[off : off + 10] for off in range(0, 21, 3)} for t in truth
        ]
        seen = set()
        for _ in range(24):
            imgs = next(it)["images"][0]
            matches = [
                o
                for per_rec in valid
                for o, w in per_rec.items()
                if np.array_equal(imgs, w)
            ]
            assert matches, "window is not a quantized contiguous slice"
            seen.add(matches[0])
        assert len(seen) > 1, "train offsets never varied"

    def test_train_mode_shuffles_and_repeats(self, fixture_dir):
        d, _ = fixture_dir
        cls = _patched(get_dataset_class("bair"))
        hp = DatasetHparams(sequence_length=12)
        ds = cls(d, mode="train", hparams=hp, seed=0)
        it = ds.make_iterator(2, backend="native")
        # 4 records; pull 6 batches of 2 -> pipeline must repeat without end
        batches = [next(it) for _ in range(6)]
        assert all(b["images"].shape == (2, 12, 8, 8, 3) for b in batches)

    def test_env_var_selects_backend(self, fixture_dir, monkeypatch):
        d, _ = fixture_dir
        monkeypatch.setenv("VP_DATA_BACKEND", "native")
        cls = _patched(get_dataset_class("bair"))
        ds = cls(d, mode="test", hparams=DatasetHparams(sequence_length=12))
        batch = next(ds.make_iterator(1))
        assert batch["images"].shape == (1, 12, 8, 8, 3)
        monkeypatch.setenv("VP_DATA_BACKEND", "bogus")
        with pytest.raises(ValueError, match="unknown data backend"):
            next(ds.make_iterator(1))


class TestNumpyPreprocessParity:
    def test_resize_matches_tf(self):
        from video_prediction_tpu.data.native_loader import bilinear_resize_uint8

        rng = np.random.RandomState(0)
        img = rng.randint(0, 256, (3, 12, 16, 3), np.uint8)
        ours = bilinear_resize_uint8(img, 6, 6)
        theirs = tf.cast(
            tf.round(tf.clip_by_value(tf.image.resize(img, [6, 6], method="bilinear"), 0.0, 255.0)),
            tf.uint8,
        ).numpy()
        # identical up to 1 uint8 step from float rounding order
        assert np.abs(ours.astype(int) - theirs.astype(int)).max() <= 1

    def test_crop_or_pad_matches_tf(self):
        from video_prediction_tpu.data.native_loader import center_crop_or_pad

        rng = np.random.RandomState(0)
        img = rng.randint(0, 256, (2, 10, 14, 3), np.uint8)
        for size in (6, 12):
            ours = center_crop_or_pad(img, size)
            theirs = tf.image.resize_with_crop_or_pad(img, size, size).numpy()
            np.testing.assert_array_equal(ours, theirs)


class TestNativeJpegCodec:
    def test_decode_matches_pil(self, tmp_path):
        import io

        from PIL import Image

        from video_prediction_tpu import native

        if not native.codec_available():
            pytest.skip("libjpeg/g++ unavailable")
        rng = np.random.RandomState(0)
        arr = rng.randint(0, 256, (24, 32, 3), np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="JPEG", quality=95)
        data = buf.getvalue()
        ours = native.decode_jpeg(data)
        theirs = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        assert ours.shape == theirs.shape == (24, 32, 3)
        # both are IDCT implementations; allow small per-pixel wiggle
        assert np.abs(ours.astype(int) - theirs.astype(int)).max() <= 2

    def test_grayscale_upsamples_to_rgb(self):
        import io

        from PIL import Image

        from video_prediction_tpu import native

        if not native.codec_available():
            pytest.skip("libjpeg/g++ unavailable")
        arr = np.arange(64, dtype=np.uint8).reshape(8, 8)
        buf = io.BytesIO()
        Image.fromarray(arr, mode="L").save(buf, format="JPEG")
        out = native.decode_jpeg(buf.getvalue())
        assert out.shape == (8, 8, 3)

    def test_bad_input_raises(self):
        from video_prediction_tpu import native

        if not native.codec_available():
            pytest.skip("libjpeg/g++ unavailable")
        with pytest.raises(ValueError, match="jpeg decode failed"):
            native.decode_jpeg(b"not a jpeg at all")
