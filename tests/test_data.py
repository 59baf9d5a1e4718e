"""Data pipeline tests: synthetic TFRecord fixtures exercising the
BAIR/KTH-schema parsers deterministically (SURVEY §4 "Pipeline" tests),
plus the synthetic dataset and the device feeder."""

import numpy as np
import pytest

from video_prediction_tpu.configs.hparams import DatasetHparams
from video_prediction_tpu.data import DeviceFeeder, get_dataset_class

tf = pytest.importorskip("tensorflow")


def _bytes_feature(v):
    return tf.train.Feature(bytes_list=tf.train.BytesList(value=[v]))


def _floats_feature(v):
    return tf.train.Feature(float_list=tf.train.FloatList(value=list(v)))


def write_bair_fixture(path, num_examples=4, seq_len=30, size=8):
    """Handwritten BAIR-schema records with a deterministic pixel pattern."""
    rng = np.random.RandomState(0)
    truth = []
    with tf.io.TFRecordWriter(path) as w:
        for n in range(num_examples):
            feat = {}
            frames = []
            for i in range(seq_len):
                img = rng.randint(0, 256, (size, size, 3), np.uint8)
                frames.append(img)
                feat[f"{i}/image_aux1/encoded"] = _bytes_feature(img.tobytes())
                feat[f"{i}/action"] = _floats_feature(rng.rand(4))
                feat[f"{i}/endeffector_pos"] = _floats_feature(rng.rand(3))
            truth.append(np.stack(frames))
            ex = tf.train.Example(features=tf.train.Features(feature=feat))
            w.write(ex.SerializeToString())
    return truth


class TestBAIRPipeline:
    @pytest.fixture()
    def fixture_dir(self, tmp_path):
        d = tmp_path / "bair" / "train"
        d.mkdir(parents=True)
        truth = write_bair_fixture(str(d / "traj_0.tfrecord"))
        return str(d), truth

    def test_parse_roundtrip_deterministic(self, fixture_dir):
        d, truth = fixture_dir
        cls = get_dataset_class("bair")
        hp = DatasetHparams(context_frames=2, sequence_length=30)
        # test mode: offset 0, no shuffle -> exact roundtrip of record 0
        ds = _patched(cls)(d, mode="test", hparams=hp)
        batch = next(ds.make_iterator(2))
        assert batch["images"].shape == (2, 30, 8, 8, 3)
        # images ship uint8 (device normalizes); exact byte roundtrip
        assert batch["images"].dtype == np.uint8
        np.testing.assert_array_equal(batch["images"][0], truth[0])

    def test_temporal_slice(self, fixture_dir):
        d, truth = fixture_dir
        cls = get_dataset_class("bair")
        hp = DatasetHparams(context_frames=2, sequence_length=12)
        ds = _patched(cls)(d, mode="test", hparams=hp)
        batch = next(ds.make_iterator(1))
        assert batch["images"].shape == (1, 12, 8, 8, 3)
        np.testing.assert_array_equal(batch["images"][0], truth[0][:12])

    def test_use_state_parses_actions(self, fixture_dir):
        d, _ = fixture_dir
        cls = get_dataset_class("bair")
        hp = DatasetHparams(sequence_length=12, use_state=True)
        ds = _patched(cls)(d, mode="test", hparams=hp)
        batch = next(ds.make_iterator(1))
        assert batch["actions"].shape == (1, 12, 4)
        assert batch["states"].shape == (1, 12, 3)

    def test_num_examples(self, fixture_dir):
        d, _ = fixture_dir
        cls = get_dataset_class("bair")
        ds = _patched(cls)(d, mode="test")
        assert ds.num_examples_per_epoch() == 4


def _patched(cls):
    """Fixture records are 8x8 to keep the test fast; subclass with the
    matching IMAGE_SHAPE."""

    class Small(cls):
        IMAGE_SHAPE = (8, 8, 3)

    return Small


class TestKTHConverterRoundtrip:
    def test_converter_and_parse(self, tmp_path):
        from PIL import Image

        from video_prediction_tpu.data.kth import KTHVideoDataset, partition_data, save_tf_record

        # two tiny "videos" of 30 frames each
        root = tmp_path / "frames"
        for name in ["person01_boxing_d1", "person17_walking_d2"]:
            vdir = root / name
            vdir.mkdir(parents=True)
            for i in range(30):
                arr = np.full((32, 32, 3), i * 8, np.uint8)
                Image.fromarray(arr).save(vdir / f"frame_{i:05d}.png")
        dirs = sorted(str(p) for p in root.iterdir())
        train, test = partition_data(dirs)
        assert len(train) == 1 and len(test) == 1

        out = tmp_path / "rec" / "train"
        out.mkdir(parents=True)
        n = save_tf_record(str(out / "kth.tfrecord"), train, window=30)
        assert n == 1

        hp = DatasetHparams(context_frames=10, sequence_length=20)
        ds = KTHVideoDataset(str(out), mode="test", hparams=hp)
        batch = next(ds.make_iterator(1))
        assert batch["images"].shape == (1, 20, 64, 64, 3)
        # frame brightness increases monotonically in the fixture
        means = batch["images"][0].astype(np.float32).mean(axis=(1, 2, 3))
        assert (np.diff(means) > 0).all()


class TestCropScale:
    def test_scale_down(self, tmp_path):
        # raw 8x8 records scaled to 4x4 (reference decode_and_preprocess_images)
        d = tmp_path / "bair" / "train"
        d.mkdir(parents=True)
        write_bair_fixture(str(d / "t.tfrecord"))
        cls = get_dataset_class("bair")
        hp = DatasetHparams(sequence_length=12, scale_size=4)
        ds = _patched(cls)(str(d), mode="test", hparams=hp)
        batch = next(ds.make_iterator(1))
        assert batch["images"].shape == (1, 12, 4, 4, 3)
        assert batch["images"].dtype == np.uint8

    def test_crop_then_scale_native_kth(self, tmp_path):
        # KTH-style: native 120x160 JPEG frames -> center-crop 120 -> scale 64
        from PIL import Image

        from video_prediction_tpu.data.kth import KTHVideoDataset, save_tf_record

        root = tmp_path / "frames" / "person01_boxing_d1"
        root.mkdir(parents=True)
        rng = np.random.RandomState(0)
        for i in range(30):
            Image.fromarray(rng.randint(0, 256, (120, 160, 3), np.uint8)).save(
                root / f"frame_{i:05d}.png"
            )
        out = tmp_path / "rec" / "train"
        out.mkdir(parents=True)
        # native-resolution storage (size=None)
        save_tf_record(str(out / "kth.tfrecord"), [str(root.parent / "person01_boxing_d1")], window=30, size=None)

        hp = DatasetHparams(context_frames=10, sequence_length=20, crop_size=120, scale_size=64)
        ds = KTHVideoDataset(str(out), mode="test", hparams=hp)
        batch = next(ds.make_iterator(1))
        assert batch["images"].shape == (1, 20, 64, 64, 3)
        assert batch["images"].dtype == np.uint8

    def test_scale_only_native(self, tmp_path):
        # no crop: rectangular native frames squash-resized to the square size
        from PIL import Image

        from video_prediction_tpu.data.kth import KTHVideoDataset, save_tf_record

        root = tmp_path / "frames" / "person01_jogging_d1"
        root.mkdir(parents=True)
        for i in range(30):
            Image.fromarray(np.full((120, 160, 3), i * 8, np.uint8)).save(
                root / f"frame_{i:05d}.png"
            )
        out = tmp_path / "rec" / "train"
        out.mkdir(parents=True)
        save_tf_record(str(out / "kth.tfrecord"), [str(root)], window=30, size=None)
        hp = DatasetHparams(context_frames=10, sequence_length=20, scale_size=128)
        ds = KTHVideoDataset(str(out), mode="test", hparams=hp)
        batch = next(ds.make_iterator(1))
        assert batch["images"].shape == (1, 20, 128, 128, 3)


class TestSynthetic:
    def test_shapes_and_determinism(self):
        cls = get_dataset_class("synthetic")
        ds1 = cls(mode="train", seed=3)
        ds2 = cls(mode="train", seed=3)
        b1 = next(ds1.make_iterator(2))
        b2 = next(ds2.make_iterator(2))
        assert b1["images"].shape == (2, 12, 64, 64, 3)
        assert b1["actions"].shape == (2, 12, 4)
        np.testing.assert_allclose(b1["images"], b2["images"])

    def test_motion_present(self):
        ds = get_dataset_class("synthetic")(mode="train")
        b = next(ds.make_iterator(1))
        a = b["images"].astype(np.int32)
        assert int(np.abs(a[0, 1] - a[0, 0]).sum()) > 0


class TestDeviceFeeder:
    def test_feeder_yields_device_arrays(self):
        import jax

        ds = get_dataset_class("synthetic")(mode="train")
        feeder = DeviceFeeder(ds.make_iterator(2), prefetch=1)
        batch = next(feeder)
        assert isinstance(batch["images"], jax.Array)
        assert batch["images"].shape == (2, 12, 64, 64, 3)
        feeder.close()

    def test_feeder_with_mesh_shards_batch(self):
        import jax

        from video_prediction_tpu.parallel import make_mesh

        mesh = make_mesh()
        ds = get_dataset_class("synthetic")(mode="train")
        feeder = DeviceFeeder(ds.make_iterator(8), mesh=mesh, prefetch=1)
        batch = next(feeder)
        assert batch["images"].sharding.num_devices == jax.device_count()
        feeder.close()


class TestTimeShift:
    """time_shift quantizes the start offset of a CONTIGUOUS window
    (reference slice_sequences); it is NOT a subsample stride."""

    def test_eval_contiguous_from_zero(self, tmp_path):
        d = tmp_path / "bair2" / "train"
        d.mkdir(parents=True)
        truth = write_bair_fixture(str(d / "t.tfrecord"), num_examples=1)
        cls = get_dataset_class("bair")
        hp = DatasetHparams(sequence_length=10, time_shift=3)
        ds = _patched(cls)(str(d), mode="test", hparams=hp)
        batch = next(ds.make_iterator(1))
        assert batch["images"].shape == (1, 10, 8, 8, 3)
        np.testing.assert_array_equal(batch["images"][0], truth[0][0:10])

    def test_train_offset_quantized(self, tmp_path):
        d = tmp_path / "bair3" / "train"
        d.mkdir(parents=True)
        truth = write_bair_fixture(str(d / "t.tfrecord"), num_examples=1)
        cls = get_dataset_class("bair")
        hp = DatasetHparams(sequence_length=10, time_shift=3)
        ds = _patched(cls)(str(d), mode="train", hparams=hp, seed=0)
        it = ds.make_iterator(1)
        # stored 30 frames, window 10 -> offsets in {0,3,...,18}
        valid = {off: truth[0][off : off + 10] for off in range(0, 21, 3)}
        seen = set()
        for _ in range(24):
            imgs = next(it)["images"][0]
            matches = [o for o, w in valid.items() if np.array_equal(imgs, w)]
            assert matches, "window is not a quantized contiguous slice"
            seen.add(matches[0])
        assert len(seen) > 1, "train offsets never varied"


class TestFeederErrors:
    def test_iterator_exception_propagates(self):
        def bad_iter():
            yield {"images": np.zeros((1, 2, 4, 4, 3), np.uint8)}
            raise RuntimeError("boom")

        feeder = DeviceFeeder(bad_iter(), prefetch=1)
        next(feeder)
        with pytest.raises(RuntimeError, match="boom"):
            next(feeder)
            next(feeder)  # second call drains to the error sentinel

    def test_stop_iteration(self):
        def one_iter():
            yield {"images": np.zeros((1, 2, 4, 4, 3), np.uint8)}

        feeder = DeviceFeeder(one_iter(), prefetch=1)
        next(feeder)
        with pytest.raises(StopIteration):
            next(feeder)
