"""Schema-roundtrip tests for the variant datasets (SV2P, Google robot,
UCF-101) with handwritten fixture records, plus the generic converter."""

import numpy as np
import pytest

from video_prediction_tpu.configs.hparams import DatasetHparams
from video_prediction_tpu.data import get_dataset_class

tf = pytest.importorskip("tensorflow")


def _bytes(v):
    return tf.train.Feature(bytes_list=tf.train.BytesList(value=[v]))


def _floats(v):
    return tf.train.Feature(float_list=tf.train.FloatList(value=list(v)))


def _jpeg(img):
    return tf.io.encode_jpeg(tf.constant(img)).numpy()


def _small(cls, size):
    class Small(cls):
        IMAGE_SHAPE = (size, size, 3)

    return Small


class TestSV2PSchema:
    def test_roundtrip(self, tmp_path):
        d = tmp_path / "train"
        d.mkdir()
        rng = np.random.RandomState(0)
        with tf.io.TFRecordWriter(str(d / "r.tfrecord")) as w:
            for _ in range(2):
                feat = {}
                for i in range(30):
                    img = rng.randint(0, 256, (8, 8, 3), np.uint8)
                    feat[f"{i}/image/encoded"] = _bytes(img.tobytes())
                    feat[f"{i}/action"] = _floats(rng.rand(4))
                w.write(tf.train.Example(features=tf.train.Features(feature=feat)).SerializeToString())
        cls = _small(get_dataset_class("sv2p"), 8)
        ds = cls(str(d), mode="test", hparams=DatasetHparams(sequence_length=12, use_state=True))
        batch = next(ds.make_iterator(2))
        assert batch["images"].shape == (2, 12, 8, 8, 3)
        assert batch["actions"].shape == (2, 12, 4)


class TestGoogleRobotSchema:
    def test_roundtrip(self, tmp_path):
        d = tmp_path / "train"
        d.mkdir()
        rng = np.random.RandomState(0)
        with tf.io.TFRecordWriter(str(d / "r.tfrecord")) as w:
            feat = {}
            for i in range(15):
                img = rng.randint(0, 256, (8, 8, 3), np.uint8)
                feat[f"move/{i}/image/encoded"] = _bytes(_jpeg(img))
                feat[f"move/{i}/commanded_pose/vec_pitch_yaw"] = _floats(rng.rand(5))
                feat[f"move/{i}/endeffector/vec_pitch_yaw"] = _floats(rng.rand(5))
            w.write(tf.train.Example(features=tf.train.Features(feature=feat)).SerializeToString())
        cls = _small(get_dataset_class("google_robot"), 8)
        ds = cls(str(d), mode="test", hparams=DatasetHparams(sequence_length=15, use_state=True))
        batch = next(ds.make_iterator(1))
        assert batch["images"].shape == (1, 15, 8, 8, 3)
        assert batch["actions"].shape == (1, 15, 5)
        assert batch["states"].shape == (1, 15, 5)


class TestUCF101ViaGenericConverter:
    def test_convert_tree_and_parse(self, tmp_path):
        from PIL import Image

        from video_prediction_tpu.data.convert import convert_tree

        root = tmp_path / "frames"
        for v in range(3):
            vdir = root / f"vid{v:02d}"
            vdir.mkdir(parents=True)
            for i in range(25):
                arr = np.full((32, 32, 3), (v * 50 + i * 5) % 255, np.uint8)
                Image.fromarray(arr).save(vdir / f"{i:04d}.jpg")
        out = tmp_path / "records"
        n_train, n_val = convert_tree(str(root), str(out), window=25, size=64, val_fraction=0.34)
        assert n_train == 2 and n_val == 1

        ds = get_dataset_class("ucf101")(
            str(out / "train"), mode="test", hparams=DatasetHparams(sequence_length=14, context_frames=4)
        )
        batch = next(ds.make_iterator(2))
        assert batch["images"].shape == (2, 14, 64, 64, 3)
        assert batch["images"].dtype == np.uint8


class TestSomethingSomething:
    def _make_frames(self, root, n_videos=3, n_frames=20, hw=(24, 32)):
        from PIL import Image

        rng = np.random.RandomState(0)
        for v in range(n_videos):
            vdir = root / f"{v:05d}"
            vdir.mkdir(parents=True)
            for i in range(n_frames):
                arr = rng.randint(0, 256, (*hw, 3), np.uint8)
                Image.fromarray(arr).save(vdir / f"{i:04d}.jpg")

    def test_converter_roundtrip_and_train_smoke(self, tmp_path):
        """Fixture frames -> converter -> registry parse -> one SAVP train
        step (BASELINE.json configs[4] Something-Something path)."""
        import jax

        from video_prediction_tpu.data.something import partition_data, save_tf_record
        from video_prediction_tpu.models import get_model_class
        from video_prediction_tpu.train import create_train_state, make_train_step

        root = tmp_path / "frames"
        self._make_frames(root)
        video_dirs = sorted(str(d) for d in root.iterdir())
        train_dirs, val_dirs = partition_data(video_dirs, 0.34)
        assert len(val_dirs) == 1 and len(train_dirs) == 2
        d = tmp_path / "train"
        d.mkdir()
        # non-square 24x32 sources center-crop to square before resize
        n = save_tf_record(str(d / "r.tfrecord"), train_dirs, window=16, size=16)
        assert n == 2  # 20 frames -> one non-overlapping 16-frame window each

        cls = _small(get_dataset_class("something"), 16)
        ds = cls(str(d), mode="test", hparams=DatasetHparams(sequence_length=12))
        batch = next(ds.make_iterator(2))
        assert batch["images"].shape == (2, 12, 16, 16, 3)
        assert batch["images"].dtype == np.uint8
        assert "actions" not in batch  # action-free clips

        hp = get_model_class("savp").default_hparams().replace(
            context_frames=2, sequence_length=12, ngf=4, nef=8,
            num_transformed_images=2, conv_rnn_norm=False,
        )
        model = get_model_class("savp")(hp)
        ts = create_train_state(model, jax.random.PRNGKey(0), batch)
        step = make_train_step(model, donate=False)
        ts, scalars = step(ts, batch)
        assert np.isfinite(float(scalars["g_loss"]))


class TestCartgripperSchema:
    def test_roundtrip(self, tmp_path):
        d = tmp_path / "train"
        d.mkdir()
        rng = np.random.RandomState(0)
        with tf.io.TFRecordWriter(str(d / "r.tfrecord")) as w:
            feat = {}
            for i in range(30):
                img = rng.randint(0, 256, (8, 8, 3), np.uint8)
                feat[f"{i}/image_view0/encoded"] = _bytes(img.tobytes())
                feat[f"{i}/action"] = _floats(rng.rand(5))
                feat[f"{i}/endeffector_pos"] = _floats(rng.rand(6))
            w.write(tf.train.Example(features=tf.train.Features(feature=feat)).SerializeToString())
        cls = _small(get_dataset_class("cartgripper"), 8)
        ds = cls(str(d), mode="test", hparams=DatasetHparams(sequence_length=15, use_state=True))
        batch = next(ds.make_iterator(1))
        assert batch["images"].shape == (1, 15, 8, 8, 3)
        assert batch["actions"].shape == (1, 15, 5)
        assert batch["states"].shape == (1, 15, 6)
