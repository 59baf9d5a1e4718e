"""Dataset registry (reference ``video_prediction/datasets/__init__.py#
get_dataset_class``): ``bair``/``softmotion``, ``kth``, ``ucf101``,
``sv2p``, ``google_robot``, ``cartgripper``, ``something``
(Something-Something, BASELINE.json configs[4]), plus our file-free
``synthetic``."""

from video_prediction_tpu.data.bair import SoftmotionVideoDataset  # noqa: F401
from video_prediction_tpu.data.base import BaseVideoDataset, VideoDataset  # noqa: F401
from video_prediction_tpu.data.kth import KTHVideoDataset  # noqa: F401
from video_prediction_tpu.data.loader import DeviceFeeder  # noqa: F401
from video_prediction_tpu.data.something import SomethingSomethingVideoDataset  # noqa: F401
from video_prediction_tpu.data.synthetic import SyntheticVideoDataset  # noqa: F401
from video_prediction_tpu.data.variants import (  # noqa: F401
    CartgripperVideoDataset,
    GoogleRobotVideoDataset,
    SV2PVideoDataset,
    UCF101VideoDataset,
)

_DATASETS = {
    "bair": SoftmotionVideoDataset,
    "softmotion": SoftmotionVideoDataset,
    "kth": KTHVideoDataset,
    "ucf101": UCF101VideoDataset,
    "sv2p": SV2PVideoDataset,
    "google_robot": GoogleRobotVideoDataset,
    "cartgripper": CartgripperVideoDataset,
    "something": SomethingSomethingVideoDataset,
    "synthetic": SyntheticVideoDataset,
}


def get_dataset_class(name: str):
    if name not in _DATASETS:
        raise ValueError(f"unknown dataset {name!r}; available: {sorted(_DATASETS)}")
    return _DATASETS[name]


def register_dataset(name: str, cls) -> None:
    _DATASETS[name] = cls
