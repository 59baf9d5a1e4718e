"""Model registry (reference ``video_prediction/models/__init__.py#
get_model_class``): name -> model class, covering the reference zoo —
``savp``, ``dna``, ``sna``, ``sv2p``, ``ground_truth``, ``repeat``.
"""

from video_prediction_tpu.models.base import (  # noqa: F401
    GroundTruthVideoPredictionModel,
    NonTrainableVideoPredictionModel,
    RepeatVideoPredictionModel,
    VideoPredictionModel,
)
from video_prediction_tpu.models.model_zoo import (  # noqa: F401
    DNAVideoPredictionModel,
    SAVPVideoPredictionModel,
    SNAVideoPredictionModel,
    SV2PVideoPredictionModel,
)

_MODELS = {
    "ground_truth": GroundTruthVideoPredictionModel,
    "repeat": RepeatVideoPredictionModel,
    "savp": SAVPVideoPredictionModel,
    "dna": DNAVideoPredictionModel,
    "sna": SNAVideoPredictionModel,
    "sv2p": SV2PVideoPredictionModel,
}


def get_model_class(name: str):
    if name not in _MODELS:
        raise ValueError(f"unknown model {name!r}; available: {sorted(_MODELS)}")
    return _MODELS[name]


def register_model(name: str, cls) -> None:
    _MODELS[name] = cls
