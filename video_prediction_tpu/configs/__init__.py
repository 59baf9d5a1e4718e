from video_prediction_tpu.configs.hparams import (  # noqa: F401
    ModelHparams,
    DatasetHparams,
    parse_overrides,
    apply_overrides,
    load_hparams_json,
    resolve_model_hparams,
)
