from video_prediction_tpu.train.state import TrainState, create_train_state  # noqa: F401
from video_prediction_tpu.train.step import make_train_step, make_eval_step  # noqa: F401
