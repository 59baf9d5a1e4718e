from video_prediction_tpu.utils.gif import encode_gif, save_gif  # noqa: F401
from video_prediction_tpu.utils.html import HTML  # noqa: F401
