"""posenet-tpu: TPU-native multi-person pose estimation (JAX/XLA/Pallas).

Package facade with reference API parity
(/root/reference/posenet/__init__.py:1-6), plus the fixes documented in
SURVEY.md Appendix B: `decode_multiple_poses` is exported (the reference
ships it commented out — B1).
"""

from posenet_tpu.constants import *  # noqa: F401,F403
from posenet_tpu import constants, decode, decode_multi  # noqa: F401
from posenet_tpu.config import DecodeConfig, ModelConfig, TrainConfig  # noqa: F401
from posenet_tpu.decode import (DecodedPoses, decode_batch,  # noqa: F401
                                build_part_with_score_single_pose,
                                decode_pose, decode_single_pose, find_root)
from posenet_tpu.decode_multi import (decode_multiple_poses,  # noqa: F401
                                      decode_multiple_poses_batch)
from posenet_tpu.models.model_factory import (MobileNetV1, PoseNet,  # noqa: F401
                                              load_model)
from posenet_tpu.models.mobilenet_v1 import MOBILENET_V1_CHECKPOINTS  # noqa: F401
from posenet_tpu.pipeline import PoseNetPipeline  # noqa: F401
from posenet_tpu.preprocess import (process_input, read_cap,  # noqa: F401
                                    read_imgfile, valid_resolution)
from posenet_tpu.draw import (draw_keypoints, draw_skel_and_kp,  # noqa: F401
                              draw_skeleton, get_adjacent_keypoints)

# Backwards-compat alias: reference exposes `_process_input` (utils.py:13).
_process_input = process_input

__version__ = "0.1.0"
