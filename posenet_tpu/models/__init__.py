from posenet_tpu.models.mobilenet_v1 import (ARCHS, HEAD_CHANNELS,
                                             MOBILENET_V1_CHECKPOINTS,
                                             forward, forward_jit, init_params,
                                             stride_plan)
from posenet_tpu.models.model_factory import (MobileNetV1, PoseNet,
                                              load_model)
