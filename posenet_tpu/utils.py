"""Import-parity module: `posenet_tpu.utils` mirrors the reference's
`posenet.utils` surface (/root/reference/posenet/utils.py) — preprocessing
helpers plus drawing. Implementations live in posenet_tpu.preprocess
(input half) and posenet_tpu.draw (overlay half).
"""

from posenet_tpu.draw import (draw_keypoints, draw_skel_and_kp,  # noqa: F401
                              draw_skeleton, get_adjacent_keypoints)
from posenet_tpu.preprocess import (process_input, read_cap,  # noqa: F401
                                    read_imgfile, valid_resolution)

# The reference names its core preprocessor with a leading underscore
# (utils.py:13) and callers import it anyway; keep the alias.
_process_input = process_input
