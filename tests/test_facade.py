"""Package-facade API parity: every name the reference facade exposes
(/root/reference/posenet/__init__.py:1-6 plus the B1 fix) resolves on
`posenet_tpu`, and the `MobileNetV1` constructor returns a working model.
"""
import numpy as np

import posenet_tpu


def test_facade_exports_reference_surface():
    # constants (posenet/constants.py) — star-exported
    for name in ["PART_NAMES", "NUM_KEYPOINTS", "PART_IDS",
                 "CONNECTED_PART_NAMES", "CONNECTED_PART_INDICES",
                 "LOCAL_MAXIMUM_RADIUS", "POSE_CHAIN",
                 "PARENT_CHILD_TUPLES", "PART_CHANNELS"]:
        assert hasattr(posenet_tpu, name), name
    # facade re-exports (posenet/__init__.py), incl. the B1 fix
    for name in ["decode", "load_model", "MobileNetV1",
                 "decode_multiple_poses", "read_imgfile", "read_cap",
                 "valid_resolution", "draw_keypoints", "draw_skeleton",
                 "draw_skel_and_kp", "get_adjacent_keypoints",
                 "_process_input"]:
        assert hasattr(posenet_tpu, name), name


def test_mobilenetv1_constructor_untrained_forward():
    model = posenet_tpu.MobileNetV1(50, output_stride=16)
    assert model.output_stride == 16
    assert model.model_id == 50
    x = np.zeros((1, 3, 33, 33), np.float32)  # NCHW like the reference
    hm, off, dfwd, dbwd = model(x)
    assert hm.shape == (1, 17, 3, 3)
    assert off.shape == (1, 34, 3, 3)
    assert dfwd.shape == (1, 32, 3, 3)
    assert dbwd.shape == (1, 32, 3, 3)
    # heatmap head output is sigmoid-activated (reference mobilenet_v1.py:158)
    hm = np.asarray(hm)
    assert (hm >= 0).all() and (hm <= 1).all()
    # deterministic under the same seed
    model2 = posenet_tpu.MobileNetV1(50, output_stride=16)
    np.testing.assert_array_equal(np.asarray(model2(x)[0]), hm)
