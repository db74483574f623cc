"""Keypoint topology and decoder constants.

Behavioral parity with the reference constants module
(/root/reference/posenet/constants.py:1-63): 17 COCO keypoints, the 12
skeleton-drawing edges, the 16-edge kinematic tree walked by the multi-pose
decoder, and the local-maximum NMS radius.

In addition to the reference's Python lists we precompute the edge tables as
numpy int32 arrays so the JAX/Pallas decoder can close over them as static
constants (baked into the compiled executable — no host lookup at runtime).
"""

from __future__ import annotations

import numpy as np

# Keeps `from posenet_tpu.constants import *` (the package facade) from
# leaking the numpy import into the public namespace.
__all__ = [
    "PART_NAMES", "NUM_KEYPOINTS", "PART_IDS", "CONNECTED_PART_NAMES",
    "CONNECTED_PART_INDICES", "LOCAL_MAXIMUM_RADIUS", "POSE_CHAIN",
    "PARENT_CHILD_TUPLES", "NUM_EDGES", "EDGES", "PART_CHANNELS",
    "OKS_SIGMAS", "LEFT_RIGHT_SWAP",
]

PART_NAMES = [
    "nose", "leftEye", "rightEye", "leftEar", "rightEar", "leftShoulder",
    "rightShoulder", "leftElbow", "rightElbow", "leftWrist", "rightWrist",
    "leftHip", "rightHip", "leftKnee", "rightKnee", "leftAnkle", "rightAnkle",
]

NUM_KEYPOINTS = len(PART_NAMES)  # 17

PART_IDS = {pn: pid for pid, pn in enumerate(PART_NAMES)}

# Keypoint index permutation under a horizontal image flip: every left*
# part swaps with its right* counterpart, symmetric parts map to
# themselves. Derived from PART_NAMES so it can never drift from the
# channel order. Used by the training flip augmentation (the reference
# DEFINED a RandomHorizontalFlip transform but never applied it — and a
# bare image flip without this index swap would mislabel every left/right
# keypoint; reference train.py:458-485, SURVEY.md Appendix B8).
LEFT_RIGHT_SWAP = np.asarray([
    PART_IDS["right" + n[4:]] if n.startswith("left")
    else PART_IDS["left" + n[5:]] if n.startswith("right")
    else i
    for i, n in enumerate(PART_NAMES)
], dtype=np.int32)

# Pairs of keypoints drawn as skeleton line segments (reference
# constants.py:12-21). Order preserved for identical overlay rendering.
CONNECTED_PART_NAMES = [
    ("leftHip", "leftShoulder"), ("leftElbow", "leftShoulder"),
    ("leftElbow", "leftWrist"), ("leftHip", "leftKnee"),
    ("leftKnee", "leftAnkle"), ("rightHip", "rightShoulder"),
    ("rightElbow", "rightShoulder"), ("rightElbow", "rightWrist"),
    ("rightHip", "rightKnee"), ("rightKnee", "rightAnkle"),
    ("leftShoulder", "rightShoulder"), ("leftHip", "rightHip"),
]

CONNECTED_PART_INDICES = [
    (PART_IDS[a], PART_IDS[b]) for a, b in CONNECTED_PART_NAMES
]

# Radius (in output-grid cells) of the local-maximum window used for part NMS
# (reference constants.py:23). Window size is 2*r+1.
LOCAL_MAXIMUM_RADIUS = 1

# Kinematic tree (parent -> child) the greedy decoder walks, rooted at the
# nose (reference constants.py:25-36). Edge order matters: the decoder
# traverses edges in reversed order with backward displacements, then forward
# order with forward displacements.
POSE_CHAIN = [
    ("nose", "leftEye"), ("leftEye", "leftEar"), ("nose", "rightEye"),
    ("rightEye", "rightEar"), ("nose", "leftShoulder"),
    ("leftShoulder", "leftElbow"), ("leftElbow", "leftWrist"),
    ("leftShoulder", "leftHip"), ("leftHip", "leftKnee"),
    ("leftKnee", "leftAnkle"), ("nose", "rightShoulder"),
    ("rightShoulder", "rightElbow"), ("rightElbow", "rightWrist"),
    ("rightShoulder", "rightHip"), ("rightHip", "rightKnee"),
    ("rightKnee", "rightAnkle"),
]

PARENT_CHILD_TUPLES = [
    (PART_IDS[parent], PART_IDS[child]) for parent, child in POSE_CHAIN
]

NUM_EDGES = len(PARENT_CHILD_TUPLES)  # 16

# Static int32 edge tables for the compiled decoder. Column 0 = parent id,
# column 1 = child id.
EDGES = np.asarray(PARENT_CHILD_TUPLES, dtype=np.int32)  # (16, 2)

# Body-part segmentation channel names (reference constants.py:38-63);
# kept for API parity — unused by the decoder, same as in the reference.
PART_CHANNELS = [
    'left_face',
    'right_face',
    'right_upper_leg_front',
    'right_lower_leg_back',
    'right_upper_leg_back',
    'left_lower_leg_front',
    'left_upper_leg_front',
    'left_upper_leg_back',
    'left_lower_leg_back',
    'right_feet',
    'right_lower_leg_front',
    'left_feet',
    'torso_front',
    'torso_back',
    'right_upper_arm_front',
    'right_upper_arm_back',
    'right_lower_arm_back',
    'left_lower_arm_front',
    'left_upper_arm_front',
    'left_upper_arm_back',
    'left_lower_arm_back',
    'right_hand',
    'right_lower_arm_front',
    'left_hand',
]

# COCO OKS per-keypoint falloff sigmas (used by training metrics; reference
# train.py:592).
OKS_SIGMAS = np.array(
    [.26, .25, .25, .35, .35, .79, .79, .72, .72, .62, .62,
     1.07, 1.07, .87, .87, .89, .89], dtype=np.float32) / 10.0
