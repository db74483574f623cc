"""Golden-test oracle: run the PyTorch reference implementation on CPU.

The reference repo is mounted read-only at /root/reference. We import it as a
numerical oracle only — its outputs define the parity targets (SURVEY.md §4
test strategy). No reference code is copied into the framework.

To compare against our randomly initialized JAX params we convert the HWIO
pytree into the reference's OIHW torch state_dict.
"""

from __future__ import annotations

import os
import sys

import numpy as np

REFERENCE_ROOT = "/root/reference"

_ref_cache = {}


def has_reference() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "posenet"))


def _import_reference():
    if "mod" in _ref_cache:
        return _ref_cache["mod"]
    if REFERENCE_ROOT not in sys.path:
        # APPEND, never insert(0): the reference repo has top-level modules
        # whose names collide with ours (visualizers, get_test_images,
        # image_demo, ...). At the path head it would shadow the repo-root
        # versions for every later test in the same pytest process (only
        # `posenet` itself is unique to the reference, so appending still
        # resolves it).
        sys.path.append(REFERENCE_ROOT)
    import posenet as ref_posenet  # noqa: F401
    from posenet import decode_multi as ref_decode_multi
    from posenet.models import mobilenet_v1 as ref_mobilenet
    _ref_cache["mod"] = (ref_posenet, ref_mobilenet, ref_decode_multi)
    return _ref_cache["mod"]


def build_reference_model(params, model_id: int, output_stride: int):
    """Instantiate the reference torch MobileNetV1 and load our params into it."""
    import torch

    _, ref_mobilenet, _ = _import_reference()
    model = ref_mobilenet.MobileNetV1(model_id, output_stride=output_stride)

    state = {}
    for i, layer in enumerate(params["backbone"]):
        if "w" in layer:  # input conv
            state[f"features.conv{i}.conv.weight"] = torch.tensor(
                np.asarray(layer["w"]).transpose(3, 2, 0, 1))  # HWIO -> OIHW
            state[f"features.conv{i}.conv.bias"] = torch.tensor(np.asarray(layer["b"]))
        else:
            # depthwise (H,W,1,C) -> torch (C,1,H,W)
            state[f"features.conv{i}.depthwise.weight"] = torch.tensor(
                np.asarray(layer["dw_w"]).transpose(3, 2, 0, 1))
            state[f"features.conv{i}.depthwise.bias"] = torch.tensor(np.asarray(layer["dw_b"]))
            state[f"features.conv{i}.pointwise.weight"] = torch.tensor(
                np.asarray(layer["pw_w"]).transpose(3, 2, 0, 1))
            state[f"features.conv{i}.pointwise.bias"] = torch.tensor(np.asarray(layer["pw_b"]))
    for head, p in params["heads"].items():
        state[f"{head}.weight"] = torch.tensor(np.asarray(p["w"]).transpose(3, 2, 0, 1))
        state[f"{head}.bias"] = torch.tensor(np.asarray(p["b"]))

    model.load_state_dict(state)
    model.eval()
    return model


def reference_forward(params, x_nchw: np.ndarray, model_id: int, output_stride: int):
    """Reference forward pass -> 4 numpy NCHW head tensors."""
    import torch

    model = build_reference_model(params, model_id, output_stride)
    with torch.no_grad():
        outs = model(torch.tensor(np.asarray(x_nchw, dtype=np.float32)))
    return tuple(o.numpy() for o in outs)


def reference_decode(scores_chw, offsets_chw, dfwd_chw, dbwd_chw, output_stride,
                     **kwargs):
    """Reference multi-pose decode -> (pose_scores, kp_scores, kp_coords, pose_offsets)."""
    import torch

    _, _, ref_decode_multi = _import_reference()
    return ref_decode_multi.decode_multiple_poses(
        torch.tensor(np.asarray(scores_chw, dtype=np.float32)),
        torch.tensor(np.asarray(offsets_chw, dtype=np.float32)),
        torch.tensor(np.asarray(dfwd_chw, dtype=np.float32)),
        torch.tensor(np.asarray(dbwd_chw, dtype=np.float32)),
        output_stride,
        **kwargs,
    )
