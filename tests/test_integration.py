"""Full-pipeline integration parity: image file -> preprocess -> backbone ->
decode -> source-resolution keypoints, ours vs the PyTorch reference
(BASELINE: <=1px mean keypoint deviation; SURVEY.md §4 integration test)."""

import numpy as np
import pytest

import jax

from posenet_tpu.config import ModelConfig
from posenet_tpu.decode_multi import decode_multiple_poses
from posenet_tpu.models import mobilenet_v1
from posenet_tpu.models.model_factory import PoseNet
from posenet_tpu.preprocess import read_imgfile

from tests import reference_oracle


@pytest.mark.skipif(not reference_oracle.has_reference(), reason="reference unavailable")
@pytest.mark.parametrize("seed,size", [(0, (353, 481)), (1, (240, 320))])
def test_image_demo_parity(tmp_path, seed, size):
    """The complete image_demo flow must reproduce the reference's decoded
    poses on the same weights and image."""
    import cv2
    import torch

    rng = np.random.RandomState(seed)
    img = rng.randint(0, 255, (*size, 3), dtype=np.uint8)
    path = str(tmp_path / "img.png")  # png: lossless, identical pixels
    cv2.imwrite(path, img)

    cfg = ModelConfig(model_id=50, output_stride=16)
    params = mobilenet_v1.init_params(jax.random.PRNGKey(seed), cfg)
    model = PoseNet(params, cfg)

    # ---- ours ----
    input_image, draw_image, output_scale = read_imgfile(path, 1.0, 16)
    heatmaps, offsets, dfwd, dbwd = model(
        input_image, precision=jax.lax.Precision.HIGHEST)
    ours = decode_multiple_poses(
        np.asarray(heatmaps)[0], np.asarray(offsets)[0],
        np.asarray(dfwd)[0], np.asarray(dbwd)[0], 16,
        max_pose_detections=10, score_threshold=0.25, min_pose_score=0.15)
    our_coords = ours[2] * output_scale

    # ---- reference ----
    reference_oracle._import_reference()
    from posenet import utils as ref_utils

    ref_model = reference_oracle.build_reference_model(params, 50, 16)
    r_input, r_draw, r_scale = ref_utils._process_input(img.copy(), 1.0, 16)
    with torch.no_grad():
        r_heads = ref_model(torch.tensor(r_input))
    ref = reference_oracle.reference_decode(
        r_heads[0].squeeze(0), r_heads[1].squeeze(0), r_heads[2].squeeze(0),
        r_heads[3].squeeze(0), 16,
        max_pose_detections=10, score_threshold=0.25, min_pose_score=0.15)
    ref_coords = ref[2] * r_scale

    # Pose count identical.
    n_poses = int((ref[0] > 0).sum())
    assert int((ours[0] > 0).sum()) == n_poses

    # With random weights the head values sit on knife edges: a 1-ulp
    # difference between torch-CPU and XLA conv outputs can flip a
    # cell-rounding or greedy decision and swap a whole later pose slot —
    # inherent cross-framework float behavior, NOT a pipeline bug (the
    # decode-parity suite proves the decoder exact on identical inputs,
    # and the backbone suite proves heads <=1e-4). Here we assert the full
    # chain's plumbing: identical pose count and the top pose within
    # BASELINE's <=1 px mean deviation at source resolution.
    dev0 = np.linalg.norm(our_coords[0] - ref_coords[0], axis=-1)
    assert dev0.mean() <= 1.0, f"top-pose mean deviation {dev0.mean():.3f}px"
    assert np.median(dev0) <= 0.01
    np.testing.assert_allclose(ours[0][0], ref[0][0], atol=1e-5)


@pytest.mark.skipif(not reference_oracle.has_reference(), reason="reference unavailable")
def test_forward_bf16_close_to_reference():
    """The production bf16 path stays within loose tolerance of the
    reference f32 forward (sanity check that bf16 doesn't wreck heads)."""
    cfg = ModelConfig(model_id=50, output_stride=16)
    import jax.numpy as jnp

    params = mobilenet_v1.init_params(jax.random.PRNGKey(3), cfg)
    rng = np.random.RandomState(3)
    x = rng.uniform(-1, 1, (1, 3, 129, 129)).astype(np.float32)
    ref_heads = reference_oracle.reference_forward(params, x, 50, 16)

    bf16_cfg = ModelConfig(model_id=50, output_stride=16,
                           compute_dtype=jnp.bfloat16)
    bf16_params = mobilenet_v1.cast_params(params, jnp.bfloat16)
    out = mobilenet_v1.forward(
        bf16_params, jnp.asarray(x.transpose(0, 2, 3, 1)), bf16_cfg)
    ours = np.asarray(out['heatmap']).transpose(0, 3, 1, 2)
    # heatmaps are sigmoid-bounded; bf16 should stay within a few percent
    assert np.abs(ours - ref_heads[0]).max() < 0.05
