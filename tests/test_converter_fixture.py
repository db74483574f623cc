"""Golden converter test on checkpoint-format data (SURVEY §3.1, §7 step 2).

Runs the full cold-start chain — manifest parse -> shard read -> layout
mapping -> forward -> decode -> overlay — on a fabricated checkpoint in the
EXACT tfjs on-disk format (tests/tfjs_fixture.py), through BOTH converters:
ours (posenet_tpu/converter/tfjs2jax.py) and the reference's
(/root/reference/posenet/converter/tfjs2pytorch.py:44-72). Any regex,
byte-order, shape, or HWIO/OIHW layout bug in our converter shows up as a
head/decode mismatch against the torch model built from the same bytes.

This is the de-facto acceptance test of the reference (a converter-time
forward on tennis_in_crowd.jpg, tfjs2pytorch.py:99-111) made automatic;
with egress blocked (GCS unreachable) the weights and the photograph are
deterministic synthetic stand-ins in the real formats.
"""

import os
import sys

import numpy as np
import pytest

import jax

from tests import reference_oracle
from tests.tfjs_fixture import synth_photo, write_tfjs_checkpoint

pytestmark = pytest.mark.skipif(not reference_oracle.has_reference(),
                                reason="reference unavailable")

CHECKPOINT = 'mobilenet_v1_050'


@pytest.fixture(scope='module')
def fixture_env(tmp_path_factory):
    """Checkpoint dir in tfjs format + a photograph on disk."""
    import cv2

    root = tmp_path_factory.mktemp('tfjs')
    write_tfjs_checkpoint(str(root), CHECKPOINT, model_id=50)
    img_dir = root / 'images'
    img_dir.mkdir()
    photo = str(img_dir / 'tennis_in_crowd.jpg')
    cv2.imwrite(photo, synth_photo(), [cv2.IMWRITE_JPEG_QUALITY, 95])
    return str(root), photo


def _reference_params(base_dir):
    """Run the REFERENCE torch converter over the fixture bytes."""
    if reference_oracle.REFERENCE_ROOT not in sys.path:
        # append, never insert(0) — see reference_oracle._import_reference
        sys.path.append(reference_oracle.REFERENCE_ROOT)
    from posenet.converter import tfjs2pytorch as ref_conv
    from posenet.models import mobilenet_v1 as ref_mobilenet

    state_dict = ref_conv.load_variables(CHECKPOINT, base_dir=base_dir)
    model = ref_mobilenet.MobileNetV1(50, output_stride=16)
    model.load_state_dict(state_dict)
    model.eval()
    return model


def test_convert_cold_start_and_sanity_forward(fixture_env, tmp_path,
                                               monkeypatch, capsys):
    """Our convert() end-to-end: manifest -> pytree -> .npz on disk, plus the
    reference's converter self-check forward on the check image."""
    base_dir, _photo = fixture_env
    from posenet_tpu.converter import tfjs2jax

    monkeypatch.chdir(base_dir)  # so ./images/tennis_in_crowd.jpg is found
    path = tfjs2jax.convert(50, str(tmp_path), base_dir=base_dir, check=True)
    assert os.path.exists(path)
    out = capsys.readouterr().out
    assert 'Heatmaps' in out  # sanity forward ran (tfjs2pytorch.py:99-111)

    params = tfjs2jax.load_params_npz(path)
    assert len(params['backbone']) == 14
    assert params['backbone'][0]['w'].shape == (3, 3, 3, 16)
    assert params['backbone'][1]['dw_w'].shape == (3, 3, 1, 16)
    assert set(params['heads']) == {'heatmap', 'offset', 'displacement_fwd',
                                    'displacement_bwd'}


def test_converter_golden_forward_decode_overlay(fixture_env, tmp_path):
    """Both converters on the same checkpoint bytes -> heads <=1e-4,
    decoded keypoints <=1px, overlay written (BASELINE acceptance chain)."""
    import torch

    import posenet_tpu
    from posenet_tpu import read_imgfile
    from posenet_tpu.config import ModelConfig
    from posenet_tpu.converter import tfjs2jax
    from posenet_tpu.draw import draw_skel_and_kp
    from posenet_tpu.models import mobilenet_v1

    base_dir, photo = fixture_env

    variables = tfjs2jax.load_tfjs_variables(CHECKPOINT, base_dir=base_dir)
    params = tfjs2jax.variables_to_pytree(variables, 50)
    ref_model = _reference_params(base_dir)

    input_img, draw_img, output_scale = read_imgfile(
        photo, scale_factor=1.0, output_stride=16)

    # --- 4 head tensors from the same checkpoint bytes -------------------
    cfg = ModelConfig(model_id=50, output_stride=16)
    out = mobilenet_v1.forward(params, np.transpose(input_img, (0, 2, 3, 1)),
                               cfg, precision=jax.lax.Precision.HIGHEST)
    with torch.no_grad():
        ref_heads = [t.numpy() for t in ref_model(torch.tensor(input_img))]
    ours_nchw = [np.asarray(out[k]).transpose(0, 3, 1, 2)
                 for k in ('heatmap', 'offset', 'displacement_fwd',
                           'displacement_bwd')]
    for name, a, b in zip(('heatmap', 'offset', 'dfwd', 'dbwd'),
                          ours_nchw, ref_heads):
        assert np.abs(a - b).max() <= 1e-4, name

    # --- decode parity: both decoders on the SAME head tensors ------------
    # (head parity <=1e-4 is asserted above; decoding each side's own heads
    # would add ulp-level cell flips — clip(round(c/stride)) is knife-edge —
    # that say nothing about the converter under test.) Random-weight
    # heatmaps are near-flat with bitwise-equal ties between distinct cells;
    # torch argsort and lax.top_k legitimately break ties differently, so a
    # tiny deterministic per-cell dither unties them for both decoders.
    hm = ref_heads[0][0]
    # strictly increasing per cell, and each step > float32 ulp at ~0.5 so
    # no two cells stay bitwise-tied after the add
    dither = (np.arange(hm.size).reshape(hm.shape) * 1e-6).astype(np.float32)
    hm = (hm.astype(np.float64) + dither).astype(np.float32)
    kwargs = dict(max_pose_detections=10, score_threshold=0.3,
                  nms_radius=20, min_pose_score=0.15)
    ours = posenet_tpu.decode_multiple_poses(
        hm, ref_heads[1][0], ref_heads[2][0], ref_heads[3][0],
        16, **kwargs)
    ref = reference_oracle.reference_decode(
        hm, ref_heads[1][0], ref_heads[2][0], ref_heads[3][0],
        16, **kwargs)
    np.testing.assert_allclose(ours[0], ref[0], atol=1e-5)  # pose scores
    # BASELINE: <=1px mean keypoint deviation on scored keypoints
    live = ref[1] > 0
    assert live.any()
    dev = np.linalg.norm(ours[2][live] - ref[2][live], axis=-1)
    assert dev.mean() <= 1.0 and dev.max() <= 1.0

    # --- overlay written like image_demo (reference image_demo.py:50-57) --
    coords = ours[2] * output_scale
    overlay = draw_skel_and_kp(draw_img, ours[0], ours[1], coords,
                               min_pose_score=0.15, min_part_score=0.1)
    import cv2
    out_path = str(tmp_path / 'overlay.png')
    cv2.imwrite(out_path, overlay)
    assert os.path.exists(out_path) and os.path.getsize(out_path) > 0


def test_both_converters_skip_extra_variables(fixture_env):
    """Checkpoints carry extra heads (part_heatmap) both converters must
    ignore (reference tfjs2pytorch.py:36-39 returns '' -> skipped)."""
    base_dir, _ = fixture_env
    from posenet_tpu.converter import tfjs2jax

    variables = tfjs2jax.load_tfjs_variables(CHECKPOINT, base_dir=base_dir)
    assert any('part_heatmap' in k for k in variables)
    params = tfjs2jax.variables_to_pytree(variables, 50)  # must not raise
    assert set(params['heads']) == {'heatmap', 'offset', 'displacement_fwd',
                                    'displacement_bwd'}
