"""Real-weights golden parity — runs ONLY when network egress exists.

Round-3 environment has zero egress (the GCS bucket and the 24 canonical
test images, reference get_test_images.py:7-32, are unreachable), so every
parity claim so far rests on fixture/random weights. This test closes that
gap automatically in any future environment WITH egress:

1. downloads + converts the real tfjs checkpoints for all 4 model_ids
   (cold path, reference model_factory.py:11-23 semantics),
2. fetches the 24 canonical COCO images,
3. decodes them with model 101 stride 16,
4. cross-checks every image DIRECTLY against the torch reference running
   the same converted weights (tests/reference_oracle.py) — a true parity
   test: a systematic real-weights divergence fails immediately instead of
   being baked into a self-generated golden,
5. AND compares against committed goldens at tests/golden/real_weights.json
   as a second, regression layer — on the first networked run it WRITES
   the goldens and skips with an instruction to commit them (the torch
   cross-check in step 4 has already validated them at that point).

Offline it skips in <1s (socket probe, no JAX work).
"""

import json
import os
import socket

import numpy as np
import pytest

GOLDEN_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           'golden', 'real_weights.json')


def _has_egress(timeout: float = 2.0) -> bool:
    try:
        with socket.create_connection(
                ("storage.googleapis.com", 443), timeout=timeout):
            return True
    except OSError:
        return False


pytestmark = pytest.mark.skipif(
    not _has_egress(), reason="no network egress (GCS unreachable)")


@pytest.fixture(scope='module')
def real_setup(tmp_path_factory):
    import cv2

    import get_test_images
    from posenet_tpu.converter import tfjs2jax
    from posenet_tpu.models.mobilenet_v1 import MOBILENET_V1_CHECKPOINTS

    root = tmp_path_factory.mktemp('real')
    model_dir = str(root / 'models')
    image_dir = str(root / 'images')
    # cold path for every model id: download -> convert -> save
    for model_id in sorted(MOBILENET_V1_CHECKPOINTS):
        tfjs2jax.convert(model_id, model_dir, base_dir=str(root / 'weights'),
                         check=False)
    get_test_images.download_images(image_dir)
    images = sorted(os.listdir(image_dir))
    assert len(images) == 24
    return model_dir, image_dir, images


def test_real_weights_golden_decode(real_setup):
    from posenet_tpu.config import ModelConfig
    from posenet_tpu.converter import tfjs2jax
    from posenet_tpu.decode_multi import decode_multiple_poses
    from posenet_tpu.models.model_factory import PoseNet
    from posenet_tpu.models.mobilenet_v1 import MOBILENET_V1_CHECKPOINTS
    from posenet_tpu.preprocess import read_imgfile

    import jax

    model_dir, image_dir, images = real_setup
    params = tfjs2jax.load_params_npz(os.path.join(
        model_dir, MOBILENET_V1_CHECKPOINTS[101] + '.npz'))
    model = PoseNet(params, ModelConfig(model_id=101, output_stride=16))

    results = {}
    for fname in images:
        input_image, _, output_scale = read_imgfile(
            os.path.join(image_dir, fname), 1.0, 16)
        heads = model(input_image, precision=jax.lax.Precision.HIGHEST)
        ps, ks, kc, _ = decode_multiple_poses(
            *[np.asarray(t)[0] for t in heads], 16,
            max_pose_detections=10, score_threshold=0.25,
            min_pose_score=0.25)
        kc = kc * output_scale
        n = int((ps > 0).sum())
        results[fname] = {
            'n_poses': n,
            'pose_scores': np.round(ps[:n], 4).tolist(),
            'coords': np.round(kc[:n], 2).tolist(),
        }

    # --- layer 1: TRUE parity — the torch reference running the SAME
    # freshly converted real weights is the oracle for every image
    # (reference model_factory.py:11-23 + decode_multi.py:61-148). This
    # catches a systematic real-weights divergence that a self-generated
    # golden would silently pin.
    from tests.reference_oracle import (has_reference, reference_decode,
                                        reference_forward)
    if has_reference():
        f32_params = jax.tree.map(
            lambda a: np.asarray(a, dtype=np.float32), params)
        for fname in images:
            input_image, _, output_scale = read_imgfile(
                os.path.join(image_dir, fname), 1.0, 16)
            ref_heads = reference_forward(f32_params, input_image, 101, 16)
            ref_ps, _, ref_kc, _ = reference_decode(
                *[h[0] for h in ref_heads], 16,
                max_pose_detections=10, score_threshold=0.25,
                min_pose_score=0.25)
            ref_kc = np.asarray(ref_kc) * output_scale
            ref_n = int((np.asarray(ref_ps) > 0).sum())
            r = results[fname]
            assert r['n_poses'] == ref_n, (fname, r['n_poses'], ref_n)
            np.testing.assert_allclose(
                r['pose_scores'], np.asarray(ref_ps)[:ref_n], atol=1e-3,
                err_msg=f"torch-oracle pose scores diverge on {fname}")
            if ref_n:
                dev = np.linalg.norm(
                    np.asarray(r['coords']) - ref_kc[:ref_n], axis=-1)
                assert dev.mean() <= 1.0, (fname, dev.mean())

    # --- layer 2: committed-golden regression ---
    if not os.path.exists(GOLDEN_PATH):
        os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
        with open(GOLDEN_PATH, 'w') as f:
            json.dump(results, f, indent=1, sort_keys=True)
        pytest.skip(f"goldens generated at {GOLDEN_PATH} — review and commit")

    with open(GOLDEN_PATH) as f:
        golden = json.load(f)
    for fname, g in golden.items():
        r = results[fname]
        assert r['n_poses'] == g['n_poses'], fname
        np.testing.assert_allclose(r['pose_scores'], g['pose_scores'],
                                   atol=1e-3, err_msg=fname)
        # BASELINE accuracy bar, applied per pose against the pinned run
        dev = np.linalg.norm(
            np.asarray(r['coords']) - np.asarray(g['coords']), axis=-1)
        assert dev.mean() <= 1.0, (fname, dev.mean())
