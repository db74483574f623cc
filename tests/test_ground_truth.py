"""Ground-truth generation + metrics tests."""

import json
import os

import numpy as np
import pytest

from posenet_tpu.constants import NUM_KEYPOINTS, PART_NAMES
from posenet_tpu.training import ground_truth as gt
from posenet_tpu.training import metrics as M

from tests import reference_oracle


def test_gaussian_heatmap_matches_reference_kernel():
    """Vectorized Gaussian must equal the reference's cv2 kernel pasting."""
    import cv2

    kx, ky = 10.3, 20.7
    ours = gt.gaussian_heatmaps(
        np.array([[[kx, ky]] + [[0.0, 0.0]] * 16]))[0, 0]

    # reference semantics (ground_truth_dataloop.py:111-137) re-derived:
    k = 11
    kernel = cv2.getGaussianKernel(k, k / 10)
    kernel2d = np.outer(kernel, kernel.T)
    expect = np.zeros((33, 33))
    xmin, xmax = int(kx) - 5, int(kx) + 6
    ymin, ymax = int(ky) - 5, int(ky) + 6
    expect[ymin:ymax, xmin:xmax] = kernel2d
    expect /= expect.max()

    np.testing.assert_allclose(ours, expect, atol=1e-6)


def test_gaussian_heatmap_zero_for_absent():
    hm = gt.gaussian_heatmaps(np.zeros((1, 17, 2)))
    assert hm.sum() == 0


def test_keypoints_from_heatmaps_roundtrip():
    kp = np.array([[[5.0, 9.0], [30.0, 2.0]] + [[12.0, 12.0]] * 15])
    hm = gt.gaussian_heatmaps(kp)
    rec = gt.keypoints_from_heatmaps(hm)
    np.testing.assert_array_equal(rec[0, 0], [5, 9])
    np.testing.assert_array_equal(rec[0, 1], [30, 2])


def test_dataloop_parser(tmp_path):
    ann = {
        "metadata": {"system": {"height": 660, "width": 660}},
        "annotations": [
            {"type": "pose", "id": "p1"},
            {"type": "point", "label": "Nose",
             "metadata": {"system": {"parentId": "p1"}},
             "coordinates": {"x": 330.0, "y": 330.0}},
            {"type": "point", "label": "Left Shoulder",
             "metadata": {"system": {"parentId": "p1"}},
             "coordinates": {"x": 660.0, "y": 0.0}},
            {"type": "pose", "id": "p2"},  # pose with no points -> dropped
        ],
    }
    path = tmp_path / "img.json"
    path.write_text(json.dumps(ann))
    kp = gt.parse_dataloop_json(str(path))
    assert kp.shape == (1, 17, 2)
    np.testing.assert_allclose(kp[0, 0], [16.5, 16.5])       # nose scaled to 33 grid
    np.testing.assert_allclose(kp[0, PART_NAMES.index("leftShoulder")], [33.0, 0.0])
    np.testing.assert_allclose(kp[0, 1], [-1.0, -1.0])       # unannotated


def test_roboflow_parser(tmp_path):
    # class ids index the alphabetically sorted label list; prefix = kp index
    sorted_names = sorted([f"{i}-{n}" for i, n in enumerate(PART_NAMES)] + ["17-person"])
    nose_class = sorted_names.index("0-nose")
    person_class = sorted_names.index("17-person")
    path = tmp_path / "img.txt"
    path.write_text(f"{nose_class} 0.5 0.25 0.1 0.1\n{person_class} 0.5 0.5 1 1\n")
    kp = gt.parse_roboflow_txt(str(path))
    assert kp.shape == (1, 17, 2)
    np.testing.assert_allclose(kp[0, 0], [0.5 * 33, 0.25 * 33])
    assert (kp[0, 1:] == 0).all()  # person box dropped, others absent


def test_prepare_and_load_roundtrip(tmp_path):
    import cv2

    images = tmp_path / "images"
    labels = tmp_path / "labels"
    outdir = tmp_path / "keypoints_updated"
    images.mkdir(); labels.mkdir()
    cv2.imwrite(str(images / "a.jpg"),
                np.zeros((100, 100, 3), np.uint8))
    ann = {
        "metadata": {"system": {"height": 100, "width": 100}},
        "annotations": [
            {"type": "pose", "id": "p1"},
            {"type": "point", "label": "Nose",
             "metadata": {"system": {"parentId": "p1"}},
             "coordinates": {"x": 50.0, "y": 50.0}},
        ],
    }
    (labels / "a.json").write_text(json.dumps(ann))

    stems = gt.prepare_ground_truth_data(
        str(images), str(labels), keypoints_updated_dir=str(outdir))
    assert stems == ["a"]
    kps, hms, offs = gt.load_ground_truth_data(stems, str(outdir))
    assert kps.shape == (1, 15, 17, 2)
    assert hms.shape == (1, 15, 17, 33, 33)
    np.testing.assert_allclose(kps[0, 0, 0], [16.5, 16.5])
    assert kps[0, 1, 0, 0] == -1          # pose padding
    # offset vector = annotated - argmax cell
    np.testing.assert_allclose(offs[0, 0, 0], [0.5, 0.5])


def test_prepare_with_heatmap_pngs(tmp_path):
    """save_heatmap_images writes per-pose/per-keypoint png dumps (reference
    ground_truth_dataloop.py:173-204 always writes them; ours are opt-in)."""
    import cv2

    images = tmp_path / "images"
    labels = tmp_path / "labels"
    images.mkdir(); labels.mkdir()
    cv2.imwrite(str(images / "a.jpg"), np.zeros((100, 100, 3), np.uint8))
    ann = {
        "metadata": {"system": {"height": 100, "width": 100}},
        "annotations": [
            {"type": "pose", "id": "p1"},
            {"type": "point", "label": "Nose",
             "metadata": {"system": {"parentId": "p1"}},
             "coordinates": {"x": 50.0, "y": 50.0}},
        ],
    }
    (labels / "a.json").write_text(json.dumps(ann))

    gt.prepare_ground_truth_data(
        str(images), str(labels),
        keypoints_updated_dir=str(tmp_path / "kp"),
        heatmaps_dir=str(tmp_path / "heatmaps"),
        save_heatmap_images=True)
    png = tmp_path / "heatmaps" / "a" / "pose_0" / "png" / "heatmap_0.png"
    assert png.exists()
    img = cv2.imread(str(png))
    assert img is not None and img.shape == (33, 33, 3)
    # all 17 keypoint channels dumped
    pngs = list((tmp_path / "heatmaps" / "a" / "pose_0" / "png").iterdir())
    assert len(pngs) == 17


# ---------------------------------------------------------------------------
# Metrics
# ---------------------------------------------------------------------------

def test_sentinel_rule_matches_training_validity():
    """Eval's _is_sentinel and training's keypoint_validity must classify
    every keypoint identically (same per-coord {0,-1} rule) — a keypoint
    dropped from the loss but scored by eval (or vice versa) would skew
    OKS/mAP against the model silently. Mixed sentinels like (0,-1) are
    excluded by BOTH."""
    import jax.numpy as jnp
    from posenet_tpu.training.loss import keypoint_validity
    kp = np.array([[0., 0.], [-1., -1.], [0., -1.], [-1., 0.],
                   [5., 0.], [0., 5.], [3., 4.], [-1., 2.]])
    eval_invalid = M._is_sentinel(kp)
    train_invalid = ~np.asarray(keypoint_validity(jnp.asarray(kp[None])))[0]
    np.testing.assert_array_equal(eval_invalid, train_invalid)
    assert list(eval_invalid) == [True, True, True, True,
                                  False, False, False, False]


def test_match_poses_identity():
    rng = np.random.RandomState(0)
    gts = rng.uniform(0, 100, (3, 17, 2))
    perm = [2, 0, 1]
    preds = gts[perm] + rng.uniform(-0.5, 0.5, (3, 17, 2))
    pairs = dict(M.match_poses(preds, gts))
    assert pairs == {0: 2, 1: 0, 2: 1}


def test_oks_perfect_and_far():
    gts = np.random.RandomState(1).uniform(10, 90, (2, 17, 2))
    pairs = [(0, 0), (1, 1)]
    assert M.calculate_oks(pairs, gts.copy(), gts) == pytest.approx(1.0)
    far = gts + 1000.0
    assert M.calculate_oks(pairs, far, gts) < 0.01


def test_precision_recall_perfect():
    gts = np.random.RandomState(2).uniform(10, 90, (2, 17, 2))
    p, r = M.precision_recall(gts.copy(), gts, threshold=0.5)
    assert p == pytest.approx(1.0)
    assert r == pytest.approx(1.0)


def test_precision_counts_fp_on_missing_gt():
    gts = np.full((1, 17, 2), -1.0)
    gts[0, 0] = [10.0, 10.0]
    gts[0, 1] = [20.0, 20.0]
    preds = np.full((1, 17, 2), 30.0)  # predicts everything
    p, r = M.precision_recall(preds, gts, threshold=100.0)
    # 2 TP (within generous threshold), 15 FP on unannotated keypoints
    assert p == pytest.approx(2 / 17)
    assert r == pytest.approx(1.0)


def test_oks_matches_pycocotools_formula():
    """ks_i = exp(-d^2 / (2 s^2 (2 sigma_i)^2)) — the COCO k_i = 2*sigma_i
    factor (pycocotools cocoeval.py vars = (sigmas*2)**2)."""
    gt = np.zeros((1, 17, 2))
    gt[0, :, 0] = np.linspace(10, 90, 17)
    gt[0, :, 1] = np.linspace(10, 90, 17)
    pred = gt.copy()
    pred[0, 0] += [3.0, 4.0]                     # d = 5 px on the nose
    s = M.object_scale(gt[0])
    expected_nose = np.exp(-25.0 / (2 * s**2 * (2 * M.OKS_SIGMAS[0])**2))
    expected = (expected_nose + 16.0) / 17.0
    assert M.calculate_oks([(0, 0)], pred, gt) == pytest.approx(expected)


def test_oks_denominator_counts_scored_pairs_only():
    gts = np.random.RandomState(3).uniform(10, 90, (2, 17, 2))
    gts[1] = -1.0                                # all-sentinel GT pose
    pairs = [(0, 0), (1, 1)]
    assert M.calculate_oks(pairs, gts.copy(), gts) == pytest.approx(1.0)


def test_precision_recall_counts_unmatched_poses():
    """Hallucinated surplus poses must cost precision; missed GT poses
    must cost recall (the reference scores matched pairs only)."""
    gts = np.random.RandomState(4).uniform(10, 90, (1, 17, 2))
    # 2 predictions, 1 GT: the surplus pose is all false positives
    preds = np.stack([gts[0], gts[0] + 500.0])
    p, r = M.precision_recall(preds, gts, threshold=0.5)
    assert p == pytest.approx(17 / 34)
    assert r == pytest.approx(1.0)
    # 1 prediction, 2 GTs: the missed pose is all false negatives
    gts2 = np.stack([gts[0], gts[0] + 500.0])
    p, r = M.precision_recall(gts[:1].copy(), gts2, threshold=0.5)
    assert p == pytest.approx(1.0)
    assert r == pytest.approx(17 / 34)


def test_threshold_sweep_matches_per_threshold_calls():
    rng = np.random.RandomState(5)
    gts = rng.uniform(10, 90, (2, 17, 2))
    preds = gts + rng.uniform(-30, 30, gts.shape)
    ts = np.linspace(0.1, 5.0, 50)
    ps, rs, ap = M.threshold_sweep(preds, gts, ts)
    for k in (0, 10, 49):
        p, r = M.precision_recall(preds, gts, ts[k])
        assert ps[k] == pytest.approx(p)
        assert rs[k] == pytest.approx(r)
    assert ap == pytest.approx(M.calculate_mAP(ps, rs))


def test_mAP_envelope():
    # classic monotone case: AP of perfect PR curve is 1
    p = np.ones(10)
    r = np.linspace(0.1, 1.0, 10)
    assert M.calculate_mAP(p, r) == pytest.approx(1.0)
    # degenerate: zero precision everywhere
    assert M.calculate_mAP(np.zeros(10), r) == pytest.approx(0.0)


def test_dataset_and_mean_std(tmp_path):
    import cv2

    images = tmp_path / "img"
    labels = tmp_path / "lab"
    outdir = tmp_path / "kp"
    images.mkdir(); labels.mkdir()
    rng = np.random.RandomState(0)
    for name in ("a", "b"):
        cv2.imwrite(str(images / f"{name}.jpg"),
                    rng.randint(0, 255, (64, 64, 3), dtype=np.uint8))
        ann = {
            "metadata": {"system": {"height": 64, "width": 64}},
            "annotations": [
                {"type": "pose", "id": "p1"},
                {"type": "point", "label": "Nose",
                 "metadata": {"system": {"parentId": "p1"}},
                 "coordinates": {"x": 32.0, "y": 16.0}},
            ],
        }
        (labels / f"{name}.json").write_text(json.dumps(ann))
    gt.prepare_ground_truth_data(str(images), str(labels),
                                 keypoints_updated_dir=str(outdir))

    from posenet_tpu.training.dataset import PosenetDataset, get_dataset_mean_std

    ds = PosenetDataset(str(images), str(outdir), image_size=65)
    assert len(ds) == 2
    item = ds[0]
    assert item['image'].shape == (65, 65, 3)
    assert item['keypoints'].shape == (15, 17, 2)
    # y-x order, rescaled from the canonical 33-grid to the actual
    # (65-1)/16+1 = 5-cell grid: x = 32/64*33 * (5/33) = 2.5, y = 1.25
    np.testing.assert_allclose(item['keypoints'][0, 0], [1.25, 2.5])

    batches = list(ds.iter_batches(2, shuffle=False))
    assert batches[0]['image'].shape == (2, 65, 65, 3)

    mean, std = get_dataset_mean_std(ds)
    assert mean.shape == (3,) and (np.abs(mean) <= 1).all()
    assert (std > 0).all()
