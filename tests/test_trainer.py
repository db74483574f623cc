"""End-to-end trainer tests: loop, early stopping, orbax checkpoint/resume
(the reference never saves its model — SURVEY.md §5)."""

import json
import os

import numpy as np
import pytest

import jax

from posenet_tpu.config import ModelConfig, TrainConfig
from posenet_tpu.models import mobilenet_v1
from posenet_tpu.training import train_step as ts
from posenet_tpu.training.dataset import PosenetDataset
from posenet_tpu.training.ground_truth import prepare_ground_truth_data
from posenet_tpu.training.trainer import (MetricLogger, restore_checkpoint,
                                          save_checkpoint, train)


def make_synthetic_dataset(root, n_images=4, image_size=65):
    import cv2

    images = os.path.join(root, "images")
    labels = os.path.join(root, "labels")
    kpdir = os.path.join(root, "keypoints_updated")
    os.makedirs(images); os.makedirs(labels)
    rng = np.random.RandomState(0)
    for i in range(n_images):
        cv2.imwrite(os.path.join(images, f"img{i}.jpg"),
                    rng.randint(0, 255, (80, 80, 3), dtype=np.uint8))
        ann = {
            "metadata": {"system": {"height": 80, "width": 80}},
            "annotations": [
                {"type": "pose", "id": "p1"},
                {"type": "point", "label": "Nose",
                 "metadata": {"system": {"parentId": "p1"}},
                 "coordinates": {"x": float(rng.randint(10, 70)),
                                 "y": float(rng.randint(10, 70))}},
                {"type": "point", "label": "Left Shoulder",
                 "metadata": {"system": {"parentId": "p1"}},
                 "coordinates": {"x": float(rng.randint(10, 70)),
                                 "y": float(rng.randint(10, 70))}},
            ],
        }
        with open(os.path.join(labels, f"img{i}.json"), "w") as f:
            json.dump(ann, f)
    prepare_ground_truth_data(images, labels, keypoints_updated_dir=kpdir)
    return images, kpdir


def test_dataset_prefetch_matches_sync(tmp_path):
    """Prefetched (threaded, double-buffered) batches must be identical to
    the synchronous path, for both cached and uncached image loading."""
    images, kpdir = make_synthetic_dataset(str(tmp_path), n_images=5)
    ds_sync = PosenetDataset(images, kpdir, image_size=65, output_stride=16,
                             cache_images=False)
    ds_pre = PosenetDataset(images, kpdir, image_size=65, output_stride=16,
                            cache_images=True)

    sync = list(ds_sync.iter_batches(2, shuffle=True, seed=3, prefetch=0))
    pre = list(ds_pre.iter_batches(2, shuffle=True, seed=3, prefetch=2))
    assert len(sync) == len(pre) == 2  # drop_remainder
    for a, b in zip(sync, pre):
        np.testing.assert_array_equal(a['image'], b['image'])
        np.testing.assert_array_equal(a['keypoints'], b['keypoints'])
        assert a['filenames'] == b['filenames']
    # second (cached) epoch identical
    again = list(ds_pre.iter_batches(2, shuffle=True, seed=3, prefetch=2))
    np.testing.assert_array_equal(pre[0]['image'], again[0]['image'])


def test_dataset_wrap_if_short(tmp_path):
    """A dataset smaller than one batch yields ONE wrap-around-padded
    batch under drop_remainder + wrap_if_short (sharded eval must not get
    zero batches -> nan val loss)."""
    images, kpdir = make_synthetic_dataset(str(tmp_path), n_images=3)
    ds = PosenetDataset(images, kpdir, image_size=65, output_stride=16)
    assert list(ds.iter_batches(8, shuffle=False, drop_remainder=True)) == []
    batches = list(ds.iter_batches(8, shuffle=False, drop_remainder=True,
                                   wrap_if_short=True))
    assert len(batches) == 1
    assert batches[0]['image'].shape[0] == 8
    # wrap-around repeats items cyclically
    np.testing.assert_array_equal(batches[0]['image'][0],
                                  batches[0]['image'][3])


def test_dataset_abandoned_generator_retires_producer(tmp_path):
    """Dropping a prefetching iterator mid-epoch must not leak the
    producer thread (it used to block forever on the full queue)."""
    import threading
    import time as _time
    images, kpdir = make_synthetic_dataset(str(tmp_path), n_images=5)
    ds = PosenetDataset(images, kpdir, image_size=65, output_stride=16)
    base = threading.active_count()
    for _ in range(4):
        gen = ds.iter_batches(1, shuffle=False, prefetch=1)
        next(gen)          # take one batch, abandon the rest
        gen.close()
    deadline = _time.time() + 10.0
    while threading.active_count() > base and _time.time() < deadline:
        _time.sleep(0.05)
    assert threading.active_count() <= base


def test_checkpoint_roundtrip(tmp_path):
    model_cfg = ModelConfig(model_id=50, output_stride=16)
    train_cfg = TrainConfig(model_id=50)
    params = mobilenet_v1.init_params(jax.random.PRNGKey(0), model_cfg)
    state, tx = ts.init_train_state(params, train_cfg)

    ckpt_dir = str(tmp_path / "ckpt")
    save_checkpoint(ckpt_dir, state)
    restored = restore_checkpoint(ckpt_dir, state)
    assert restored is not None
    assert int(restored.step) == int(state.step)
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # missing dir -> None
    assert restore_checkpoint(str(tmp_path / "nope"), state) is None


def test_train_loop_end_to_end(tmp_path):
    """Two epochs of heads-only fine-tuning on a synthetic dataset must run,
    log metrics, reduce the train loss, and write a checkpoint."""
    images, kpdir = make_synthetic_dataset(str(tmp_path))
    ds = PosenetDataset(images, kpdir, image_size=65, output_stride=16)

    cfg = TrainConfig(model_id=50, output_stride=16, batch_size=2,
                      learning_rate=3e-3, num_epochs=4,
                      checkpoint_dir=str(tmp_path / "ckpt"))
    logger = MetricLogger(verbose=False)
    state = train(ds, ds, cfg, logger=logger, resume=False,
                  eval_pose_metrics=False)

    assert int(state.step) == 4 * 2  # 4 epochs x 2 batches
    hist = logger.history
    assert len(hist) == 4
    assert np.isfinite([h['train_loss'] for h in hist]).all()
    assert hist[-1]['train_loss'] < hist[0]['train_loss']
    assert 'test_loss' in hist[0]
    # best-model checkpoint written
    assert any(d.startswith('step_') for d in os.listdir(cfg.checkpoint_dir))

    # resume: restarting with the same checkpoint dir picks up the step
    state2 = train(ds, None, TrainConfig(
        model_id=50, output_stride=16, batch_size=2, num_epochs=1,
        checkpoint_dir=str(tmp_path / "ckpt")), logger=MetricLogger(verbose=False),
        resume=True, eval_pose_metrics=False)
    assert int(state2.step) > int(state.step) - 4  # resumed, not restarted


def test_train_visual_diagnostics(tmp_path):
    """visual_every=1 + output_dir must dump per-keypoint heatmap pngs and
    keypoint overlays each epoch (the reference's per-step dumps,
    train.py:672-716, at configurable cadence and off by default)."""
    images, kpdir = make_synthetic_dataset(str(tmp_path), n_images=2)
    ds = PosenetDataset(images, kpdir, image_size=65, output_stride=16)
    out_dir = str(tmp_path / "output")
    cfg = TrainConfig(model_id=50, output_stride=16, batch_size=2,
                      num_epochs=1, checkpoint_dir=str(tmp_path / "ckpt"),
                      output_dir=out_dir, visual_every=1)
    train(ds, ds, cfg, logger=MetricLogger(verbose=False), resume=False,
          eval_pose_metrics=False)

    epoch_dir = os.path.join(out_dir, 'epoch_0')
    assert os.path.isdir(epoch_dir)
    item_dirs = sorted(os.listdir(epoch_dir))
    assert item_dirs  # one dir per batch item
    item = os.path.join(epoch_dir, item_dirs[0])
    # heatmap channel dumps (visualizers.print_heatmap layout)
    assert os.path.exists(os.path.join(item, 'image_0',
                                       'joint_0_heatmap.png'))
    # skeleton overlay at original image resolution
    overlay = os.path.join(item, item_dirs[0] + '_keypoints.jpg')
    assert os.path.exists(overlay)
    import cv2
    img = cv2.imread(overlay)
    assert img is not None and img.shape[:2] == (80, 80)


def test_train_loop_with_pose_metrics(tmp_path):
    """One epoch with the decode+OKS/mAP eval path enabled."""
    images, kpdir = make_synthetic_dataset(str(tmp_path), n_images=2)
    ds = PosenetDataset(images, kpdir, image_size=65, output_stride=16)
    cfg = TrainConfig(model_id=50, output_stride=16, batch_size=2,
                      num_epochs=1, checkpoint_dir=str(tmp_path / "ckpt"))
    logger = MetricLogger(verbose=False)
    train(ds, ds, cfg, logger=logger, resume=False, eval_pose_metrics=True)
    assert 'oks' in logger.history[0] or 'test_loss' in logger.history[0]


def test_evaluate_standalone(tmp_path):
    """trainer.evaluate: loss + OKS/mAP over a dataset with no training."""
    from posenet_tpu.training.trainer import evaluate

    images, kpdir = make_synthetic_dataset(str(tmp_path))
    ds = PosenetDataset(images, kpdir, image_size=65, output_stride=16)
    cfg = TrainConfig(model_id=50, output_stride=16, batch_size=2)
    params = mobilenet_v1.init_params(jax.random.PRNGKey(0),
                                      ModelConfig(model_id=50,
                                                  output_stride=16))
    report = evaluate(ds, cfg, params)
    for key in ('loss', 'heatmap_loss', 'offset_loss', 'oks', 'mAP'):
        assert key in report and np.isfinite(report[key]), (key, report)
    assert report['n_images'] == 4
    # metrics off -> no pose keys, loss still there
    lean = evaluate(ds, cfg, params, eval_pose_metrics=False)
    assert 'oks' not in lean and np.isfinite(lean['loss'])


def test_evaluate_weights_partial_and_wrapped_batches(tmp_path):
    """The eval report must be an exact per-image mean: a partial final
    batch (unsharded) and wrap-around duplicates (mesh short dataset) must
    not skew the loss (ADVICE r3 items 1-2)."""
    from posenet_tpu.parallel.mesh import make_mesh
    from posenet_tpu.training.trainer import evaluate

    images, kpdir = make_synthetic_dataset(str(tmp_path), n_images=3)
    ds = PosenetDataset(images, kpdir, image_size=65, output_stride=16)
    params = mobilenet_v1.init_params(jax.random.PRNGKey(0),
                                      ModelConfig(model_id=50,
                                                  output_stride=16))
    # Oracle: batch_size=1 => every batch is one real image; the mean over
    # batches IS the per-image mean regardless of weighting.
    cfg1 = TrainConfig(model_id=50, output_stride=16, batch_size=1)
    oracle = evaluate(ds, cfg1, params, eval_pose_metrics=False)
    # Unsharded, batch_size=2 over 3 images: final batch is 1 image; an
    # unweighted per-batch mean would weight it double.
    cfg2 = TrainConfig(model_id=50, output_stride=16, batch_size=2)
    got = evaluate(ds, cfg2, params, eval_pose_metrics=False)
    assert got['n_images'] == 3
    np.testing.assert_allclose(got['loss'], oracle['loss'], rtol=1e-5)
    # Mesh path, dataset (3) < batch (8): one wrap-padded batch whose 5
    # duplicate slots must not count toward n_images or the means.
    mesh = make_mesh()
    cfg8 = TrainConfig(model_id=50, output_stride=16, batch_size=8)
    wrapped = evaluate(ds, cfg8, params, mesh=mesh, eval_pose_metrics=True)
    assert wrapped['n_images'] == 3
    np.testing.assert_allclose(wrapped['loss'], oracle['loss'], rtol=1e-5)


def test_train_cli_eval_only(tmp_path, monkeypatch, capsys):
    """train.py --eval_only prints one JSON report line and does not write
    a checkpoint."""
    import sys

    import train as train_cli

    images, kpdir = make_synthetic_dataset(str(tmp_path))
    ckpt_dir = str(tmp_path / "ckpt")
    monkeypatch.setattr(sys, 'argv', [
        'train.py', '--model', '50', '--train_image_dir', images,
        '--test_image_dir', str(tmp_path / 'none'),
        '--keypoint_dir', kpdir, '--image_size', '65',
        '--checkpoint_dir', ckpt_dir, '--batch_size', '2',
        '--eval_only', '--allow_random_init'])
    train_cli.main()
    out = capsys.readouterr().out
    assert 'no checkpoint found' in out
    report = json.loads(out.strip().splitlines()[-1])
    assert np.isfinite(report['loss']) and report['n_images'] == 4
    assert not os.path.exists(ckpt_dir)


def test_score_decoded_zero_predictions_counts_fn():
    """An image where the model predicts NOTHING but GT poses exist must
    drag OKS/recall/mAP to 0 — not silently vanish from the average
    (round-2 verdict weak #3: the old n_pred==0 skip made metrics RISE as
    the model degraded toward silence)."""
    from posenet_tpu.training.trainer import score_decoded_poses

    stride = 16
    gt = np.full((1, 15, 17, 2), -1.0, np.float32)
    gt[0, 0] = np.random.RandomState(0).uniform(2, 30, (17, 2))
    # no predictions at all
    kp_coords = np.zeros((1, 10, 17, 2), np.float64)
    pose_scores = np.zeros((1, 10), np.float64)
    oks, ap, scored = score_decoded_poses(kp_coords, pose_scores, gt, stride)
    assert oks == 0.0 and ap == 0.0 and scored == 1

    # sanity: a perfect prediction of the same GT scores ~1.0 OKS
    kp_coords[0, 0] = gt[0, 0] * stride
    pose_scores[0, 0] = 0.9
    oks2, ap2, _ = score_decoded_poses(kp_coords, pose_scores, gt, stride)
    assert oks2 > 0.99 and ap2 > 0.9

    # averaging: one perfect image + one silent image with GT halves both
    gt2 = np.concatenate([gt, gt], axis=0)
    kp2 = np.concatenate([kp_coords, np.zeros_like(kp_coords)], axis=0)
    ps2 = np.concatenate([pose_scores, np.zeros_like(pose_scores)], axis=0)
    oks3, ap3, scored3 = score_decoded_poses(kp2, ps2, gt2, stride)
    assert abs(oks3 - oks2 / 2) < 1e-9 and abs(ap3 - ap2 / 2) < 1e-9
    assert scored3 == 2


def test_score_decoded_predictions_without_gt_count_fp():
    """Symmetric case: hallucinated poses on a GT-empty image must yield
    zero precision/mAP (and not be skipped)."""
    from posenet_tpu.training.trainer import score_decoded_poses

    gt = np.full((1, 15, 17, 2), -1.0, np.float32)   # no GT poses
    kp_coords = np.zeros((1, 10, 17, 2), np.float64)
    kp_coords[0, 0] = np.random.RandomState(1).uniform(10, 400, (17, 2))
    pose_scores = np.zeros((1, 10), np.float64)
    pose_scores[0, 0] = 0.8
    oks, ap, scored = score_decoded_poses(kp_coords, pose_scores, gt, 16)
    assert oks == 0.0 and ap == 0.0 and scored == 1

    # while a truly empty image (no GT, no preds) still contributes nothing
    empty = score_decoded_poses(np.zeros((1, 10, 17, 2)),
                                np.zeros((1, 10)), gt, 16)
    assert empty == (0.0, 0.0, 0)  # excluded, not scored 0


def test_restore_ignores_orbax_tmp_dirs(tmp_path):
    """An interrupted orbax save leaves 'step_<N>.orbax-checkpoint-tmp' in
    the checkpoint dir; resume must skip it (regression: int() on the dir
    name raised ValueError, killing the recovery path it exists for)."""
    cfg = ModelConfig(model_id=50, output_stride=16)
    params = mobilenet_v1.init_params(jax.random.PRNGKey(0), cfg)
    tcfg = TrainConfig(model_id=50, output_stride=16,
                       checkpoint_dir=str(tmp_path))
    state, _ = ts.init_train_state(params, tcfg)
    save_checkpoint(str(tmp_path), state)
    os.makedirs(os.path.join(str(tmp_path),
                             "step_7.orbax-checkpoint-tmp"))
    restored = restore_checkpoint(str(tmp_path), state)
    assert restored is not None
    assert int(restored.step) == int(state.step)
    # a dir of ONLY tmp leftovers restores nothing (fresh start)
    empty = str(tmp_path / "only_tmp")
    os.makedirs(os.path.join(empty, "step_3.orbax-checkpoint-tmp"))
    assert restore_checkpoint(empty, state) is None


def test_best_val_loss_persists_across_resume(tmp_path):
    """save_checkpoint writes the best-so-far eval loss next to the
    checkpoints, and a resumed run must not overwrite the on-disk best
    with a worse model (regression: best reset to inf across restarts)."""
    from posenet_tpu.training.trainer import _load_best_val_loss

    cfg = ModelConfig(model_id=50, output_stride=16)
    params = mobilenet_v1.init_params(jax.random.PRNGKey(0), cfg)
    tcfg = TrainConfig(model_id=50, output_stride=16,
                       checkpoint_dir=str(tmp_path))
    state, _ = ts.init_train_state(params, tcfg)
    assert _load_best_val_loss(str(tmp_path)) == float("inf")
    save_checkpoint(str(tmp_path), state, best_val_loss=0.125)
    assert _load_best_val_loss(str(tmp_path)) == 0.125


def test_best_val_loss_written_before_checkpoint(tmp_path, monkeypatch):
    """restore_checkpoint picks the LATEST step, so a crash inside
    save_checkpoint must leave the stricter best.json bound already on
    disk — otherwise a resumed run (stale looser bound) saves a worse
    model at a higher step, which then wins the latest-step restore."""
    import orbax.checkpoint as ocp
    from posenet_tpu.training.trainer import _load_best_val_loss

    cfg = ModelConfig(model_id=50, output_stride=16)
    params = mobilenet_v1.init_params(jax.random.PRNGKey(0), cfg)
    tcfg = TrainConfig(model_id=50, output_stride=16,
                       checkpoint_dir=str(tmp_path))
    state, _ = ts.init_train_state(params, tcfg)

    def boom(self, *a, **k):
        raise RuntimeError("simulated crash mid-save")

    monkeypatch.setattr(ocp.StandardCheckpointer, "save", boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        save_checkpoint(str(tmp_path), state, best_val_loss=0.25)
    assert _load_best_val_loss(str(tmp_path)) == 0.25


def test_train_remainder_not_dropped_unsharded(tmp_path):
    """Unsharded training keeps the last partial batch like the reference
    DataLoader (drop_last=False): 5 images at batch 2 -> 3 steps/epoch
    (regression: the remainder was silently discarded every epoch; a
    dataset smaller than one batch trained on nothing at all)."""
    images, kpdir = make_synthetic_dataset(str(tmp_path), n_images=5)
    ds = PosenetDataset(images, kpdir, image_size=65, output_stride=16)
    tcfg = TrainConfig(model_id=50, output_stride=16, batch_size=2,
                       num_epochs=1, learning_rate=1e-4,
                       checkpoint_dir=str(tmp_path / "ckpt"),
                       output_dir=str(tmp_path / "out"), visual_every=0)
    state = train(ds, None, tcfg, logger=MetricLogger(verbose=False),
                  resume=False, eval_pose_metrics=False)
    assert int(state.step) == 3  # 2+2+1, not 2+2

    # smaller than one batch: still one step, not zero
    tcfg_big = TrainConfig(model_id=50, output_stride=16, batch_size=8,
                           num_epochs=1, learning_rate=1e-4,
                           checkpoint_dir=str(tmp_path / "ckpt2"),
                           output_dir=str(tmp_path / "out2"), visual_every=0)
    state = train(ds, None, tcfg_big, logger=MetricLogger(verbose=False),
                  resume=False, eval_pose_metrics=False)
    assert int(state.step) == 1


def test_dataset_scale_factor_applied(tmp_path):
    """scale_factor must change the training resolution (reference
    read_imgfile semantics: scale, then snap stride-valid) — regression:
    it was stored and ignored."""
    images, kpdir = make_synthetic_dataset(str(tmp_path), n_images=2)
    full = PosenetDataset(images, kpdir, image_size=513, output_stride=16)
    half = PosenetDataset(images, kpdir, image_size=513, output_stride=16,
                          scale_factor=0.5)
    assert full.image_size == 513 and half.image_size == 257
    assert half[0]["image"].shape == (257, 257, 3)
    # GT grid coords scale with the output grid (33 -> 17 cells)
    valid = ~np.all((full.keypoints[0] == 0) | (full.keypoints[0] == -1),
                    axis=-1)
    np.testing.assert_allclose(half.keypoints[0][valid],
                               full.keypoints[0][valid] * (17 / 33),
                               rtol=1e-5)


def test_left_right_swap_constant():
    """LEFT_RIGHT_SWAP is an involution mapping every left* part to its
    right* counterpart (8 pairs) and fixing the nose."""
    from posenet_tpu.constants import LEFT_RIGHT_SWAP, PART_NAMES
    swap = np.asarray(LEFT_RIGHT_SWAP)
    np.testing.assert_array_equal(swap[swap], np.arange(17))
    for i, name in enumerate(PART_NAMES):
        j = int(swap[i])
        if name.startswith('left'):
            assert PART_NAMES[j] == 'right' + name[4:]
        elif name.startswith('right'):
            assert PART_NAMES[j] == 'left' + name[5:]
        else:
            assert j == i
    assert int((swap != np.arange(17)).sum()) == 16  # 8 left/right pairs


def test_dataset_flip_augmentation(tmp_path):
    """augment_flip: a per-slot coin mirrors the image, x-mirrors keypoints
    on the output grid, and swaps left/right channels; sentinels pass
    through untouched; deterministic per seed and prefetch-invariant."""
    from posenet_tpu.constants import LEFT_RIGHT_SWAP

    images, kpdir = make_synthetic_dataset(str(tmp_path), n_images=8)
    ds_plain = PosenetDataset(images, kpdir, image_size=65, output_stride=16)
    ds_flip = PosenetDataset(images, kpdir, image_size=65, output_stride=16,
                             augment_flip=True)

    plain = list(ds_plain.iter_batches(4, shuffle=True, seed=7, prefetch=0))
    flip = list(ds_flip.iter_batches(4, shuffle=True, seed=7, prefetch=0))
    r = (65 - 1) // 16 + 1
    n_flipped = 0
    for pb, fb in zip(plain, flip):
        assert pb['filenames'] == fb['filenames']
        for i in range(4):
            img_p, img_f = pb['image'][i], fb['image'][i]
            kp_p, kp_f = pb['keypoints'][i], fb['keypoints'][i]
            if np.array_equal(img_p, img_f):
                np.testing.assert_array_equal(kp_p, kp_f)
                continue
            n_flipped += 1
            np.testing.assert_array_equal(img_f, img_p[:, ::-1])
            expected = kp_p[:, LEFT_RIGHT_SWAP, :].copy()
            live = ~np.all((expected == 0) | (expected == -1), axis=-1)
            expected[live, 1] = r * (65 - 1) / 65 - expected[live, 1]
            np.testing.assert_allclose(kp_f, expected, rtol=1e-6)
    assert 0 < n_flipped < 8  # the coin actually lands both ways

    # same seed replays bit-identically through the prefetch path
    flip2 = list(ds_flip.iter_batches(4, shuffle=True, seed=7, prefetch=2))
    for a, b in zip(flip, flip2):
        np.testing.assert_array_equal(a['image'], b['image'])
        np.testing.assert_array_equal(a['keypoints'], b['keypoints'])


def test_train_loop_with_flip_augmentation(tmp_path):
    """Training with augment_flip on still reduces the loss (the soak for
    the capability the reference attempted but never shipped)."""
    images, kpdir = make_synthetic_dataset(str(tmp_path))
    ds = PosenetDataset(images, kpdir, image_size=65, output_stride=16,
                        augment_flip=True)
    cfg = TrainConfig(model_id=50, output_stride=16, batch_size=2,
                      learning_rate=3e-3, num_epochs=4,
                      checkpoint_dir=str(tmp_path / "ckpt"))
    logger = MetricLogger(verbose=False)
    train(ds, None, cfg, logger=logger, resume=False,
          eval_pose_metrics=False)
    hist = logger.history
    assert np.isfinite([h['train_loss'] for h in hist]).all()
    assert hist[-1]['train_loss'] < hist[0]['train_loss']


def test_flip_skips_sentinel_collision(tmp_path):
    """A real keypoint that would mirror onto the (0,0) unlabeled sentinel
    (y=0, x = R*(S-1)/S exactly) or to a NEGATIVE grid coord (right-edge
    annotation, x > R*(S-1)/S) must leave the sample UNFLIPPED (label
    preserved) rather than silently corrupting the supervision."""
    images, kpdir = make_synthetic_dataset(str(tmp_path), n_images=2)
    ds = PosenetDataset(images, kpdir, image_size=65, output_stride=16,
                        augment_flip=True)
    r = (65 - 1) // 16 + 1
    mirror_max = r * (65 - 1) / 65
    img_batch = {i: ds._load_u8(i).copy() for i in range(2)}
    for planted_x in (mirror_max,            # mirrors exactly onto (0,0)
                      mirror_max + 0.03):    # mirrors to x' < 0
        ds.keypoints[:, 0, 3] = [0.0, planted_x]  # (y, x) grid coords
        batch = ds._make_batch([0, 1], None, flips=np.array([True, True]))
        for i in range(2):
            np.testing.assert_array_equal(batch['image'][i],
                                          img_batch[i].astype(np.float32)
                                          * (2.0 / 255.0) - 1.0)
            np.testing.assert_allclose(batch['keypoints'][i],
                                       ds.keypoints[i])
    # y=1 at the exact mirror_max lands on (1,0) — a real coord; DOES flip
    ds.keypoints[:, 0, 3] = [1.0, mirror_max]
    batch2 = ds._make_batch([0, 1], None, flips=np.array([True, True]))
    for i in range(2):
        np.testing.assert_array_equal(
            batch2['image'][i],
            (img_batch[i].astype(np.float32) * (2.0 / 255.0) - 1.0)[:, ::-1])


def test_flip_content_label_consistency(tmp_path):
    """Flipped (image, label) pairs must stay consistent under the LOADER's
    coordinate convention (x_grid = x_px * R / S): paint a unique marker
    pixel, label it per the convention, flip, and check the label still
    points at the marker's new pixel — asserting the semantics, not the
    mirror formula (advisor r4: the (R-1)-x formula passed the formula
    test while shifting every flipped label ~0.94 cells)."""
    import cv2
    s, stride = 65, 16
    r = (s - 1) // stride + 1
    images, kpdir = make_synthetic_dataset(str(tmp_path), n_images=1)
    ds = PosenetDataset(images, kpdir, image_size=s, output_stride=stride,
                        augment_flip=True, cache_images=True)
    py, px = 20, 47                       # marker training pixel
    frame = np.zeros((s, s, 3), np.uint8)
    frame[py, px] = (255, 10, 10)
    ds._cache[0] = frame                  # bypass disk: exact content
    ds.keypoints[0] = -1.0                # clear, then one live keypoint
    ds.keypoints[0, 0, 0] = [py * r / s, px * r / s]   # loader convention
    batch = ds._make_batch([0], None, flips=np.array([True]))
    img, kp = batch['image'][0], batch['keypoints'][0]
    # marker moved to the mirrored pixel
    my, mx = np.unravel_index(img[..., 0].argmax(), img[..., 0].shape)
    assert (my, mx) == (py, (s - 1) - px)
    # label points at the SAME pixel under the SAME convention
    np.testing.assert_allclose(
        kp[0, 0], [my * r / s, mx * r / s], atol=1e-5)


def test_iter_batches_augment_override(tmp_path):
    """iter_batches(augment=False) on a flip-augmented dataset must yield
    the exact unaugmented batches — evaluation never sees flipped data
    even when the eval set IS the training dataset."""
    images, kpdir = make_synthetic_dataset(str(tmp_path), n_images=6)
    ds_plain = PosenetDataset(images, kpdir, image_size=65, output_stride=16)
    ds_flip = PosenetDataset(images, kpdir, image_size=65, output_stride=16,
                             augment_flip=True)
    plain = list(ds_plain.iter_batches(2, shuffle=False, prefetch=0))
    noaug = list(ds_flip.iter_batches(2, shuffle=False, prefetch=0,
                                      augment=False))
    assert len(plain) == len(noaug)
    for a, b in zip(plain, noaug):
        np.testing.assert_array_equal(a['image'], b['image'])
        np.testing.assert_array_equal(a['keypoints'], b['keypoints'])
