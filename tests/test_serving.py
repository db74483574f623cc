"""Serving-artifact tests: jax.export round trip of the fused pipeline.

The reference has no serving story beyond "ship the .pth and the Python"
(reference posenet/models/model_factory.py:11-23); the artifact format is a
TPU-native addition (posenet_tpu/serving.py). These tests run the exported
StableHLO on the CPU lowering and compare against the in-process pipeline.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from posenet_tpu.config import DecodeConfig, ModelConfig
from posenet_tpu.models import mobilenet_v1
from posenet_tpu.models.model_factory import PoseNet
from posenet_tpu.pipeline import _infer
from posenet_tpu.serving import (load_serving_artifact, main,
                                 save_serving_artifact)


@pytest.fixture(scope="module")
def small_model():
    cfg = ModelConfig(model_id=50, output_stride=16)
    params = mobilenet_v1.init_params(jax.random.PRNGKey(3), cfg)
    return PoseNet(params, cfg)


def test_artifact_round_trip_matches_pipeline(small_model, tmp_path):
    """Exported program == in-process pipeline up to export-lowering ulps
    (documented in serving.py: coords within ~1e-5 px, never a cell flip),
    with the DecodedPoses container preserved through deserialization."""
    dcfg = DecodeConfig(min_pose_score=0.0, score_threshold=0.25)
    path = str(tmp_path / "m50.posenet")
    meta = save_serving_artifact(small_model, path, decode_cfg=dcfg,
                                 batch_sizes=(2,), input_hw=(129, 129),
                                 platforms=("cpu",))
    assert meta["model_id"] == 50 and meta["batch_sizes"] == [2]

    art = load_serving_artifact(path)
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (2, 129, 129, 3)).astype(np.uint8)
    out = art(frames)
    assert type(out).__name__ == "DecodedPoses"

    params = mobilenet_v1.cast_params(small_model.params,
                                      small_model.cfg.compute_dtype)
    ref = _infer(params, jnp.asarray(frames), small_model.cfg,
                 DecodeConfig(min_pose_score=0.0, score_threshold=0.25,
                              use_pallas=False))
    np.testing.assert_allclose(np.asarray(out.pose_scores),
                               np.asarray(ref.pose_scores), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.keypoint_scores),
                               np.asarray(ref.keypoint_scores), atol=1e-5)
    # coords: identical cells (diffs far below one stride), sub-ulp offsets
    np.testing.assert_allclose(np.asarray(out.keypoint_coords),
                               np.asarray(ref.keypoint_coords), atol=1e-3)


def test_artifact_batch_routing_and_validation(small_model, tmp_path):
    path = str(tmp_path / "m50.posenet")
    save_serving_artifact(small_model, path, batch_sizes=(1, 2),
                          input_hw=(65, 65), platforms=("cpu",))
    art = load_serving_artifact(path)
    assert art.batch_sizes == [1, 2]
    out1 = art(np.zeros((1, 65, 65, 3), np.uint8))
    out2 = art(np.zeros((2, 65, 65, 3), np.uint8))
    assert np.asarray(out1.pose_scores).shape[0] == 1
    assert np.asarray(out2.pose_scores).shape[0] == 2
    with pytest.raises(ValueError, match="no program for batch size 3"):
        art(np.zeros((3, 65, 65, 3), np.uint8))
    with pytest.raises(ValueError, match="expected"):
        art(np.zeros((1, 64, 64, 3), np.uint8))


def test_multiplatform_artifact_runs_on_cpu(small_model, tmp_path):
    """The default export carries BOTH tpu and cpu lowerings in one
    artifact; the cpu entry must execute here (the tpu entry is validated
    by the same serialize/deserialize path)."""
    path = str(tmp_path / "multi.posenet")
    meta = save_serving_artifact(small_model, path, batch_sizes=(1,),
                                 input_hw=(65, 65),
                                 platforms=("tpu", "cpu"))
    assert meta["platforms"] == ["tpu", "cpu"]
    art = load_serving_artifact(path)
    scores = np.asarray(art(np.zeros((1, 65, 65, 3), np.uint8)).pose_scores)
    assert scores.shape == (1, 10) and np.isfinite(scores).all()


def test_data_parallel_artifact(small_model, tmp_path):
    """DP-sharded artifact on the 8-virtual-device CPU mesh: batch sharded
    over 4 devices, loader shards the plain numpy input itself, results
    match the unsharded artifact (decode is per-image, so sharding must
    not change anything beyond lowering ulps)."""
    import jax as _jax
    assert len(_jax.devices()) >= 4

    dcfg = DecodeConfig(min_pose_score=0.0, score_threshold=0.25)
    plain_path = str(tmp_path / "plain.posenet")
    dp_path = str(tmp_path / "dp.posenet")
    save_serving_artifact(small_model, plain_path, decode_cfg=dcfg,
                          batch_sizes=(8,), input_hw=(65, 65),
                          platforms=("cpu",))
    meta = save_serving_artifact(small_model, dp_path, decode_cfg=dcfg,
                                 batch_sizes=(8,), input_hw=(65, 65),
                                 platforms=("cpu",),
                                 data_parallel_devices=4)
    assert meta["data_parallel_devices"] == 4

    rng = np.random.default_rng(1)
    frames = rng.integers(0, 255, (8, 65, 65, 3)).astype(np.uint8)
    ref = load_serving_artifact(plain_path)(frames)
    out = load_serving_artifact(dp_path)(frames)
    np.testing.assert_allclose(np.asarray(out.pose_scores),
                               np.asarray(ref.pose_scores), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.keypoint_coords),
                               np.asarray(ref.keypoint_coords), atol=1e-3)

    # a non-exported batch gets the actionable message, not a raw
    # device_put sharding error
    with pytest.raises(ValueError, match="no program for batch size 4"):
        load_serving_artifact(dp_path)(np.zeros((4, 65, 65, 3), np.uint8))

    with pytest.raises(ValueError, match="must divide every batch size"):
        save_serving_artifact(small_model, str(tmp_path / "x.posenet"),
                              batch_sizes=(6,), input_hw=(65, 65),
                              platforms=("cpu",), data_parallel_devices=4)


def test_platform_mismatch_is_actionable(small_model, tmp_path):
    """Calling a tpu-only artifact on the CPU backend names both sides
    instead of surfacing a raw jax.export lowering error."""
    path = str(tmp_path / "tpu_only.posenet")
    save_serving_artifact(small_model, path, batch_sizes=(1,),
                          input_hw=(65, 65), platforms=("tpu",))
    art = load_serving_artifact(path)
    with pytest.raises(ValueError, match="exported for platforms.*tpu.*cpu"):
        art(np.zeros((1, 65, 65, 3), np.uint8))


def test_export_rejects_bad_configs(small_model, tmp_path):
    with pytest.raises(ValueError, match="stride-valid"):
        save_serving_artifact(small_model, str(tmp_path / "x.posenet"),
                              input_hw=(64, 64))
    with pytest.raises(ValueError, match="XLA decode path"):
        save_serving_artifact(small_model, str(tmp_path / "x.posenet"),
                              decode_cfg=DecodeConfig(use_pallas=True),
                              input_hw=(65, 65))


def test_train_cli_exports_artifact(tmp_path, monkeypatch):
    """train.py --export_artifact: full production loop — prepare GT,
    fine-tune one epoch, export the best checkpoint as a serving artifact,
    load it back, and decode a frame."""
    from tests.test_trainer import make_synthetic_dataset

    images, kpdir = make_synthetic_dataset(str(tmp_path), n_images=2)
    art_path = str(tmp_path / "trained.posenet")
    monkeypatch.setattr("sys.argv", [
        "train.py", "--model", "50", "--output_stride", "16",
        "--train_image_dir", images, "--test_image_dir", images,
        # 129 * scale_factor 0.5 -> effective stride-valid 65: the artifact
        # must be exported at the resolution actually trained (regression:
        # it was computed from the raw --image_size flag)
        "--keypoint_dir", kpdir, "--image_size", "129",
        "--scale_factor", "0.5",
        "--batch_size", "2", "--num_epochs", "1", "--no_pose_metrics",
        "--checkpoint_dir", str(tmp_path / "ckpt"),
        "--output_dir", str(tmp_path / "out"),
        "--allow_random_init",
        "--export_artifact", art_path, "--export_dtype", "float32"])
    import train as train_cli
    train_cli.main()
    art = load_serving_artifact(art_path)
    assert art.input_hw == (65, 65)
    scores = np.asarray(art(np.zeros((1, 65, 65, 3), np.uint8)).pose_scores)
    assert scores.shape == (1, 10) and np.isfinite(scores).all()


def test_export_cli_from_checkpoint(small_model, tmp_path):
    """posenet-export --from_checkpoint: export a trained orbax checkpoint
    without re-running train.py; the artifact must carry the checkpoint's
    weights (different output from a fresh random init)."""
    from posenet_tpu.config import TrainConfig
    from posenet_tpu.training import train_step as ts
    from posenet_tpu.training.trainer import save_checkpoint

    ckpt_dir = str(tmp_path / "ckpt")
    tcfg = TrainConfig(model_id=50, output_stride=16,
                       checkpoint_dir=ckpt_dir)
    state, _ = ts.init_train_state(small_model.params, tcfg)
    save_checkpoint(ckpt_dir, state)

    out = str(tmp_path / "ckpt.posenet")
    main(["--model", "50", "--output_stride", "16", "--size", "65", "65",
          "--platforms", "cpu", "--compute_dtype", "float32",
          "--from_checkpoint", ckpt_dir, "--output", out])
    art = load_serving_artifact(out)
    frames = np.random.default_rng(7).integers(
        0, 255, (1, 65, 65, 3)).astype(np.uint8)
    got = np.asarray(art(frames).keypoint_coords)

    # direct pipeline on the checkpointed params agrees
    ref = _infer(small_model.params, jnp.asarray(frames), small_model.cfg,
                 DecodeConfig(min_pose_score=0.25, use_pallas=False))
    np.testing.assert_allclose(got, np.asarray(ref.keypoint_coords),
                               atol=1e-3)

    with pytest.raises(SystemExit, match="no checkpoint"):
        main(["--model", "50", "--size", "65", "65", "--platforms", "cpu",
              "--from_checkpoint", str(tmp_path / "empty"),
              "--output", out])


def test_export_cli(tmp_path, monkeypatch):
    """posenet-export end to end on a random-init model (no egress)."""
    monkeypatch.chdir(tmp_path)  # keep ./_models writes out of the repo
    out = str(tmp_path / "cli.posenet")
    meta = main(["--model", "50", "--output_stride", "16",
                 "--size", "70", "70", "--batch_sizes", "1",
                 "--platforms", "cpu", "--compute_dtype", "float32",
                 "--output", out, "--random_init_ok"])
    # 70 snaps to the stride-valid 65
    assert meta["input_hw"] == [65, 65]
    assert os.path.exists(out)
    art = load_serving_artifact(out)
    scores = np.asarray(art(np.zeros((1, 65, 65, 3), np.uint8)).pose_scores)
    assert scores.shape == (1, 10) and np.isfinite(scores).all()
