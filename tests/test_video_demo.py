"""posenet-video tests: batched offline video extraction end-to-end
(no reference counterpart; the reference's only video surface is the live
webcam loop)."""

import json
import os
import sys

import numpy as np
import pytest


def _write_video(path, n_frames=6, hw=(72, 96), fps=10):
    import cv2

    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*'mp4v'),
                             fps, (hw[1], hw[0]))
    assert writer.isOpened(), "cv2 mp4v writer unavailable"
    rng = np.random.RandomState(0)
    for _ in range(n_frames):
        writer.write(rng.randint(0, 255, (*hw, 3), dtype=np.uint8))
    writer.release()


@pytest.mark.parametrize('pipeline_depth', ['2', '1'])
def test_video_demo_end_to_end(tmp_path, monkeypatch, capsys,
                               pipeline_depth):
    """6 frames through batch 4 (one full + one padded partial batch):
    overlay video at SOURCE resolution, one JSONL record per frame —
    at both pipeline depths (2 = dispatch-ahead default, 1 = the
    synchronous A/B baseline)."""
    import cv2

    import video_demo

    src = str(tmp_path / 'in.mp4')
    out_video = str(tmp_path / 'out.mp4')
    poses_out = str(tmp_path / 'poses.jsonl')
    _write_video(src, n_frames=6, hw=(72, 96))

    monkeypatch.setattr(sys, 'argv', [
        'video_demo.py', '--video', src, '--model', '50',
        '--resize', '33x33', '--batch_size', '4',
        '--min_pose_score', '0.0',
        '--output_video', out_video, '--poses_out', poses_out,
        '--pipeline_depth', pipeline_depth,
        '--allow_random_init'])
    video_demo.main()

    out = capsys.readouterr().out
    assert 'Processed 6 frames' in out

    records = [json.loads(l) for l in open(poses_out)]
    assert [r['frame'] for r in records] == list(range(6))
    for r in records:
        for pose in r['poses']:
            assert pose['score'] > 0          # padded/empty slots excluded
            assert len(pose['keypoints']) == 17
            # coordinates mapped back to SOURCE resolution bounds
            ys = [k['y'] for k in pose['keypoints']]
            xs = [k['x'] for k in pose['keypoints']]
            assert max(ys) <= 72 and max(xs) <= 96

    cap = cv2.VideoCapture(out_video)
    n = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        assert frame.shape == (72, 96, 3)     # source resolution overlay
        n += 1
    cap.release()
    assert n == 6


def test_video_demo_max_frames_no_outputs(tmp_path, monkeypatch, capsys):
    """--max_frames truncation with neither writer enabled still reports."""
    import video_demo

    src = str(tmp_path / 'in.mp4')
    _write_video(src, n_frames=5, hw=(48, 64))
    monkeypatch.setattr(sys, 'argv', [
        'video_demo.py', '--video', src, '--model', '50',
        '--resize', '17x17', '--batch_size', '3', '--max_frames', '4',
        '--allow_random_init'])
    video_demo.main()
    assert 'Processed 4 frames' in capsys.readouterr().out


def test_video_demo_device_preprocess(tmp_path, monkeypatch, capsys):
    """--device_preprocess ships raw source-resolution frames; resize +
    color flip + normalize run fused on device."""
    import video_demo

    src = str(tmp_path / 'in.mp4')
    poses_out = str(tmp_path / 'poses.jsonl')
    _write_video(src, n_frames=4, hw=(60, 84))
    monkeypatch.setattr(sys, 'argv', [
        'video_demo.py', '--video', src, '--model', '50',
        '--resize', '33x33', '--batch_size', '4', '--min_pose_score', '0.0',
        '--poses_out', poses_out, '--device_preprocess',
        '--allow_random_init'])
    video_demo.main()
    assert 'Processed 4 frames' in capsys.readouterr().out
    records = [json.loads(l) for l in open(poses_out)]
    assert len(records) == 4
    for r in records:
        for pose in r['poses']:
            ys = [k['y'] for k in pose['keypoints']]
            xs = [k['x'] for k in pose['keypoints']]
            assert max(ys) <= 60 and max(xs) <= 84   # source-resolution coords


def test_video_demo_missing_file(monkeypatch, tmp_path):
    import video_demo

    monkeypatch.setattr(sys, 'argv', [
        'video_demo.py', '--video', str(tmp_path / 'nope.mp4'),
        '--model', '50', '--allow_random_init'])
    with pytest.raises(IOError, match='could not open video'):
        video_demo.main()


def test_video_demo_resize_backend_flag(tmp_path, monkeypatch, capsys):
    """--resize_backend: cv2 forces the two-pass host path; 'native'
    errors loudly when the shared library is absent; auto picks native
    when built (the default e2e test above exercises it). Frame-level
    native-vs-cv2 agreement (+-1 LSB) is pinned in test_preprocess.py."""
    import sys as _sys

    import video_demo
    from posenet_tpu import native_preprocess as npp

    src = str(tmp_path / 'in.mp4')
    _write_video(src, n_frames=3, hw=(48, 64))
    monkeypatch.setattr(_sys, 'argv', [
        'video_demo.py', '--video', src, '--model', '50',
        '--resize', '33x33', '--batch_size', '3',
        '--resize_backend', 'cv2', '--allow_random_init'])
    video_demo.main()
    assert 'Processed 3 frames' in capsys.readouterr().out

    # explicit native with no .so built -> actionable SystemExit
    monkeypatch.setattr(npp, 'native_available', lambda: False)
    monkeypatch.setattr(_sys, 'argv', [
        'video_demo.py', '--video', src, '--model', '50',
        '--resize', '33x33', '--resize_backend', 'native',
        '--allow_random_init'])
    with pytest.raises(SystemExit, match='not.*built|make -C native'):
        video_demo.main()
