"""Application-level tests: the demo CLIs run end-to-end in-process
(reference has no tests at all — SURVEY.md §4)."""

import json
import os
import sys

import numpy as np
import pytest


def _write_images(d, n=2, hw=(120, 160)):
    import cv2

    os.makedirs(d, exist_ok=True)
    rng = np.random.RandomState(0)
    names = []
    for i in range(n):
        p = os.path.join(d, f"im{i}.jpg")
        cv2.imwrite(p, rng.randint(0, 255, (*hw, 3), dtype=np.uint8))
        names.append(p)
    return names


def test_image_demo_main(tmp_path, monkeypatch, capsys):
    import image_demo

    img_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    _write_images(img_dir)
    monkeypatch.setattr(sys, 'argv', [
        'image_demo.py', '--model', '50', '--image_dir', img_dir,
        '--output_dir', out_dir, '--allow_random_init'])
    image_demo.main()
    out = capsys.readouterr().out
    assert 'Average FPS:' in out
    assert 'Results for image' in out
    written = os.listdir(out_dir)
    assert len(written) == 2  # overlay per input image


def test_image_demo_fixed_resize(tmp_path, monkeypatch, capsys):
    """--resize processes mixed-resolution folders at ONE program shape
    (TPU compiles per distinct input shape) while coordinates still come
    back at each image's source resolution."""
    import cv2

    import image_demo

    img_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    os.makedirs(img_dir)
    rng = np.random.RandomState(1)
    for i, hw in enumerate([(120, 160), (96, 200)]):   # two resolutions
        cv2.imwrite(os.path.join(img_dir, f"im{i}.jpg"),
                    rng.randint(0, 255, (*hw, 3), dtype=np.uint8))
    monkeypatch.setattr(sys, 'argv', [
        'image_demo.py', '--model', '50', '--image_dir', img_dir,
        '--output_dir', out_dir, '--allow_random_init',
        '--resize', '97x97'])
    image_demo.main()
    out = capsys.readouterr().out
    assert 'Average FPS:' in out
    written = os.listdir(out_dir)
    assert len(written) == 2
    # overlays keep the SOURCE resolutions
    shapes = sorted(cv2.imread(os.path.join(out_dir, f)).shape[:2]
                    for f in written)
    assert shapes == [(96, 200), (120, 160)]


def test_process_input_fixed_contract():
    """Fixed-resolution preprocess honors the (input, source, scale)
    contract: stride-valid target, scale maps target->source pixels."""
    from posenet_tpu.preprocess import process_input_fixed

    src = np.random.RandomState(0).randint(0, 255, (120, 160, 3), np.uint8)
    inp, source, scale = process_input_fixed(src, (97, 97), output_stride=16)
    assert inp.shape == (1, 3, 97, 97)
    assert source is src
    np.testing.assert_allclose(scale, [120 / 97, 160 / 97])


def test_image_demo_notxt(tmp_path, monkeypatch, capsys):
    import image_demo

    img_dir = str(tmp_path / "in")
    _write_images(img_dir, n=1)
    monkeypatch.setattr(sys, 'argv', [
        'image_demo.py', '--model', '50', '--image_dir', img_dir,
        '--output_dir', '', '--notxt', '--allow_random_init'])
    image_demo.main()
    out = capsys.readouterr().out
    assert 'Results for image' not in out
    assert 'Average FPS:' in out


class _FakeCapture:
    """Stands in for cv2.VideoCapture: yields a fixed number of frames."""

    def __init__(self, n_frames=3, hw=(96, 128)):
        self.n = n_frames
        self.hw = hw
        self.rng = np.random.RandomState(1)

    def set(self, *_):
        pass

    def read(self):
        if self.n <= 0:
            return False, None
        self.n -= 1
        return True, self.rng.randint(0, 255, (*self.hw, 3), dtype=np.uint8)


def test_webcam_demo_main(monkeypatch, capsys):
    import cv2

    import webcam_demo

    monkeypatch.setattr(cv2, 'VideoCapture', lambda _id: _FakeCapture(3))
    monkeypatch.setattr(sys, 'argv', [
        'webcam_demo.py', '--model', '50', '--max_frames', '2',
        '--no_display', '--allow_random_init'])
    webcam_demo.main()
    out = capsys.readouterr().out
    assert 'Average FPS:' in out


def test_webcam_demo_capture_failure(monkeypatch):
    import cv2

    import webcam_demo

    monkeypatch.setattr(cv2, 'VideoCapture', lambda _id: _FakeCapture(0))
    monkeypatch.setattr(sys, 'argv', [
        'webcam_demo.py', '--model', '50', '--max_frames', '1',
        '--no_display', '--allow_random_init'])
    with pytest.raises(IOError, match="webcam failure"):
        webcam_demo.main()


def test_get_test_images_synthesize(tmp_path, monkeypatch):
    import get_test_images

    d = str(tmp_path / "imgs")
    monkeypatch.setattr(sys, 'argv', [
        'get_test_images.py', '--image_dir', d, '--synthesize'])
    get_test_images.main()
    files = os.listdir(d)
    assert len(files) == len(get_test_images.TEST_IMAGES)


def test_visualizers(tmp_path):
    import visualizers

    hm = np.random.RandomState(0).uniform(0, 1, (2, 17, 8, 8)).astype(np.float32)
    out_dir = str(tmp_path / "dumps")
    visualizers.print_heatmap(hm[0], output_dir=out_dir, use_matplotlib=False)
    assert os.path.exists(os.path.join(out_dir, "image_0", "joint_0_heatmap.png"))

    import cv2

    img_path = str(tmp_path / "img.jpg")
    cv2.imwrite(img_path, np.zeros((100, 100, 3), np.uint8))
    coords = np.random.RandomState(1).uniform(10, 90, (1, 17, 2))
    overlay = visualizers.draw_coordinates_to_image_file(
        img_path, str(tmp_path / "out.jpg"),
        np.array([0.9]), np.full((1, 17), 0.9), coords, np.array([1.0, 1.0]))
    assert os.path.exists(str(tmp_path / "out.jpg"))
    assert overlay.sum() > 0

    arrows = visualizers.draw_displacement_vectors(
        np.zeros((100, 100, 3), np.uint8), coords[0],
        np.full((16, 2), 5.0))
    assert arrows.sum() > 0
