"""Streamlit app tests: drive main() through a stubbed `st` module so every
branch actually executes (the reference's app broke exactly in its untested
video/existing-image paths — /root/reference/streamlit_demo.py:188-232,
SURVEY.md Appendix B10). Covers all three input modes, the no-egress
random-weights warning, and the corrupt-input error paths."""

import os

import numpy as np
import pytest


def _write_video(path, n_frames=4, hw=(48, 64), fps=10):
    import cv2

    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*'mp4v'),
                             fps, (hw[1], hw[0]))
    assert writer.isOpened(), "cv2 mp4v writer unavailable"
    rng = np.random.RandomState(0)
    for _ in range(n_frames):
        writer.write(rng.randint(0, 255, (*hw, 3), dtype=np.uint8))
    writer.release()


class _Upload:
    """Duck-types streamlit's UploadedFile for the one method used."""

    def __init__(self, data: bytes):
        self._data = data

    def read(self):
        return self._data


class _Progress:
    def __init__(self):
        self.values = []

    def progress(self, v):
        self.values.append(float(v))


class _Sidebar:
    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


class FakeStreamlit:
    """Scriptable stand-in implementing exactly the st API main() uses.

    `answers` maps widget label -> returned value; unscripted widgets fall
    back to their declared defaults (selectbox: options[index], slider /
    text_input: the default argument, file_uploader/radio: None).
    """

    def __init__(self, answers):
        self.answers = answers
        self.calls = {"image": [], "error": [], "warning": [], "write": [],
                      "download_button": [], "title": []}
        self.progress_bars = []
        self.sidebar = _Sidebar()

    # --- widgets (return scripted values) ---
    def selectbox(self, label, options, index=0):
        return self.answers.get(label, options[index])

    def slider(self, label, lo, hi, default):
        return self.answers.get(label, default)

    def text_input(self, label, default=""):
        return self.answers.get(label, default)

    def radio(self, label, options):
        return self.answers.get(label, options[0])

    def file_uploader(self, label, type=None):
        return self.answers.get(label)

    def cache_resource(self, fn):
        return fn

    def progress(self, v):
        bar = _Progress()
        self.progress_bars.append(bar)
        return bar

    # --- outputs (recorded) ---
    def title(self, *a):
        self.calls["title"].append(a)

    def image(self, *a, **k):
        self.calls["image"].append(a)

    def error(self, *a):
        self.calls["error"].append(a)

    def warning(self, *a):
        self.calls["warning"].append(a)

    def write(self, *a):
        self.calls["write"].append(a)

    def download_button(self, *a, **k):
        self.calls["download_button"].append((a, k))


def _run_main(monkeypatch, answers):
    import streamlit_demo

    fake = FakeStreamlit({"Model": 50, "Output stride": 16, **answers})
    monkeypatch.setattr(streamlit_demo, "st", fake)
    streamlit_demo.main()
    return fake


def _jpg_bytes(hw=(48, 64), seed=3):
    import cv2

    frame = np.random.RandomState(seed).randint(
        0, 255, (*hw, 3), dtype=np.uint8)
    ok, buf = cv2.imencode(".jpg", frame)
    assert ok
    return bytes(buf.tobytes()), frame


def test_image_upload_mode(monkeypatch):
    """Upload image -> decoded overlay displayed; offline model fallback
    emits the random-weights warning instead of failing."""
    data, frame = _jpg_bytes()
    fake = _run_main(monkeypatch, {"Input": "Upload image",
                                   "Image": _Upload(data)})
    assert len(fake.calls["image"]) == 1
    overlay = fake.calls["image"][0][0]
    assert overlay.shape == frame.shape      # overlay at source resolution
    assert not fake.calls["error"]
    assert any("RANDOM weights" in w[0] for w in fake.calls["warning"])


def test_image_upload_corrupt_bytes_errors(monkeypatch):
    fake = _run_main(monkeypatch, {"Input": "Upload image",
                                   "Image": _Upload(b"not an image")})
    assert fake.calls["error"] and not fake.calls["image"]


def test_video_upload_mode(monkeypatch, tmp_path):
    """Upload video -> output.mp4 written frame-by-frame, progress reaches
    1.0, download button offered (the reference's most broken surface)."""
    import cv2

    src = str(tmp_path / "in.mp4")
    _write_video(src, n_frames=4, hw=(48, 64))
    with open(src, "rb") as f:
        data = f.read()
    outdir = str(tmp_path / "out")
    fake = _run_main(monkeypatch, {"Input": "Upload video",
                                   "Video": _Upload(data),
                                   "Output directory": outdir})
    out_path = os.path.join(outdir, "output.mp4")
    assert os.path.exists(out_path)
    cap = cv2.VideoCapture(out_path)
    n = 0
    while cap.read()[0]:
        n += 1
    cap.release()
    assert n == 4
    assert fake.progress_bars and fake.progress_bars[0].values[-1] == 1.0
    assert len(fake.calls["download_button"]) == 1
    assert any("4 frames" in w[0] for w in fake.calls["write"])
    assert not fake.calls["error"]


def test_video_upload_corrupt_errors(monkeypatch, tmp_path):
    fake = _run_main(monkeypatch, {"Input": "Upload video",
                                   "Video": _Upload(b"garbage bytes"),
                                   "Output directory": str(tmp_path)})
    assert fake.calls["error"] and not fake.calls["download_button"]
    assert not os.path.exists(os.path.join(str(tmp_path), "output.mp4"))


def test_existing_image_mode(monkeypatch, tmp_path):
    """'Try existing image' routes through the SAME annotate_frame as the
    upload path — the exact signature drift that broke the reference
    (B10: run_model(image) vs run_model(path, model))."""
    import cv2

    frame = np.random.RandomState(5).randint(0, 255, (48, 64, 3),
                                             dtype=np.uint8)
    cv2.imwrite(str(tmp_path / "a.png"), frame)
    fake = _run_main(monkeypatch, {"Input": "Try existing image",
                                   "Image directory": str(tmp_path)})
    assert len(fake.calls["image"]) == 1
    assert fake.calls["image"][0][0].shape == frame.shape
    assert not fake.calls["error"]


def test_existing_image_missing_dir_warns(monkeypatch, tmp_path):
    fake = _run_main(monkeypatch, {"Input": "Try existing image",
                                   "Image directory": str(tmp_path / "nope")})
    assert any("not found" in w[0] for w in fake.calls["warning"])
    assert not fake.calls["image"]


def test_annotate_video_standalone(tmp_path):
    """annotate_video is st-free: callable directly with a real model,
    returns the frame count, 0 (and no file) on an undecodable input."""
    import posenet_tpu as posenet
    import streamlit_demo

    src = str(tmp_path / "in.mp4")
    _write_video(src, n_frames=3, hw=(48, 64))
    model = posenet.load_model(50, output_stride=16, allow_random_init=True)
    out = str(tmp_path / "o" / "output.mp4")
    n = streamlit_demo.annotate_video(src, out, model, 1.0, 0.0, 0.0)
    assert n == 3 and os.path.exists(out)

    bad = str(tmp_path / "bad.mp4")
    with open(bad, "wb") as f:
        f.write(b"\x00" * 64)
    out2 = str(tmp_path / "o2" / "output.mp4")
    assert streamlit_demo.annotate_video(bad, out2, model, 1.0, 0.0, 0.0) == 0
    assert not os.path.exists(out2)
