"""Streamlit UI: interactive pose estimation on images and videos.

Capability parity with the reference app (/root/reference/streamlit_demo.py):
sidebar model config (model 101/100/75/50, output stride, score thresholds,
output dir), three input modes (video upload -> annotated output.mp4 with a
download button, image upload, existing image), per-frame decode + overlay.
Fixes the reference's 'Try existing image' signature drift (SURVEY.md
Appendix B10) by using one run_model for all modes.

Run with: streamlit run streamlit_demo.py
(streamlit is an optional dependency; the module import-guards it so the
rest of the framework never depends on it.)
"""

import os
import tempfile
import time

import numpy as np

import posenet_tpu as posenet

try:
    import streamlit as st
except ImportError:  # pragma: no cover - optional dependency
    st = None


def run_model(input_image, model, min_pose_score: float = 0.25):
    """One frame: forward + decode. input_image is the preprocessed NCHW
    tensor from posenet.process_input."""
    output_stride = model.output_stride
    heatmaps, offsets, dfwd, dbwd = model(input_image)
    pose_scores, keypoint_scores, keypoint_coords, _ = \
        posenet.decode_multiple_poses(
            heatmaps.squeeze(0), offsets.squeeze(0),
            dfwd.squeeze(0), dbwd.squeeze(0),
            output_stride=output_stride,
            max_pose_detections=10,
            min_pose_score=min_pose_score)
    return pose_scores, keypoint_scores, keypoint_coords


def annotate_frame(frame, model, scale_factor, min_pose_score, min_part_score):
    input_image, draw_image, output_scale = posenet.process_input(
        frame, scale_factor=scale_factor, output_stride=model.output_stride)
    pose_scores, keypoint_scores, keypoint_coords = run_model(
        input_image, model, min_pose_score)
    keypoint_coords = keypoint_coords * output_scale
    return posenet.draw_skel_and_kp(
        draw_image, pose_scores, keypoint_scores, keypoint_coords,
        min_pose_score=min_pose_score, min_part_score=min_part_score)


def annotate_video(video_path, out_path, model, scale_factor,
                   min_pose_score, min_part_score, progress_cb=None):
    """Video file -> annotated mp4 at `out_path`, one decoded overlay per
    frame. Returns the number of frames written (0 = nothing decodable:
    unsupported codec or corrupt file, in which case no output file is
    produced). Pure processing — no streamlit dependency — so the app's
    only untestable surface is widget wiring (the reference's video branch
    broke exactly because its processing was welded to the UI,
    /root/reference/streamlit_demo.py:196-232).

    `progress_cb(done_fraction)` is invoked after each frame when given.
    """
    import cv2

    cap = cv2.VideoCapture(video_path)
    writer = None
    # some containers report 0 or -1 for an unknown frame count
    n_frames = max(int(cap.get(cv2.CAP_PROP_FRAME_COUNT)), 1)
    i = 0
    try:
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            overlay = annotate_frame(frame, model, scale_factor,
                                     min_pose_score, min_part_score)
            if writer is None:
                os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
                fps = cap.get(cv2.CAP_PROP_FPS)
                writer = cv2.VideoWriter(
                    out_path, cv2.VideoWriter_fourcc(*"mp4v"),
                    fps if fps > 0 else 15.0,
                    (overlay.shape[1], overlay.shape[0]))
            writer.write(overlay)
            i += 1
            if progress_cb is not None:
                progress_cb(min(i / n_frames, 1.0))
    finally:
        # release even if annotate_frame raises mid-video — otherwise each
        # failed attempt leaks an open capture/writer handle.
        cap.release()
        if writer is not None:
            writer.release()
    return i


def main():
    import cv2

    st.title("PoseNet on TPU")

    with st.sidebar:
        model_id = st.selectbox("Model", [101, 100, 75, 50], index=0)
        output_stride = st.selectbox("Output stride", [8, 16, 32], index=1)
        min_pose_score = st.slider("Min pose score", 0.0, 1.0, 0.25)
        min_part_score = st.slider("Min part score", 0.0, 1.0, 0.25)
        scale_factor = st.slider("Scale factor", 0.2, 1.0, 1.0)
        output_dir = st.text_input("Output directory", "./output")

    @st.cache_resource
    def get_model(model_id, output_stride):
        # Only SUCCESSFUL loads are cached: raising on failure keeps
        # cache_resource from pinning a random-weights fallback for the
        # app's lifetime — once the checkpoint becomes available a rerun
        # picks it up without restarting the process.
        return posenet.load_model(model_id, output_stride=output_stride)

    import urllib.error
    try:
        model, real_weights = get_model(model_id, output_stride), True
    except (urllib.error.URLError, TimeoutError):
        # no network egress: keep the UI usable but SAY so — silently
        # serving random weights would look like a broken detector.
        # Deliberately uncached (re-checked each rerun).
        model, real_weights = posenet.load_model(
            model_id, output_stride=output_stride,
            allow_random_init=True), False
    if not real_weights:
        st.warning("Checkpoint download failed (no network) — running with "
                   "RANDOM weights; detections are meaningless.")
    mode = st.radio("Input", ["Upload image", "Upload video", "Try existing image"])

    if mode == "Upload image":
        up = st.file_uploader("Image", type=["jpg", "jpeg", "png"])
        if up is not None:
            data = np.frombuffer(up.read(), np.uint8)
            frame = cv2.imdecode(data, cv2.IMREAD_COLOR)
            if frame is None:
                st.error("Could not decode the uploaded image.")
                return
            overlay = annotate_frame(frame, model, scale_factor,
                                     min_pose_score, min_part_score)
            st.image(cv2.cvtColor(overlay, cv2.COLOR_BGR2RGB))

    elif mode == "Upload video":
        up = st.file_uploader("Video", type=["mp4", "mov", "avi"])
        if up is not None:
            tfile = tempfile.NamedTemporaryFile(delete=False, suffix=".mp4")
            tfile.write(up.read())
            tfile.flush()
            tfile.close()  # BufferedWriter tail must hit disk before cv2 opens it
            os.makedirs(output_dir, exist_ok=True)
            out_path = os.path.join(output_dir, "output.mp4")
            progress = st.progress(0.0)
            t0 = time.time()
            try:
                n = annotate_video(tfile.name, out_path, model, scale_factor,
                                   min_pose_score, min_part_score,
                                   progress_cb=progress.progress)
            finally:
                os.unlink(tfile.name)  # never leak the /tmp upload copy
            if n > 0:
                st.write(f"{n} frames in {time.time()-t0:.1f}s")
                with open(out_path, "rb") as f:
                    st.download_button("Download annotated video", f,
                                       file_name="output.mp4")
            else:
                st.error("Could not decode any frames from the uploaded "
                         "video (unsupported codec or corrupt file).")

    else:  # Try existing image
        image_dir = st.text_input("Image directory", "./images")
        if os.path.isdir(image_dir):
            files = sorted(f for f in os.listdir(image_dir)
                           if f.lower().endswith((".jpg", ".jpeg", ".png")))
            choice = st.selectbox("Image", files)
            if choice:
                frame = cv2.imread(os.path.join(image_dir, choice))
                if frame is None:
                    st.error(f"Could not read {choice}.")
                    return
                overlay = annotate_frame(frame, model, scale_factor,
                                         min_pose_score, min_part_score)
                st.image(cv2.cvtColor(overlay, cv2.COLOR_BGR2RGB))
        else:
            st.warning(f"directory {image_dir} not found")


if __name__ == "__main__":
    if st is None:
        raise SystemExit("streamlit is not installed; "
                         "run `pip install streamlit` to use this demo")
    main()
