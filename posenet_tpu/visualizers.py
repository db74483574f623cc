"""Visualization helpers: heatmap dumps, keypoint overlays, displacement
vector plots.

Capability parity with the reference helpers (/root/reference/visualizers.py):
`print_heatmap` (fixed — the reference version references undefined
variables, SURVEY.md Appendix B11), `draw_coordinates_to_image_file`, and
`draw_displacement_vectors`. Used by the training loop for visual debugging.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

from posenet_tpu.constants import PARENT_CHILD_TUPLES
from posenet_tpu.draw import draw_skel_and_kp


def print_heatmap(heatmap: np.ndarray, output_dir: str = "./heatmap_dumps",
                  prefix: str = "heatmap", use_matplotlib: bool = True):
    """Dump each keypoint channel of a (17, H, W) or (B, 17, H, W) heatmap
    as an image (reference visualizers.py:13-40, with its undefined-name
    bugs fixed)."""
    import cv2

    plt = None
    if use_matplotlib:
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except ImportError:
            plt = None  # fall through to the cv2 colormap path

    hm = np.asarray(heatmap)
    if hm.ndim == 3:
        hm = hm[None]
    os.makedirs(output_dir, exist_ok=True)
    for b in range(hm.shape[0]):
        d = os.path.join(output_dir, f"image_{b}")
        os.makedirs(d, exist_ok=True)
        for k in range(hm.shape[1]):
            channel = hm[b, k]
            path = os.path.join(d, f"joint_{k}_{prefix}.png")
            if plt is not None:
                fig = plt.figure()
                plt.imshow(channel, cmap="hot", interpolation="nearest")
                plt.colorbar()
                plt.savefig(path)
                plt.close(fig)
                continue
            lo, hi = float(channel.min()), float(channel.max())
            norm = (channel - lo) / (hi - lo) if hi > lo else channel * 0
            cv2.imwrite(path, cv2.applyColorMap(
                (norm * 255).astype(np.uint8), cv2.COLORMAP_HOT))


def draw_coordinates_to_image_file(
        image_path: str, output_path: str,
        pose_scores: np.ndarray, keypoint_scores: np.ndarray,
        keypoint_coords: np.ndarray, output_scale,
        min_pose_score: float = 0.25, min_part_score: float = 0.25,
        image: Optional[np.ndarray] = None):
    """Re-read an image, scale decoded coords by `output_scale`, draw the
    skeleton overlay, and write it out (reference visualizers.py:43-133).
    The overlay is drawn on the full-resolution source read, so the output
    is always at the image's original size. Pass `image` (BGR array) to
    skip the disk read when the caller already decoded the file."""
    import cv2

    img = image if image is not None else cv2.imread(image_path)
    if img is None:
        raise IOError(f"could not read {image_path}")

    coords = np.asarray(keypoint_coords, dtype=np.float64) * np.asarray(output_scale)
    overlay = draw_skel_and_kp(
        img, np.asarray(pose_scores), np.asarray(keypoint_scores), coords,
        min_pose_score=min_pose_score, min_part_score=min_part_score)
    os.makedirs(os.path.dirname(output_path) or ".", exist_ok=True)
    cv2.imwrite(output_path, overlay)
    return overlay


def draw_displacement_vectors(
        image: np.ndarray, keypoint_coords: np.ndarray,
        displacement_vectors: np.ndarray,
        edges: Sequence = PARENT_CHILD_TUPLES,
        color=(0, 255, 0), thickness: int = 2):
    """Draw per-edge displacement arrows along the kinematic tree
    (reference visualizers.py:136-153). `keypoint_coords` (17, 2) y-x px,
    `displacement_vectors` (16, 2) y-x px."""
    import cv2

    out = image.copy()
    for edge_id, (parent, _child) in enumerate(edges):
        y, x = keypoint_coords[parent]
        dy, dx = displacement_vectors[edge_id]
        cv2.arrowedLine(out, (int(x), int(y)), (int(x + dx), int(y + dy)),
                        color, thickness, tipLength=0.3)
    return out
