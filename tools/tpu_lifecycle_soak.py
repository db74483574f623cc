"""Full-lifecycle soak on the DEFAULT jax backend (the real TPU in a
foreground shell): synthetic Dataloop dataset -> train.py (--prepare_gt,
heads-only fine-tune, orbax checkpoints, artifact export) -> serving
artifact inference on the same backend.

The CPU twin of this run is recorded in CLAUDE.md (2026-08-18); this tool
exists so the hardware path can be re-soaked in one command after
toolchain or trainer changes:

    timeout 590 python tools/tpu_lifecycle_soak.py --workdir /tmp/soak

Exit 0 and a final "LIFECYCLE OK" line mean: GT generation, training
(loss finite and decreasing epoch-over-epoch is NOT asserted — 2 epochs
of random-init heads on 6 images only smoke the machinery), export, and
artifact execution all ran on the live backend.

Reference lifecycle being exercised: prepare_ground_truth_data ->
train() -> save (the reference's train.py:578-916 never saves; ours
checkpoints and exports — SURVEY.md §5 checkpoint/resume row).
"""

import argparse
import json
import os
import shutil
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:  # script lives in tools/; make posenet_tpu importable
    sys.path.insert(0, REPO)

# Spaced-lowercase Dataloop labels for a few COCO parts (the parser
# lowercases and matches camelCase part names rendered with spaces —
# posenet_tpu/training/ground_truth.py:_label_to_index).
_PARTS = {
    "nose": 0.50, "left shoulder": 0.35, "right shoulder": 0.65,
    "left hip": 0.40, "right hip": 0.60, "left knee": 0.38,
    "right knee": 0.62,
}


def synthesize(workdir: str, n_train: int, n_test: int, size: int,
               rng: np.random.RandomState):
    """Images with bright blobs at the keypoints + Dataloop JSON labels."""
    import cv2

    labels = os.path.join(workdir, "labels")
    os.makedirs(labels, exist_ok=True)
    for split, n in (("train", n_train), ("test", n_test)):
        img_dir = os.path.join(workdir, f"images_{split}")
        os.makedirs(img_dir, exist_ok=True)
        for i in range(n):
            name = f"{split}_{i:02d}"
            img = rng.randint(0, 60, (size, size, 3)).astype(np.uint8)
            anns = [{"type": "pose", "id": "p1"}]
            jitter = rng.uniform(-0.08, 0.08, size=2 * len(_PARTS))
            for j, (label, xfrac) in enumerate(_PARTS.items()):
                x = float(np.clip((xfrac + jitter[2 * j]) * size, 4, size - 5))
                y = float(np.clip((0.3 + 0.1 * j + jitter[2 * j + 1]) * size,
                                  4, size - 5))
                cv2.circle(img, (int(x), int(y)), 3, (255, 255, 255), -1)
                anns.append({
                    "type": "point", "label": label,
                    "metadata": {"system": {"parentId": "p1"}},
                    "coordinates": {"x": x, "y": y}})
            cv2.imwrite(os.path.join(img_dir, f"{name}.jpg"), img)
            meta = {"metadata": {"system": {"height": size, "width": size}},
                    "annotations": anns}
            with open(os.path.join(labels, f"{name}.json"), "w") as f:
                json.dump(meta, f)
    return labels


def main():
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--workdir", default="/tmp/tpu_soak")
    p.add_argument("--model", type=int, default=50)
    p.add_argument("--image_size", type=int, default=129)
    p.add_argument("--epochs", type=int, default=2)
    p.add_argument("--keep", action="store_true",
                   help="keep the workdir (default: wiped first)")
    args = p.parse_args()

    if not args.keep and os.path.isdir(args.workdir):
        shutil.rmtree(args.workdir)
    os.makedirs(args.workdir, exist_ok=True)
    labels = synthesize(args.workdir, n_train=6, n_test=2,
                        size=args.image_size,
                        rng=np.random.RandomState(0))

    artifact = os.path.join(args.workdir, "trained.posenet")
    cmd = [
        sys.executable, os.path.join(REPO, "train.py"),
        "--model", str(args.model),
        "--train_image_dir", os.path.join(args.workdir, "images_train"),
        "--test_image_dir", os.path.join(args.workdir, "images_test"),
        "--output_dir", os.path.join(args.workdir, "out"),
        "--keypoint_dir", os.path.join(args.workdir, "keypoints"),
        "--checkpoint_dir", os.path.join(args.workdir, "ckpt"),
        "--prepare_gt", labels,
        "--image_size", str(args.image_size),
        "--num_epochs", str(args.epochs),
        "--batch_size", "2",
        "--allow_random_init",
        "--export_artifact", artifact,
    ]
    print("+", " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True, cwd=REPO)

    # Execute the trained artifact on the same backend.
    import jax

    from posenet_tpu.serving import load_serving_artifact
    art = load_serving_artifact(artifact)
    h, w = art.input_hw
    frame = np.random.RandomState(1).randint(
        0, 255, (1, h, w, 3)).astype(np.uint8)
    out = art(frame)
    scores = np.asarray(out.pose_scores)
    assert scores.shape[0] == 1 and np.isfinite(scores).all(), scores
    print(f"LIFECYCLE OK backend={jax.default_backend()} "
          f"model={args.model} size={h}x{w} epochs={args.epochs} "
          f"artifact={artifact} max_pose_score={scores.max():.3f}")


if __name__ == "__main__":
    main()
