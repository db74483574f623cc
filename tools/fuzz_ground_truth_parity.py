"""Offline deep-fuzz: gaussian_heatmaps vs the reference's per-keypoint
cv2 kernel pasting, across random grids / kernel sizes / fractional and
border keypoints.

The reference generator (/root/reference/ground_truth_dataloop.py:111-137,
points_to_heatmap) cannot be imported here (it needs skimage, absent in
this env), so this uses a line-faithful replica of its window arithmetic —
including the asymmetric-looking kernel_ymin formula (`+ ymin` where the x
branch uses `- xmin`; both reduce to the same crop for in-grid keypoints)
and the paste-then-max-normalize order. The committed unit test
(tests/test_ground_truth.py) covers interior keypoints on the default
33x33/k=11 config; this sweeps borders, fractional coords, kernels 5..15,
and non-square grids.

Usage:
    python tools/fuzz_ground_truth_parity.py --count 200
"""

import argparse
import sys

import cv2
import numpy as np

sys.path.insert(0, ".")

from posenet_tpu.training import ground_truth as gt  # noqa: E402


def reference_points_to_heatmap(keypoint_x, keypoint_y, kernel_size,
                                heatmap_size):
    """Replica of reference ground_truth_dataloop.py:111-137."""
    if keypoint_x == 0 and keypoint_y == 0:
        return np.zeros(heatmap_size)
    heatmap = np.zeros(heatmap_size)
    kernel_std = kernel_size / 10
    kernel = cv2.getGaussianKernel(kernel_size, kernel_std)
    kernel = np.outer(kernel, kernel.transpose())

    xmin = max(int(keypoint_x - kernel_size // 2), 0)
    xmax = min(int(keypoint_x + kernel_size // 2 + 1), heatmap_size[1])
    ymin = max(int(keypoint_y - kernel_size // 2), 0)
    ymax = min(int(keypoint_y + kernel_size // 2 + 1), heatmap_size[0])

    kernel_xmin = max(0, kernel_size // 2 - int(keypoint_x) - xmin)
    kernel_xmax = min(kernel_size, kernel_size // 2 + xmax - int(keypoint_x))
    kernel_ymin = max(0, kernel_size // 2 - int(keypoint_y) + ymin)
    kernel_ymax = min(kernel_size, kernel_size // 2 + ymax - int(keypoint_y))

    heatmap[ymin:ymax, xmin:xmax] += kernel[kernel_ymin:kernel_ymax,
                                            kernel_xmin:kernel_xmax]
    heatmap /= np.max(heatmap)
    return heatmap


def run_case(seed: int) -> str:
    rng = np.random.RandomState(seed)
    h = int(rng.choice([17, 33, 45, 65]))
    w = int(rng.choice([17, 33, 45, 65]))
    kernel = int(rng.choice([5, 7, 11, 15]))
    n_poses = rng.randint(1, 6)
    # fractional coords anywhere in the grid, borders included; ~10%
    # forced absent (0, 0)
    kp = rng.uniform(0, [w - 1e-6, h - 1e-6], (n_poses, 17, 2))
    absent = rng.uniform(size=(n_poses, 17)) < 0.1
    kp[absent] = 0.0

    ours = gt.gaussian_heatmaps(kp, heatmap_shape=(h, w), kernel_size=kernel)
    for p in range(n_poses):
        for k in range(17):
            ref = reference_points_to_heatmap(kp[p, k, 0], kp[p, k, 1],
                                              kernel, (h, w))
            err = float(np.abs(ours[p, k] - ref).max())
            if err > 1e-6:
                return (f"pose {p} kp {k} at {kp[p, k]} max err {err:.3g} "
                        f"[seed={seed} grid=({h},{w}) kernel={kernel}]")
    return ""


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--start", type=int, default=0)
    p.add_argument("--count", type=int, default=200)
    p.add_argument("--seed_base", type=int, default=31_000)
    args = p.parse_args()

    fails = 0
    for i in range(args.start, args.start + args.count):
        msg = run_case(args.seed_base + i * 7)
        if msg:
            fails += 1
            print(f"FAIL case {i}: {msg}")
        elif i % 25 == 0:
            print(f"ok through case {i}", flush=True)
    print(f"done: {args.count} cases, {fails} failures")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
