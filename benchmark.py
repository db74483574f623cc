"""Benchmark CLI: forward + multi-pose decode throughput.

Workload parity with the reference harness (/root/reference/benchmark.py:16-46):
pre-load all images into RAM, loop --num_images forward+decode passes, print
average FPS. Two modes:

- default: per-frame latency mode, mirroring the reference's one-image-at-a-
  time loop (but with decode fused on device).
- --batch_size N: throughput mode — frames are decoded in device-resident
  batches via the fused PoseNetPipeline (no reference equivalent; this is
  the BASELINE.json config-2 workload).
"""

import argparse
import os
import time

import numpy as np

import posenet_tpu as posenet
from posenet_tpu.pipeline import PoseNetPipeline
from posenet_tpu.config import DecodeConfig


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument('--model', type=int, default=101)
    parser.add_argument('--image_dir', type=str, default='./images')
    parser.add_argument('--num_images', type=int, default=1000)
    parser.add_argument('--output_stride', type=int, default=16)
    parser.add_argument('--batch_size', type=int, default=0,
                        help='0 = reference-style per-frame loop; N>0 = '
                             'batched fused pipeline')
    parser.add_argument('--image_size', type=int, default=513)
    parser.add_argument('--allow_random_init', action='store_true')
    parser.add_argument('--profile', type=str, default='',
                        help='capture a jax.profiler device trace to this '
                             'directory and print a per-op time report')
    return parser.parse_args()


def list_images(args):
    import os

    filenames = [
        f.path for f in os.scandir(args.image_dir)
        if f.is_file() and f.path.endswith(('.png', '.jpg'))]
    return filenames[:args.num_images]


def load_images(args, output_stride):
    filenames = list_images(args)
    return filenames, {
        f: posenet.read_imgfile(f, 1.0, output_stride)[0] for f in filenames}


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.jax_cache"))
    args = parse_args()
    model = posenet.load_model(args.model, output_stride=args.output_stride,
                               allow_random_init=args.allow_random_init)
    output_stride = model.output_stride
    num_images = args.num_images

    if args.batch_size > 0:
        # batch mode needs only the filename list — skip the per-image
        # float preprocessing that the per-frame mode caches
        filenames = list_images(args)
        images = None
    else:
        filenames, images = load_images(args, output_stride)
    if not filenames:
        raise SystemExit(f'no images found in {args.image_dir}')

    if args.batch_size > 0:
        # Throughput mode: uint8 RGB frames at valid resolution, batched by
        # the native multi-threaded loader (native/preprocess.cpp; falls
        # back to cv2 if unbuilt), fused normalize->forward->decode on
        # device.
        import cv2

        from posenet_tpu import native_preprocess as npp
        from posenet_tpu.preprocess import valid_resolution

        raw = []
        for i in range(args.batch_size):
            path = filenames[i % len(filenames)]
            img = cv2.imread(path)
            if img is None:
                raise IOError(f'could not read image: {path}')
            raw.append(img)
        tw, th = valid_resolution(args.image_size, args.image_size,
                                  output_stride)
        frames = npp.resize_batch(raw, (th, tw), swap_rb=True)
        pipe = PoseNetPipeline(model, DecodeConfig(min_pose_score=0.25))
        pipe.warmup((th, tw), args.batch_size)
        n_batches = max(1, num_images // args.batch_size)
        frames = jax.device_put(frames)  # upload once, reuse device-resident
        # device_put is async: barrier the upload (a ~12 MB batch takes
        # seconds over the tunnel) so the timed loop measures compute, not
        # the one-time transfer.
        np.asarray(frames[0, 0, 0, 0])

        if args.profile:
            from posenet_tpu.profiling import device_time_report, trace
            with trace(args.profile):
                out = pipe(frames)
                np.asarray(out.pose_scores)
            print(device_time_report(args.profile))

        start = time.time()
        for _ in range(n_batches):
            out = pipe(frames)
        np.asarray(out.pose_scores)  # execution barrier (see bench.py)
        elapsed = time.time() - start
        n = n_batches * args.batch_size
        print('Average FPS:', n / elapsed)
        return

    # Reference-style per-frame loop; --profile adds a host-side stage
    # breakdown (forward vs decode) on top of the device trace.
    from posenet_tpu.profiling import StageTimer
    timer = StageTimer()
    start = time.time()
    for i in range(num_images):
        input_image = images[filenames[i % len(filenames)]]
        with timer.stage('forward'):
            heatmaps, offsets, displacement_fwd, displacement_bwd = model(input_image)
            if args.profile:
                # JAX dispatch is async: without a sync the 'forward' stage
                # would time only the dispatch and 'decode' would absorb all
                # forward device time. A 1-element host fetch is the only
                # reliable barrier on tunneled platforms (CLAUDE.md). Only
                # under --profile — it would serialize the throughput loop.
                np.asarray(heatmaps[(0,) * heatmaps.ndim])  # 4-byte fetch
        with timer.stage('decode'):
            output = posenet.decode_multiple_poses(
                heatmaps.squeeze(0), offsets.squeeze(0),
                displacement_fwd.squeeze(0), displacement_bwd.squeeze(0),
                output_stride=output_stride,
                max_pose_detections=10,
                min_pose_score=0.25)
    print('Average FPS:', num_images / (time.time() - start))
    if args.profile:
        print(timer.report())


if __name__ == "__main__":
    main()
