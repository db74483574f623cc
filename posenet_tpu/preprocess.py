"""Input preprocessing: resize-to-valid-stride + normalization.

Behavioral parity with the reference input half of utils
(/root/reference/posenet/utils.py:7-38): images are resized so each side is
`(d * scale_factor // stride) * stride + 1`, converted BGR->RGB, scaled to
[-1, 1] via `*2/255 - 1`, and returned with the per-axis `scale =
source_dim / target_dim` that callers multiply decoded coordinates by.

Two paths:

- Host path (`process_input`, `read_imgfile`, `read_cap`): cv2 bilinear
  resize, bit-identical input to what the reference feeds its model. Returns
  NCHW like the reference so existing caller code ports unchanged.
- Device path (`preprocess_on_device`): jit-compiled `jax.image.resize` +
  normalization fused into the same XLA program as the backbone — the
  benchmark/streaming path, where the host only decodes JPEG bytes and the
  uint8 frame is shipped to HBM once (3 bytes/px instead of 12).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def valid_resolution(width: float, height: float,
                     output_stride: int = 16) -> Tuple[int, int]:
    """Largest stride-compatible (w, h) = (d//s)*s + 1 not exceeding the
    scaled source dims (reference utils.py:7-10)."""
    target_width = (int(width) // output_stride) * output_stride + 1
    target_height = (int(height) // output_stride) * output_stride + 1
    return target_width, target_height


def _resize_normalize(source_img: np.ndarray, target_width: int,
                      target_height: int):
    """Shared body of the host preprocess paths: cv2 bilinear resize,
    BGR->RGB, *2/255-1, HWC->NCHW — plus the (2,) coordinate scale."""
    import cv2

    scale = np.array([source_img.shape[0] / target_height,
                      source_img.shape[1] / target_width])
    input_img = cv2.resize(source_img, (target_width, target_height),
                           interpolation=cv2.INTER_LINEAR)
    input_img = cv2.cvtColor(input_img, cv2.COLOR_BGR2RGB).astype(np.float32)
    input_img = input_img * (2.0 / 255.0) - 1.0
    input_img = input_img.transpose((2, 0, 1)).reshape(
        1, 3, target_height, target_width)
    return input_img, source_img, scale


def process_input(source_img: np.ndarray, scale_factor: float = 1.0,
                  output_stride: int = 16):
    """BGR uint8 HWC frame -> (input (1,3,th,tw) float32 in [-1,1],
    source_img, scale (2,)) — reference utils.py:13-26 contract."""
    target_width, target_height = valid_resolution(
        source_img.shape[1] * scale_factor, source_img.shape[0] * scale_factor,
        output_stride=output_stride)
    return _resize_normalize(source_img, target_width, target_height)


def process_input_fixed(source_img: np.ndarray, target_hw,
                        output_stride: int = 16):
    """process_input at a FIXED stride-valid resolution.

    TPU-specific batching aid: every distinct input shape is a separate
    XLA compilation, so a folder of mixed-resolution images compiles once
    per resolution on the default path (the reference pays a cudnn
    autotune per shape instead, utils.py:13-26 has no fixed mode). Routing
    all images through one target resolution gives exactly one program;
    decoded coordinates scale back through the same (2,) `scale` contract.
    """
    target_width, target_height = valid_resolution(
        target_hw[1], target_hw[0], output_stride=output_stride)
    return _resize_normalize(source_img, target_width, target_height)


def read_imgfile(path: str, scale_factor: float = 1.0,
                 output_stride: int = 16, target_hw=None):
    """Read + preprocess an image file (reference utils.py:36-38).

    `target_hw` switches to the fixed-resolution path (one XLA program for
    any mix of source resolutions); default keeps reference semantics."""
    import cv2

    img = cv2.imread(path)
    if img is None:
        raise IOError(f"could not read image: {path}")
    if target_hw is not None:
        return process_input_fixed(img, target_hw, output_stride)
    return process_input(img, scale_factor, output_stride)


def read_cap(cap, scale_factor: float = 1.0, output_stride: int = 16):
    """Read + preprocess one capture frame (reference utils.py:29-33)."""
    res, img = cap.read()
    if not res:
        raise IOError("webcam failure")
    return process_input(img, scale_factor, output_stride)


@functools.partial(jax.jit, static_argnames=('target_hw',))
def preprocess_on_device(frame_bgr_u8: jax.Array,
                         target_hw: Tuple[int, int]) -> jax.Array:
    """uint8 BGR (H, W, 3) or batch (B, H, W, 3) -> normalized NHWC float.

    Bilinear resize + BGR->RGB flip + [-1,1] scaling, all on device. XLA
    fuses the channel flip and affine normalization into the resize's
    output epilogue.

    Standalone utility (the serving pipeline keeps frames at a fixed
    resolution and normalizes inside the fused program instead; the
    host/native path handles arbitrary sources). antialias=False matches
    cv2.INTER_LINEAR / the native resizer — jax.image.resize defaults to
    antialiased downscaling, which would shift heatmap activations vs the
    parity-tested host path.
    """
    x = frame_bgr_u8
    if x.ndim == 3:
        x = x[None]
    th, tw = target_hw
    x = x[..., ::-1].astype(jnp.float32)  # BGR -> RGB
    x = jax.image.resize(x, (x.shape[0], th, tw, 3), method='bilinear',
                         antialias=False)
    return x * (2.0 / 255.0) - 1.0
