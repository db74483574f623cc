"""On-disk tfjs checkpoint fixture + synthetic photograph.

Egress is blocked in this environment (the GCS bucket at
reference wget.py:8 is unreachable), so the converter's manifest/shard
path can never see a real download. This module fabricates a checkpoint in
the EXACT tfjs on-disk format the real ones use — `manifest.json` mapping
each variable name to `{"filename", "shape", "dtype"}`, one raw
little-endian float32 blob per variable, filenames = variable name with
'/' -> '_' (the layout reference wget.py:28-41 downloads and both
converters parse) — with deterministic realistic-scale weights.

Running BOTH converters (ours, posenet_tpu/converter/tfjs2jax.py, and the
reference's torch one, /root/reference/posenet/converter/tfjs2pytorch.py)
over the same fixture catches manifest-regex, shard-read, and kernel-layout
bugs on real checkpoint-format data — the coverage a live download would
give, minus the literal trained values.

`synth_photo` builds a structured photograph-like scene (gradient sky,
textured ground, person-shaped figures) — not camera noise — since no real
image asset can be fetched offline.
"""

from __future__ import annotations

import json
import os

import numpy as np

from posenet_tpu.models.mobilenet_v1 import ARCHS, HEAD_CHANNELS

# Extra variables real checkpoints carry that BOTH converters must skip
# (reference to_torch_name returns '' for them, tfjs2pytorch.py:36-39).
_IGNORED_EXTRAS = {
    'MobilenetV1/part_heatmap_2/weights': lambda last: (1, 1, last, 24),
    'MobilenetV1/part_heatmap_2/biases': lambda last: (24,),
}


def tfjs_variable_specs(model_id: int):
    """{tfjs_variable_name: shape} for a posenet MobileNetV1 checkpoint.

    Mirrors the real manifests: Conv2d_0 full conv, Conv2d_N_depthwise
    (kernels shipped (H, W, C, multiplier=1)) + Conv2d_N_pointwise per sep
    layer, heads suffixed `_2` (reference tfjs2pytorch.py:15-41).
    """
    specs = {}
    arch = ARCHS[model_id]
    for i, (conv_type, inp, outp, _stride) in enumerate(arch):
        if conv_type == 'input':
            specs[f'MobilenetV1/Conv2d_{i}/weights'] = (3, 3, inp, outp)
            specs[f'MobilenetV1/Conv2d_{i}/biases'] = (outp,)
        else:
            specs[f'MobilenetV1/Conv2d_{i}_depthwise/depthwise_weights'] = (3, 3, inp, 1)
            specs[f'MobilenetV1/Conv2d_{i}_depthwise/biases'] = (inp,)
            specs[f'MobilenetV1/Conv2d_{i}_pointwise/weights'] = (1, 1, inp, outp)
            specs[f'MobilenetV1/Conv2d_{i}_pointwise/biases'] = (outp,)
    last = arch[-1][2]
    for head, ch in HEAD_CHANNELS.items():
        specs[f'MobilenetV1/{head}_2/weights'] = (1, 1, last, ch)
        specs[f'MobilenetV1/{head}_2/biases'] = (ch,)
    for name, shape_fn in _IGNORED_EXTRAS.items():
        specs[name] = shape_fn(last)
    return specs


def write_tfjs_checkpoint(base_dir: str, checkpoint: str = 'mobilenet_v1_050',
                          model_id: int = 50, seed: int = 20240816) -> str:
    """Write a complete tfjs-format checkpoint directory; returns its path."""
    ckpt_dir = os.path.join(base_dir, checkpoint)
    os.makedirs(ckpt_dir, exist_ok=True)
    rng = np.random.RandomState(seed)

    manifest = {}
    for name, shape in tfjs_variable_specs(model_id).items():
        fan_in = int(np.prod(shape[:-1])) if len(shape) == 4 else 64
        if name.endswith('biases'):
            arr = rng.uniform(-0.8, 0.8, size=shape)  # checkpoint-scale biases
        else:
            arr = rng.normal(0.0, 1.0 / np.sqrt(fan_in), size=shape)
        filename = name.replace('/', '_')
        with open(os.path.join(ckpt_dir, filename), 'wb') as f:
            f.write(arr.astype('<f4').tobytes())
        manifest[name] = {'filename': filename, 'shape': list(shape),
                          'dtype': 'float32'}

    with open(os.path.join(ckpt_dir, 'manifest.json'), 'w') as f:
        json.dump(manifest, f)
    return ckpt_dir


def synth_photo(height: int = 353, width: int = 481, seed: int = 7) -> np.ndarray:
    """Deterministic photograph-like BGR uint8 scene with two person-shaped
    figures (head/torso/limbs), a sky gradient, and sensor-like texture."""
    import cv2

    rng = np.random.RandomState(seed)
    img = np.zeros((height, width, 3), np.uint8)
    # sky -> ground vertical gradient
    for c, (top, bot) in enumerate(((180, 60), (140, 110), (90, 70))):
        img[:, :, c] = np.linspace(top, bot, height)[:, None].astype(np.uint8)

    def person(cx, cy, s, color):
        cv2.circle(img, (cx, cy - int(2.2 * s)), int(0.5 * s), color, -1)
        cv2.line(img, (cx, cy - int(1.6 * s)), (cx, cy), color, max(2, int(0.45 * s)))
        cv2.line(img, (cx, cy - int(1.3 * s)), (cx - s, cy - int(0.4 * s)), color, max(1, int(0.3 * s)))
        cv2.line(img, (cx, cy - int(1.3 * s)), (cx + s, cy - int(0.6 * s)), color, max(1, int(0.3 * s)))
        cv2.line(img, (cx, cy), (cx - int(0.6 * s), cy + int(1.6 * s)), color, max(1, int(0.35 * s)))
        cv2.line(img, (cx, cy), (cx + int(0.5 * s), cy + int(1.7 * s)), color, max(1, int(0.35 * s)))

    person(width // 3, height // 2, height // 8, (40, 40, 150))
    person(2 * width // 3, height // 2 + 20, height // 10, (30, 120, 40))
    noise = rng.normal(0, 6, img.shape)
    return np.clip(img.astype(np.float32) + noise, 0, 255).astype(np.uint8)
