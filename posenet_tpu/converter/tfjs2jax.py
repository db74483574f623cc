"""tfjs checkpoint -> JAX parameter pytree converter.

Capability parity with the reference converter
(/root/reference/posenet/converter/tfjs2pytorch.py:15-111), redesigned for
the TPU layout: tfjs stores conv kernels HWIO, which is exactly what our
NHWC/`lax.conv_general_dilated` backbone consumes, so regular and pointwise
kernels are used verbatim (the reference transposes everything to OIHW,
tfjs2pytorch.py:67-69 — a detour we skip). Depthwise kernels ship as
(H, W, C, multiplier=1) and are transposed once to (H, W, 1, C) for
`feature_group_count=C`.

Raw little-endian float32 shards are read with `np.frombuffer` (the reference
uses a Python `struct.unpack` loop, tfjs2pytorch.py:62-65).
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict

import numpy as np

from posenet_tpu.converter.download import BASE_DIR, download
from posenet_tpu.models.mobilenet_v1 import (ARCHS, HEAD_CHANNELS,
                                             MOBILENET_V1_CHECKPOINTS)

# tfjs variable name patterns (see reference tfjs2pytorch.py:15-41):
#   MobilenetV1/Conv2d_0/weights                      -> backbone[0] full conv
#   MobilenetV1/Conv2d_5_depthwise/depthwise_weights  -> backbone[5] depthwise
#   MobilenetV1/Conv2d_5_pointwise/weights            -> backbone[5] pointwise
#   MobilenetV1/heatmap_2/weights                     -> heads['heatmap']
_CONV_RE = re.compile(r'^mobilenetv1/conv2d_(\d+)(?:_(depthwise|pointwise))?/(weights|depthwise_weights|biases)$')
_HEAD_RE = re.compile(r'^mobilenetv1/(heatmap|offset|displacement_fwd|displacement_bwd)_2/(weights|biases)$')


def load_tfjs_variables(checkpoint: str, base_dir: str = BASE_DIR) -> Dict[str, np.ndarray]:
    """Read every variable from the tfjs manifest as {tfjs_name: np.float32 array}."""
    manifest_path = os.path.join(base_dir, checkpoint, 'manifest.json')
    if not os.path.exists(manifest_path):
        print(f'Weights for checkpoint {checkpoint} are not downloaded. '
              f'Downloading to {base_dir} ...')
        download(checkpoint, base_dir)

    with open(manifest_path) as f:
        manifest = json.load(f)

    variables = {}
    for name, meta in manifest.items():
        with open(os.path.join(base_dir, checkpoint, meta['filename']), 'rb') as f:
            raw = f.read()
        arr = np.frombuffer(raw, dtype='<f4').reshape(meta['shape'])
        variables[name] = arr
    return variables


def variables_to_pytree(variables: Dict[str, np.ndarray], model_id: int) -> Dict[str, Any]:
    """Map tfjs variables onto the `init_params` pytree layout."""
    n_layers = len(ARCHS[model_id])
    backbone: list = [dict() for _ in range(n_layers)]
    heads: Dict[str, Dict[str, np.ndarray]] = {name: {} for name in HEAD_CHANNELS}

    for name, arr in variables.items():
        key = name.lower()
        m = _CONV_RE.match(key)
        if m:
            idx, kind, var = int(m.group(1)), m.group(2), m.group(3)
            layer = backbone[idx]
            if kind == 'depthwise':
                if var in ('weights', 'depthwise_weights'):
                    # (H, W, C, 1) -> (H, W, 1, C) for feature_group_count=C
                    layer['dw_w'] = np.ascontiguousarray(arr.transpose(0, 1, 3, 2))
                else:
                    layer['dw_b'] = arr
            elif kind == 'pointwise':
                if var == 'weights':
                    layer['pw_w'] = arr  # (1, 1, C, C2) HWIO verbatim
                else:
                    layer['pw_b'] = arr
            else:  # the full input conv (layer 0)
                if var == 'weights':
                    layer['w'] = arr  # (3, 3, 3, C) HWIO verbatim
                else:
                    layer['b'] = arr
            continue
        m = _HEAD_RE.match(key)
        if m:
            head, var = m.group(1), m.group(2)
            if var == 'weights':
                heads[head]['w'] = arr  # (1, 1, C, K) HWIO verbatim
            else:
                heads[head]['b'] = arr
            # Other variables (e.g. segmentation/part-offset heads in some
            # checkpoints) are ignored, same as the reference (':39 -> """').

    # Completeness check — fail loudly on a malformed checkpoint.
    for i, layer in enumerate(backbone):
        want = {'w', 'b'} if i == 0 else {'dw_w', 'dw_b', 'pw_w', 'pw_b'}
        missing = want - set(layer)
        if missing:
            raise ValueError(f'backbone layer {i} missing variables: {missing}')
    for head, p in heads.items():
        if set(p) != {'w', 'b'}:
            raise ValueError(f'head {head} missing variables: {set(p)}')

    return {'backbone': backbone, 'heads': heads}


def convert(model_id: int, model_dir: str, base_dir: str = BASE_DIR,
            output_stride: int = 16, image_size: int = 513,
            check: bool = True) -> str:
    """Download (if needed) + convert + save as a flat .npz checkpoint.

    Returns the saved checkpoint path (same role as the reference's
    `convert()` writing `<model_dir>/<checkpoint>.pth`, tfjs2pytorch.py:85-97).
    With `check=True` and ./images/tennis_in_crowd.jpg present, runs a
    sanity forward pass and prints the heatmap shape/corner/mean — the
    reference's converter self-check (tfjs2pytorch.py:99-111).
    """
    checkpoint_name = MOBILENET_V1_CHECKPOINTS[model_id]
    os.makedirs(model_dir, exist_ok=True)
    variables = load_tfjs_variables(checkpoint_name, base_dir)
    params = variables_to_pytree(variables, model_id)
    path = os.path.join(model_dir, checkpoint_name + '.npz')
    save_params_npz(path, params)

    check_image = "./images/tennis_in_crowd.jpg"
    if check and os.path.exists(check_image):
        import cv2
        import jax.numpy as jnp

        from posenet_tpu.config import ModelConfig
        from posenet_tpu.models import mobilenet_v1

        img = cv2.resize(cv2.imread(check_image), (image_size, image_size))
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB).astype(np.float32)
        x = jnp.asarray(img * (2.0 / 255.0) - 1.0)[None]
        cfg = ModelConfig(model_id=model_id, output_stride=output_stride)
        out = mobilenet_v1.forward(params, x, cfg)
        hm = np.asarray(out['heatmap'])
        print("Heatmaps")
        print(hm.shape)
        print(hm[:, 0:1, 0:1])
        print(float(hm.mean()))
    return path


# ---------------------------------------------------------------------------
# Flat .npz (de)serialization for the params pytree
# ---------------------------------------------------------------------------

def _flatten(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    flat = {}
    for i, layer in enumerate(params['backbone']):
        for k, v in layer.items():
            flat[f'backbone/{i}/{k}'] = np.asarray(v)
    for head, p in params['heads'].items():
        for k, v in p.items():
            flat[f'heads/{head}/{k}'] = np.asarray(v)
    return flat


def save_params_npz(path: str, params: Dict[str, Any]) -> None:
    # Write-temp-then-rename: load_model gates re-conversion on
    # os.path.exists(path), so a truncated .npz from an interrupted save
    # would be trusted forever (same poisoned-cache class download.py
    # avoids by writing manifest.json last).
    tmp = path + '.tmp'
    with open(tmp, 'wb') as f:
        np.savez(f, **_flatten(params))
    os.replace(tmp, path)


def load_params_npz(path: str) -> Dict[str, Any]:
    data = np.load(path)
    n_layers = 1 + max(int(k.split('/')[1]) for k in data.files if k.startswith('backbone/'))
    backbone: list = [dict() for _ in range(n_layers)]
    heads: Dict[str, Dict[str, np.ndarray]] = {}
    for k in data.files:
        parts = k.split('/')
        if parts[0] == 'backbone':
            backbone[int(parts[1])][parts[2]] = data[k]
        else:
            heads.setdefault(parts[1], {})[parts[2]] = data[k]
    return {'backbone': backbone, 'heads': heads}
