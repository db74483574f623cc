"""tfjs PoseNet checkpoint downloader.

Same cold-start UX as the reference downloader
(/root/reference/posenet/converter/wget.py:8-41): fetch `manifest.json` plus
every weight shard from the public tfjs-models GCS bucket into a local cache
directory. Uses urllib from the standard library (no `requests` dependency).
"""

from __future__ import annotations

import json
import os
import posixpath
import tempfile
import urllib.request

GOOGLE_CLOUD_STORAGE_DIR = 'https://storage.googleapis.com/tfjs-models/weights/posenet/'

# Weight shard cache (reference tfjs2pytorch.py:12 uses <tmp>/_posenet_weights).
BASE_DIR = os.path.join(tempfile.gettempdir(), '_posenet_weights')


def _fetch(url: str) -> bytes:
    with urllib.request.urlopen(url, timeout=60) as resp:
        return resp.read()


def download(checkpoint: str, base_dir: str = BASE_DIR) -> str:
    """Download manifest + all weight shards for `checkpoint`.

    Returns the directory containing the downloaded files. Raises URLError /
    OSError if the environment has no network egress — callers fall back to
    random initialization with a clear message.
    """
    save_dir = os.path.join(base_dir, checkpoint)
    os.makedirs(save_dir, exist_ok=True)

    manifest_path = os.path.join(save_dir, 'manifest.json')
    manifest_bytes = _fetch(posixpath.join(GOOGLE_CLOUD_STORAGE_DIR, checkpoint, 'manifest.json'))
    manifest = json.loads(manifest_bytes)

    for entry in manifest.values():
        filename = entry['filename']
        print('Downloading', filename)
        blob = _fetch(posixpath.join(GOOGLE_CLOUD_STORAGE_DIR, checkpoint, filename))
        with open(os.path.join(save_dir, filename), 'wb') as f:
            f.write(blob)
    # Write the manifest LAST: its presence is the converter's
    # "already downloaded" marker (tfjs2jax.load_tfjs_variables), so an
    # interrupted shard loop must not leave a poisoned cache that every
    # later load_model() trusts.
    with open(manifest_path, 'w') as f:
        json.dump(manifest, f)
    return save_dir
