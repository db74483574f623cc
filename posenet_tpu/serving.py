"""AOT serving artifacts: the fused uint8->poses program as portable
StableHLO (`jax.export`), with the weights baked in.

The reference deploys by shipping Python + torch + a `.pth` checkpoint and
rebuilding the model at the serving host (reference
posenet/models/model_factory.py:11-23). The TPU-native production path
ships the **compiled program itself**: one versioned artifact containing
the whole normalize -> backbone -> multi-pose-decode pipeline, loadable
without the model code or the checkpoint, covered by StableHLO's
serialization compatibility guarantees (backward compatible across jax
releases, unlike pickled pytrees).

Design notes:
- The **XLA decode path** is what gets exported (`use_pallas=False`):
  Mosaic custom calls are pinned to the libtpu that compiled them, while
  the XLA traversal is reference-exact on TPU (PARITY.md, barrier-pinned
  gather indices) and lowers for every platform — so one artifact can
  carry both `tpu` and `cpu` lowerings.
- Weights are embedded as module constants in the model's compute dtype,
  making the artifact self-contained (~2.4 MB for model 50 bf16).
- XLA requires static shapes, so the artifact holds **one program per
  batch size**; a serving tier calls the entry matching its batch.
- Numerics: an exported module's lowering can differ from an in-process
  `jit` of the same function at the ulp level (measured: <= 4e-6 px on
  coords, no cell flips); results are deterministic *within* an artifact,
  which is the property serving replicas need.

Artifact layout (a zip, conventional suffix `.posenet`):
    meta.json             format/version, model + decode config, shapes
    program_b{N}.stablehlo    jax.export blob for batch size N
"""

from __future__ import annotations

import dataclasses
import json
import os
import zipfile
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

from posenet_tpu.config import DecodeConfig, ModelConfig
from posenet_tpu.decode import DecodedPoses
from posenet_tpu.models import mobilenet_v1
from posenet_tpu.models.model_factory import PoseNet
from posenet_tpu.pipeline import _infer

# v1: single-device programs. v2: adds data_parallel_devices (loader must
# understand it to shard the input, so v1 loaders reject v2 artifacts).
FORMAT_VERSION = 2
_READABLE_VERSIONS = (1, 2)

# jax.export refuses unregistered pytree containers in the output tree; the
# registration makes deserialized programs return real DecodedPoses.
try:
    jax_export.register_namedtuple_serialization(
        DecodedPoses, serialized_name="posenet_tpu.decode.DecodedPoses")
except ValueError:
    pass  # already registered (repeated import under test runners)


def _dp_sharding(n: int, context: str):
    """('data',)-mesh batch sharding over the first n local devices."""
    if len(jax.devices()) < n:
        raise ValueError(
            f"{context} needs {n} local devices (found "
            f"{len(jax.devices())}); on a CPU host set "
            f"XLA_FLAGS=--xla_force_host_platform_device_count={n}")
    from posenet_tpu.parallel import mesh as mesh_lib
    return mesh_lib.data_sharding(mesh_lib.make_mesh(n))


def _validate_input_hw(input_hw: Tuple[int, int], output_stride: int):
    h, w = input_hw
    if (h - 1) % output_stride or (w - 1) % output_stride:
        raise ValueError(
            f"input_hw {input_hw} is not stride-valid for stride "
            f"{output_stride}: each side must be {output_stride}*n+1 "
            f"(preprocess.valid_resolution computes the nearest)")


def save_serving_artifact(
        model: PoseNet, path: str, *,
        decode_cfg: DecodeConfig = DecodeConfig(min_pose_score=0.25),
        batch_sizes: Sequence[int] = (1,),
        input_hw: Tuple[int, int] = (513, 513),
        platforms: Sequence[str] = ("tpu", "cpu"),
        data_parallel_devices: Optional[int] = None) -> Dict:
    """Export `model`'s fused inference pipeline to a serving artifact.

    With `data_parallel_devices=N`, programs are exported batch-sharded
    over an N-device ('data',) mesh (params replicated; pose decode is
    per-image so inference needs no cross-chip traffic) — the loader then
    requires exactly N devices and shards the input itself. Export needs
    N local devices too, but NOT the target platform: a CPU host with
    `--xla_force_host_platform_device_count=N` can emit N-chip TPU
    artifacts (lowering is cross-platform).

    Returns the metadata dict that was written to the artifact."""
    cfg = model.cfg
    if cfg.quantized:
        raise NotImplementedError(
            "serving export of the int8 trunk is not supported (and it is "
            "measured slower than bf16 on TPU v5e — models/quantized.py)")
    if decode_cfg.use_pallas:
        raise ValueError(
            "serving artifacts always export the XLA decode path "
            "(Mosaic custom calls are libtpu-version-pinned); leave "
            "use_pallas as None/False")
    _validate_input_hw(input_hw, cfg.output_stride)
    decode_cfg = dataclasses.replace(decode_cfg, use_pallas=False)

    params = mobilenet_v1.cast_params(model.params, cfg.compute_dtype)

    def fn(frames_u8):
        return _infer(params, frames_u8, cfg, decode_cfg)

    data_sharding = None
    if data_parallel_devices is not None:
        n = data_parallel_devices = int(data_parallel_devices)
        if n < 1:
            raise ValueError(f"data_parallel_devices must be >= 1, got {n}")
        bad = [b for b in batch_sizes if b % n]
        if bad:
            raise ValueError(
                f"data_parallel_devices={n} must divide every batch size; "
                f"got {bad}")
        data_sharding = _dp_sharding(n, f"exporting a {n}-device program")

    meta = {
        "format_version": FORMAT_VERSION,
        "model_id": cfg.model_id,
        "output_stride": cfg.output_stride,
        "compute_dtype": jnp.dtype(cfg.compute_dtype).name,
        "input_hw": list(input_hw),
        "input_dtype": "uint8",
        "input_layout": "NHWC, RGB",
        "batch_sizes": sorted(set(int(b) for b in batch_sizes)),
        "platforms": list(platforms),
        "decode": {
            "max_pose_detections": decode_cfg.max_pose_detections,
            "score_threshold": decode_cfg.score_threshold,
            "nms_radius": decode_cfg.nms_radius,
            "min_pose_score": decode_cfg.min_pose_score,
            "max_candidates": decode_cfg.max_candidates,
            "two_stage_topk": decode_cfg.two_stage_topk,
        },
        "jax_version": jax.__version__,
        "framework_version": __import__("posenet_tpu").__version__,
        "outputs": list(DecodedPoses._fields),
        "data_parallel_devices": data_parallel_devices,
    }
    # Write-to-temp + atomic rename: ZipFile.__exit__ finalizes the
    # central directory even on exception, so writing `path` directly
    # would leave a LOADABLE zip with programs missing when a later batch
    # size fails to export — the breakage would only surface as a
    # KeyError at serve time on another host.
    tmp_path = path + ".tmp"
    try:
        with zipfile.ZipFile(tmp_path, "w",
                             compression=zipfile.ZIP_DEFLATED) as zf:
            zf.writestr("meta.json", json.dumps(meta, indent=2))
            for b in meta["batch_sizes"]:
                spec = jax.ShapeDtypeStruct((b, *input_hw, 3), jnp.uint8,
                                            sharding=data_sharding)
                jit_fn = (jax.jit(fn) if data_sharding is None else
                          jax.jit(fn, in_shardings=(data_sharding,)))
                exp = jax_export.export(jit_fn,
                                        platforms=list(platforms))(spec)
                zf.writestr(f"program_b{b}.stablehlo", exp.serialize())
        os.replace(tmp_path, path)
    finally:
        if os.path.exists(tmp_path):
            os.remove(tmp_path)
    return meta


class ServingArtifact:
    """A loaded serving artifact: call it with (B, H, W, 3) uint8 frames.

    Programs deserialize lazily per batch size and are cached; the actual
    per-platform compile happens on the first call, like any jit."""

    def __init__(self, path: str):
        self.path = path
        with zipfile.ZipFile(path) as zf:
            self.meta = json.loads(zf.read("meta.json"))
        if self.meta.get("format_version") not in _READABLE_VERSIONS:
            raise ValueError(
                f"artifact {path} has format_version "
                f"{self.meta.get('format_version')}; this loader reads "
                f"{_READABLE_VERSIONS}")
        self.batch_sizes = list(self.meta["batch_sizes"])
        self.input_hw = tuple(self.meta["input_hw"])
        self.data_parallel_devices = self.meta.get("data_parallel_devices")
        self._programs: Dict[int, object] = {}
        self._data_sharding = None

    def _program(self, batch: int):
        if batch not in self._programs:
            if batch not in self.batch_sizes:
                raise ValueError(
                    f"artifact {self.path} has no program for batch size "
                    f"{batch}; available: {self.batch_sizes} (re-export "
                    f"with batch_sizes including {batch})")
            with zipfile.ZipFile(self.path) as zf:
                blob = zf.read(f"program_b{batch}.stablehlo")
            exported = jax_export.deserialize(blob)
            # A bare Exported.call re-traces the call_exported primitive on
            # every invocation — ~150 ms of host dispatch per call on a slow
            # core (measured, vs ~17 ms jit-cached end to end at b1). The
            # cached jit hits the C++ fast dispatch path after the first
            # call; the underlying executable is the same.
            self._programs[batch] = jax.jit(exported.call)
        return self._programs[batch]

    def __call__(self, frames_u8) -> DecodedPoses:
        # Validate from .shape/.dtype WITHOUT np.asarray: a device-resident
        # jax.Array input must pass through untouched (materializing it
        # would drag every frame device->host just to re-upload — hundreds
        # of ms over a slow link), and a non-uint8 dtype must RAISE rather
        # than be astype-wrapped into garbage poses (float [0,1] frames
        # would silently truncate to zeros).
        frames = (frames_u8 if isinstance(frames_u8, jax.Array)
                  else np.asarray(frames_u8))
        if frames.ndim != 4 or tuple(frames.shape[1:3]) != self.input_hw \
                or frames.shape[3] != 3:
            raise ValueError(
                f"expected (B, {self.input_hw[0]}, {self.input_hw[1]}, 3) "
                f"uint8 frames, got {frames.shape}")
        if frames.dtype != np.uint8:
            raise ValueError(
                f"expected uint8 frames, got {frames.dtype} (scale/round "
                f"to 0..255 uint8 first — an implicit cast would wrap "
                f"float/negative values into garbage)")
        backend = jax.default_backend()
        if backend not in self.meta["platforms"]:
            raise ValueError(
                f"artifact {self.path} was exported for platforms "
                f"{self.meta['platforms']} but the current backend is "
                f"'{backend}'; re-export with --platforms including it")
        program = self._program(frames.shape[0])  # batch validated FIRST
        if self.data_parallel_devices:
            if self._data_sharding is None:
                self._data_sharding = _dp_sharding(
                    self.data_parallel_devices,
                    f"artifact {self.path} (exported data-parallel)")
            frames = jax.device_put(frames, self._data_sharding)
        return program(frames)


def load_serving_artifact(path: str) -> ServingArtifact:
    return ServingArtifact(path)


def main(argv: Optional[Sequence[str]] = None):
    """`posenet-export`: write a serving artifact for a model checkpoint."""
    import argparse

    from posenet_tpu.models.model_factory import load_model
    from posenet_tpu.preprocess import valid_resolution

    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--model", type=int, default=101,
                   choices=(50, 75, 100, 101))
    p.add_argument("--output_stride", type=int, default=16,
                   choices=(8, 16, 32))
    p.add_argument("--size", type=int, nargs=2, default=(513, 513),
                   metavar=("H", "W"),
                   help="input resolution; snapped stride-valid")
    p.add_argument("--batch_sizes", type=str, default="1",
                   help="comma-separated, e.g. 1,8,128")
    p.add_argument("--platforms", type=str, default="tpu,cpu")
    p.add_argument("--compute_dtype", default="bfloat16",
                   choices=("bfloat16", "float32"),
                   help="bf16 is the TPU production default")
    p.add_argument("--min_pose_score", type=float, default=0.25)
    p.add_argument("--output", type=str, required=True,
                   help="artifact path (conventionally *.posenet)")
    p.add_argument("--data_parallel_devices", type=int, default=None,
                   help="export batch-sharded over an N-device data mesh "
                        "(loader then requires exactly N devices)")
    p.add_argument("--from_checkpoint", type=str, default="",
                   help="orbax checkpoint dir written by train.py; export "
                        "its latest (= best) step instead of the "
                        "downloaded tfjs weights. --model/--output_stride "
                        "must match the training run")
    p.add_argument("--random_init_ok", action="store_true",
                   help="export random weights if the checkpoint cannot be "
                        "downloaded (testing only)")
    args = p.parse_args(argv)

    export_cfg = ModelConfig(model_id=args.model,
                             output_stride=args.output_stride,
                             compute_dtype=jnp.dtype(args.compute_dtype))
    if args.from_checkpoint:
        from posenet_tpu.config import TrainConfig
        from posenet_tpu.training import train_step as ts
        from posenet_tpu.training.trainer import restore_checkpoint

        # train.py always trains with TrainConfig's optimizer defaults
        # (heads_only adam), so a default-config template matches any of
        # its checkpoints' state pytrees.
        init = mobilenet_v1.init_params(jax.random.PRNGKey(0), export_cfg)
        template, _ = ts.init_train_state(
            init, TrainConfig(model_id=args.model,
                              output_stride=args.output_stride))
        restored = restore_checkpoint(args.from_checkpoint, template)
        if restored is None:
            raise SystemExit(
                f"no checkpoint found in {args.from_checkpoint}")
        model = PoseNet(restored.params, export_cfg)
    else:
        model = load_model(args.model, args.output_stride,
                           compute_dtype=jnp.dtype(args.compute_dtype),
                           allow_random_init=args.random_init_ok)
    # valid_resolution takes (width, height) and returns (w, h)
    vw, vh = valid_resolution(args.size[1], args.size[0],
                              args.output_stride)
    input_hw = (vh, vw)
    meta = save_serving_artifact(
        model, args.output,
        decode_cfg=DecodeConfig(min_pose_score=args.min_pose_score),
        batch_sizes=[int(b) for b in args.batch_sizes.split(",")],
        input_hw=input_hw,
        platforms=tuple(args.platforms.split(",")),
        data_parallel_devices=args.data_parallel_devices)
    print(f"wrote {args.output}: model {meta['model_id']} "
          f"s{meta['output_stride']} {meta['input_hw']} "
          f"batches {meta['batch_sizes']} platforms {meta['platforms']}")
    return meta


if __name__ == "__main__":
    main()
