"""Large-grid spatial-partition exactness (VERDICT round-3 weak #4).

The height-sharded inference path (`PoseNetPipeline(partition='spatial')`,
the CNN analog of sequence parallelism) was proven only at toy grids
(129x129 in tests, 65x65 in the dryrun). This runs it at production
shapes on the 8-virtual-device CPU mesh against the unsharded pipeline:

  - 513x513 stride 16 (the flagship serving shape; 33x33 output grid)
  - 721x1281 stride 8  (s8 720p; 91x161 grid — dilated stride plan, the
    case where `valid_h` pad-row masking could interact with dilation)

Biases are inflated (same trick as tests/test_preprocess.py
test_pipeline_spatial_partition) so pad-row leakage through relu6(bias)
is visible rather than masked by near-zero random init.

Usage: python tools/verify_spatial_large.py   (CPU; takes a few minutes)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")  # env var is ignored on axon
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")

    from posenet_tpu.config import DecodeConfig
    from posenet_tpu.models import load_model
    from posenet_tpu.parallel.mesh import make_mesh
    from posenet_tpu.pipeline import PoseNetPipeline

    mesh = make_mesh(8)
    ok = True
    for name, (hh, ww), stride in (("513x513-s16", (513, 513), 16),
                                   ("721x1281-s8", (721, 1281), 8)):
        model = load_model(50, output_stride=stride, allow_random_init=True)
        params = jax.tree.map(lambda a: a, model.params)
        for layer in params["backbone"]:
            for k in layer:
                if k.endswith("b"):
                    layer[k] = layer[k] + 1.0
        model = type(model)(params, model.cfg)
        dcfg = DecodeConfig(min_pose_score=0.0, score_threshold=0.3,
                            max_candidates=64)
        frames = np.random.RandomState(11).randint(
            0, 255, (1, hh, ww, 3), dtype=np.uint8)

        plain = PoseNetPipeline(model, dcfg)(frames)
        spatial = PoseNetPipeline(model, dcfg, mesh=mesh,
                                  partition="spatial")(frames)
        n = int((np.asarray(plain.pose_scores) > 0).sum())
        d_ps = np.abs(np.asarray(plain.pose_scores)
                      - np.asarray(spatial.pose_scores)).max()
        d_kc = np.abs(np.asarray(plain.keypoint_coords)
                      - np.asarray(spatial.keypoint_coords)).max()
        status = "OK" if (d_ps <= 1e-5 and d_kc <= 1e-3) else "FAIL"
        ok &= status == "OK"
        print(f"{name}: poses={n} max|d pose_scores|={d_ps:.3g} "
              f"max|d coords|={d_kc:.3g} px -> {status}", flush=True)
        jax.clear_caches()  # XLA:CPU JIT holds executables live

    print("PASS: spatial partition exact at production grids" if ok
          else "FAIL: spatial partition diverges")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
