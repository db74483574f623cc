"""Prove the training stack moves ACCURACY, not just loss (VERDICT r4 #8).

Synthesizes a blob-keypoint Dataloop dataset (same generator as the
lifecycle soak), evaluates OKS/mAP on the held-out split BEFORE any
training (seeded random-init weights — egress to the real checkpoints is
blocked), fine-tunes with `trainer.train`, restores the best checkpoint,
re-evaluates, and prints ONE JSON line with before/after/delta.

    python tools/train_accuracy_delta.py --cpu --epochs 40

Everything runs in one process so the compile cache is shared between the
two eval passes. `--cpu` forces the CPU backend via jax.config (the
JAX_PLATFORMS env var is ignored under axon); without it the default
(TPU when tunneled) backend is used.

Reference being exceeded: the reference's train loop (train.py:826-890)
prints per-epoch metrics but never publishes a before/after accuracy
delta; its eval metrics were also broken (B5/B6/B13/B14, PARITY.md).
Published numbers live in PARITY.md §"Training accuracy delta".
"""

import argparse
import json
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main():
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--workdir", default="/tmp/acc_delta")
    p.add_argument("--model", type=int, default=50)
    p.add_argument("--image_size", type=int, default=129)
    p.add_argument("--epochs", type=int, default=40)
    p.add_argument("--n_train", type=int, default=16)
    p.add_argument("--n_test", type=int, default=4)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--heads_only", action="store_true", default=True)
    p.add_argument("--full", dest="heads_only", action="store_false",
                   help="fine-tune the trunk too (slower, moves further)")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (axon ignores JAX_PLATFORMS)")
    args = p.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from tools.tpu_lifecycle_soak import synthesize
    from posenet_tpu.config import TrainConfig
    from posenet_tpu.models import model_factory
    from posenet_tpu.training import train_step as ts
    from posenet_tpu.training.dataset import PosenetDataset
    from posenet_tpu.training.ground_truth import prepare_ground_truth_data
    from posenet_tpu.training.trainer import (evaluate, restore_checkpoint,
                                              train)

    if os.path.isdir(args.workdir):
        shutil.rmtree(args.workdir)
    os.makedirs(args.workdir)
    labels = synthesize(args.workdir, n_train=args.n_train,
                        n_test=args.n_test, size=args.image_size,
                        rng=np.random.RandomState(0))
    kp_dir = os.path.join(args.workdir, "keypoints")
    for split in ("train", "test"):
        prepare_ground_truth_data(
            os.path.join(args.workdir, f"images_{split}"), labels,
            keypoints_updated_dir=kp_dir)

    cfg = TrainConfig(model_id=args.model, output_stride=16,
                      batch_size=args.batch_size, learning_rate=args.lr,
                      num_epochs=args.epochs, heads_only=args.heads_only,
                      early_stop_patience=max(10, args.epochs),
                      checkpoint_dir=os.path.join(args.workdir, "ckpt"),
                      keypoint_dir=kp_dir,
                      output_dir=os.path.join(args.workdir, "out"))

    model = model_factory.load_model(args.model, output_stride=16,
                                     allow_random_init=True)
    train_ds = PosenetDataset(os.path.join(args.workdir, "images_train"),
                              kp_dir, image_size=args.image_size,
                              output_stride=16)
    test_ds = PosenetDataset(os.path.join(args.workdir, "images_test"),
                             kp_dir, image_size=args.image_size,
                             output_stride=16)

    before = evaluate(test_ds, cfg, model.params)
    print(f"before: {json.dumps(before)}", flush=True)

    state = train(train_ds, test_ds, cfg, params=model.params,
                  resume=False, eval_pose_metrics=False)

    # Evaluate the BEST checkpoint (train saves on eval-loss improvement),
    # falling back to the final state if nothing was written.
    template, _ = ts.init_train_state(model.params, cfg)
    best = restore_checkpoint(cfg.checkpoint_dir, template)
    after_params = best.params if best is not None else state.params
    after = evaluate(test_ds, cfg, after_params)
    print(f"after:  {json.dumps(after)}", flush=True)

    result = {
        "backend": __import__("jax").default_backend(),
        "model": args.model, "image_size": args.image_size,
        "epochs": args.epochs, "heads_only": args.heads_only,
        "n_train": args.n_train, "n_test": args.n_test,
        "before": {k: before.get(k) for k in ("loss", "oks", "mAP")},
        "after": {k: after.get(k) for k in ("loss", "oks", "mAP")},
        "delta_oks": after.get("oks", 0.0) - before.get("oks", 0.0),
        "delta_map": after.get("mAP", 0.0) - before.get("mAP", 0.0),
    }
    print("ACCURACY_DELTA " + json.dumps(result))
    # The point of the tool: training must IMPROVE held-out accuracy.
    ok = (result["delta_oks"] > 0 or result["delta_map"] > 0)
    print("VERDICT:", "IMPROVED" if ok else "NO IMPROVEMENT")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
