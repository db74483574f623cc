"""Training CLI: heads-only fine-tuning on Dataloop/Roboflow ground truth.

Flag parity with the reference CLI (/root/reference/train.py:44-52,979-1036):
--model, --train_image_dir, --test_image_dir, --output_dir, --scale_factor,
with GT prepared under ./keypoints_updated. Extras: --num_devices for data
parallelism, --prepare_gt to run the ground-truth generator first,
--checkpoint_dir / automatic resume (the reference never saves), --wandb to
opt into wandb logging (the reference hard-requires it).
"""

import argparse
import os

import posenet_tpu  # noqa: F401  (registers the package)
from posenet_tpu.config import TrainConfig
from posenet_tpu.models import model_factory
from posenet_tpu.parallel import mesh as mesh_lib
from posenet_tpu.training.dataset import PosenetDataset
from posenet_tpu.training.trainer import MetricLogger, train


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument('--model', type=int, default=101)
    parser.add_argument('--train_image_dir', type=str, default='./images_train')
    parser.add_argument('--test_image_dir', type=str, default='./images_test')
    parser.add_argument('--output_dir', type=str, default='./output')
    parser.add_argument('--scale_factor', type=float, default=1.0)
    parser.add_argument('--output_stride', type=int, default=16)
    parser.add_argument('--keypoint_dir', type=str, default='./keypoints_updated')
    parser.add_argument('--checkpoint_dir', type=str, default='./_train_ckpt')
    parser.add_argument('--batch_size', type=int, default=2)
    parser.add_argument('--lr', type=float, default=1e-4)
    parser.add_argument('--num_epochs', type=int, default=100)
    parser.add_argument('--num_devices', type=int, default=0,
                        help='data-parallel device count (0 = single device)')
    parser.add_argument('--image_size', type=int, default=513)
    parser.add_argument('--wandb', action='store_true')
    parser.add_argument('--prepare_gt', type=str, default='',
                        help='annotation dir; if set, run the ground-truth '
                             'generator (dataloop JSON) before training')
    parser.add_argument('--gt_format', type=str, default='dataloop',
                        choices=['dataloop', 'roboflow'])
    parser.add_argument('--allow_random_init', action='store_true')
    parser.add_argument('--augment_flip', action='store_true',
                        help='random horizontal-flip training augmentation '
                             '(image + keypoint x-mirror + left/right '
                             'keypoint channel swap; the reference defined '
                             'this transform but never applied it)')
    parser.add_argument('--no_pose_metrics', action='store_true')
    parser.add_argument('--distributed', action='store_true',
                        help='multi-host: join the jax.distributed runtime '
                             'before building the device mesh (auto-detects '
                             'coordinator on TPU pods)')
    parser.add_argument('--visual_every', type=int, default=0,
                        help='dump predicted-heatmap pngs + keypoint '
                             'overlays under --output_dir every N epochs '
                             '(0 = off; the reference dumps every step, '
                             'train.py:672-716)')
    parser.add_argument('--export_artifact', type=str, default='',
                        help='after training, export the best checkpoint '
                             'as an AOT serving artifact (StableHLO with '
                             'weights baked in — posenet_tpu/serving.py)')
    parser.add_argument('--eval_only', action='store_true',
                        help='no training: restore the checkpoint (or use '
                             'the loaded/converted weights if none exists) '
                             'and print one JSON line of eval loss + '
                             'OKS/mAP over --test_image_dir (falls back to '
                             '--train_image_dir)')
    parser.add_argument('--train_dtype', type=str, default='float32',
                        choices=['float32', 'bfloat16'],
                        help='trunk compute dtype for the training forward '
                             'pass. float32 (default) matches the reference '
                             'fine-tune; bfloat16 is mixed precision — the '
                             'frozen trunk runs bf16, master params / head '
                             'accumulation / loss / Adam stay float32')
    parser.add_argument('--export_dtype', type=str, default='bfloat16',
                        choices=['bfloat16', 'float32'],
                        help='compute dtype baked into the exported '
                             'artifact (bf16 is the TPU production default)')
    return parser.parse_args()


def main():
    args = parse_args()

    if args.distributed:
        proc = mesh_lib.initialize_distributed()
        print(f'distributed: process {proc}/{__import__("jax").process_count()}')

    if args.prepare_gt:
        from posenet_tpu.training.ground_truth import prepare_ground_truth_data
        prepare_ground_truth_data(
            args.train_image_dir, args.prepare_gt,
            keypoints_updated_dir=args.keypoint_dir,
            annotation_format=args.gt_format)
        if os.path.isdir(args.test_image_dir):
            prepare_ground_truth_data(
                args.test_image_dir, args.prepare_gt,
                keypoints_updated_dir=args.keypoint_dir,
                annotation_format=args.gt_format)

    import jax.numpy as _jnp

    cfg = TrainConfig(
        model_id=args.model, output_stride=args.output_stride,
        batch_size=args.batch_size, learning_rate=args.lr,
        num_epochs=args.num_epochs, checkpoint_dir=args.checkpoint_dir,
        keypoint_dir=args.keypoint_dir,
        output_dir=args.output_dir, visual_every=args.visual_every,
        num_devices=args.num_devices or None,
        compute_dtype=_jnp.dtype(args.train_dtype))

    model = model_factory.load_model(
        args.model, output_stride=args.output_stride,
        allow_random_init=args.allow_random_init)

    train_ds = PosenetDataset(args.train_image_dir, args.keypoint_dir,
                              image_size=args.image_size,
                              output_stride=args.output_stride,
                              scale_factor=args.scale_factor,
                              augment_flip=args.augment_flip)
    try:
        test_ds = PosenetDataset(args.test_image_dir, args.keypoint_dir,
                                 image_size=args.image_size,
                                 output_stride=args.output_stride,
                                 scale_factor=args.scale_factor)
    except FileNotFoundError:
        test_ds = None

    mesh = mesh_lib.make_mesh(cfg.num_devices) if cfg.num_devices else None

    if args.eval_only:
        import json

        from posenet_tpu.training import train_step as _ts
        from posenet_tpu.training.trainer import (evaluate,
                                                  restore_checkpoint)

        params = model.params
        state, _ = _ts.init_train_state(params, cfg)
        restored = restore_checkpoint(cfg.checkpoint_dir, state)
        if restored is not None:
            params = restored.params
            print(f'eval: restored checkpoint step {int(restored.step)} '
                  f'from {cfg.checkpoint_dir}')
        else:
            print('eval: no checkpoint found, using loaded model weights')
        ds = test_ds if test_ds is not None else train_ds
        report = evaluate(ds, cfg, params, mesh=mesh,
                          eval_pose_metrics=not args.no_pose_metrics)
        print(json.dumps(report))
        return

    logger = MetricLogger(use_wandb=args.wandb)
    state = train(train_ds, test_ds, cfg, logger=logger, mesh=mesh,
                  params=model.params,
                  eval_pose_metrics=not args.no_pose_metrics)

    if args.export_artifact:
        import jax.numpy as jnp

        from posenet_tpu.config import ModelConfig
        from posenet_tpu.models.model_factory import PoseNet
        from posenet_tpu.serving import save_serving_artifact
        from posenet_tpu.training import train_step as ts
        from posenet_tpu.training.trainer import restore_checkpoint

        # The BEST model is the latest saved checkpoint: train() saves on
        # eval improvement (or every epoch when there is no test split),
        # so the in-memory final state may be later and worse. The final
        # state is only a fallback for when nothing was ever written
        # (num_epochs=0, unwritable checkpoint_dir).
        template, _ = ts.init_train_state(model.params, cfg)
        best = restore_checkpoint(args.checkpoint_dir, template)
        params = best.params if best is not None else state.params
        export_cfg = ModelConfig(model_id=args.model,
                                 output_stride=args.output_stride,
                                 compute_dtype=jnp.dtype(args.export_dtype))
        # Serve at the resolution the model was actually fine-tuned at —
        # the dataset's EFFECTIVE image_size (scale_factor applied, snapped
        # stride-valid), not the raw --image_size flag.
        size = train_ds.image_size
        meta = save_serving_artifact(PoseNet(params, export_cfg),
                                     args.export_artifact,
                                     input_hw=(size, size))
        print(f'exported serving artifact to {args.export_artifact} '
              f'({meta["input_hw"]}, {meta["compute_dtype"]})')


if __name__ == '__main__':
    main()
