"""Training loop: heads-only fine-tuning with DP sharding, checkpoints,
early stopping, and eval metrics.

Capability parity with the reference loop (/root/reference/train.py:578-916):
per-epoch train + eval passes of the heatmap+offset loss, heads-only
freezing, OKS/precision/recall/mAP metrics, early stopping with patience 10
on the eval loss, and metric logging (wandb optional). Improvements the
reference lacks (SURVEY.md §5 checkpoint/resume: the reference's "save best
model" branch saves nothing, train.py:897-899):

- Orbax checkpointing of params + optimizer state + step, with resume.
- The step is ONE compiled XLA program (grad + masked-Adam update),
  data-parallel over a device mesh; the reference re-enters Python per item
  and recomputes metric sweeps in the hot loop (SURVEY §3.4 notes the CPU
  metric sweep dominates its step time). Metrics here run at a configurable
  cadence on the eval set only.
"""

from __future__ import annotations

import json
import os
import re
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from posenet_tpu.config import DecodeConfig, ModelConfig, TrainConfig
from posenet_tpu.decode import decode_batch
from posenet_tpu.models import mobilenet_v1
from posenet_tpu.parallel import mesh as mesh_lib
from posenet_tpu.training import metrics as metrics_lib
from posenet_tpu.training import train_step as ts
from posenet_tpu.training.dataset import PosenetDataset


class MetricLogger:
    """Quiet-by-default structured metric sink with an optional wandb
    backend (the reference hard-requires wandb, train.py:33,993)."""

    def __init__(self, use_wandb: bool = False, project: str = 'posenet',
                 verbose: bool = True):
        self.verbose = verbose
        self.wandb = None
        if use_wandb:
            try:
                import wandb
                wandb.init(project=project)
                self.wandb = wandb
            except ImportError:
                print('wandb not available; logging to stdout only')
        self.history = []

    def log(self, data: Dict, step: Optional[int] = None):
        self.history.append(dict(data))
        if self.wandb is not None:
            self.wandb.log(data, step=step)
        if self.verbose:
            parts = ' '.join(f'{k}={v:.4f}' if isinstance(v, float) else f'{k}={v}'
                             for k, v in data.items())
            print(parts)


def save_checkpoint(ckpt_dir: str, state: ts.TrainState,
                    best_val_loss: Optional[float] = None):
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(ckpt_dir, f'step_{int(state.step)}'))
    if best_val_loss is not None:
        # Sidecar so a resumed run doesn't overwrite the on-disk best model
        # with a worse one at a higher step (best_val_loss would otherwise
        # reset to inf across restarts). Written BEFORE the checkpoint:
        # restore_checkpoint picks the latest step, so a crash between the
        # two must leave the STRICTER bound — the new loss with no matching
        # checkpoint means a resumed run refuses to save anything worse
        # than the lost model, rather than letting a worse later step win
        # the latest-step restore.
        os.makedirs(ckpt_dir, exist_ok=True)
        with open(os.path.join(ckpt_dir, 'best.json'), 'w') as f:
            json.dump({'step': int(state.step),
                       'val_loss': float(best_val_loss)}, f)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.device_get(state), force=True)
    ckptr.wait_until_finished()
    return path


def _load_best_val_loss(ckpt_dir: str) -> float:
    try:
        with open(os.path.join(ckpt_dir, 'best.json')) as f:
            return float(json.load(f)['val_loss'])
    except (OSError, ValueError, KeyError):
        return float('inf')


def restore_checkpoint(ckpt_dir: str, template: ts.TrainState) -> Optional[ts.TrainState]:
    import orbax.checkpoint as ocp

    if not os.path.isdir(ckpt_dir):
        return None
    # Match only completed checkpoints: an interrupted save leaves a
    # 'step_<N>.orbax-checkpoint-tmp' dir in the same parent, which must
    # not crash (or win) the resume that exists to recover from it.
    steps = [d for d in os.listdir(ckpt_dir)
             if re.fullmatch(r'step_\d+', d)]
    if not steps:
        return None
    latest = max(steps, key=lambda d: int(d.split('_')[1]))
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(
        os.path.abspath(os.path.join(ckpt_dir, latest)),
        jax.device_get(template))
    return ts.TrainState(*restored)


def score_decoded_poses(kp_coords: np.ndarray, pose_scores: np.ndarray,
                        gt_keypoints: np.ndarray, output_stride: int):
    """Score decoded predictions against GT keypoints for one batch.

    Args:
      kp_coords: (B, P, 17, 2) decoded keypoint coords, image px.
      pose_scores: (B, P) decoded pose scores (0 = empty slot).
      gt_keypoints: (B, Pmax, 17, 2) GT grid coords, sentinel-padded.
    Returns: (mean OKS, mean mAP, n_scored) — means over the n_scored
    SCOREABLE images only (an image with neither predictions nor GT is a
    vacuously perfect outcome and is excluded, not scored 0). Callers
    aggregating across batches must weight by n_scored, not batch size.
    """
    oks_vals, maps = [], []
    for b in range(kp_coords.shape[0]):
        n_pred = int((pose_scores[b] > 0).sum())
        gt = np.asarray(gt_keypoints[b])
        gt_present = ~np.all((gt == 0) | (gt == -1), axis=(1, 2))
        gt_poses = gt[gt_present].astype(np.float64)
        # grid -> px, but keep the (0,0)/(-1,-1) missing-keypoint
        # sentinels UNscaled — scaling them to (-16,-16) would make the
        # metrics treat every unannotated keypoint as a real annotation.
        sentinel = np.all((gt_poses == 0) | (gt_poses == -1), axis=-1,
                          keepdims=True)
        gt_poses = np.where(sentinel, gt_poses,
                            gt_poses * output_stride)
        preds = kp_coords[b, :n_pred]
        if n_pred == 0 and len(gt_poses) == 0:
            continue  # nothing to score either way
        # Zero-prediction images with GT (and predictions with no GT) MUST
        # still be scored: threshold_sweep counts every keypoint of
        # unmatched poses as FN/FP (metrics.py _match_statistics, B13), so
        # OKS/recall/mAP correctly drop to 0 instead of the image silently
        # improving the average by vanishing from it.
        pairs = metrics_lib.match_poses(preds, gt_poses)
        oks_vals.append(metrics_lib.calculate_oks(pairs, preds, gt_poses))
        _, _, ap = metrics_lib.threshold_sweep(preds, gt_poses)
        maps.append(ap)
    return (float(np.mean(oks_vals)) if oks_vals else 0.0,
            float(np.mean(maps)) if maps else 0.0,
            len(oks_vals))


def evaluate_poses(params, batch, model_cfg: ModelConfig,
                   decode_cfg: DecodeConfig, n_real: int = None):
    """Decode predictions for a batch and score them against GT keypoints
    (host-side Hungarian/OKS/mAP — reference train.py:757-779).

    `n_real` scores only the first n images — wrap-padded eval batches
    carry duplicates in the trailing slots (dataset.iter_batches
    wrap_if_short); slicing AFTER decode keeps the compiled shape stable.
    Returns (mean OKS, mean mAP, n_scored) — see score_decoded_poses."""
    out = mobilenet_v1.forward_jit(params, jnp.asarray(batch['image']), model_cfg)
    decoded = decode_batch(out['heatmap'], out['offset'],
                           out['displacement_fwd'], out['displacement_bwd'],
                           model_cfg.output_stride, decode_cfg)
    sl = slice(None) if n_real is None else slice(n_real)
    return score_decoded_poses(
        np.asarray(decoded.keypoint_coords)[sl],
        np.asarray(decoded.pose_scores)[sl],
        np.asarray(batch['keypoints'])[sl], model_cfg.output_stride)


def evaluate(dataset: PosenetDataset, train_cfg: TrainConfig, params,
             mesh: Optional[jax.sharding.Mesh] = None,
             eval_pose_metrics: bool = True) -> Dict[str, float]:
    """Standalone evaluation: loss + OKS/mAP over a dataset, no training.

    The same eval path the training loop runs per epoch (loss via the
    jitted eval step, pose metrics via decode + Hungarian/OKS/mAP —
    reference train.py:826-890 does this only inside its loop), exposed
    for `train.py --eval_only` and notebooks. Returns a flat dict:
    loss / heatmap_loss / offset_loss means, plus oks / mAP when
    eval_pose_metrics, plus n_images actually scored."""
    model_cfg = ModelConfig(model_id=train_cfg.model_id,
                            output_stride=train_cfg.output_stride,
                            compute_dtype=train_cfg.compute_dtype)
    decode_cfg = DecodeConfig(min_pose_score=0.25, score_threshold=0.25)
    # Per-item metrics so the report is an exact per-image mean: the
    # unsharded path keeps its final PARTIAL batch (weighted here by its
    # true size, not 1/n_batches), and the mesh path's wrap-around-padded
    # short batch carries duplicates in trailing slots (excluded here).
    eval_fn = ts.make_eval_step(model_cfg, train_cfg, mesh=mesh,
                                per_item=True)
    if mesh is not None:
        params = mesh_lib.replicate(params, mesh)

    loss_sums: Dict[str, float] = {}
    oks_sum = map_sum = 0.0
    n_images = 0
    n_scored = 0
    n_total = len(dataset)
    for batch in dataset.iter_batches(train_cfg.batch_size, shuffle=False,
                                      drop_remainder=mesh is not None,
                                      wrap_if_short=mesh is not None,
                                      augment=False):
        # shuffle=False + wrap_if_short's np.resize both preserve dataset
        # order, so the first `real` slots of every batch are the unique
        # not-yet-seen images and anything after is wrap padding.
        real = min(batch['image'].shape[0], n_total - n_images)
        device_batch = {'image': batch['image'],
                        'keypoints': batch['keypoints']}
        if mesh is not None:
            device_batch = mesh_lib.shard_batch(device_batch, mesh)
        per_item = eval_fn(params, device_batch)
        for k, v in per_item.items():
            loss_sums[k] = loss_sums.get(k, 0.0) + float(
                np.asarray(v)[:real].sum())
        n_images += real
        if eval_pose_metrics:
            # Weight by the number of SCOREABLE images in the batch, not
            # `real`: score_decoded_poses averages over scoreable images
            # only (no-GT/no-prediction images are excluded), so a
            # real-count weighting would skew the mean whenever the
            # scoreable fraction varies across batches.
            oks, ap, scored = evaluate_poses(params, batch, model_cfg,
                                             decode_cfg, n_real=real)
            oks_sum += oks * scored
            map_sum += ap * scored
            n_scored += scored

    report = {k: v / max(n_images, 1) for k, v in loss_sums.items()}
    report['n_images'] = n_images
    if eval_pose_metrics and n_images:
        report['oks'] = oks_sum / max(n_scored, 1)
        report['mAP'] = map_sum / max(n_scored, 1)
        report['n_scored'] = n_scored
    return report


def dump_visual_diagnostics(params, batch, dataset: PosenetDataset,
                            model_cfg: ModelConfig, decode_cfg: DecodeConfig,
                            output_dir: str, epoch: int):
    """Write predicted heatmap channels + keypoint overlays for one batch
    (the reference's per-step dumps, train.py:672-716 + visualizers.py,
    at a per-epoch cadence under `output_dir`)."""
    from posenet_tpu import visualizers

    out = mobilenet_v1.forward_jit(params, jnp.asarray(batch['image']),
                                   model_cfg)
    decoded = decode_batch(out['heatmap'], out['offset'],
                           out['displacement_fwd'], out['displacement_bwd'],
                           model_cfg.output_stride, decode_cfg)
    heatmaps = np.asarray(out['heatmap']).transpose(0, 3, 1, 2)  # (B,17,R,R)
    pose_scores = np.asarray(decoded.pose_scores)
    kp_scores = np.asarray(decoded.keypoint_scores)
    kp_coords = np.asarray(decoded.keypoint_coords)

    epoch_dir = os.path.join(output_dir, f'epoch_{epoch}')
    for b, fname in enumerate(batch['filenames']):
        stem = os.path.splitext(fname)[0]
        item_dir = os.path.join(epoch_dir, stem)
        visualizers.print_heatmap(heatmaps[b], output_dir=item_dir,
                                  use_matplotlib=False)
        image_path = os.path.join(dataset.image_dir, fname)
        # overlay on the original image: decode coords are in resized-input
        # px, so scale by original/resized per (y, x)
        import cv2
        orig = cv2.imread(image_path)
        if orig is None:
            continue
        scale = np.array([orig.shape[0] / batch['image'].shape[1],
                          orig.shape[1] / batch['image'].shape[2]])
        visualizers.draw_coordinates_to_image_file(
            image_path, os.path.join(item_dir, stem + '_keypoints.jpg'),
            pose_scores[b], kp_scores[b], kp_coords[b], scale,
            min_pose_score=0.25, min_part_score=0.25, image=orig)


def train(train_dataset: PosenetDataset,
          test_dataset: Optional[PosenetDataset],
          train_cfg: TrainConfig,
          logger: Optional[MetricLogger] = None,
          mesh: Optional[jax.sharding.Mesh] = None,
          params=None,
          resume: bool = True,
          eval_pose_metrics: bool = True) -> ts.TrainState:
    """Run the fine-tuning loop; returns the final TrainState."""
    logger = logger or MetricLogger()
    model_cfg = ModelConfig(model_id=train_cfg.model_id,
                            output_stride=train_cfg.output_stride,
                            compute_dtype=train_cfg.compute_dtype)
    if params is None:
        params = mobilenet_v1.init_params(
            jax.random.PRNGKey(train_cfg.seed), model_cfg)

    state, tx = ts.init_train_state(params, train_cfg)
    resumed = False
    if resume:
        restored = restore_checkpoint(train_cfg.checkpoint_dir, state)
        if restored is not None:
            state = restored
            resumed = True
            print(f'resumed from step {int(state.step)}')

    if mesh is not None:
        state = mesh_lib.replicate(state, mesh)
    step_fn = ts.make_train_step(tx, model_cfg, train_cfg, mesh=mesh)
    eval_fn = ts.make_eval_step(model_cfg, train_cfg, mesh=mesh)

    decode_cfg = DecodeConfig(min_pose_score=0.25, score_threshold=0.25)
    # Across restarts the best-so-far eval loss is persisted next to the
    # checkpoints; the early-stop patience counter restarts (documented —
    # it is not saved).
    best_val_loss = (_load_best_val_loss(train_cfg.checkpoint_dir)
                     if resumed else float('inf'))
    no_improve = 0

    # The reference DataLoader keeps the last partial batch (drop_last
    # defaults False); so do we. Unsharded, the remainder runs at its own
    # (constant across epochs) shape — one extra compile. Under a mesh,
    # jit in_shardings require mesh-divisible batches, so the remainder is
    # PADDED up to the full batch size with zero-weight wrap items
    # (train_step.pad_batch_to): exact true-batch gradients, one compiled
    # shape, no dropped data (pre-r5 behavior dropped it loudly).
    train_iter_kwargs = dict(drop_remainder=False)
    if mesh is not None and len(train_dataset) % train_cfg.batch_size:
        rem = len(train_dataset) % train_cfg.batch_size
        print(f'note: mesh-sharded training pads the {rem}-image epoch '
              f'remainder up to batch {train_cfg.batch_size} with '
              f'zero-weight items (exact gradients, one compiled shape)')

    for epoch in range(train_cfg.num_epochs):
        t0 = time.time()
        train_losses = []
        for batch in train_dataset.iter_batches(
                train_cfg.batch_size, shuffle=True,
                seed=train_cfg.seed + epoch, **train_iter_kwargs):
            # numpy leaves go straight to their final placement: device_put
            # with the data sharding (mesh) or the jit transfer (single
            # device) — a jnp.asarray here would upload the full batch to
            # device 0 first, doubling host->device traffic on the tunnel.
            device_batch = {'image': batch['image'],
                            'keypoints': batch['keypoints']}
            if mesh is not None:
                device_batch = mesh_lib.shard_batch(
                    ts.pad_batch_to(device_batch, train_cfg.batch_size),
                    mesh)
            state, m = step_fn(state, device_batch)
            train_losses.append(m)

        train_metrics = {k: float(np.mean([float(m[k]) for m in train_losses]))
                         for k in train_losses[0]} if train_losses else {}

        log = {'epoch': epoch, **{f'train_{k}': v for k, v in train_metrics.items()}}

        if test_dataset is not None:
            eval_losses = []   # (batch-mean loss, real item count) pairs
            oks_vals, map_vals = [], []
            # Under a mesh, the remainder batch is padded with zero-weight
            # items (same mechanism as training); the weighted-mean eval
            # step excludes the pads exactly. val_loss weights each batch
            # by its REAL item count, so it is the exact per-image mean.
            for batch in test_dataset.iter_batches(
                    train_cfg.batch_size, shuffle=False,
                    drop_remainder=False, augment=False):
                n_real = batch['image'].shape[0]
                device_batch = {'image': batch['image'],
                                'keypoints': batch['keypoints']}
                if mesh is not None:
                    device_batch = ts.pad_batch_to(device_batch,
                                                   train_cfg.batch_size)
                eval_losses.append((eval_fn(state.params, device_batch),
                                    n_real))
                if eval_pose_metrics:
                    # scored-count weighting: see evaluate() — per-batch
                    # means cover scoreable images only.
                    oks, ap, scored = evaluate_poses(state.params, batch,
                                                     model_cfg, decode_cfg)
                    oks_vals.append((oks, scored))
                    map_vals.append((ap, scored))
            val_loss = (sum(float(m['loss']) * n for m, n in eval_losses)
                        / sum(n for _, n in eval_losses))
            log['test_loss'] = val_loss
            n_scored = sum(s for _, s in oks_vals)
            if eval_pose_metrics and n_scored:
                log['oks'] = sum(v * s for v, s in oks_vals) / n_scored
                log['mAP'] = sum(v * s for v, s in map_vals) / n_scored

            # Early stopping (reference train.py:583-585,892-902) — but we
            # actually save the best model.
            if val_loss < best_val_loss:
                best_val_loss = val_loss
                no_improve = 0
                save_checkpoint(train_cfg.checkpoint_dir, state,
                                best_val_loss=val_loss)
            else:
                no_improve += 1
        else:
            save_checkpoint(train_cfg.checkpoint_dir, state)

        if (train_cfg.visual_every > 0
                and epoch % train_cfg.visual_every == 0):
            vis_ds = test_dataset if test_dataset is not None else train_dataset
            vis_gen = vis_ds.iter_batches(
                min(train_cfg.batch_size, len(vis_ds)), shuffle=False,
                drop_remainder=True)
            try:
                vis_batch = next(vis_gen)
            finally:
                vis_gen.close()  # retire the prefetch producer thread
            dump_visual_diagnostics(state.params, vis_batch, vis_ds,
                                    model_cfg, decode_cfg,
                                    train_cfg.output_dir, epoch)

        log['epoch_time_s'] = time.time() - t0
        logger.log(log, step=int(state.step))

        if test_dataset is not None and no_improve >= train_cfg.early_stop_patience:
            print(f'early stop at epoch {epoch} '
                  f'(no improvement for {no_improve} epochs)')
            break

    return state
