"""Training loss + DP train step tests (SURVEY.md §4: multi-chip logic
testable on CPU via device-count spoofing)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from posenet_tpu.config import ModelConfig, TrainConfig
from posenet_tpu.models import mobilenet_v1
from posenet_tpu.parallel import mesh as mesh_lib
from posenet_tpu.training import train_step as ts
from posenet_tpu.training.loss import (batched_loss, binary_disk_targets,
                                       heatmap_offset_loss,
                                       keypoint_validity,
                                       offset_targets_and_mask)


def test_keypoint_validity_sentinels():
    kp = jnp.array([[[0., 0.], [-1., -1.], [0., -1.], [5., 0.], [3., 4.]]])
    v = np.asarray(keypoint_validity(kp))[0]
    # both coords sentinel -> invalid; any real coord -> valid
    assert list(v) == [False, False, False, True, True]


def test_binary_disk_targets_geometry():
    kp = jnp.full((1, 17, 2), -1.0).at[0, 0].set(jnp.array([10., 12.]))
    disks = np.asarray(binary_disk_targets(kp, 33, 33, radius=3))
    assert disks.shape == (1, 17, 33, 33)
    assert disks[0, 1:].sum() == 0            # invalid keypoints -> empty
    d = disks[0, 0]
    assert d[10, 12] == 1 and d[13, 12] == 1 and d[10, 15] == 1
    assert d[14, 12] == 0                     # radius 3 boundary
    # disk area: cells with d2 <= 9
    yy, xx = np.mgrid[0:33, 0:33]
    expect = ((yy - 10) ** 2 + (xx - 12) ** 2 <= 9).sum()
    assert d.sum() == expect


def test_offset_targets_point_to_keypoint():
    kp = jnp.full((1, 17, 2), -1.0).at[0, 3].set(jnp.array([5., 7.]))
    off, mask = offset_targets_and_mask(kp, 33, 33, output_stride=16)
    off, mask = np.asarray(off), np.asarray(mask)
    # offset at the keypoint's own cell is 0; one cell over is ±stride
    np.testing.assert_allclose(off[0, 3, 5, 7], [0., 0.])
    np.testing.assert_allclose(off[0, 3, 4, 7], [16., 0.])
    np.testing.assert_allclose(off[0, 3, 5, 8], [0., -16.])
    # reference mask semantics: {gaussian > 0.1} (cells with d^2 <= 5 of
    # trunc(kp)) dilated by a Chebyshev-3 max_pool -> max(|e|) <= 5 minus
    # the four exact corners (loss.offset_targets_and_mask derivation)
    assert mask[0, 3, 5, 7] == 1 and mask[0, 3, 5, 12] == 1
    assert mask[0, 3, 5, 13] == 0             # |ex| = 6: outside reach
    assert mask[0, 3, 10, 12] == 0            # (5,5) corner excluded
    assert mask[0, 3, 10, 11] == 1            # (5,4) included
    assert mask[0, 2].sum() == 0              # invalid keypoint -> no mask


def test_loss_kernel_size_defaults_track_ground_truth():
    """The Gaussian kernel size parameterizes BOTH the GT heatmap sigma and
    the closed-form offset-loss mask; the loss-side defaults must be the
    single source of truth from ground_truth, not duplicated literals —
    otherwise changing GAUSSIAN_KERNEL_SIZE silently trains the offset mask
    against a different disk radius than the dataset's heatmaps."""
    import inspect

    from posenet_tpu.training import ground_truth, loss

    for fn, param in [(loss.offset_targets_and_mask, 'kernel_size'),
                      (loss.heatmap_offset_loss, 'gaussian_kernel_size'),
                      (loss.batched_loss, 'gaussian_kernel_size')]:
        default = inspect.signature(fn).parameters[param].default
        assert default == ground_truth.GAUSSIAN_KERNEL_SIZE, fn.__name__


@pytest.mark.parametrize('kernel_size', [7, 11, 15])
def test_offset_mask_matches_materialized_reference(kernel_size):
    """The closed-form mask must equal the reference pipeline materialized:
    Gaussian paste at trunc(kp) -> threshold > 0.1 -> (2r+1) max-pool
    dilation (reference train.py:86-97) — including FRACTIONAL keypoints
    with fractional part >= 0.5, where a round() center would shift the
    mask one cell (round-2 advisor finding)."""
    from scipy.ndimage import maximum_filter

    from posenet_tpu.training.ground_truth import gaussian_heatmaps

    h = w = 33
    radius = 3
    rng = np.random.RandomState(7)
    # deliberately include >= .5 fractional parts and border-adjacent cells
    kp_yx = np.stack([rng.uniform(0, h - 1, (2, 17)),
                      rng.uniform(0, w - 1, (2, 17))], axis=-1)
    kp_yx[0, 0] = [10.7, 12.5]
    kp_yx[0, 1] = [0.9, 31.6]
    kp_yx[1, 0] = [-1.0, -1.0]   # sentinel: no mask

    _, mask = offset_targets_and_mask(
        jnp.asarray(kp_yx, jnp.float32), h, w, output_stride=16,
        radius=radius, kernel_size=kernel_size)
    mask = np.asarray(mask)

    kp_xy = kp_yx[..., ::-1]
    gauss = gaussian_heatmaps(kp_xy, (h, w), kernel_size=kernel_size)
    binary = (gauss > 0.1).astype(np.float32)
    ref = maximum_filter(binary, size=(1, 1, 2 * radius + 1, 2 * radius + 1),
                         mode='constant', cval=0.0)
    valid = np.asarray(keypoint_validity(jnp.asarray(kp_yx, jnp.float32)))
    ref = ref * valid[..., None, None]
    np.testing.assert_array_equal(mask, ref)


def test_loss_decreases_with_correct_prediction():
    """A prediction matching the target must score lower than a wrong one."""
    h = w = 17
    kp = jnp.full((2, 17, 2), -1.0).at[0].set(
        jnp.asarray(np.random.RandomState(0).uniform(2, 14, (17, 2)), jnp.float32))
    disks = binary_disk_targets(kp, h, w)[0]  # (17,H,W) for pose 0
    good_logits = jnp.transpose((disks * 2 - 1) * 8.0, (1, 2, 0))
    bad_logits = -good_logits
    gt_off, _ = offset_targets_and_mask(kp, h, w, 16)
    good_off = jnp.concatenate(
        [jnp.transpose(gt_off[0, :, :, :, 0], (1, 2, 0)),
         jnp.transpose(gt_off[0, :, :, :, 1], (1, 2, 0))], axis=-1)

    good = heatmap_offset_loss(good_logits, good_off, kp, 16)
    bad = heatmap_offset_loss(bad_logits, jnp.zeros_like(good_off), kp, 16)
    assert float(good['loss']) < float(bad['loss'])
    assert float(good['heatmap_loss']) < 0.01


def test_train_step_heads_only_updates():
    model_cfg = ModelConfig(model_id=50, output_stride=16)
    train_cfg = TrainConfig(model_id=50, heads_only=True)
    params = mobilenet_v1.init_params(jax.random.PRNGKey(0), model_cfg)
    state, tx = ts.init_train_state(params, train_cfg)
    step = ts.make_train_step(tx, model_cfg, train_cfg)

    rng = np.random.RandomState(0)
    batch = {
        'image': jnp.asarray(rng.uniform(-1, 1, (2, 33, 33, 3)), jnp.float32),
        'keypoints': jnp.asarray(rng.uniform(0, 2, (2, 4, 17, 2)), jnp.float32),
    }
    new_state, metrics = step(state, batch)
    assert np.isfinite(float(metrics['loss']))
    # backbone frozen
    b0_old = np.asarray(params['backbone'][0]['w'])
    b0_new = np.asarray(new_state.params['backbone'][0]['w'])
    np.testing.assert_array_equal(b0_old, b0_new)
    # heads updated
    h_old = np.asarray(params['heads']['heatmap']['w'])
    h_new = np.asarray(new_state.params['heads']['heatmap']['w'])
    assert np.abs(h_new - h_old).max() > 0
    assert int(new_state.step) == 1


def test_train_step_bfloat16_mixed_precision():
    """--train_dtype bfloat16: bf16 frozen trunk, f32 master params/loss.
    The step must keep params f32, update only heads, and land within
    bf16-activation tolerance of the f32 step's loss."""
    rng = np.random.RandomState(2)
    batch = {
        'image': jnp.asarray(rng.uniform(-1, 1, (2, 33, 33, 3)), jnp.float32),
        'keypoints': jnp.asarray(rng.uniform(0, 2, (2, 4, 17, 2)), jnp.float32),
    }

    losses = {}
    states = {}
    for dtype in (jnp.float32, jnp.bfloat16):
        model_cfg = ModelConfig(model_id=50, output_stride=16,
                                compute_dtype=dtype)
        train_cfg = TrainConfig(model_id=50, compute_dtype=dtype)
        params = mobilenet_v1.init_params(jax.random.PRNGKey(3),
                                          ModelConfig(model_id=50,
                                                      output_stride=16))
        state, tx = ts.init_train_state(params, train_cfg)
        step = ts.make_train_step(tx, model_cfg, train_cfg)
        new_state, metrics = step(state, batch)
        losses[dtype] = float(metrics['loss'])
        states[dtype] = (params, new_state)

    assert np.isfinite(losses[jnp.bfloat16])
    # bf16 activations shift the loss by ulps of bf16, not more
    np.testing.assert_allclose(losses[jnp.bfloat16], losses[jnp.float32],
                               rtol=0.05)
    params, new_state = states[jnp.bfloat16]
    # master params stay float32 and the frozen trunk does not move
    assert new_state.params['heads']['heatmap']['w'].dtype == jnp.float32
    np.testing.assert_array_equal(
        np.asarray(params['backbone'][0]['w']),
        np.asarray(new_state.params['backbone'][0]['w']))
    h_old = np.asarray(params['heads']['heatmap']['w'])
    h_new = np.asarray(new_state.params['heads']['heatmap']['w'])
    assert np.abs(h_new - h_old).max() > 0


def test_train_step_dp_matches_single_device():
    """The 8-device DP step must produce the same update as single-device on
    the same global batch (the collective is a mean-preserving all-reduce)."""
    model_cfg = ModelConfig(model_id=50, output_stride=16)
    train_cfg = TrainConfig(model_id=50)
    params = mobilenet_v1.init_params(jax.random.PRNGKey(1), model_cfg)

    rng = np.random.RandomState(1)
    batch = {
        'image': jnp.asarray(rng.uniform(-1, 1, (8, 33, 33, 3)), jnp.float32),
        'keypoints': jnp.asarray(rng.uniform(0, 2, (8, 3, 17, 2)), jnp.float32),
    }

    state, tx = ts.init_train_state(params, train_cfg)
    single_step = ts.make_train_step(tx, model_cfg, train_cfg)
    s1, m1 = single_step(state, batch)

    mesh = mesh_lib.make_mesh(8)
    state_r = mesh_lib.replicate(state, mesh)
    batch_r = mesh_lib.shard_batch(batch, mesh)
    dp_step = ts.make_train_step(tx, model_cfg, train_cfg, mesh=mesh)
    s8, m8 = dp_step(state_r, batch_r)

    np.testing.assert_allclose(float(m1['loss']), float(m8['loss']), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_padded_dp_step_matches_true_batch():
    """An UNEVEN batch (10 items over 8 devices) padded with zero-weight
    wrap items must produce EXACTLY the true 10-item step: the weighted
    mean excludes the pads from loss and gradients, so mesh training can
    consume epoch remainders instead of dropping them."""
    model_cfg = ModelConfig(model_id=50, output_stride=16)
    train_cfg = TrainConfig(model_id=50)
    params = mobilenet_v1.init_params(jax.random.PRNGKey(1), model_cfg)

    rng = np.random.RandomState(2)
    batch = {
        'image': rng.uniform(-1, 1, (10, 33, 33, 3)).astype(np.float32),
        'keypoints': rng.uniform(0, 2, (10, 3, 17, 2)).astype(np.float32),
    }

    state, tx = ts.init_train_state(params, train_cfg)
    s_true, m_true = ts.make_train_step(tx, model_cfg, train_cfg)(
        state, batch)

    padded = ts.pad_batch_to(batch, 16)
    assert padded['image'].shape[0] == 16
    np.testing.assert_array_equal(padded['weights'],
                                  ([1.0] * 10 + [0.0] * 6))
    # pads wrap real items (no degenerate zero images)
    np.testing.assert_array_equal(padded['image'][10], batch['image'][0])

    mesh = mesh_lib.make_mesh(8)
    state_r = mesh_lib.replicate(state, mesh)
    batch_r = mesh_lib.shard_batch(padded, mesh)
    s_pad, m_pad = ts.make_train_step(tx, model_cfg, train_cfg, mesh=mesh)(
        state_r, batch_r)

    np.testing.assert_allclose(float(m_true['loss']), float(m_pad['loss']),
                               rtol=1e-6)
    for a, b in zip(jax.tree.leaves(s_true.params),
                    jax.tree.leaves(s_pad.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    # a batch can never be padded DOWN
    import pytest as _pytest
    with _pytest.raises(ValueError, match="padded down"):
        ts.pad_batch_to(batch, 8)


def test_graft_entry_dryrun():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_graft_entry_single():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert out.pose_scores.shape == (1, 10)
