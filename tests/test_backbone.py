"""Backbone unit + golden parity tests (SURVEY.md §4, §7 step 3)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from posenet_tpu.config import ModelConfig
from posenet_tpu.models import mobilenet_v1

from tests import reference_oracle


def test_stride_plan_16():
    plan = mobilenet_v1.stride_plan(101, 16)
    # Nominal strides: 2,1,2,1,2,1,2,1,1,1,1,1,2,1 -> cumulative 16 reached at
    # layer 6; layer 12's nominal stride 2 becomes stride 1 and the dilation
    # rate doubles for the layers AFTER it (reference mobilenet_v1.py:19-26:
    # `layer_rate = rate; rate *= stride`).
    assert [l['stride'] for l in plan] == [2, 1, 2, 1, 2, 1, 2, 1, 1, 1, 1, 1, 1, 1]
    assert [l['rate'] for l in plan] == [1] * 13 + [2]
    assert plan[-1]['cumulative_stride'] == 16


def test_stride_plan_8():
    plan = mobilenet_v1.stride_plan(101, 8)
    assert [l['stride'] for l in plan] == [2, 1, 2, 1, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1]
    assert [l['rate'] for l in plan] == [1] * 7 + [2] * 6 + [4]


def test_stride_plan_32():
    plan = mobilenet_v1.stride_plan(101, 32)
    assert [l['stride'] for l in plan] == [2, 1, 2, 1, 2, 1, 2, 1, 1, 1, 1, 1, 2, 1]
    assert all(l['rate'] == 1 for l in plan)


def test_padding_math():
    # torch: p = ((stride-1) + dilation*(k-1)) // 2
    assert mobilenet_v1.torch_same_padding(3, 1, 1) == 1
    assert mobilenet_v1.torch_same_padding(3, 2, 1) == 1
    assert mobilenet_v1.torch_same_padding(3, 1, 2) == 2
    assert mobilenet_v1.torch_same_padding(3, 1, 4) == 4
    assert mobilenet_v1.torch_same_padding(1, 1, 1) == 0


@pytest.mark.parametrize("model_id,stride,size", [(50, 16, 65), (101, 16, 65)])
def test_output_shapes(model_id, stride, size):
    cfg = ModelConfig(model_id=model_id, output_stride=stride)
    params = mobilenet_v1.init_params(jax.random.PRNGKey(0), cfg)
    x = jnp.zeros((1, size, size, 3), jnp.float32)
    out = mobilenet_v1.forward(params, x, cfg)
    r = (size - 1) // stride + 1
    assert out['heatmap'].shape == (1, r, r, 17)
    assert out['offset'].shape == (1, r, r, 34)
    assert out['displacement_fwd'].shape == (1, r, r, 32)
    assert out['displacement_bwd'].shape == (1, r, r, 32)
    hm = np.asarray(out['heatmap'])
    assert (hm >= 0).all() and (hm <= 1).all()  # sigmoid applied in forward


@pytest.mark.skipif(not reference_oracle.has_reference(), reason="reference unavailable")
@pytest.mark.parametrize("model_id,stride,size", [
    (50, 16, 65),
    (75, 16, 65),
    (101, 16, 97),
    (101, 8, 65),
    (101, 32, 65),
    # NON-SQUARE inputs (the reference's canonical workloads are 1280x720
    # aspect): distinct H/W exercises per-axis output-grid math and the
    # asymmetric dilated padding at every layer.
    (101, 16, (97, 65)),
    (100, 8, (65, 33)),
])
def test_backbone_parity_vs_reference(model_id, stride, size):
    """4 head tensors must match the PyTorch reference <=1e-4 (SURVEY §7.3)."""
    cfg = ModelConfig(model_id=model_id, output_stride=stride)
    params = mobilenet_v1.init_params(jax.random.PRNGKey(42), cfg)

    h, w = (size, size) if isinstance(size, int) else size
    rng = np.random.RandomState(0)
    x_nchw = rng.uniform(-1, 1, size=(1, 3, h, w)).astype(np.float32)

    ref_heads = reference_oracle.reference_forward(params, x_nchw, model_id, stride)

    x_nhwc = jnp.asarray(x_nchw.transpose(0, 2, 3, 1))
    out = mobilenet_v1.forward(params, x_nhwc, cfg,
                               precision=jax.lax.Precision.HIGHEST)
    ours = (out['heatmap'], out['offset'], out['displacement_fwd'],
            out['displacement_bwd'])
    for name, ref, mine in zip(('heatmap', 'offset', 'dfwd', 'dbwd'), ref_heads, ours):
        mine_nchw = np.asarray(mine).transpose(0, 3, 1, 2)
        err = np.abs(mine_nchw - ref).max()
        assert err <= 1e-4, f"{name}: max abs err {err}"


@pytest.mark.skipif(not reference_oracle.has_reference(), reason="reference unavailable")
def test_converter_roundtrip_layout():
    """HWIO pytree -> torch OIHW -> same forward ensures the tfjs converter's
    layout rules (transpose-free regular kernels, (H,W,C,1)->(H,W,1,C)
    depthwise) are consistent with the reference's OIHW conversion."""
    from posenet_tpu.converter import tfjs2jax

    cfg = ModelConfig(model_id=50, output_stride=16)
    params = mobilenet_v1.init_params(jax.random.PRNGKey(7), cfg)

    # Build synthetic tfjs variables from our pytree, then convert back.
    variables = {}
    for i, layer in enumerate(params['backbone']):
        if 'w' in layer:
            variables['MobilenetV1/Conv2d_0/weights'] = np.asarray(layer['w'])
            variables['MobilenetV1/Conv2d_0/biases'] = np.asarray(layer['b'])
        else:
            variables[f'MobilenetV1/Conv2d_{i}_depthwise/depthwise_weights'] = (
                np.asarray(layer['dw_w']).transpose(0, 1, 3, 2))  # (H,W,1,C)->(H,W,C,1)
            variables[f'MobilenetV1/Conv2d_{i}_depthwise/biases'] = np.asarray(layer['dw_b'])
            variables[f'MobilenetV1/Conv2d_{i}_pointwise/weights'] = np.asarray(layer['pw_w'])
            variables[f'MobilenetV1/Conv2d_{i}_pointwise/biases'] = np.asarray(layer['pw_b'])
    for head, p in params['heads'].items():
        variables[f'MobilenetV1/{head}_2/weights'] = np.asarray(p['w'])
        variables[f'MobilenetV1/{head}_2/biases'] = np.asarray(p['b'])

    rebuilt = tfjs2jax.variables_to_pytree(variables, 50)
    flat_a = jax.tree_util.tree_leaves(params)
    flat_b = jax.tree_util.tree_leaves(rebuilt)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_npz_roundtrip(tmp_path):
    from posenet_tpu.converter import tfjs2jax

    cfg = ModelConfig(model_id=50, output_stride=16)
    params = mobilenet_v1.init_params(jax.random.PRNGKey(3), cfg)
    path = str(tmp_path / "ckpt.npz")
    tfjs2jax.save_params_npz(path, params)
    loaded = tfjs2jax.load_params_npz(path)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
