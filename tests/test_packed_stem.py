"""Packed-stem equivalence vs the plain layer 0-2 prefix.

The packed stem is a measured NEGATIVE on v5e (see
posenet_tpu/models/packed_stem.py docstring) and ships OFF by default;
this test pins its correctness so the artifact stays trustworthy for
backends where the layout win applies.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from posenet_tpu.config import ModelConfig
from posenet_tpu.models import mobilenet_v1 as M
from posenet_tpu.models import packed_stem as PS


def _plain_prefix(params, x, plan):
    for i, layer in enumerate(plan[:3]):
        p = params['backbone'][i]
        if layer['conv_type'] == 'input':
            x = M._relu6(M._conv2d(x, p['w'], p['b'], stride=layer['stride'],
                                   dilation=layer['rate'], precision=None))
        else:
            x = M._relu6(M._conv2d(x, p['dw_w'], p['dw_b'],
                                   stride=layer['stride'],
                                   dilation=layer['rate'],
                                   groups=layer['inp'], precision=None))
            x = M._relu6(M._conv2d(x, p['pw_w'], p['pw_b'], precision=None))
    return x


@pytest.mark.parametrize('output_stride', [8, 16])
def test_packed_stem_matches_plain_prefix(output_stride):
    cfg = ModelConfig(model_id=101, output_stride=output_stride)
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    plan = M.stride_plan(101, output_stride)
    assert PS.stem_applicable((2, 513, 513, 3), plan)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 513, 513, 3), jnp.float32)
    ref = jax.jit(lambda p, x: _plain_prefix(p, x, plan))(params, x)
    got = jax.jit(PS.packed_stem)(params, x)
    assert got.shape == ref.shape == (2, 129, 129, 128)
    # identical math up to f32-accumulation reassociation
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-6, rtol=1e-5)


def test_packed_stem_gate_in_forward():
    """forward(packed_stem=True) equals forward(packed_stem=False) in bf16
    (same math modulo accumulation order; compared loosely)."""
    import dataclasses
    cfg = dataclasses.replace(
        ModelConfig(model_id=50, output_stride=16),
        compute_dtype=jnp.bfloat16, packed_stem=True)
    cfg_plain = dataclasses.replace(cfg, packed_stem=False)
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    params = M.cast_params(params, jnp.bfloat16)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 513, 513, 3),
                           jnp.float32, -1.0, 1.0)
    a = M.forward(params, x, cfg)
    b = M.forward(params, x, cfg_plain)
    for k in a:
        np.testing.assert_allclose(
            np.asarray(a[k], np.float32), np.asarray(b[k], np.float32),
            atol=0.05, rtol=0.1)


def test_stem_applicable_gates():
    plan = M.stride_plan(101, 16)
    assert not PS.stem_applicable((2, 257, 257, 3), plan)   # wrong geometry
    assert not PS.stem_applicable((2, 513, 513), plan)      # wrong rank
