"""MobileNetV1 backbone + PoseNet heads, TPU-native.

Functionally equivalent to the reference PyTorch model
(/root/reference/posenet/models/mobilenet_v1.py:130-162): a 14-layer
depthwise-separable CNN with ReLU6, depth multipliers 50/75/100/101,
output-stride control via stride->dilation rewriting, and four 1x1 conv
heads (17-ch sigmoid heatmap, 34-ch offsets, 2x32-ch displacements).

TPU-first design decisions (deliberately NOT a translation):

- **NHWC / HWIO everywhere.** XLA:TPU's native conv layout; also the layout
  the tfjs checkpoints ship in, so weight conversion is transpose-free for
  regular convs (the reference round-trips through OIHW,
  tfjs2pytorch.py:67-69).
- **Pure functions over pytrees.** `init_params` builds the parameter pytree;
  `forward(params, x)` is a jit-/vmap-/pjit-compatible pure function. No
  module objects in the compute path.
- **`lax.conv_general_dilated` with `feature_group_count`** for depthwise
  convs — one XLA op per layer; XLA fuses bias+ReLU6 into the conv epilogue.
- **Configurable compute dtype.** float32 (+HIGHEST precision) for bitwise
  parity with the reference; bfloat16 for MXU-rate inference.

Padding matches torch's symmetric integer padding
p = ((stride-1) + dilation*(k-1)) // 2 (reference mobilenet_v1.py:42-44),
so outputs agree element-for-element with the reference at every stride.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from posenet_tpu.config import ModelConfig

# Checkpoint names per depth multiplier (reference mobilenet_v1.py:71-76).
MOBILENET_V1_CHECKPOINTS = {
    50: 'mobilenet_v1_050',
    75: 'mobilenet_v1_075',
    100: 'mobilenet_v1_100',
    101: 'mobilenet_v1_101',
}

# Architecture tables: (conv_type, in_ch, out_ch, stride) per layer.
# conv_type 'input' = full 3x3 conv, 'sep' = depthwise 3x3 + pointwise 1x1.
# (reference mobilenet_v1.py:78-127; model 100 and 101 share the table and
# differ only in checkpoint weights, mobilenet_v1.py:137-142)
_ARCH_100 = [
    ('input', 3, 32, 2),
    ('sep', 32, 64, 1),
    ('sep', 64, 128, 2),
    ('sep', 128, 128, 1),
    ('sep', 128, 256, 2),
    ('sep', 256, 256, 1),
    ('sep', 256, 512, 2),
    ('sep', 512, 512, 1),
    ('sep', 512, 512, 1),
    ('sep', 512, 512, 1),
    ('sep', 512, 512, 1),
    ('sep', 512, 512, 1),
    ('sep', 512, 1024, 2),
    ('sep', 1024, 1024, 1),
]

_ARCH_75 = [
    ('input', 3, 24, 2),
    ('sep', 24, 48, 1),
    ('sep', 48, 96, 2),
    ('sep', 96, 96, 1),
    ('sep', 96, 192, 2),
    ('sep', 192, 192, 1),
    ('sep', 192, 384, 2),
    ('sep', 384, 384, 1),
    ('sep', 384, 384, 1),
    ('sep', 384, 384, 1),
    ('sep', 384, 384, 1),
    ('sep', 384, 384, 1),
    ('sep', 384, 384, 1),
    ('sep', 384, 384, 1),
]

_ARCH_50 = [
    ('input', 3, 16, 2),
    ('sep', 16, 32, 1),
    ('sep', 32, 64, 2),
    ('sep', 64, 64, 1),
    ('sep', 64, 128, 2),
    ('sep', 128, 128, 1),
    ('sep', 128, 256, 2),
    ('sep', 256, 256, 1),
    ('sep', 256, 256, 1),
    ('sep', 256, 256, 1),
    ('sep', 256, 256, 1),
    ('sep', 256, 256, 1),
    ('sep', 256, 256, 1),
    ('sep', 256, 256, 1),
]

ARCHS = {50: _ARCH_50, 75: _ARCH_75, 100: _ARCH_100, 101: _ARCH_100}

# Head name -> output channels (reference mobilenet_v1.py:151-154).
HEAD_CHANNELS = {
    'heatmap': 17,
    'offset': 34,
    'displacement_fwd': 32,
    'displacement_bwd': 32,
}


def stride_plan(model_id: int, output_stride: int) -> List[Dict[str, Any]]:
    """Rewrite nominal layer strides so the net's cumulative stride equals
    `output_stride`, converting later strides into growing dilation rates.

    Same semantics as the reference planner (mobilenet_v1.py:8-39): while the
    cumulative stride is below the target, layers keep their nominal stride;
    once it is reached, every further nominally-strided layer runs at stride 1
    and the dilation rate multiplies up instead.
    """
    current_stride = 1
    rate = 1
    plan = []
    for block_id, (conv_type, inp, outp, stride) in enumerate(ARCHS[model_id]):
        if current_stride == output_stride:
            layer_stride = 1
            layer_rate = rate
            rate *= stride
        else:
            layer_stride = stride
            layer_rate = 1
            current_stride *= stride
        plan.append(dict(
            block_id=block_id, conv_type=conv_type, inp=inp, outp=outp,
            stride=layer_stride, rate=layer_rate, cumulative_stride=current_stride,
        ))
    return plan


def torch_same_padding(kernel_size: int, stride: int, dilation: int) -> int:
    """Symmetric padding identical to the reference (mobilenet_v1.py:42-44)."""
    return ((stride - 1) + dilation * (kernel_size - 1)) // 2


# ---------------------------------------------------------------------------
# Parameter initialization
# ---------------------------------------------------------------------------

def _conv_init(key, kshape, fan_in, dtype):
    """Kaiming-uniform matching torch nn.Conv2d default init (bound = 1/sqrt(fan_in))."""
    kw, kb = jax.random.split(key)
    # torch kaiming_uniform(a=sqrt(5)) => bound = sqrt(6/((1+5)*fan_in)) = 1/sqrt(fan_in)
    bound = 1.0 / np.sqrt(fan_in)
    w = jax.random.uniform(kw, kshape, dtype, -bound, bound)
    b = jax.random.uniform(kb, (kshape[-1],), dtype, -bound, bound)
    return w, b


def init_params(key: jax.Array, cfg: ModelConfig) -> Dict[str, Any]:
    """Build the parameter pytree.

    Layout (all kernels HWIO):
      params['backbone'][i]:
        input layer:  {'w': (3,3,3,C), 'b': (C,)}
        sep layer:    {'dw_w': (3,3,1,C), 'dw_b': (C,), 'pw_w': (1,1,C,C2), 'pw_b': (C2,)}
      params['heads'][name]: {'w': (1,1,C_last,K), 'b': (K,)}
    """
    plan = stride_plan(cfg.model_id, cfg.output_stride)
    dtype = cfg.param_dtype
    layers = []
    for layer in plan:
        key, sub = jax.random.split(key)
        if layer['conv_type'] == 'input':
            w, b = _conv_init(sub, (3, 3, layer['inp'], layer['outp']),
                              fan_in=3 * 3 * layer['inp'], dtype=dtype)
            layers.append({'w': w, 'b': b})
        else:
            k1, k2 = jax.random.split(sub)
            dw_w, dw_b = _conv_init(k1, (3, 3, 1, layer['inp']),
                                    fan_in=3 * 3 * 1, dtype=dtype)
            pw_w, pw_b = _conv_init(k2, (1, 1, layer['inp'], layer['outp']),
                                    fan_in=layer['inp'], dtype=dtype)
            layers.append({'dw_w': dw_w, 'dw_b': dw_b, 'pw_w': pw_w, 'pw_b': pw_b})
    last_depth = plan[-1]['outp']
    heads = {}
    for name, ch in HEAD_CHANNELS.items():
        key, sub = jax.random.split(key)
        w, b = _conv_init(sub, (1, 1, last_depth, ch), fan_in=last_depth, dtype=dtype)
        heads[name] = {'w': w, 'b': b}
    return {'backbone': layers, 'heads': heads}


# ---------------------------------------------------------------------------
# Forward pass
# ---------------------------------------------------------------------------

_DN = ('NHWC', 'HWIO', 'NHWC')


def _conv2d(x, w, b, *, stride=1, dilation=1, groups=1, precision,
            accum_dtype=None):
    """Conv + bias. `accum_dtype` controls the conv output dtype: float32
    for parity/heads; None keeps the input dtype (bf16 end-to-end in the
    production path, halving HBM traffic between layers)."""
    k = w.shape[0]
    pad = torch_same_padding(k, stride, dilation)
    y = lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        rhs_dilation=(dilation, dilation),
        dimension_numbers=_DN,
        feature_group_count=groups,
        precision=precision,
        preferred_element_type=accum_dtype or x.dtype,
    )
    return y + b.astype(y.dtype)


def _relu6(x):
    return jnp.clip(x, 0.0, 6.0)


def _valid_h_out(vh: int, stride: int, dilation: int) -> int:
    """Output rows a 3x3 conv produces from `vh` valid input rows under
    torch-style symmetric padding (the same formula the conv itself obeys)."""
    p = torch_same_padding(3, stride, dilation)
    return (vh + 2 * p - dilation * 2 - 1) // stride + 1


def forward(params: Dict[str, Any], x: jax.Array, cfg: ModelConfig,
            precision=None, stop_trunk_gradient: bool = False,
            valid_h: int = None) -> Dict[str, jax.Array]:
    """Run backbone + heads.

    Args:
      params: pytree from `init_params` / the tfjs converter.
      x: (B, H, W, 3) float input in [-1, 1], H = W' = stride*n + 1.
      cfg: static model config (baked into the jit cache key).
      precision: lax precision for parity runs (None = fast TPU default).
      valid_h: if set, only the first `valid_h` input rows are real and the
        rest is bottom padding (the spatial-partition path pads H up to a
        multiple of the mesh). Rows at-or-below the boundary are zeroed
        before every 3x3 conv, which makes them indistinguishable from the
        convs' own implicit zero padding — so the first
        (valid_h-1)//stride+1 output rows are EXACTLY the unsharded result.
        Without this masking, pad rows turn into relu6(bias) != 0 after
        layer 1 and bleed into real rows within the receptive field.

    Returns:
      dict with NHWC heads: heatmap (B,R,R',17) after sigmoid, offset
      (B,R,R',34), displacement_fwd / displacement_bwd (B,R,R',32), where
      R = (H-1)/output_stride + 1 (reference mobilenet_v1.py:156-162).
    """
    plan = stride_plan(cfg.model_id, cfg.output_stride)
    # In float32 (parity) mode, accumulate in f32; in bf16 production mode
    # keep everything bf16 so inter-layer activations cost half the HBM
    # bandwidth (the quality headroom of ReLU6-bounded activations makes
    # bf16 rounding negligible for this model).
    x = _run_trunk(params, x, cfg, plan, precision=precision,
                   valid_h=valid_h)

    if stop_trunk_gradient:
        # Heads-only fine-tuning: cutting the gradient at the trunk boundary
        # lets XLA dead-code-eliminate the ENTIRE backbone backward pass
        # (the reference's requires_grad=False freezing has the same effect,
        # train.py:620-634; optax.masked alone still computes the unused
        # backbone grads).
        x = lax.stop_gradient(x)
        if x.dtype != jnp.float32:
            # bf16-trunk training: the head conv's weight gradient contracts
            # the f32 cotangent (heads accumulate f32) with these features,
            # and XLA's conv grad requires matching dtypes. Only this
            # training branch pays the upcast; inference keeps bf16 head
            # input (the HBM-cheap layout).
            x = x.astype(jnp.float32)

    return run_heads(params['heads'], x, precision=precision)


def run_heads(heads_params, feat, precision=None):
    """Fused 4-in-1 head conv + output dict — the ONE copy of the head
    contract (the bf16/f32 and quantized forwards both call it).

    Heads always accumulate in f32: offsets/displacements are regressed
    pixel values consumed by the decoder's coordinate math. All four 1x1
    heads run as ONE conv over concatenated output channels so the
    1024-ch trunk features are read from HBM once instead of four times
    (at batch 128 that is ~1 GB of traffic saved); results are channel
    slices. Numerically identical to separate convs — each output channel
    only contracts with its own kernel column."""
    head_order = ('heatmap', 'offset', 'displacement_fwd', 'displacement_bwd')
    w_all = jnp.concatenate([heads_params[n]['w'] for n in head_order], axis=-1)
    b_all = jnp.concatenate([heads_params[n]['b'] for n in head_order], axis=-1)
    all_heads = _conv2d(feat, w_all, b_all, precision=precision,
                        accum_dtype=jnp.float32).astype(jnp.float32)
    c0 = HEAD_CHANNELS['heatmap']
    c1 = c0 + HEAD_CHANNELS['offset']
    c2 = c1 + HEAD_CHANNELS['displacement_fwd']
    heatmap_logits = all_heads[..., :c0]
    return {
        'heatmap': jax.nn.sigmoid(heatmap_logits),
        'heatmap_logits': heatmap_logits,
        'offset': all_heads[..., c0:c1],
        'displacement_fwd': all_heads[..., c1:c2],
        'displacement_bwd': all_heads[..., c2:],
    }


def _run_trunk(params, x, cfg: ModelConfig, plan, precision=None,
               valid_h=None):
    """The 14-layer trunk — the ONE copy of the layer loop (forward and
    backbone_features both run it, so they cannot drift)."""
    accum = jnp.float32 if cfg.compute_dtype == jnp.float32 else None
    x = x.astype(cfg.compute_dtype)
    vh = valid_h

    def mask_pad_rows(x, vh):
        if vh is None or vh >= x.shape[1]:
            return x
        rows = lax.broadcasted_iota(jnp.int32, (x.shape[1], 1), 0)
        return x * (rows < vh).astype(x.dtype)[None, :, :, None]

    start_layer = 0
    if (cfg.packed_stem and cfg.compute_dtype == jnp.bfloat16
            and valid_h is None and precision is None):
        from posenet_tpu.models import packed_stem as _ps
        if _ps.stem_applicable(x.shape, plan):
            # Layers 0-2 in x-packed full-lane layouts: C=32/64 NHWC bf16
            # tensors pad lanes 4x/2x and cost ~9 of the trunk's 18 ms in
            # pure padded HBM traffic (see packed_stem.py).
            x = _ps.packed_stem(params, x)
            start_layer = 3

    for layer, p in zip(plan[start_layer:], params['backbone'][start_layer:]):
        x = mask_pad_rows(x, vh)
        if layer['conv_type'] == 'input':
            x = _relu6(_conv2d(x, p['w'], p['b'], stride=layer['stride'],
                               dilation=layer['rate'], precision=precision,
                               accum_dtype=accum))
        else:
            c_in = p['dw_w'].shape[-1]
            x = _relu6(_conv2d(x, p['dw_w'], p['dw_b'], stride=layer['stride'],
                               dilation=layer['rate'], groups=c_in,
                               precision=precision, accum_dtype=accum))
            x = _relu6(_conv2d(x, p['pw_w'], p['pw_b'], precision=precision,
                               accum_dtype=accum))
        if vh is not None:
            vh = _valid_h_out(vh, layer['stride'], layer['rate'])
        x = x.astype(cfg.compute_dtype)
    return x


def backbone_features(params, x, cfg: ModelConfig, precision=None):
    """Backbone trunk only (pre-head features), for debugging/feature taps.
    Same layer loop (and f32-parity accumulation rule) as forward()."""
    plan = stride_plan(cfg.model_id, cfg.output_stride)
    return _run_trunk(params, x, cfg, plan, precision=precision)


@functools.partial(jax.jit, static_argnames=('cfg', 'precision'))
def forward_jit(params, x, cfg: ModelConfig, precision=None):
    return forward(params, x, cfg, precision=precision)


def cast_params(params: Dict[str, Any], dtype) -> Dict[str, Any]:
    """Cast conv kernels to `dtype` (biases stay float32: they add into the
    float32/accum epilogue). Pre-casting once at load time removes the
    per-call f32->bf16 weight conversions and the f32 weight DMA traffic
    the profiler shows in the production path."""
    kernel_keys = {'w', 'dw_w', 'pw_w'}

    def cast_layer(layer):
        # biases explicitly f32 (not passthrough): a param_dtype=bf16 pytree
        # would otherwise carry bf16 biases into the f32-accum epilogue
        return {k: jnp.asarray(v, dtype if k in kernel_keys else jnp.float32)
                for k, v in layer.items()}

    return {
        'backbone': [cast_layer(l) for l in params['backbone']],
        'heads': {name: cast_layer(p) for name, p in params['heads'].items()},
    }
