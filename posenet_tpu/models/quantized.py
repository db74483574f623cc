"""Int8 quantized serving path for the MobileNetV1 trunk.

**Status: correct, fully tested, and a measured NEGATIVE on TPU v5e via
XLA — do not enable there for speed.** Measured (batch 128, 513x513 m101
s16, fused forward+decode): 164 ms/batch quantized vs 25.4 ms bf16. The
per-layer autopsy (see CLAUDE.md round-2 outcomes):

- `lax.conv_general_dilated` with int8 operands compiles but ABORTS at
  runtime on this platform; only `lax.dot_general` s8xs8->s32 runs (and
  was verified bit-exact), so the pointwise convs here are matmuls.
- Even so, the int8 matmul is only ~1.18x bf16 at the best shape
  (K=512, N=1024) — nowhere near the 2x paper rate — and collapses at
  the early-layer shapes (257^2 spatial, K=64: 86 ms vs 7.6 ms bf16).
- The activation quantize/dequantize round+clip work on the VPU costs
  more than the halved HBM traffic saves at every single layer once the
  bf16 baseline is measured in its fused (dw+pw) form.

The module is kept because (a) the quantization scheme itself is the
interesting artifact — static, calibration-free, exact where it matters —
and transfers to hardware/toolchains where int8 does pay (int8-native
pallas kernels, other TPU generations, CPU serving), and (b) its tests pin
the numerics so a future backend can flip it on with confidence.

This is a TPU-native capability with no reference counterpart (the PyTorch
reference, /root/reference/posenet/models/mobilenet_v1.py, runs float32
end-to-end): an opt-in mode that halves the trunk's HBM traffic —
the measured bottleneck (see CLAUDE.md perf notes: ~8.6 GB of bf16
activation traffic per batch-128 against a ~10.5 ms bandwidth floor) — by
storing all inter-layer activations as int8 and running every pointwise
(1x1) conv as an s8 matmul.

Why this quantization scheme needs NO calibration and stays exact where it
matters:

- **Static activation range.** Every inter-layer tensor in MobileNetV1 is
  post-ReLU6, so its range is [0, 6] by construction. The affine map
  q = round(x * 254/6) - 127 uses the full signed-int8 range with
  zero-point -127; no data-dependent calibration pass exists to get wrong.
- **Pointwise convs have no padding**, so the zero-point correction is an
  exact per-output-channel constant:
      y[c] = sum_i x_i W[i,c] + b[c]
           = s_a * w_scale[c] * (acc[c] + 127 * colsum[c]) + b[c]
  with acc = q · qW in int32 on the MXU, colsum[c] = sum_i qW[i,c] folded
  at quantize time. No per-element zero-point arithmetic survives into the
  hot loop.
- **Depthwise convs stay bf16** (they are VPU work; int8 buys nothing on
  the MXU they never use) and dequantize their input on load. The dequant
  is elementwise BEFORE the conv's implicit zero padding, so pad cells are
  exact real-space zeros — the classic asymmetric-quantization padding bug
  cannot occur.
- **Weights are per-output-channel symmetric** (w_scale[c] = max|W[:,c]|/127),
  the standard MobileNet recipe.
- **Heads and decoder are untouched**: the last sep layer dequantizes
  straight to bf16, the four 1x1 heads accumulate in f32 exactly as the
  bf16 path does (mobilenet_v1.forward), and every decode stage downstream
  is byte-identical. Quantization noise enters ONLY through the trunk
  features.

"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax import lax

from posenet_tpu.config import ModelConfig
from posenet_tpu.models import mobilenet_v1
from posenet_tpu.models.mobilenet_v1 import _conv2d, _relu6, stride_plan

# Activation quantization constants: post-ReLU6 x in [0, 6] maps to
# q in [-127, 127] via q = round(x * QSCALE) + QZERO.
QSCALE = 254.0 / 6.0
QZERO = -127.0


def _quantize_act(y: jax.Array) -> jax.Array:
    """f32/bf16 post-ReLU6 activation -> s8. Arithmetic in f32: bf16's
    8 mantissa bits alias the 254-level grid and would double the
    quantization noise."""
    return (jnp.round(y.astype(jnp.float32) * QSCALE) + QZERO).astype(jnp.int8)


def _dequantize_act(q: jax.Array, dtype) -> jax.Array:
    """s8 -> real-valued activation in [0, 6]."""
    return ((q.astype(jnp.float32) - QZERO) * (1.0 / QSCALE)).astype(dtype)


def quantize_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """Fold a float parameter pytree (init_params / tfjs converter layout)
    into the int8 serving layout.

    Per sep layer the pointwise kernel becomes:
      pw_w8    (C_in, C_out) int8   symmetric per-output-channel
      pw_alpha (C_out,)      f32    s_a * w_scale[c]  (dequant multiplier)
      pw_corr  (C_out,)      int32  127 * sum_i qW[i, c]  (zero-point fold)
      pw_b     (C_out,)      f32
    The depthwise kernel/bias and the input conv stay bf16/f32. Heads are
    passed through untouched (mobilenet_v1.forward handles them).
    """
    backbone = []
    for p in params['backbone']:
        if 'w' in p:  # input conv
            backbone.append({'w': jnp.asarray(p['w'], jnp.bfloat16),
                             'b': jnp.asarray(p['b'], jnp.float32)})
            continue
        pw = jnp.asarray(p['pw_w'], jnp.float32)[0, 0]        # (CI, CO)
        w_scale = jnp.maximum(jnp.max(jnp.abs(pw), axis=0), 1e-12) / 127.0
        qw = jnp.round(pw / w_scale).astype(jnp.int8)          # (CI, CO)
        backbone.append({
            'dw_w': jnp.asarray(p['dw_w'], jnp.bfloat16),
            'dw_b': jnp.asarray(p['dw_b'], jnp.float32),
            'pw_w8': qw,
            'pw_alpha': (w_scale / QSCALE).astype(jnp.float32),
            'pw_corr': jnp.sum(qw.astype(jnp.int32), axis=0) * 127,
            'pw_b': jnp.asarray(p['pw_b'], jnp.float32),
        })
    heads = {name: {'w': jnp.asarray(hp['w'], jnp.bfloat16),
                    'b': jnp.asarray(hp['b'], jnp.float32)}
             for name, hp in params['heads'].items()}
    return {'backbone': backbone, 'heads': heads}


def _pw_int8(q: jax.Array, layer: Dict[str, Any]) -> jax.Array:
    """Quantized pointwise conv: (B, H, W, CI) s8 -> (B, H, W, CO) f32
    (bias added, pre-ReLU6). The 1x1 conv is a plain matmul on the int8
    MXU with int32 accumulation."""
    b, h, w, ci = q.shape
    acc = lax.dot_general(q.reshape(-1, ci), layer['pw_w8'],
                          (((1,), (0,)), ((), ())),
                          preferred_element_type=jnp.int32)      # (BHW, CO)
    y = (acc + layer['pw_corr']).astype(jnp.float32) * layer['pw_alpha'] \
        + layer['pw_b']
    return y.reshape(b, h, w, -1)


def forward_quantized(qparams: Dict[str, Any], x: jax.Array,
                      cfg: ModelConfig) -> Dict[str, jax.Array]:
    """Quantized trunk + float heads. Same contract as mobilenet_v1.forward
    (input (B, H, W, 3) in [-1, 1]; NHWC head dict out), minus the
    parity-mode knobs — this path exists only for bf16 serving.
    """
    plan = stride_plan(cfg.model_id, cfg.output_stride)
    n_layers = len(plan)

    # Input conv in bf16, then quantize its ReLU6 output once.
    p0 = qparams['backbone'][0]
    y = _relu6(_conv2d(x.astype(jnp.bfloat16), p0['w'], p0['b'],
                       stride=plan[0]['stride'], dilation=plan[0]['rate'],
                       precision=None))
    q = _quantize_act(y)

    for i in range(1, n_layers):
        layer, p = plan[i], qparams['backbone'][i]
        # Depthwise in bf16 on the dequantized input: dequant happens
        # before the conv's zero padding, so pad semantics are exact.
        xf = _dequantize_act(q, jnp.bfloat16)
        c_in = p['dw_w'].shape[-1]
        y = _relu6(_conv2d(xf, p['dw_w'], p['dw_b'], stride=layer['stride'],
                           dilation=layer['rate'], groups=c_in,
                           precision=None))
        y = _pw_int8(_quantize_act(y), p)
        y = jnp.clip(y, 0.0, 6.0)
        if i < n_layers - 1:
            q = _quantize_act(y)
        else:
            # Last sep layer feeds the heads: skip the final quantize so
            # head regression reads full-precision trunk features.
            feat = y.astype(jnp.bfloat16)

    # Heads: the ONE shared fused head conv (mobilenet_v1.run_heads) so
    # the quantized path cannot drift from the head contract.
    return mobilenet_v1.run_heads(qparams['heads'], feat)


@functools.partial(jax.jit, static_argnames=('cfg',))
def forward_quantized_jit(qparams, x, cfg: ModelConfig):
    return forward_quantized(qparams, x, cfg)
