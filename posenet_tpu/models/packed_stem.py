"""x-packed stem: MobileNet layers 0-2 without lane-padding waste.

Why this exists (measured, v5e, bf16, batch 128, 513x513):
The first trunk layers carry C=32 and C=64 activations at 257x257. TPU
bf16 tiling is (16, 128) over the two minor dims, so a (..., 32)-channel
NHWC tensor pads its lane dimension 32 -> 128 and every HBM byte is moved
4x (C=64: 2x). A bare relu copy of the (128,257,257,64) bf16 tensor
measures 5.3 ms — exactly the 2x-padded traffic at peak bandwidth — and
layers 0-1 alone cost 9.1 ms of the 18.2 ms trunk.

Fix: pack 4 (then 2) horizontally-adjacent pixels into the channel dim so
every stem tensor is exactly 128 lanes wide:

  P4 (after conv0, C=32): (B, H, 65, 128), channel = 32*p + c,
     pixel x = 4*x4 + p                       (phase-major, p = x mod 4)
  P2 (after pw1, C=64):   (B, H, 130, 128), channel = 64*p + c,
     pixel x = 2*x2 + p

and compute layers 0-2 natively in these layouts:
  - conv0 (3x3 s2) emits P4 directly: a (3, 9, 3, 128) kernel with
    stride (2, 8) computes all 4 phases of an output pack in one conv.
  - depthwise convs become sums of 9 shifted elementwise FMAs (exactly
    the dw FLOPs — no zero-tap inflation); x-shifts are channel-block
    slices in the phase-major layout, so XLA fuses the whole layer into
    one pass over a full-lane tensor.
  - pointwise convs become 1x1 convs with block-structured weights that
    also re-pack (P4 -> P2 -> unpacked); the interleave back to pixel
    order is a free row-major reshape.

Out-of-range lanes (x >= 257) are zeroed after every op, which is exactly
the 3x3 convs' zero padding as seen by the next layer.

Everything is plain XLA — no pallas. Weight re-arrangement happens inside
jit from the standard checkpoint pytree (zero format changes). Numerics:
same per-output-element sums as the reference convs
(/root/reference/posenet/models/mobilenet_v1.py:47-68) up to f32-accum
reassociation; the f32 parity path does not use the packed stem.

STATUS: measured NEGATIVE on v5e via XLA (correct but slower; OFF by
default — ModelConfig.packed_stem). Autopsy of every formulation tried
(all measured, batch 128, same session as the 11 ms plain-stem baseline):

1. This file's shift-FMA + block-weight convs: whole stem 76 ms. The
   profiler shows XLA:TPU materializes every shifted slice-FMA term as a
   full HBM pass (no loop fusion across pad/slice/concat chains), and the
   1x1 convs pick pathological layouts ({3,0,2,1} on the 256-ch tensor).
2. Packed convs via strided conv kernels: stride-(2,8) width-9 conv0
   never finished compiling (>9 min); stride-(2,4) width-5 compiles in
   155 s and runs 5.5 ms (slower than the plain conv0 it replaces).
3. XLA grouped convs on the packed full-lane tensors — (3,3,4,128)
   fgc=32: 9.1 ms; (3,2,2,128) fgc=64 stride (2,1): 8.9 ms; 1x1 128->256:
   6.2 ms. All ~4x over their traffic floors.
4. Channels-first flat (B,C,H,W) shift-FMA depthwise: 11.7 ms for one
   dw layer vs a 1.3 ms floor — same non-fusion failure.
5. Host relayout of the input into packed parity planes for a pallas
   stem kernel: 5.3 ms alone (minor-dim-3 transposes run ~10x off peak),
   which consumes the entire projected win.
6. In-kernel (Mosaic) relayout instead: `tpu.reshape` cannot lower a
   (260,32)->(65,128) sublane fold — unsupported; MXU identity-transpose
   per row costs more MXU passes than the whole conv.

The underlying measurement that motivated all this stands and is worth
keeping: a bare relu copy of the (128,257,257,64) bf16 tensor runs at
exactly 2x its logical traffic floor (5.28 ms vs 2.64), i.e. bf16 (16,128)
tiling pads C=64 lanes 2x and C=32 4x, and layers 0-1 cost 9.1 ms of the
18.2 ms trunk mostly in padded HBM traffic. The fix needs either an XLA
that fuses elementwise chains on TPU or a Mosaic with sublane-fold
relayouts; neither exists in this toolchain today.

ROUND-4 RE-PROBE (the VERDICT's "one probe at the last trunk lever" — a
fused multi-layer pallas dw+pw chain over the stem, zero XLA convs
between kernels). Design analysis first, then the measurement:

A chain spanning L1+L2 (the 257^2 C=32/64 block) has a ~1.4 ms
traffic+compute floor against ~9 ms of XLA cost — IF its HBM tensors are
lane-dense. The entry tensor is the blocker: conv0's (B,257,257,32)
output is physically lane-padded 4x in HBM no matter who reads it, so
the chain must start at the IMAGE (whose dense (B,H,W*3) layout the host
CAN provide for free) and therefore include conv0 (C_in=3: MXU-hostile,
VPU-affordable only in a channel-planar or interleaved-lane layout).
Either way, the pw convs need pixels-on-sublanes/channels-on-lanes for
the MXU, and the dw/conv0 taps need width-on-lanes — so SOME in-VMEM
lane<->sublane refold of (TR, W*C) <-> (TR*W, C) is unavoidable. That
refold is the single primitive everything hangs on.

Measured 2026-08-19 (tools/probe_mosaic_refold.py, real chip, current
toolchain): reshape (8,8192)->(2048,32) lane->sublane FAILS to lower
(Mosaic INTERNAL error), the inverse fold FAILS, a strided lane slice
x[:,:,0] of a (8,256,32) view FAILS; only the one-hot-matmul
de-interleave fallback compiles — and a per-channel one-hot pull of a
32-channel tile costs a (W*C, W) matmul per channel, a >30x FLOP
inflation that loses by construction. Conclusion unchanged and now
re-dated: the multi-layer pallas stem chain is blocked at the Mosaic
primitive level on this toolchain; re-probe (the tool is kept) only
after a libtpu/Mosaic upgrade.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _relu6(x):
    return jnp.clip(x, 0.0, 6.0)


def _conv0_packed(x, w, b):
    """Input conv 3x3 stride 2 -> P4. x (B, 513, 513, 3), w (3,3,3,32).

    The input is x-packed FIRST — pad cols 513 -> 520 and fold (8, 3) into
    24 channels, a free row-major reshape — so the packed conv is a plain
    stride-(2,1) kernel-(3,2) conv over the 65-wide pack grid. (The naive
    alternative, a stride-(2,8) width-9 kernel over the raw input, sent
    XLA:TPU compilation off a cliff: >9 min, never finished.)

    Output phase p at pack x4 is pixel x = 4*x4 + p, whose tap kxw sits at
    input col 8*x4 + 2p + kxw - 1 = pack x4 + kx - 1, lane dx:
    pos = 2p + kxw - 1; kx,dx = (0, pos+8) if pos < 0 else (1, pos)."""
    B, H, W, cin = x.shape
    c = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, 7), (0, 0)))           # W 513->520
    xp = xp.reshape(B, H, 65, 8 * cin)                          # lane = 3dx+c
    wk = jnp.zeros((3, 2, 8 * cin, 4 * c), w.dtype)
    for p in range(4):
        for kxw in range(3):
            pos = 2 * p + kxw - 1
            kx, dx = (0, pos + 8) if pos < 0 else (1, pos)
            wk = wk.at[:, kx, cin * dx:cin * (dx + 1),
                       c * p:c * (p + 1)].set(w[:, kxw])
    y = lax.conv_general_dilated(
        xp, wk.astype(x.dtype), window_strides=(2, 1),
        padding=[(1, 1), (1, 0)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=x.dtype)
    y = y + jnp.tile(b, 4).astype(y.dtype)
    return _relu6(y) * _mask_p4(y.shape, c, y.dtype)


def _mask_p4(shape, c, dtype):
    """Zero lanes whose pixel x = 4*x4 + p >= 257 (x4 = 64, p > 0)."""
    _, _, w4, ch = shape
    x4 = np.arange(w4)[:, None]
    p = np.arange(ch)[None, :] // c
    keep = (x4 * 4 + p) < 257
    return jnp.asarray(keep, dtype)


def _dw_p4(x, w, b):
    """Depthwise 3x3 stride 1 on P4 (C=32). w (3,3,1,32).

    Nine shifted FMAs; the x-shift by +-1 pixel is a channel-block rotation
    (phase p -> p+-1) with the wrapped phase pulled from the neighboring
    pack column."""
    B, H, W4, CH = x.shape
    c = CH // 4
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # x-shifted views at full height (H+2): S[d] holds pixel x + (d-1)
    s_m = jnp.concatenate([xp[:, :, 0:W4, 3 * c:], xp[:, :, 1:W4 + 1, :3 * c]],
                          axis=-1)
    s_0 = xp[:, :, 1:W4 + 1, :]
    s_p = jnp.concatenate([xp[:, :, 1:W4 + 1, c:], xp[:, :, 2:W4 + 2, :c]],
                          axis=-1)
    acc = jnp.zeros((B, H, W4, CH), jnp.float32)
    for dy in range(3):
        for dx, s in ((0, s_m), (1, s_0), (2, s_p)):
            wvec = jnp.tile(w[dy, dx, 0, :], 4).astype(jnp.float32)
            acc = acc + s[:, dy:dy + H].astype(jnp.float32) * wvec
    y = _relu6(acc + jnp.tile(b, 4).astype(jnp.float32)).astype(x.dtype)
    return y * _mask_p4(y.shape, c, y.dtype)


def _pw_p4_to_p2(x, w, b):
    """Pointwise 32->64 on P4, emitting P2. w (1,1,32,64).

    Output channel (parity, p', c') at pack j is pixel x = 4j + 2*parity
    + p', which reads input phase block 2*parity + p'. The (j, parity)
    interleave back to x2 order is a free row-major reshape."""
    B, H, W4, _ = x.shape
    cin, cout = w.shape[2], w.shape[3]
    blocks = []
    for parity in range(2):
        for p_out in range(2):
            p_in = 2 * parity + p_out
            col = jnp.zeros((4 * cin, cout), w.dtype)
            col = lax.dynamic_update_slice(col, w[0, 0], (p_in * cin, 0))
            blocks.append(col)
    wp = jnp.concatenate(blocks, axis=1)[None, None]            # (1,1,128,4*64)
    y = lax.conv_general_dilated(
        x, wp.astype(x.dtype), window_strides=(1, 1), padding='VALID',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=x.dtype)
    y = _relu6(y + jnp.tile(b, 4).astype(y.dtype))
    y = y.reshape(B, H, W4 * 2, 2 * cout)                       # (B,H,130,128)
    return y * _mask_p2(y.shape, cout, y.dtype)


def _mask_p2(shape, c, dtype):
    """Zero lanes whose pixel x = 2*x2 + p >= 257."""
    _, _, w2, ch = shape
    x2 = np.arange(w2)[:, None]
    p = np.arange(ch)[None, :] // c
    keep = (x2 * 2 + p) < 257
    return jnp.asarray(keep, dtype)


def _dw_p2_s2(x, w, b):
    """Depthwise 3x3 stride 2 on P2 (C=64) -> P2 at 129 rows. w (3,3,1,64).

    Output pixel xo = 2*x1 + q taps x = 2*xo + dx - 1; in the (x1, r)
    pair-of-packs view those are channel blocks of the same or previous
    pair column. y-stride-2 is a strided row slice."""
    B, H, W2, CH = x.shape
    c = CH // 2
    Hout = (H + 1) // 2  # 257 -> 129
    v = x.reshape(B, H, W2 // 2, 2 * CH)                        # (B,H,65,256)
    vp = jnp.pad(v, ((0, 0), (1, 1), (1, 1), (0, 0)))
    W1 = W2 // 2
    # per-(q, dx) source channel block (r, p) within the padded pair view
    #   q=0: dx=-1 -> (x1-1, r1 p1); dx=0 -> (x1, r0 p0); dx=+1 -> (x1, r0 p1)
    #   q=1: dx=-1 -> (x1, r0 p1);   dx=0 -> (x1, r1 p0); dx=+1 -> (x1, r1 p1)
    def src(q, dx):
        if q == 0 and dx == -1:
            return vp[:, :, 0:W1, 3 * c:4 * c]
        off = {(0, 0): 0, (0, 1): 1, (1, -1): 1, (1, 0): 2, (1, 1): 3}[(q, dx)]
        return vp[:, :, 1:W1 + 1, off * c:(off + 1) * c]

    outs = []
    for q in range(2):
        acc = jnp.zeros((B, Hout, W1, c), jnp.float32)
        for dy in range(3):
            for dx in (-1, 0, 1):
                s = src(q, dx)[:, dy:dy + 2 * Hout - 1:2]
                acc = acc + s.astype(jnp.float32) * w[dy, dx + 1, 0].astype(
                    jnp.float32)
        outs.append(acc)
    y = jnp.concatenate(outs, axis=-1) + jnp.tile(b, 2).astype(jnp.float32)
    y = _relu6(y).astype(x.dtype)                               # (B,129,65,128)
    x1 = np.arange(W1)[:, None]
    p = np.arange(CH)[None, :] // c
    keep = (2 * x1 + p) < 129
    return y * jnp.asarray(keep, y.dtype)


def _pw_p2_unpack(x, w, b, out_w):
    """Pointwise 64->128 on P2, emitting an UNPACKED NHWC tensor.

    w (1,1,64,128). Output pixel x = 2*x1 + q reads input phase block q;
    the (x1, q) interleave is again a free reshape, then the pad column is
    sliced off."""
    B, H, W1, CH = x.shape
    cin, cout = w.shape[2], w.shape[3]
    cols = []
    for q in range(2):
        col = jnp.zeros((2 * cin, cout), w.dtype)
        col = lax.dynamic_update_slice(col, w[0, 0], (q * cin, 0))
        cols.append(col)
    wp = jnp.concatenate(cols, axis=1)[None, None]              # (1,1,128,256)
    y = lax.conv_general_dilated(
        x, wp.astype(x.dtype), window_strides=(1, 1), padding='VALID',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=x.dtype)
    y = _relu6(y + jnp.tile(b, 2).astype(y.dtype))
    y = y.reshape(B, H, W1 * 2, cout)[:, :, :out_w]             # (B,129,129,128)
    return y


def packed_stem(params, x):
    """Layers 0-2 (conv0 s2, sep 32->64 s1, sep 64->128 s2) in packed
    layouts. x (B, 513, 513, 3) -> (B, 129, 129, 128), matching the plain
    path's plan[:3] prefix up to f32-accumulation reassociation.

    Only valid for the stock stride plan (layers 0-2 are stride 2/1/2 with
    rate 1 for every output_stride in {8,16,32}) and square-ish inputs
    whose W yields the 257 -> 129 chain; forward() falls back to the plain
    path otherwise."""
    l0, l1, l2 = params['backbone'][0], params['backbone'][1], params['backbone'][2]
    y = _conv0_packed(x, l0['w'], l0['b'])
    y = _dw_p4(y, l1['dw_w'], l1['dw_b'])
    y = _pw_p4_to_p2(y, l1['pw_w'], l1['pw_b'])
    y = _dw_p2_s2(y, l2['dw_w'], l2['dw_b'])
    y = _pw_p2_unpack(y, l2['pw_w'], l2['pw_b'], out_w=129)
    return y


def stem_applicable(x_shape, plan) -> bool:
    """Packed stem supports the stock 513x513 stem geometry."""
    if len(x_shape) != 4 or x_shape[1] != 513 or x_shape[2] != 513:
        return False
    s = [(l['conv_type'], l['stride'], l['rate']) for l in plan[:3]]
    return s == [('input', 2, 1), ('sep', 1, 1), ('sep', 2, 1)]
