"""Pallas TPU kernel: fused depthwise(3x3) + ReLU6 + pointwise(1x1) + ReLU6.

MobileNet's separable-conv blocks are HBM-bandwidth-bound on TPU: XLA runs
the depthwise and pointwise convs as separate kernels, writing and re-reading
the full intermediate activation (e.g. 1.08 GB at batch 128 for the 257x257
x64 layer). This kernel keeps the depthwise result in VMEM and feeds the MXU
pointwise matmul directly — one read of x, one write of y, nothing between.

Scope: stride 1, dilation 1, 3x3 depthwise (the layers the stride->dilation
rewrite leaves at stride/rate 1 — most of the network at stride 16).
Strided/dilated layers fall back to XLA. Numerics: float32 depthwise
accumulation (+bias, ReLU6), bf16 cast, MXU pointwise with f32 accumulation
(+bias, ReLU6), bf16 out — at least as precise as the production XLA bf16
path (which accumulates the depthwise in bf16).

Implementation notes (Mosaic constraints):
- DMA slices on the tiled (second-to-last) dim must be 8-aligned, and
  stride-valid W = 16n+1 never is — so the row scratch buffers use the
  EXACT W so DMAs slice only the untiled leading dim.
- Horizontal halo is applied in registers: the left/right taps are
  zero-concat column shifts of the loaded rows.
- The (TR, W) -> TR*W collapse for the MXU needs a sublane-aligned W, so
  the accumulator is zero-padded to W8 = roundup(W, 8) before the reshape
  and the pad columns are dropped when writing the output scratch.
- Vertical halo: grid (B, ceil(H/TR)); first/middle/last row tiles use
  statically-sized DMA branches (H = 16n+1 never tiles evenly, and block
  index maps cannot express clamped offsets).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sepconv_kernel(x_hbm, dw_w_ref, dw_b_ref, pw_w_ref, pw_b_ref, out_hbm,
                    x_rows, y_rows, in_sem, out_sem,
                    *, h: int, w: int, c_in: int, c_out: int, tr: int):
    b = pl.program_id(0)
    t = pl.program_id(1)
    nt = pl.num_programs(1)
    r0 = t * tr
    w8 = -(-w // 8) * 8

    # Static tile count (matches pl.num_programs(1)); branches whose slice
    # shapes would be statically invalid must not be traced at all.
    nt_static = max(1, -(-h // tr))
    last_rows = h - (nt_static - 1) * tr  # rows computed by the last tile

    # ---- load tr+2 input rows (vertical halo; zeros at image borders) ----
    if nt_static == 1:
        x_rows[0, :, :] = jnp.zeros((w, c_in), x_rows.dtype)
        if h + 1 < tr + 2:
            x_rows[pl.ds(h + 1, tr + 2 - (h + 1)), :, :] = jnp.zeros(
                (tr + 2 - (h + 1), w, c_in), x_rows.dtype)
        cp = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(0, h)], x_rows.at[pl.ds(1, h)], in_sem)
        cp.start()
        cp.wait()
    else:
        @pl.when(t == 0)
        def _first():
            x_rows[0, :, :] = jnp.zeros((w, c_in), x_rows.dtype)
            cp = pltpu.make_async_copy(
                x_hbm.at[b, pl.ds(0, tr + 1)], x_rows.at[pl.ds(1, tr + 1)],
                in_sem)
            cp.start()
            cp.wait()

        if nt_static > 2:
            @pl.when((t > 0) & (t < nt - 1))
            def _middle():
                cp = pltpu.make_async_copy(
                    x_hbm.at[b, pl.ds(r0 - 1, tr + 2)], x_rows, in_sem)
                cp.start()
                cp.wait()

        @pl.when((t == nt - 1) & (t > 0))
        def _last():
            x_rows[pl.ds(last_rows + 1, tr + 2 - (last_rows + 1)), :, :] = (
                jnp.zeros((tr + 2 - (last_rows + 1), w, c_in), x_rows.dtype))
            cp = pltpu.make_async_copy(
                x_hbm.at[b, pl.ds(r0 - 1, last_rows + 1)],
                x_rows.at[pl.ds(0, last_rows + 1)], in_sem)
            cp.start()
            cp.wait()

    # ---- depthwise 3x3: 9 shifted FMAs; horizontal halo in registers ----
    xt = x_rows[:, :, :]                          # (tr+2, W, C)
    zcol = jnp.zeros((tr + 2, 1, c_in), xt.dtype)
    shifted = (
        jnp.concatenate([zcol, xt[:, :w - 1, :]], axis=1),   # dx = -1
        xt,                                                  # dx = 0
        jnp.concatenate([xt[:, 1:, :], zcol], axis=1),       # dx = +1
    )
    acc = jnp.zeros((tr, w, c_in), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            tap = shifted[dx][dy:dy + tr, :, :].astype(jnp.float32)
            acc = acc + tap * dw_w_ref[dy * 3 + dx, :].astype(jnp.float32)
    acc = jnp.clip(acc + dw_b_ref[0, :], 0.0, 6.0).astype(jnp.bfloat16)

    # ---- pointwise on the MXU (pad W to a sublane multiple to collapse) --
    if w8 > w:
        acc8 = jnp.concatenate(
            [acc, jnp.zeros((tr, w8 - w, c_in), acc.dtype)], axis=1)
    else:
        acc8 = acc                                # (tr, w8, C)
    y = jax.lax.dot_general(
        acc8.reshape(tr * w8, c_in), pw_w_ref[:, :],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    y = jnp.clip(y + pw_b_ref[0, :], 0.0, 6.0).astype(jnp.bfloat16)
    y_rows[:, :, :] = y.reshape(tr, w8, c_out)[:, :w, :]

    # ---- store valid rows -------------------------------------------------
    @pl.when(t < nt - 1)
    def _store_full():
        cp = pltpu.make_async_copy(
            y_rows, out_hbm.at[b, pl.ds(r0, tr)], out_sem)
        cp.start()
        cp.wait()

    @pl.when(t == nt - 1)
    def _store_tail():
        cp = pltpu.make_async_copy(
            y_rows.at[pl.ds(0, last_rows)],
            out_hbm.at[b, pl.ds(r0, last_rows)], out_sem)
        cp.start()
        cp.wait()


@functools.partial(jax.jit, static_argnames=('tr', 'interpret'))
def sepconv_pallas(x, dw_w, dw_b, pw_w, pw_b, tr: int = 32,
                   interpret: bool = False):
    """Fused stride-1 separable conv block. EXPERIMENTAL — correct and
    tested, NOT wired into the backbone. Measured findings (v5e):
    - C must currently be a multiple of 128 (Mosaic rejects DMAs whose lane
      dim is a smaller full size), excluding the biggest win (layer 1,
      C=64 at 257x257).
    - At C=128 (129x129) the kernel ties XLA (~1.2 ms/b8) — XLA's conv
      pair is already near bandwidth-optimal here, so the VMEM fusion win
      did not materialize at these shapes.
    Kept as the starting point for the round-2 padded-width-layout plan
    (see CLAUDE.md), which targets the C=64 layer where the intermediate
    round trip is ~2.6 ms/batch128.

    Args:
      x: (B, H, W, C) bf16. W is padded to a multiple of 8 internally.
      dw_w: (3, 3, 1, C) HWIO depthwise kernel (bf16 or f32).
      dw_b: (C,) f32. pw_w: (1, 1, C, C2). pw_b: (C2,) f32.
    Returns (B, H, W, C2) bf16 — relu6(pointwise(relu6(depthwise(x)))).
    """
    b, h, w_in, c_in = x.shape
    w = -(-w_in // 8) * 8
    if w != w_in:
        # Right-pad with zeros: identical to conv zero padding for the
        # valid columns; padded output columns are sliced off below.
        x = jnp.pad(x, ((0, 0), (0, 0), (0, w - w_in), (0, 0)))
    c_out = pw_w.shape[-1]
    tr = min(tr, h)
    nt = max(1, -(-h // tr))

    dw_flat = dw_w.reshape(9, c_in).astype(jnp.bfloat16)
    pw_flat = pw_w.reshape(c_in, c_out).astype(jnp.bfloat16)

    kernel = functools.partial(_sepconv_kernel, h=h, w=w, c_in=c_in,
                               c_out=c_out, tr=tr)
    return pl.pallas_call(
        kernel,
        grid=(b, nt),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),           # x stays in HBM
            pl.BlockSpec((9, c_in), lambda b_, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_in), lambda b_, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_in, c_out), lambda b_, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_out), lambda b_, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),     # out stays in HBM
        out_shape=jax.ShapeDtypeStruct((b, h, w, c_out), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((tr + 2, w, c_in), jnp.bfloat16),
            pltpu.VMEM((tr, w, c_out), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )(x, dw_flat, dw_b.reshape(1, c_in).astype(jnp.float32),
      pw_flat, pw_b.reshape(1, c_out).astype(jnp.float32))[:, :, :w_in, :]
