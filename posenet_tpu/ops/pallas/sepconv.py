"""Pallas TPU kernel: fused depthwise(3x3) + ReLU6 + pointwise(1x1) + ReLU6.

EXPERIMENTAL — correct, tested, and deliberately NOT wired into the
backbone. Round-2 measurements (v5e, batch 128, m101-s16 shapes) killed the
fusion hypothesis:

1. XLA:TPU ALREADY fuses each depthwise+pointwise pair into ONE fusion —
   the per-op profile of the production forward shows exactly one fusion
   per sep layer (e.g. six 33x33x512 fusions for the twelve L6..L12 conv
   ops), so the "intermediate activation round trip" this kernel was
   designed to eliminate does not exist in the compiled graph.
2. Isolated A/B (this kernel vs a jitted XLA dw+pw pair, best-of-3):
   L3 129x129x128: 2.54 vs 2.90 ms; L5 65x65x256: 1.84 vs 2.33;
   L7 33x33x512: 1.83 vs 1.80; L12 512->1024: 2.13 vs 2.85. Small wins —
   but only because the isolated XLA pair is layout-pessimized.
3. End-to-end, with this kernel at L3+L5+L12 inside the real backbone:
   32.7 ms vs 17.9 ms for pure XLA. In-network XLA picks non-row-major
   activation layouts for its convs (e.g. bf16[128,257,257,32]{0,3,2,1});
   a pallas_call forces row-major operands, so XLA inserts full transposes
   around every kernel boundary, which cost far more than the fusion saves.

Kept as a documented negative result and as the repo's reference for the
software-pipelined DMA pattern below; a future full-pallas backbone (no
XLA convs between kernels, one transpose at each end) is the only route
this design could win, and is not worth it at these model sizes.

v2 — software-pipelined: the v1 kernel issued `start(); wait()` around every
row-tile DMA, serializing memory and compute. Here the grid is flattened
to (B * row_tiles,) and each step prefetches the NEXT tile's input rows and
drains the PREVIOUS tile's output rows through multi-buffered scratch, so
the 9-tap depthwise + MXU pointwise of tile t runs concurrently with the
DMA of tiles t±1 — the kernel streams x in and y out at ~580 GB/s
(measured; a DMA-only variant of the same pipeline hits the same rate, so
the compute is fully hidden).

Scope: stride 1, dilation 1, 3x3 depthwise (the layers the stride->dilation
rewrite leaves at stride/rate 1 — most of the network at stride 16), C a
multiple of 128 (lane-dim DMA constraint; the C<128 layers fall back to
XLA). Numerics: float32 depthwise accumulation (+bias, ReLU6), bf16 cast,
MXU pointwise with f32 accumulation (+bias, ReLU6), bf16 out — at least as
precise as the production XLA bf16 path (which accumulates the depthwise in
bf16).

Mosaic constraints shaping the implementation (measured in v1):
- DMA slices on the tiled (second-to-last) dim must be 8-aligned, and
  stride-valid W = 16n+1 never is — so the row scratch buffers use the
  EXACT W so DMAs slice only the untiled leading dim.
- A DMA `wait()` must be built from the SAME descriptor as its `start()`
  (the expected byte count comes from the descriptor), so the issue/wait
  helpers mirror each other branch for branch.
- Horizontal halo is applied in registers: the left/right taps are
  zero-concat column shifts of the loaded rows.
- The (TR, W) -> TR*W collapse for the MXU needs a sublane-aligned W, so
  the accumulator is zero-padded to W8 = roundup(W, 8) before the reshape
  and the pad columns are dropped when writing the output scratch.
- Vertical halo: first/last row tiles get statically-sized DMA branches
  (H = 16n+1 never tiles evenly, and block index maps cannot express
  clamped offsets); halo rows outside the image are zeroed in VMEM (NO XLA
  pad — it costs a full extra x round trip through HBM).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sepconv_kernel(x_hbm, dw_w_ref, dw_b_ref, pw_w_ref, pw_b_ref, out_hbm,
                    x_bufs, y_bufs, in_sems, out_sems,
                    *, h: int, w: int, c_in: int, c_out: int, tr: int,
                    nt: int, n_steps: int, valid_w: int, out_w: int):
    i = pl.program_id(0)
    last_rows = h - (nt - 1) * tr          # rows computed by a last tile
    first_rows = min(tr + 1, h)            # input rows a first tile loads

    def for_each_load(step, slot, go):
        """Run go(copy_descriptor, is_first, rows) in the branch matching
        `step`'s tile; issue and wait use the same descriptors."""
        b = step // nt
        t = step % nt
        r0 = t * tr
        if nt == 1:
            go(pltpu.make_async_copy(
                x_hbm.at[b, pl.ds(0, h)],
                x_bufs.at[slot, pl.ds(1, h)], in_sems.at[slot]))
            return

        @pl.when(t == 0)
        def _first():
            go(pltpu.make_async_copy(
                x_hbm.at[b, pl.ds(0, first_rows)],
                x_bufs.at[slot, pl.ds(1, first_rows)], in_sems.at[slot]))

        if nt > 2:
            @pl.when((t > 0) & (t < nt - 1))
            def _middle():
                go(pltpu.make_async_copy(
                    x_hbm.at[b, pl.ds(r0 - 1, tr + 2)],
                    x_bufs.at[slot], in_sems.at[slot]))

        @pl.when(t == nt - 1)
        def _last():
            go(pltpu.make_async_copy(
                x_hbm.at[b, pl.ds(r0 - 1, last_rows + 1)],
                x_bufs.at[slot, pl.ds(0, last_rows + 1)], in_sems.at[slot]))

    def issue_load(step, slot):
        """Zero out-of-image halo rows, then start the row DMA."""
        b = step // nt
        t = step % nt
        if nt == 1:
            x_bufs[slot, 0, :, :] = jnp.zeros((w, c_in), x_bufs.dtype)
            if h + 1 < tr + 2:
                x_bufs[slot, pl.ds(h + 1, tr + 2 - (h + 1)), :, :] = (
                    jnp.zeros((tr + 2 - (h + 1), w, c_in), x_bufs.dtype))
        else:
            @pl.when(t == 0)
            def _zero_top():
                x_bufs[slot, 0, :, :] = jnp.zeros((w, c_in), x_bufs.dtype)

            @pl.when(t == nt - 1)
            def _zero_bottom():
                x_bufs[slot, last_rows + 1, :, :] = jnp.zeros(
                    (w, c_in), x_bufs.dtype)
        for_each_load(step, slot, lambda cp: cp.start())

    def for_each_store(step, slot, go):
        b = step // nt
        t = step % nt
        r0 = t * tr
        if nt == 1:
            go(pltpu.make_async_copy(
                y_bufs.at[slot, pl.ds(0, h)],
                out_hbm.at[b, pl.ds(0, h)], out_sems.at[slot]))
            return

        @pl.when(t < nt - 1)
        def _full():
            go(pltpu.make_async_copy(
                y_bufs.at[slot, pl.ds(0, tr)],
                out_hbm.at[b, pl.ds(r0, tr)], out_sems.at[slot]))

        @pl.when(t == nt - 1)
        def _tail():
            go(pltpu.make_async_copy(
                y_bufs.at[slot, pl.ds(0, last_rows)],
                out_hbm.at[b, pl.ds(r0, last_rows)], out_sems.at[slot]))

    # ---- pipeline: prologue load, steady-state prefetch ------------------
    @pl.when(i == 0)
    def _prologue():
        issue_load(0, 0)

    @pl.when(i + 1 < n_steps)
    def _prefetch():
        issue_load(i + 1, (i + 1) % 2)

    # ---- wait for this tile's rows ---------------------------------------
    slot = i % 2
    for_each_load(i, slot, lambda cp: cp.wait())

    # ---- depthwise 3x3: 9 shifted FMAs; horizontal halo in registers ----
    xt = x_bufs[slot, :, :, :]                    # (tr+2, W, C)
    if valid_w < w:
        # producer pad columns carry garbage (e.g. relu6(bias) from an XLA
        # conv); re-zero them so they act as conv zero padding
        col = jax.lax.broadcasted_iota(jnp.int32, (1, w, 1), 1)
        xt = jnp.where(col < valid_w, xt, jnp.zeros_like(xt))
    xt = xt.astype(jnp.float32)          # one convert; taps slice views
    zcol = jnp.zeros((tr + 2, 1, c_in), xt.dtype)
    shifted = (
        jnp.concatenate([zcol, xt[:, :w - 1, :]], axis=1),   # dx = -1
        xt,                                                  # dx = 0
        jnp.concatenate([xt[:, 1:, :], zcol], axis=1),       # dx = +1
    )
    acc = jnp.zeros((tr, w, c_in), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            tap = shifted[dx][dy:dy + tr, :, :]
            acc = acc + tap * dw_w_ref[dy * 3 + dx, :].astype(jnp.float32)
    acc = jnp.clip(acc + dw_b_ref[0, :], 0.0, 6.0).astype(jnp.bfloat16)

    # ---- pointwise on the MXU ---------------------------------------------
    y = jax.lax.dot_general(
        acc.reshape(tr * w, c_in), pw_w_ref[:, :],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    y = jnp.clip(y + pw_b_ref[0, :], 0.0, 6.0).astype(jnp.bfloat16)
    y = y.reshape(tr, w, c_out)
    # zero pad columns in the output (downstream kernels/convs rely on it)
    if valid_w < out_w:
        colo = jax.lax.broadcasted_iota(jnp.int32, (1, min(w, out_w), 1), 1)
        y = jnp.where(colo < valid_w, y[:, :min(w, out_w)],
                      jnp.zeros_like(y[:, :min(w, out_w)]))
    else:
        y = y[:, :out_w]
    if out_w > w:
        y = jnp.concatenate(
            [y, jnp.zeros((tr, out_w - w, c_out), y.dtype)], axis=1)

    # ---- store, double-buffered against the out DMA -----------------------
    @pl.when(i >= 2)
    def _drain_prev():
        # the DMA issued 2 steps ago writes from this y slot; it must be
        # done before the buffer is overwritten
        for_each_store(i - 2, slot, lambda cp: cp.wait())

    y_bufs[slot, :, :, :] = y
    for_each_store(i, slot, lambda cp: cp.start())

    # ---- epilogue: drain every outstanding out DMA ------------------------
    @pl.when(i == n_steps - 1)
    def _drain_own():
        for_each_store(i, slot, lambda cp: cp.wait())

    if n_steps > 1:
        @pl.when(i == n_steps - 1)
        def _drain_other():
            for_each_store(i - 1, (i + 1) % 2, lambda cp: cp.wait())


@functools.partial(jax.jit,
                   static_argnames=('tr', 'valid_w', 'out_w', 'interpret'))
def sepconv_pallas(x, dw_w, dw_b, pw_w, pw_b, tr: int = 32,
                   valid_w: int = None, out_w: int = None,
                   interpret: bool = False):
    """Fused stride-1 separable conv block, software-pipelined.

    Replaces the XLA pair relu6(conv1x1(relu6(depthwise3x3(x)))) for layers
    the stride->dilation plan leaves at stride 1 / rate 1 (reference
    mobilenet_v1.py:57-68). Requires C_in % 128 == 0 (Mosaic lane-dim DMA
    constraint) and W % 8 == 0 (tiled-dim DMA alignment); a caller wiring
    this in must zero-pad the width to the next multiple of 8 and pass the
    true width as `valid_w` (columns >= valid_w are ignored on read and
    garbage on write), falling back to XLA for layers that don't satisfy
    the channel constraint.

    Args:
      x: (B, H, W, C) bf16, W % 8 == 0. Columns >= `valid_w` are padding
        and are re-zeroed on load (so a producing XLA conv need not mask
        its output).
      dw_w: (3, 3, 1, C) HWIO depthwise kernel (bf16 or f32).
      dw_b: (C,) f32. pw_w: (1, 1, C, C2). pw_b: (C2,) f32.
      valid_w: number of real (image) columns; default W.
      out_w: physical output width (% 8 == 0, >= valid_w); columns >=
        valid_w of the output are zero. Default W.
    Returns (B, H, out_w, C2) bf16 with
    out[:, :, :valid_w] = relu6(pointwise(relu6(depthwise(x[:valid_w])))).
    """
    b, h, w, c_in = x.shape
    c_out = pw_w.shape[-1]
    valid_w = w if valid_w is None else valid_w
    out_w = w if out_w is None else out_w
    if w % 8 or out_w % 8:
        raise ValueError(f'W and out_w must be multiples of 8, got {w}, {out_w}')
    if c_in % 128:
        raise ValueError(
            f'sepconv_pallas requires C_in % 128 == 0 (full-lane DMA '
            f'constraint), got {c_in}; fall back to the XLA path')
    if x.dtype != jnp.bfloat16:
        raise ValueError(f'sepconv_pallas requires bf16 activations, '
                         f'got {x.dtype}')
    if not (0 < valid_w <= w and valid_w <= out_w):
        raise ValueError(f'bad valid_w {valid_w} for w={w}, out_w={out_w}')
    tr = min(tr, h)
    nt = max(1, -(-h // tr))
    n_steps = b * nt

    dw_flat = dw_w.reshape(9, c_in).astype(jnp.bfloat16)
    pw_flat = pw_w.reshape(c_in, c_out).astype(jnp.bfloat16)

    kernel = functools.partial(_sepconv_kernel, h=h, w=w, c_in=c_in,
                               c_out=c_out, tr=tr, nt=nt, n_steps=n_steps,
                               valid_w=valid_w, out_w=out_w)
    return pl.pallas_call(
        kernel,
        grid=(n_steps,),
        interpret=interpret,
        in_specs=[
            # pin to HBM: pl.ANY lets the compiler pick VMEM for small
            # inputs, and VMEM-side DMA slices need 8-aligned W
            pl.BlockSpec(memory_space=pl.ANY if interpret
                         else pltpu.MemorySpace.HBM),
            pl.BlockSpec((9, c_in), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_in), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_in, c_out), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_out), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY if interpret
                               else pltpu.MemorySpace.HBM),
        out_shape=jax.ShapeDtypeStruct((b, h, out_w, c_out), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((2, tr + 2, w, c_in), jnp.bfloat16),
            pltpu.VMEM((2, tr, out_w, c_out), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(x, dw_flat, dw_b.reshape(1, c_in).astype(jnp.float32),
      pw_flat, pw_b.reshape(1, c_out).astype(jnp.float32))
