"""Mosaic probe: can TPU pallas lower lane<->sublane refolds today?

Context (VERDICT round-3 task 7 / CLAUDE.md backlog 7): every formulation
of a fused multi-layer pallas conv stage for the C=32/64 stem block dies
on ONE missing primitive — refolding a VMEM tile between the
"channels-interleaved-on-lanes" layout a dense HBM image buffer gives you
((TR, W*C), the only layout the host can provide for free) and the
"pixels-on-sublanes, channels-on-lanes" layout the MXU pointwise matmul
needs ((TR*W, C)). Round-3's packed-stem autopsy recorded "Mosaic cannot
lower sublane-fold reshapes" on that toolchain; this probe re-checks the
exact primitives on the CURRENT toolchain so the conclusion is a fresh
measurement, not a stale note:

  P1  reshape (TR, W*C) -> (TR*W, C)     lane->sublane fold, aligned W
  P2  reshape (TR*W, C) -> (TR, W*C)     sublane->lane fold (output side)
  P3  strided lane slice x[:, c::C]      the de-interleave alternative
  P4  one-hot matmul de-interleave       the always-lowers fallback, timed
                                         to bound what a workaround costs

Each probe compiles a minimal kernel, checks numerics vs numpy, and times
it standalone (dispatch-overhead dominated; only relative cost matters).
Run on the real chip: python tools/probe_mosaic_refold.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench(fn, x, n=30):
    import jax
    out = fn(x)  # compile
    np.asarray(out).ravel()[0]
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(x)
    np.asarray(out).ravel()[0]
    return (time.perf_counter() - t0) / n * 1e3


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    print("backend:", jax.devices(), flush=True)

    TR, W, C = 8, 256, 32  # aligned W; the real stem W=257 is harder still
    rng = np.random.RandomState(0)
    x_np = rng.randn(TR, W * C).astype(np.float32)
    x = jnp.asarray(x_np, jnp.bfloat16)

    results = {}

    # ---- P1: lane->sublane fold ------------------------------------------
    def k_fold(x_ref, o_ref):
        o_ref[:, :] = x_ref[:, :].reshape(TR * W, C)

    def p1(x):
        return pl.pallas_call(
            k_fold,
            in_specs=[pl.BlockSpec((TR, W * C), lambda: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((TR * W, C), lambda: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((TR * W, C), jnp.bfloat16),
        )(x)

    # ---- P2: sublane->lane fold (inverse) --------------------------------
    xf_np = x_np.reshape(TR * W, C)
    xf = jnp.asarray(xf_np, jnp.bfloat16)

    def k_unfold(x_ref, o_ref):
        o_ref[:, :] = x_ref[:, :].reshape(TR, W * C)

    def p2(x):
        return pl.pallas_call(
            k_unfold,
            in_specs=[pl.BlockSpec((TR * W, C), lambda: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((TR, W * C), lambda: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((TR, W * C), jnp.bfloat16),
        )(x)

    # ---- P3: strided lane slice (de-interleave one channel) --------------
    def k_stride(x_ref, o_ref):
        xv = x_ref[:, :].reshape(TR, W, C)
        o_ref[:, :] = xv[:, :, 0]

    def p3(x):
        return pl.pallas_call(
            k_stride,
            in_specs=[pl.BlockSpec((TR, W * C), lambda: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((TR, W), lambda: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((TR, W), jnp.bfloat16),
        )(x)

    # ---- P4: one-hot matmul de-interleave (fallback cost bound) ----------
    # (TR, W*C) @ onehot(W*C, W) pulling lanes c::C for one channel -> MXU.
    sel_np = np.zeros((W * C, W), np.float32)
    sel_np[np.arange(W) * C, np.arange(W)] = 1.0
    sel = jnp.asarray(sel_np, jnp.bfloat16)

    def k_onehot(x_ref, s_ref, o_ref):
        o_ref[:, :] = jax.lax.dot_general(
            x_ref[:, :], s_ref[:, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    def p4(x):
        return pl.pallas_call(
            k_onehot,
            in_specs=[pl.BlockSpec((TR, W * C), lambda: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((W * C, W), lambda: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((TR, W), lambda: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((TR, W), jnp.bfloat16),
        )(x, sel)

    probes = [
        ("P1 reshape lane->sublane (TR,W*C)->(TR*W,C)", p1, x,
         x_np.reshape(TR * W, C)),
        ("P2 reshape sublane->lane (TR*W,C)->(TR,W*C)", p2, xf,
         xf_np.reshape(TR, W * C)),
        ("P3 strided lane slice x[:,:,0] of (TR,W,C) view", p3, x,
         x_np.reshape(TR, W, C)[:, :, 0]),
        ("P4 one-hot matmul de-interleave (fallback)", p4, x,
         x_np.reshape(TR, W, C)[:, :, 0]),
    ]
    for name, fn, arg, want in probes:
        try:
            t0 = time.perf_counter()
            out = np.asarray(fn(arg), np.float32)
            compile_s = time.perf_counter() - t0
            # bf16 round-trip: compare against bf16-cast expectation
            want_bf = np.asarray(jnp.asarray(want, jnp.bfloat16), np.float32)
            exact = np.array_equal(out, want_bf)
            ms = bench(fn, arg)
            results[name] = (True, exact, compile_s, ms)
            print(f"{name}: LOWERS exact={exact} compile={compile_s:.1f}s "
                  f"call={ms:.3f}ms", flush=True)
        except Exception as e:
            results[name] = (False, False, 0.0, 0.0)
            msg = str(e).splitlines()[0][:160]
            print(f"{name}: FAILS ({type(e).__name__}: {msg})", flush=True)

    ok_fold = results.get(probes[0][0], (False,))[0]
    print("\nVERDICT:", "refolds LOWER — chain kernel worth building"
          if ok_fold else
          "refolds still unsupported — multi-layer stem chain remains "
          "blocked on this toolchain (autopsy stands)")


if __name__ == "__main__":
    main()
