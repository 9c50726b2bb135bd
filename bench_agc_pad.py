"""AGC channel-padding bench (VERDICT r4 #8): quantify the former
fallback cliff at a non-multiple-of-1024 channel count.

r4: a channel count off the fused kernel's 1024 gate silently ran the
masked-arithmetic XLA scan at unrecorded cost.  r5: `ops.agc.run` PADS
channels up to the gate instead (`pallas_fused_padded`).  This bench
measures, at C = 1536 (the VERDICT's example) plus the neighboring
gate-aligned counts, the per-block AGC time and which path ran — and,
for the record, the old fallback's cost via a forced XLA-scan run.

Writes BENCH_AGC_PAD_r05.json when AGC_PAD_OUT is set.
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

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from uhsdr_tpu.ops import agc as agc_mod

    T = 2048
    reps = 8
    params = agc_mod.make_params(12000.0, mode="med")
    probe = jax.jit(lambda a: jnp.mean(jnp.abs(a)) * jnp.ones(
        (4,), jnp.float32))
    rng = np.random.default_rng(0)
    rows = []

    def bench(C, force_scan=False):
        x = jax.device_put((rng.standard_normal((C, T)) * 800)
                           .astype(np.float32))
        bs = (1, C) if force_scan else (C,)
        state = jax.jit(lambda d: agc_mod.init_state(bs, params))(
            jnp.zeros((), jnp.float32))

        if force_scan:
            # the r4 fallback: a 3-D batch bypasses every kernel gate,
            # so run() takes the masked-arithmetic XLA scan
            def one(st, xx):
                y, st2 = agc_mod.run(params, st, xx[None])
                return y[0], st2
        else:
            def one(st, xx):
                return agc_mod.run(params, st, xx)

        @jax.jit
        def chained(state, x):
            def body(_, carry):
                st, acc = carry
                y, st2 = one(st, x)
                return st2, acc + jnp.mean(jnp.abs(y))
            _, acc = jax.lax.fori_loop(0, reps, body,
                                       (state, jnp.float32(0.0)))
            return acc

        np.asarray(probe(chained(state, x)))
        path = agc_mod.last_path
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(probe(chained(state, x)))
            best = min(best, (time.perf_counter() - t0) / reps)
        rate = C * T / best / 1e6
        row = {"channels": C, "path": path,
               "ms_per_block": round(best * 1e3, 3),
               "Msamples_per_s": round(rate, 1),
               "forced_scan": force_scan}
        rows.append(row)
        print(json.dumps(row))

    bench(1024)
    bench(1536)               # pads to 2048 (the r4 cliff case)
    bench(2048)
    bench(1536, force_scan=True)   # the r4 fallback, for the record

    out = {"note": "AGC stage alone, 12 kHz decimated rate, T=2048, "
                   "amortized protocol.  r5 pads off-gate channel "
                   "counts to the fused kernel's 1024 gate "
                   "(pallas_fused_padded) instead of falling back to "
                   "the masked-arithmetic XLA scan (forced_scan row = "
                   "the r4 behavior).",
           "rows": rows}
    path = os.environ.get("AGC_PAD_OUT")
    if path:
        with open(path, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
