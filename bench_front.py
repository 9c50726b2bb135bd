"""Direct standalone measurement of the front kernel (VERDICT r4 #2).

The roofline's dominant row (PERF.md "Front stage A") was previously an
in-chain residual: block total minus the directly-measured stages.  This
harness times `chain.rx.process_front` ALONE — the fused NCO + stage-A
decimating FIR + stage-B Hilbert-combine Pallas kernel plus its carry
bookkeeping — under the same amortized protocol as bench.py (INNER
chained calls inside one jit, state threading, data-dependent scalar
fetch as the only barrier).

The earlier "front fori harness compile pathology" (PERF.md:41-44) came
from donating the full RxState into a fori_loop that only updates the
front fields; this harness threads ONLY the front state (nco_phase,
front_carry, front2_carry) through the loop carry and leaves the rest of
RxState untouched, which compiles cleanly.

Usage:  python bench_front.py  [CHANNELS] [BLOCK]
Env:    FRONT_INNER (8), FRONT_STEPS (3), FRONT_IN_DTYPE (int16|f32),
        BENCH_IQ_RATE (96000), FRONT_PREC (default)
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from uhsdr_tpu.chain import rx

    C = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 16384
    inner = int(os.environ.get("FRONT_INNER", "8"))
    steps = int(os.environ.get("FRONT_STEPS", "3"))
    in_dtype = os.environ.get("FRONT_IN_DTYPE", "int16")
    iq_rate = float(os.environ.get("BENCH_IQ_RATE", "96000"))
    prec = os.environ.get("FRONT_PREC", "default")

    cfg = rx.RxConfig(mode="usb", bw_key="2P3KHZ", path_name="LPF",
                      translate_hz=12000.0, block_len=T, iq_rate=iq_rate,
                      front_prec=prec)
    params = rx.make_params(cfg)

    anchor = jax.device_put(np.zeros((), np.float32))
    mkstate = jax.jit(lambda d: rx.init_state(cfg, params, (C,)))

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(front_state, i_plane, q_plane):
        """inner chained front calls; only the front state threads."""
        nco_phase, front_carry, front2_carry = front_state
        base = mkstate_inner()

        def body(_, carry):
            ph, fc, f2c, acc = carry
            st = base._replace(nco_phase=ph, front_carry=fc,
                               front2_carry=f2c)
            iq = ((i_plane, q_plane) if i_plane.dtype == jnp.int16
                  else jax.lax.complex(i_plane, q_plane))
            zf, st2, _ = rx.process_front(cfg, params, st, iq)
            z0 = zf[0] if isinstance(zf, tuple) else zf
            acc = acc + jnp.mean(jnp.abs(z0))
            return st2.nco_phase, st2.front_carry, st2.front2_carry, acc

        ph, fc, f2c, acc = jax.lax.fori_loop(
            0, inner, body, (nco_phase, front_carry, front2_carry,
                             jnp.float32(0.0)))
        return (ph, fc, f2c), acc

    def mkstate_inner():
        return rx.init_state(cfg, params, (C,))

    probe = jax.jit(lambda a: jnp.mean(jnp.abs(a)) * jnp.ones((4,),
                                                              jnp.float32))

    rng = np.random.default_rng(0)
    i_np = rng.standard_normal((C, T)).astype(np.float32) * 0.1
    q_np = rng.standard_normal((C, T)).astype(np.float32) * 0.1
    if in_dtype == "int16":
        i_np = np.clip(np.round(i_np * 32767.0), -32767,
                       32767).astype(np.int16)
        q_np = np.clip(np.round(q_np * 32767.0), -32767,
                       32767).astype(np.int16)
    i_p = jax.device_put(i_np)
    q_p = jax.device_put(q_np)

    st0 = mkstate(anchor)
    fs = (st0.nco_phase, st0.front_carry, st0.front2_carry)
    for _ in range(2):
        fs, acc = step(fs, i_p, q_p)
        np.asarray(probe(acc))

    times = []
    for _ in range(steps):
        t0 = time.perf_counter()
        fs, acc = step(fs, i_p, q_p)
        checksum = float(np.asarray(probe(acc))[0])
        times.append(time.perf_counter() - t0)
    assert np.isfinite(checksum)
    per_block_ms = [t / inner * 1e3 for t in times]
    best = min(per_block_ms)
    msamps = C * T / (best / 1e3) / 1e6
    print(json.dumps({
        "metric": f"front kernel (stage A+B fused), {C}ch x {T} "
                  f"@{int(iq_rate)} Hz, {in_dtype}, prec={prec}",
        "per_block_ms": [round(t, 3) for t in per_block_ms],
        "best_ms": round(best, 3),
        "Msamples_per_s": round(msamps, 0),
    }))


if __name__ == "__main__":
    main()
