"""Stream runner: multi-block scan == sequential per-block calls."""
import jax
import jax.numpy as jnp
import numpy as np

from uhsdr_tpu.chain import rx
from uhsdr_tpu.core import stream


def test_scan_blocks_matches_sequential():
    cfg = rx.RxConfig(mode="usb", bw_key="2P3KHZ", path_name="LPF",
                      block_len=1024)
    params = rx.make_params(cfg)

    def step(state, i_b, q_b):
        audio, new_state, _ = rx.process_block(
            cfg, params, state, jax.lax.complex(i_b, q_b))
        return audio, new_state

    fs = 48000.0
    n = 4096
    t = np.arange(n) / fs
    iq = (0.4 * np.exp(2j * np.pi * 6700.0 * t)).astype(np.complex64)
    i_p = np.real(iq)[None].astype(np.float32)
    q_p = np.imag(iq)[None].astype(np.float32)

    # sequential
    st = rx.init_state(cfg, params, (1,))
    seq_out = []
    for k in range(0, n, 1024):
        a, st = step(st, jnp.asarray(i_p[:, k:k + 1024]),
                     jnp.asarray(q_p[:, k:k + 1024]))
        seq_out.append(np.asarray(a))
    seq = np.concatenate(seq_out, axis=-1)

    # scanned
    runner = stream.StreamRunner(step)
    i_blocks, q_blocks = stream.chunk_capture(i_p, q_p, 1024)
    st2 = rx.init_state(cfg, params, (1,))
    outs, _ = runner.run(st2, i_blocks, q_blocks)
    scanned = np.asarray(outs)            # (4, 1, 1024)
    scanned = np.moveaxis(scanned, 0, -2).reshape(1, -1)

    # jit-of-scan refuses different op fusion than per-block jit; allow
    # float reassociation noise
    np.testing.assert_allclose(seq, scanned, rtol=1e-3, atol=1e-2)
