"""Pallas biquad-cascade kernel vs the XLA dilated-scan reference
(interpret mode on CPU; the kernel auto-interprets off-TPU)."""
import jax.numpy as jnp
import numpy as np
from scipy import signal as ss

from uhsdr_tpu.ops import iir as xiir
from uhsdr_tpu.pallas import iir as piir


def _sos(lo=300.0, hi=2700.0, fs=48000.0, order=4):
    sos = ss.butter(order, [lo / (fs / 2), hi / (fs / 2)], btype="band",
                    output="sos")
    return np.array([[s[0], s[1], s[2], s[4], s[5]] for s in sos],
                    np.float32)


def test_pallas_iir_matches_scan():
    sos = _sos()
    S = sos.shape[0]
    C, T = 8, 2048
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((C, T)).astype(np.float32))
    st = jnp.asarray(rng.standard_normal((S, C, 2)).astype(np.float32) * .1)

    y_ref, st_ref = xiir.biquad_cascade_block(sos, st, x)
    y_pal, st_pal = piir.biquad_cascade_pallas(sos, st, x, t_tile=512,
                                               c_tile=8)
    # different dilation tile boundaries reorder f32 accumulation —
    # compare absolutely (signal amplitude ~1)
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_pal),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(st_ref), np.asarray(st_pal),
                               atol=2e-3)


def test_pallas_iir_streaming_carry():
    # state threading: one big block == two streamed halves; also
    # exercises the multi-time-tile scratch carry inside one call
    sos = _sos(200, 3000, order=6)
    S = sos.shape[0]
    C, T = 8, 4096
    rng = np.random.default_rng(1)
    x = rng.standard_normal((C, T)).astype(np.float32)
    st0 = jnp.zeros((S, C, 2), jnp.float32)

    y_all, _ = piir.biquad_cascade_pallas(sos, st0, jnp.asarray(x),
                                          t_tile=512, c_tile=8)
    y1, st1 = piir.biquad_cascade_pallas(sos, st0,
                                         jnp.asarray(x[:, :T // 2]),
                                         t_tile=512, c_tile=8)
    y2, _ = piir.biquad_cascade_pallas(sos, st1,
                                       jnp.asarray(x[:, T // 2:]),
                                       t_tile=512, c_tile=8)
    y_stream = np.concatenate([np.asarray(y1), np.asarray(y2)], axis=-1)
    np.testing.assert_allclose(np.asarray(y_all), y_stream,
                               rtol=2e-4, atol=2e-4)


def test_rx_chain_iir_impl_pallas_matches_scan():
    from uhsdr_tpu.chain import rx
    rng = np.random.default_rng(2)
    C, T = 8, 2048
    iq = (rng.standard_normal((C, T)) +
          1j * rng.standard_normal((C, T))).astype(np.complex64) * 0.1

    outs = {}
    for impl in ("scan", "pallas"):
        cfg = rx.RxConfig(mode="usb", block_len=T, iir_impl=impl)
        params = rx.make_params(cfg)
        state = rx.init_state(cfg, params, (C,))
        audio, _, _ = rx.process_block(cfg, params, state, jnp.asarray(iq))
        outs[impl] = np.asarray(audio)
    np.testing.assert_allclose(outs["scan"], outs["pallas"],
                               rtol=1e-3, atol=1e-3)


def test_fused_blocked_cascade_matches_exact_carry():
    """`biquad_cascade_blocked_pallas` (fused Toeplitz+carry, one HBM
    pass) vs `biquad_cascade_blocked(exact_carry=True)` — same chunk
    tables, same sequential carry; must agree to f32 rounding on a
    reference-class high-Q cascade, including streaming continuity and
    flattened batch dims."""
    from uhsdr_tpu import data as refdata
    from uhsdr_tpu.ops.latconv import lattice_to_sos

    pk, pv = refdata.lattice("IIR_2k3_1k412")
    sos6 = lattice_to_sos(pk, pv)
    sos = np.array([[s[0], s[1], s[2], s[4], s[5]] for s in sos6],
                   np.float32)
    S = sos.shape[0]
    C, T = 16, 512
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((C, T)).astype(np.float32) * 0.1)
    st = jnp.asarray(rng.standard_normal((S, C, 2)).astype(np.float32) * .01)

    y_ref, st_ref = xiir.biquad_cascade_blocked(sos, st, x,
                                                exact_carry=True)
    y_pal, st_pal = piir.biquad_cascade_blocked_pallas(sos, st, x)
    err = np.max(np.abs(np.asarray(y_ref) - np.asarray(y_pal)))
    assert err < 1e-5, err
    np.testing.assert_allclose(np.asarray(st_ref), np.asarray(st_pal),
                               rtol=1e-5, atol=1e-6)

    # streaming continuity: two chained half blocks == one full block
    y1, st1 = piir.biquad_cascade_blocked_pallas(sos, st, x[:, :T // 2])
    y2, st2 = piir.biquad_cascade_blocked_pallas(sos, st1, x[:, T // 2:])
    np.testing.assert_allclose(
        np.concatenate([np.asarray(y1), np.asarray(y2)], axis=-1),
        np.asarray(y_pal), rtol=1e-5, atol=1e-5)

    # flattened batch dims take the same path
    y3, st3 = piir.biquad_cascade_blocked_pallas(
        sos, st.reshape(S, 4, 4, 2), x.reshape(4, 4, T))
    np.testing.assert_allclose(np.asarray(y3).reshape(C, T),
                               np.asarray(y_pal), rtol=1e-6, atol=1e-6)
