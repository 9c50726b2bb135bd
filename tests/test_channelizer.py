"""Polyphase channelizer conformance.

The analysis bank must equal, per channel m, the reference-style chain
"mix by exp(-j*2*pi*m/M * i) -> lowpass (same prototype) -> decimate M"
(`freq_shift.c` + `arm_fir_decimate_f32`, audio_driver.c:2744) sample-
exactly; the synthesis bank must equal the transposed direct form.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uhsdr_tpu.ops import channelizer, fir


def _direct_channel(h, x, m, M):
    """Direct form: mix down channel m, filter, decimate by M (streaming
    phase convention of fir_decimate_block: carry = taps-1 zeros)."""
    i = np.arange(x.shape[-1])
    mixed = x * np.exp(-2j * np.pi * m * i / M)
    carry = np.zeros(x.shape[:-1] + (h.size - 1,), np.complex64)
    y, _ = fir.fir_decimate_block(jnp.asarray(h), jnp.asarray(carry),
                                  jnp.asarray(mixed.astype(np.complex64)), M)
    return np.asarray(y)


@pytest.mark.parametrize("M,K,impl", [(8, 4, "matmul"), (8, 4, "fft"),
                                      (16, 6, "matmul")])
def test_analysis_matches_direct(M, K, impl):
    rng = np.random.default_rng(0)
    B = 8 * M
    x = (rng.standard_normal(B) + 1j * rng.standard_normal(B)).astype(np.complex64)
    bank = channelizer.AnalysisPfb(M, taps_per_branch=K, dft_impl=impl)
    y, _ = jax.jit(bank)(bank.init_state(), jnp.asarray(x))
    y = np.asarray(y)
    assert y.shape == (M, B // M)
    for m in range(M):
        ref = _direct_channel(bank.prototype, x, m, M)
        np.testing.assert_allclose(y[m], ref, atol=2e-5)


def test_analysis_streaming_continuity():
    """Two blocks through the bank == one concatenated block."""
    M, K, B = 8, 6, 64
    rng = np.random.default_rng(1)
    x = (rng.standard_normal(2 * B) + 1j * rng.standard_normal(2 * B)
         ).astype(np.complex64)
    bank = channelizer.AnalysisPfb(M, taps_per_branch=K)
    st = bank.init_state()
    y1, st = bank(st, jnp.asarray(x[:B]))
    y2, st = bank(st, jnp.asarray(x[B:]))
    y_once, _ = bank(bank.init_state(), jnp.asarray(x))
    np.testing.assert_allclose(
        np.concatenate([np.asarray(y1), np.asarray(y2)], axis=-1),
        np.asarray(y_once), atol=1e-5)


def test_analysis_batched():
    M, B, C = 8, 32, 3
    rng = np.random.default_rng(2)
    x = (rng.standard_normal((C, B)) + 1j * rng.standard_normal((C, B))
         ).astype(np.complex64)
    bank = channelizer.AnalysisPfb(M, taps_per_branch=4)
    y, _ = bank(bank.init_state((C,)), jnp.asarray(x))
    assert y.shape == (C, M, B // M)
    y0, _ = bank(bank.init_state(), jnp.asarray(x[1]))
    np.testing.assert_allclose(np.asarray(y)[1], np.asarray(y0), atol=1e-6)


def test_analysis_tone_lands_in_its_channel():
    """A tone at channel m's center comes out of channel m at DC with
    ~unit amplitude and is >60 dB down everywhere else."""
    M, K = 16, 12
    fs = 16e3 * M
    bank = channelizer.AnalysisPfb(M, taps_per_branch=K)
    n = np.arange(64 * M)
    m_tone = 5
    f = channelizer.channel_center_hz(m_tone, M, fs)
    x = np.exp(2j * np.pi * f / fs * n).astype(np.complex64)
    y, _ = bank(bank.init_state(), jnp.asarray(x))
    y = np.asarray(y)[:, 2 * K:]          # skip filter warm-up
    power = np.mean(np.abs(y) ** 2, axis=-1)
    assert power[m_tone] > 0.9
    others = np.delete(power, m_tone)
    assert others.max() < power[m_tone] * 1e-6


def _direct_synth(g, y, M):
    """sum_c exp(+j2pi c i/M) * (upsample_M(y_c) conv g), valid streaming
    phase (zero history)."""
    C, T = y.shape
    out = np.zeros(T * M, np.complex128)
    for c in range(C):
        up = np.zeros(T * M, np.complex128)
        up[::M] = y[c]
        full = np.convolve(up, g)[: T * M]   # zero history == 'full' head
        i = np.arange(T * M)
        out += full * np.exp(2j * np.pi * c * i / M)
    return out


def test_synthesis_matches_direct():
    M, K, T = 8, 4, 16
    rng = np.random.default_rng(3)
    y = (rng.standard_normal((M, T)) + 1j * rng.standard_normal((M, T))
         ).astype(np.complex64)
    bank = channelizer.SynthesisPfb(M, taps_per_branch=K)
    x, _ = jax.jit(bank)(bank.init_state(), jnp.asarray(y))
    ref = _direct_synth(bank.prototype, y, M)
    np.testing.assert_allclose(np.asarray(x), ref.astype(np.complex64),
                               atol=3e-5)


def test_synthesis_streaming_continuity():
    M, K, T = 8, 6, 24
    rng = np.random.default_rng(4)
    y = (rng.standard_normal((M, 2 * T)) + 1j * rng.standard_normal((M, 2 * T))
         ).astype(np.complex64)
    bank = channelizer.SynthesisPfb(M, taps_per_branch=K)
    st = bank.init_state()
    x1, st = bank(st, jnp.asarray(y[:, :T]))
    x2, st = bank(st, jnp.asarray(y[:, T:]))
    x_once, _ = bank(bank.init_state(), jnp.asarray(y))
    np.testing.assert_allclose(
        np.concatenate([np.asarray(x1), np.asarray(x2)]),
        np.asarray(x_once), atol=1e-5)


def test_round_trip_tone():
    """synthesis(analysis(x)) reproduces an in-band tone (scaled, delayed):
    check the output is a clean tone at the same frequency."""
    M, K = 16, 12
    bank_a = channelizer.AnalysisPfb(M, taps_per_branch=K)
    bank_s = channelizer.SynthesisPfb(M, taps_per_branch=K)
    n = np.arange(128 * M)
    f_norm = (3 + 0.2) / M                  # inside channel 3
    x = np.exp(2j * np.pi * f_norm * n).astype(np.complex64)
    y, _ = bank_a(bank_a.init_state(), jnp.asarray(x))
    xr, _ = bank_s(bank_s.init_state(), y)
    xr = np.asarray(xr)[4 * K * M:]         # skip both filters' warm-up
    spec = np.fft.fft(xr * np.hanning(xr.size))
    peak = np.argmax(np.abs(spec))
    f_est = peak / xr.size
    assert abs(f_est - f_norm) < 1.0 / M / 8
    # sidelobe check: everything 3 bins away from the peak is far down
    mask = np.ones(xr.size, bool)
    mask[max(0, peak - 3):peak + 4] = False
    snr = np.abs(spec[peak]) / (np.abs(spec[mask]).max() + 1e-12)
    assert snr > 300.0


def test_channel_center_hz():
    np.testing.assert_allclose(
        channelizer.channel_center_hz(np.arange(4), 4, 48000.0),
        [0.0, 12000.0, 24000.0, -12000.0])


def test_wideband_fleet_matches_per_channel_chains():
    """WidebandFleet (one wide stream -> bank -> chains) equals the same
    chains fed by direct per-channel mix+filter+decimate."""
    from uhsdr_tpu.chain import rx
    from uhsdr_tpu.parallel import fleet

    M, T = 8, 2048
    configs = [
        rx.RxConfig(mode="usb", bw_key="2P3KHZ", path_name="LPF", block_len=T),
        rx.RxConfig(mode="am", bw_key="2P9KHZ", block_len=T),
    ]
    counts = [5, 3]
    wf = fleet.WidebandFleet(configs, counts, taps_per_branch=6)

    rng = np.random.default_rng(7)
    B = M * T
    x = (rng.standard_normal(B) + 1j * rng.standard_normal(B)
         ).astype(np.complex64) * 0.2
    audio_wide = wf.process_block(x.real.astype(np.float32),
                                  x.imag.astype(np.float32))
    assert audio_wide.shape == (M, T)

    # direct: downconvert each channel with the same prototype, feed the
    # identical chains as a plain ChannelFleet
    h = wf.bank.prototype
    planes = np.stack([_direct_channel(h, x, m, M) for m in range(M)])
    cf = fleet.ChannelFleet(configs, [0] * 5 + [1] * 3)
    audio_direct = cf.process_block(planes.real.astype(np.float32),
                                    planes.imag.astype(np.float32))
    np.testing.assert_allclose(audio_wide, audio_direct, atol=2e-4)


def test_wideband_tx_fleet_places_channels():
    """Each TX channel's carrier lands at its channel center + translate
    offset in the wideband output."""
    from uhsdr_tpu.chain import tx
    from uhsdr_tpu.parallel import fleet

    M, T = 8, 4096
    fs_chan = 48000.0
    fs_wide = M * fs_chan
    cfg = tx.TxConfig(mode="cw", translate_hz=6000.0, block_len=T,
                      cw_sidetone_hz=700.0)
    wf = fleet.WidebandTxFleet([cfg], [M], taps_per_branch=8)

    key = np.ones((M, T), np.float32)      # CW key-down on all channels
    i_w, q_w = wf.process_block_device([jnp.asarray(key)])
    # second block: steady state
    i_w, q_w = wf.process_block_device([jnp.asarray(key)])
    x = np.asarray(i_w) + 1j * np.asarray(q_w)
    assert x.shape == (M * T,)
    spec = np.abs(np.fft.fft(x * np.hanning(x.size)))
    freqs = np.fft.fftfreq(x.size, 1.0 / fs_wide)
    # strongest peaks sit at m*fs_chan + translate + sidetone for each m
    for m in [0, 2, 5]:
        f_c = channelizer.channel_center_hz(m, M, fs_wide) + 6000.0 + 700.0
        win = np.abs(freqs - f_c) < 200.0
        assert spec[win].max() > 0.2 * spec.max(), m
