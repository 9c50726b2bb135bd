"""Two-channel audio modes (USE_TWO_CHANNEL_AUDIO):
DEMOD_IQ / DEMOD_SSBSTEREO (`audio_driver.c:2618,2770-2777`) and
SAM_SIDEBAND_STEREO (`audio_driver.c:2092-2095`).
"""
import jax
import jax.numpy as jnp
import numpy as np

from uhsdr_tpu.chain import rx

FS = 48000.0


def _tone_iq(freqs_hz, T, n_blocks, amps=None):
    """Complex IQ as a sum of positive/negative-frequency tones."""
    t = np.arange(T * n_blocks) / FS
    z = np.zeros_like(t, np.complex128)
    amps = amps or [1.0] * len(freqs_hz)
    for f, a in zip(freqs_hz, amps):
        z += a * np.exp(2j * np.pi * f * t)
    return z.astype(np.complex64)


def _run_blocks(cfg, z):
    params = rx.make_params(cfg)
    state = rx.init_state(cfg, params, ())
    step = jax.jit(lambda s, blk: rx.process_block(cfg, params, s, blk)[:2])
    T = cfg.block_len
    outs = []
    for b in range(len(z) // T):
        audio, state = step(state, jnp.asarray(z[b * T:(b + 1) * T]))
        outs.append(np.asarray(audio))
    return np.concatenate(outs, axis=-1)


def _dominant_hz(x, fs=FS):
    w = np.hanning(len(x))
    spec = np.abs(np.fft.rfft(x * w))
    spec[:4] = 0.0  # ignore DC
    return np.fft.rfftfreq(len(x), 1 / fs)[np.argmax(spec)]


def test_ssbstereo_separates_sidebands():
    # USB tone at +1000 Hz and LSB tone at -1500 Hz around the translate
    # carrier: ch0 must hear 1000 Hz, ch1 must hear 1500 Hz.
    cfg = rx.RxConfig(mode="ssbstereo", bw_key="2P7KHZ", block_len=2048,
                      translate_hz=6000.0, agc_mode="off")
    z = _tone_iq([6000.0 + 1000.0, 6000.0 - 1500.0], cfg.block_len, 8,
                 amps=[0.3, 0.3])
    audio = _run_blocks(cfg, z)
    assert audio.shape == (2, 8 * cfg.block_len)
    tail0 = audio[0, -4 * cfg.block_len:]
    tail1 = audio[1, -4 * cfg.block_len:]
    assert abs(_dominant_hz(tail0) - 1000.0) < 30.0
    assert abs(_dominant_hz(tail1) - 1500.0) < 30.0


def test_iq_mode_passthrough():
    # DEMOD_IQ: a +500 Hz complex tone lands as a 500 Hz quadrature pair
    # on L/R; check both channels carry the tone and are ~90 deg apart.
    cfg = rx.RxConfig(mode="iq", bw_key="10P0KHZ", block_len=2048,
                      translate_hz=6000.0)
    z = _tone_iq([6500.0], cfg.block_len, 8, amps=[0.3])
    audio = _run_blocks(cfg, z)
    assert audio.shape == (2, 8 * cfg.block_len)
    tail = audio[:, -4 * cfg.block_len:]
    assert abs(_dominant_hz(tail[0]) - 500.0) < 30.0
    assert abs(_dominant_hz(tail[1]) - 500.0) < 30.0
    # quadrature: I*Q integrates to ~0 relative to power
    p = np.mean(tail[0] * tail[1])
    e = np.sqrt(np.mean(tail[0] ** 2) * np.mean(tail[1] ** 2))
    assert abs(p) < 0.15 * e


def test_sam_stereo_channels():
    # AM carrier at the translate freq, one tone per sideband: after the
    # SAM PLL locks, ch0 (LSB) hears 600 Hz, ch1 (USB) hears 800 Hz.
    cfg = rx.RxConfig(mode="sam", sam_sideband="stereo", bw_key="4P6KHZ",
                      block_len=2048, translate_hz=6000.0)
    assert cfg.n_audio == 2
    z = _tone_iq([6000.0, 6000.0 + 800.0, 6000.0 - 600.0],
                 cfg.block_len, 10, amps=[0.5, 0.2, 0.2])
    audio = _run_blocks(cfg, z)
    assert audio.shape == (2, 10 * cfg.block_len)
    tail0 = audio[0, -4 * cfg.block_len:]
    tail1 = audio[1, -4 * cfg.block_len:]
    assert abs(_dominant_hz(tail0) - 600.0) < 30.0
    assert abs(_dominant_hz(tail1) - 800.0) < 30.0


def test_stereo_batched_and_stateful():
    # batched channels + block streaming both keep the (batch, 2, T) layout
    cfg = rx.RxConfig(mode="ssbstereo", bw_key="2P7KHZ", block_len=1024,
                      translate_hz=6000.0)
    params = rx.make_params(cfg)
    state = rx.init_state(cfg, params, (3,))
    z = _tone_iq([7000.0], cfg.block_len, 2, amps=[0.3])
    blk = jnp.broadcast_to(jnp.asarray(z[:cfg.block_len]), (3, cfg.block_len))
    audio, state2, taps = rx.process_block(cfg, params, state, blk)
    assert audio.shape == (3, 2, cfg.block_len)
    assert taps["audio_dec"].shape[:2] == (3, 2)
    # second block must thread state without shape errors
    audio2, _, _ = rx.process_block(cfg, params, state2, blk)
    assert audio2.shape == (3, 2, cfg.block_len)
