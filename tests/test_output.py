"""RX output stage: AF gain / mute / beep injection
(`audio_driver.c:2845-2941`, `softdds_addSingleTone`)."""
import jax.numpy as jnp
import numpy as np

from uhsdr_tpu.chain import output


def test_gain_and_clip():
    # unit-scale audio with explicit full scale 1.0 -> unity mapping
    p = output.make_params(af_gain=16, input_full_scale=1.0)
    st = output.init_state((2,))
    x = jnp.asarray(np.full((2, 256), 0.5, np.float32))
    y, st = output.output_block(p, st, x)
    np.testing.assert_allclose(np.asarray(y), 0.5, atol=1e-6)

    p2 = output.make_params(af_gain=30, input_full_scale=1.0)
    y2, _ = output.output_block(p2, st, x)
    assert np.all(np.asarray(y2) <= 1.0)        # saturating clamp
    assert np.asarray(y2).max() == 1.0


def test_chain_scale_default_does_not_saturate():
    """Default full scale is the firmware's int16 range: AGC-normalized
    chain audio (out_target ~= 4096, audio_agc.c:209-229) maps to ~1/8
    full scale instead of clipping every sample."""
    p = output.make_params(af_gain=16)
    st = output.init_state((2,))
    x = jnp.asarray(np.full((2, 256), 4096.0, np.float32))
    y, _ = output.output_block(p, st, x)
    np.testing.assert_allclose(np.asarray(y), 4096.0 / 32768.0, atol=1e-6)


def test_mute_per_channel():
    p = output.make_params(input_full_scale=1.0)
    st = output.init_state((2,))
    x = jnp.ones((2, 128), jnp.float32) * 0.3
    y, _ = output.output_block(p, st, x, mute=jnp.asarray([1.0, 0.0]))
    y = np.asarray(y)
    assert np.all(y[0] == 0.0)
    assert np.all(y[1] > 0.0)


def test_beep_tone_freq_and_phase_continuity():
    fs = 48000.0
    p = output.make_params(beep_freq_hz=1000.0, beep_volume=10, fs=fs,
                           input_full_scale=1.0)
    st = output.init_state(())
    x = jnp.zeros((480,), jnp.float32)
    blocks = []
    for _ in range(4):
        y, st = output.output_block(p, st, x, beep=True)
        blocks.append(np.asarray(y))
    y = np.concatenate(blocks)
    # one continuous 1 kHz sine, amplitude beep_level
    t = np.arange(len(y)) / fs
    ref = float(p.beep_level) * np.sin(2 * np.pi * 1000.0 * t)
    np.testing.assert_allclose(y, ref, atol=1e-3)
