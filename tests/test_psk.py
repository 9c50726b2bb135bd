import numpy as np
import jax.numpy as jnp
import pytest

from uhsdr_tpu.modems import psk, psk_text


def test_varicode_roundtrip():
    msg = "CQ de UHSDR psk31 test"
    bits = psk_text.encode_bits(msg)
    dec = psk_text.VaricodeDecoder()
    out = dec.push_bits(bits)
    assert msg in out, repr(out)


@pytest.mark.parametrize("speed", [31, 63])
def test_psk_loopback(speed):
    fs = 12000.0
    params = psk.make_params(fs=fs, speed=speed)
    msg = "KA7OEI"
    bits = psk_text.encode_bits(msg)
    signs, env = psk_text.bits_to_waveform_params(bits, params.rate)
    # pad to block multiple
    B = params.rate * 16
    pad = (-len(signs)) % B + B
    signs = np.concatenate([signs, np.ones(pad, np.float32)])
    env = np.concatenate([env, np.ones(pad, np.float32)])
    phase0 = jnp.zeros((1,), jnp.uint32)
    audio, _ = psk.modulate(params, phase0, jnp.asarray(signs[None]),
                            jnp.asarray(env[None]))
    audio = np.asarray(audio)[0]
    rng = np.random.default_rng(0)
    audio = (audio + 0.05 * rng.standard_normal(len(audio))).astype(np.float32)

    state = psk.init_state((1,), params)
    dec = psk_text.VaricodeDecoder()
    for k in range(0, len(audio), B):
        bits_out, state = psk.demodulate(params, state,
                                         jnp.asarray(audio[None, k:k + B]))
        dec.push_bits(np.asarray(bits_out)[0])
    out = dec.push_bits([])
    assert msg in out, repr(out)
