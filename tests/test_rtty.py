import numpy as np
import jax.numpy as jnp
import pytest

from uhsdr_tpu.modems import rtty, rtty_text


def test_baudot_roundtrip():
    msg = "CQ DE UHSDR 599"
    codes = rtty_text.encode(msg)
    dec = rtty_text.BaudotDecoder()
    out = dec.push_codes(codes)
    assert out == msg


@pytest.mark.parametrize("atc", [False, True])
def test_rtty_loopback(atc):
    """text -> AFSK audio -> demodulate -> text."""
    fs = 12000.0
    params = rtty.make_params(fs=fs, baud=45.45, shift=170.0, atc=atc)
    msg = "RYRY CQ DE UHSDR"
    codes = rtty_text.encode(msg)
    bits = rtty_text.codes_to_bits(codes, params.one_bit)
    B = 6000
    pad = (-len(bits)) % B + B    # idle (mark) fill to a whole block
    bits = np.concatenate([bits, np.ones(pad, bool)])
    phase0 = jnp.zeros((1,), jnp.uint32)
    audio, _ = rtty.modulate(params, phase0, jnp.asarray(bits[None]))
    audio = np.asarray(audio)[0].astype(np.float32)
    rng = np.random.default_rng(0)
    audio = audio + 0.05 * rng.standard_normal(len(audio)).astype(np.float32)

    state = rtty.init_state((1,))
    dec = rtty_text.BaudotDecoder()
    n = (len(audio) // B) * B
    for k in range(0, n, B):
        bytes_out, nb, state = rtty.demodulate(
            params, state, jnp.asarray(audio[None, k:k + B]))
        dec.push_codes(np.asarray(bytes_out)[0])
    # trailing remainder block
    out = dec.push_codes([])
    assert msg in out, repr(out)
