import numpy as np
import jax.numpy as jnp

from uhsdr_tpu.modems import cw, cw_text


def test_text_to_keying_roundtrip_ideal():
    """Text -> keying envelope -> (block-rate bool) -> text."""
    fs = 12000.0
    blocksize = 88
    msg = "CQ CQ DE UHSDR " * 4
    wpm = 25
    env = cw_text.text_to_keying(msg, wpm, fs)
    nblk = len(env) // blocksize
    keying = env[: nblk * blocksize].reshape(nblk, blocksize).mean(-1) > 0.5
    dec = cw_text.CwTextDecoder(fs / blocksize)
    # append trailing silence to flush the last char
    keying = np.concatenate([keying, np.zeros(300, bool)])
    out = dec.push_keying(keying)
    assert "CQCQDEUHSDR" in out.replace(" ", ""), out


def test_keying_detect_on_tone():
    """CW audio tone bursts -> keying booleans."""
    fs = 12000.0
    params = cw.make_params(fs=fs, target_freq=700.0, thresh=1000.0)
    bs = params.blocksize
    # 200 blocks: tone on blocks 50..100
    nblk = 200
    t = np.arange(nblk * bs) / fs
    env = np.zeros(nblk * bs, np.float32)
    env[50 * bs:100 * bs] = 1.0
    audio = (200.0 * env * np.sin(2 * np.pi * 700 * t)).astype(np.float32)
    state = cw.init_state((1,))
    keying, state = cw.keying_detect(params, state, jnp.asarray(audio[None]))
    k = np.asarray(keying)[0]
    assert k[55:98].all()
    assert not k[:48].any()
    assert not k[105:].any()


def test_cw_full_loopback():
    """text -> keying -> tone -> keying_detect -> text decode."""
    fs = 12000.0
    msg = "PARIS PARIS PARIS PARIS PARIS"
    wpm = 22
    env = cw_text.text_to_keying(msg, wpm, fs)
    env = np.concatenate([env, np.zeros(int(fs), np.float32)])
    t = np.arange(len(env)) / fs
    audio = (300.0 * env * np.sin(2 * np.pi * 700 * t)).astype(np.float32)
    rng = np.random.default_rng(0)
    audio += 2.0 * rng.standard_normal(len(audio)).astype(np.float32)

    params = cw.make_params(fs=fs, target_freq=700.0, thresh=30000.0)
    bs = params.blocksize
    nblk = len(audio) // bs
    state = cw.init_state((1,))
    keying, state = cw.keying_detect(params, state,
                                     jnp.asarray(audio[None, : nblk * bs]))
    dec = cw_text.CwTextDecoder(fs / bs)
    out = dec.push_keying(np.asarray(keying)[0])
    assert "PARIS" in out.replace(" ", ""), out
