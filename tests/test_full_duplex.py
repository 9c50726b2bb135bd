"""Full-duplex system test: a fleet of CW transmitters -> channel
impairments (AWGN, per-channel gain) -> batched RX chain -> per-channel
text decode.

This is the whole-framework loop the reference can only do on real
hardware (TX audio loopback): keyer/envelope shaping (`cw_gen.c`), CW
modulator (`tx_processor.c:856`), RX translate+filter+demod chain
(`audio_driver.c:2603`), Goertzel keying detect + Guenther-timing text
decoder (`cw_decoder.c`).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from uhsdr_tpu.chain import rx, tx
from uhsdr_tpu.modems import cw, cw_text

FS = 48000.0


MESSAGES = [("CQ CQ", 18.0), ("TEST", 24.0), ("73 73", 30.0)]


def test_cw_fleet_tx_channel_rx_decode():
    rng = np.random.default_rng(7)

    # --- TX fleet: per-channel keying envelopes, padded to equal length ---
    envs = [cw_text.text_to_keying(msg, wpm, FS) for msg, wpm in MESSAGES]
    n = max(len(e) for e in envs)
    n = int(-(-n // 4096) * 4096) + 4096          # pad + tail silence
    keying = np.zeros((len(envs), n), np.float32)
    for c, e in enumerate(envs):
        keying[c, :len(e)] = e

    txc = tx.TxChain(tx.TxConfig(mode="cw", translate_hz=6000.0,
                                 cw_sidetone_hz=700.0, block_len=4096))
    tx_state = txc.init_state((len(envs),))
    iq_blocks = []
    for k in range(0, n, 4096):
        i_p, q_p, tx_state = txc(tx_state, jnp.asarray(keying[:, k:k + 4096]))
        iq_blocks.append(np.asarray(i_p) + 1j * np.asarray(q_p))
    iq = np.concatenate(iq_blocks, axis=-1)

    # --- channel: per-channel gain spread + AWGN ---
    gains = np.array([1.0, 0.5, 0.35], np.float32)[:, None]
    noise = 0.004 * (rng.standard_normal(iq.shape)
                     + 1j * rng.standard_normal(iq.shape))
    iq = (iq * gains + noise).astype(np.complex64)

    # --- RX fleet: CW chain, 700 Hz passband ---
    cfg = rx.RxConfig(mode="cw", bw_key="500HZ", path_name="750Hz",
                      translate_hz=6000.0, block_len=4096, agc_mode="fast")
    rxc = rx.RxChain(cfg)
    rx_state = rxc.init_state((len(envs),))
    fs_dec = cfg.fs_dec

    # blocksize 44 = 273 Hz decision cadence: the reference's menu range
    # is 8..128 (cw_decoder.h:11-13); 30 wpm dits are only ~5 blocks at
    # the default 88, too coarse for the Guenther gap classifier
    cw_params = cw.make_params(fs=fs_dec, target_freq=700.0,
                               blocksize=44, atc=True)
    cw_state = cw.init_state((len(envs),))
    # seed each decoder with its channel's configured speed, as the
    # reference seeds from the menu CW speed
    decoders = [cw_text.CwTextDecoder(fs_dec / cw_params.blocksize,
                                      nominal_wpm=wpm)
                for _, wpm in MESSAGES]

    texts = [""] * len(envs)
    tail = np.zeros((len(envs), 0), np.float32)   # blocksize remainder carry
    for k in range(0, n, 4096):
        _, rx_state, taps = rxc(rx_state, iq[:, k:k + 4096])
        buf = np.concatenate([tail, np.asarray(taps["audio_dec"])], axis=-1)
        m = (buf.shape[-1] // cw_params.blocksize) * cw_params.blocksize
        keyed, cw_state = cw.keying_detect(cw_params, cw_state,
                                           jnp.asarray(buf[..., :m]))
        tail = buf[..., m:]
        keyed = np.asarray(keyed)
        for c in range(len(envs)):
            texts[c] = decoders[c].push_keying(keyed[c])
    for c in range(len(envs)):
        # key-up timeout is 10*dash_avg blocks (~550 at this cadence)
        texts[c] = decoders[c].push_keying(np.zeros(2000, bool))

    for c, (msg, wpm) in enumerate(MESSAGES):
        got = texts[c].strip()
        assert msg.replace(" ", "") in got.replace(" ", ""), \
            (c, msg, wpm, got)
