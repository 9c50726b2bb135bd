import numpy as np
import jax.numpy as jnp

from uhsdr_tpu.chain import rx
from uhsdr_tpu.modems import freedv
from uhsdr_tpu.parallel import fleet


def test_mixed_mode_fleet():
    fs = 48000
    T = 4096
    configs = [
        rx.RxConfig(mode="usb", bw_key="2P3KHZ", path_name="LPF",
                    block_len=T),
        rx.RxConfig(mode="am", bw_key="2P9KHZ", block_len=T),
        rx.RxConfig(mode="fm", bw_key="5P0KHZ", block_len=T),
    ]
    # 12 channels: 6 usb, 4 am, 2 fm
    assignments = [0] * 6 + [1] * 4 + [2] * 2
    fl = fleet.ChannelFleet(configs, assignments)
    assert fl.group_sizes == {"usb/2P3KHZ": 6, "am/2P9KHZ": 4,
                              "fm/5P0KHZ": 2}
    t = np.arange(T) / fs
    z = (0.5 * np.exp(2j * np.pi * 6700 * t)).astype(np.complex64)
    i_p = np.broadcast_to(z.real, (12, T)).astype(np.float32)
    q_p = np.broadcast_to(z.imag, (12, T)).astype(np.float32)
    audio = fl.process_block(i_p, q_p)
    assert audio.shape == (12, T)
    # same-group channels identical; different groups differ
    np.testing.assert_allclose(audio[0], audio[5])
    assert not np.allclose(audio[0], audio[6])


def test_freedv_plumbing_loopback():
    fs = 48000
    T = 4800
    t = np.arange(T * 4) / fs
    tone = np.sin(2 * np.pi * 400 * t).astype(np.float32)
    iq = tone.astype(np.complex64)  # "modem signal" = real tone
    conv = freedv.RateConverter(T)
    modem = freedv.LoopbackModem()
    outs = []
    for k in range(4):
        y = freedv.freedv_rx_block(conv, modem,
                                   jnp.asarray(iq[None, k * T:(k + 1) * T]))
        outs.append(np.asarray(y)[0])
    y = np.concatenate(outs)[T:]
    # recovered 400 Hz tone at 48k
    spec = np.abs(np.fft.rfft(y * np.hanning(len(y))))
    pk = np.fft.rfftfreq(len(y), 1 / fs)[spec.argmax()]
    assert abs(pk - 400) < 10, pk
