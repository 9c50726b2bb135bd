import jax.numpy as jnp
import numpy as np

from uhsdr_tpu.nr import blanker


def _run(x, nb_setting=8):
    p = blanker.make_params(nb_setting)
    st = blanker.init_state(x.shape[:-1])
    y, _ = blanker.process_block(p, st, jnp.asarray(x))
    return np.asarray(y)


def test_blanker_removes_impulses():
    fs = 12000.0
    n = 1024
    t = np.arange(n) / fs
    clean = (1000.0 * np.sin(2 * np.pi * 650.0 * t)).astype(np.float32)
    dirty = clean.copy()
    impulse_pos = [300, 600, 900]
    for p in impulse_pos:
        dirty[p] += 8000.0
        dirty[p + 1] -= 3000.0

    y = _run(dirty[None])[0]
    # compensate the 13-sample delay
    y_al = y[blanker.DELAY:]
    ref = dirty[: len(y_al)]
    clean_al = clean[: len(y_al)]

    for p in impulse_pos:
        # skip impulses whose repair window falls in the first warmup frame
        if p < blanker.FRAME:
            continue
        win = slice(p - 4, p + 5)
        err_before = np.abs(ref[win] - clean_al[win]).max()
        err_after = np.abs(y_al[win] - clean_al[win]).max()
        assert err_after < 0.25 * err_before, (p, err_before, err_after)


def test_blanker_passes_clean_audio():
    fs = 12000.0
    n = 512
    t = np.arange(n) / fs
    clean = (1000.0 * np.sin(2 * np.pi * 650.0 * t)).astype(np.float32)
    y = _run(clean[None])[0]
    # steady-state region: output ~= delayed input
    y_al = y[256 + blanker.DELAY:]
    ref = clean[256: 256 + len(y_al)]
    rel = np.abs(y_al - ref).max() / 1000.0
    assert rel < 0.05, rel


def test_blanker_batched_channels():
    x = np.random.default_rng(0).normal(0, 100, (3, 256)).astype(np.float32)
    y = _run(x)
    assert y.shape == x.shape
    assert np.isfinite(y).all()


def test_rx_chain_with_blanker():
    import jax
    from uhsdr_tpu.chain import rx
    cfg = rx.RxConfig(mode="usb", bw_key="2P3KHZ", path_name="LPF",
                      nb_enable=True, block_len=2048)
    params = rx.make_params(cfg)
    state = rx.init_state(cfg, params, (2,))
    fs = 48000.0
    t = np.arange(2048) / fs
    iq = (0.4 * np.exp(2j * np.pi * 6700.0 * t)).astype(np.complex64)
    iqb = jnp.asarray(np.stack([iq, iq]))
    audio, state, _ = rx.process_block(cfg, params, state, iqb)
    assert np.isfinite(np.asarray(audio)).all()
