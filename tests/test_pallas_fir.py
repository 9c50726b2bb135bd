"""Pallas decimating-FIR kernel vs the XLA reference (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np

from uhsdr_tpu.ops import fir as xfir
from uhsdr_tpu.pallas import fir as pfir


def test_pallas_fir_matches_xla():
    rng = np.random.default_rng(0)
    C, B, taps, decim = 8, 8192, 199, 4
    h = (rng.standard_normal(taps) +
         1j * rng.standard_normal(taps)).astype(np.complex64) * 0.05
    x = (rng.standard_normal((C, B)) +
         1j * rng.standard_normal((C, B))).astype(np.complex64)
    carry = jnp.zeros((C, taps - 1), jnp.complex64)

    y_ref, c_ref = xfir.fir_decimate_block(jnp.asarray(h), carry,
                                           jnp.asarray(x), decim)
    y_pal, c_pal = pfir.fir_decimate_pallas(h, carry, jnp.asarray(x),
                                            decim, tile_c=8, tile_t=512,
                                            interpret=True)
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_pal),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(c_ref), np.asarray(c_pal))


def test_pallas_fir_streaming_carry():
    rng = np.random.default_rng(1)
    C, B, taps, decim = 8, 4096, 89, 4
    h = rng.standard_normal(taps).astype(np.float32) * 0.05 + 0j
    h = h.astype(np.complex64)
    x = (rng.standard_normal((C, 2 * B)) +
         1j * rng.standard_normal((C, 2 * B))).astype(np.complex64)

    # one big block vs two streamed blocks must agree
    carry = jnp.zeros((C, taps - 1), jnp.complex64)
    y_all, _ = pfir.fir_decimate_pallas(h, carry, jnp.asarray(x), decim,
                                        tile_c=8, tile_t=512,
                                        interpret=True)
    c = jnp.zeros((C, taps - 1), jnp.complex64)
    y1, c = pfir.fir_decimate_pallas(h, c, jnp.asarray(x[:, :B]), decim,
                                     tile_c=8, tile_t=512, interpret=True)
    y2, c = pfir.fir_decimate_pallas(h, c, jnp.asarray(x[:, B:]), decim,
                                     tile_c=8, tile_t=512, interpret=True)
    y_stream = jnp.concatenate([y1, y2], axis=-1)
    np.testing.assert_allclose(np.asarray(y_all), np.asarray(y_stream),
                               atol=1e-4)


def test_pallas_fir_nco_fused():
    """Fused NCO+FIR kernel == mix -> fir, including streaming carry
    continuity (fused carry is raw IQ; unfused carry is mixed IQ)."""
    from uhsdr_tpu.ops import nco
    rng = np.random.default_rng(2)
    C, B, taps, decim = 8, 4096, 199, 4
    h = (rng.standard_normal(taps) +
         1j * rng.standard_normal(taps)).astype(np.complex64) * 0.05
    x = (rng.standard_normal((C, 2 * B)) +
         1j * rng.standard_normal((C, 2 * B))).astype(np.complex64)
    delta = nco.freq_to_delta(-6000.0, 48000.0)
    d_arr = jnp.full((C,), jnp.uint32(delta))

    # reference: mix then unfused kernel, streamed over two blocks
    ph = jnp.zeros((C,), jnp.uint32)
    c = jnp.zeros((C, taps - 1), jnp.complex64)
    ys = []
    for blk in (x[:, :B], x[:, B:]):
        zm, ph = nco.mix(jnp.asarray(blk), ph, d_arr)
        y, c = pfir.fir_decimate_pallas(h, c, zm, decim, tile_c=8,
                                        tile_t=512, interpret=True)
        ys.append(y)
    y_ref = jnp.concatenate(ys, axis=-1)

    # fused: raw IQ in, scalar phase/delta
    ph0 = jnp.zeros((), jnp.uint32)
    c = jnp.zeros((C, taps - 1), jnp.complex64)
    ys = []
    for blk in (x[:, :B], x[:, B:]):
        y, c = pfir.fir_decimate_pallas(
            h, c, jnp.asarray(blk), decim, tile_c=8, tile_t=512,
            interpret=True, nco=(ph0, jnp.uint32(delta)))
        ph0 = nco.advance(ph0, jnp.uint32(delta), B)
        ys.append(y)
    y_fused = jnp.concatenate(ys, axis=-1)
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_fused),
                               atol=2e-4)

    # real_out variant == Re(full output), same carry
    ph0 = jnp.zeros((), jnp.uint32)
    c = jnp.zeros((C, taps - 1), jnp.complex64)
    yr, c2 = pfir.fir_decimate_pallas(
        h, c, jnp.asarray(x[:, :B]), decim, tile_c=8, tile_t=512,
        interpret=True, nco=(ph0, jnp.uint32(delta)), real_out=True)
    np.testing.assert_allclose(np.asarray(yr), np.real(np.asarray(ys[0])),
                               atol=1e-6)


def test_real_analytic_pallas_fused():
    """TX kernel: real-input analytic FIR + conj + post-NCO vs the
    unfused ops path, streamed over two blocks."""
    from uhsdr_tpu.ops import nco
    rng = np.random.default_rng(4)
    C, B, taps = 8, 1024, 201
    h = (rng.standard_normal(taps) +
         1j * rng.standard_normal(taps)).astype(np.complex64) * 0.05
    x = rng.standard_normal((C, 2 * B)).astype(np.float32)
    delta = nco.freq_to_delta(6000.0, 48000.0)

    for conj in (False, True):
        # reference: fir_block -> conj -> mix
        hc = jnp.asarray(h)
        carry = jnp.zeros((C, taps - 1), jnp.float32)
        ph = jnp.zeros((C,), jnp.uint32)
        ys = []
        for blk in (x[:, :B], x[:, B:]):
            z, carry = xfir.fir_block(hc, carry, jnp.asarray(blk))
            if conj:
                z = jnp.conj(z)
            z, ph = nco.mix(z, ph, jnp.full((C,), jnp.uint32(delta)))
            ys.append(z)
        y_ref = jnp.concatenate(ys, axis=-1)

        carry = jnp.zeros((C, taps - 1), jnp.float32)
        ph0 = jnp.zeros((), jnp.uint32)
        ys = []
        for blk in (x[:, :B], x[:, B:]):
            z, carry = pfir.fir_real_analytic_pallas(
                h, carry, jnp.asarray(blk), tile_c=8, tile_t=512,
                nco=(ph0, jnp.uint32(delta)), conj=conj, interpret=True)
            ph0 = nco.advance(ph0, jnp.uint32(delta), B)
            ys.append(z)
        y_fused = jnp.concatenate(ys, axis=-1)
        np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_fused),
                                   atol=2e-4)


def test_interp_pallas_matches_ops():
    # streaming equality with ops.xfir.fir_interpolate_block across blocks
    from uhsdr_tpu.ops import design
    I = 4
    h = design.interpolation_fir(16 * I, I, 48000.0).astype(np.float32)
    sub_len = -(-len(h) // I)
    rng = np.random.default_rng(3)
    x = rng.standard_normal((8, 1024)).astype(np.float32)
    c0 = jnp.zeros((8, sub_len - 1), jnp.float32)
    y1a, c1 = pfir.fir_interpolate_pallas(h, c0, jnp.asarray(x), I,
                                                tile_c=8, tile_t_in=512,
                                                interpret=True)
    y1b, _ = pfir.fir_interpolate_pallas(h, c1, jnp.asarray(x), I,
                                               tile_c=8, tile_t_in=512,
                                               interpret=True)
    y2a, c2 = xfir.fir_interpolate_block(jnp.asarray(h), c0,
                                        jnp.asarray(x), I)
    y2b, _ = xfir.fir_interpolate_block(jnp.asarray(h), c2,
                                       jnp.asarray(x), I)
    np.testing.assert_allclose(np.asarray(y1a), np.asarray(y2a),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(y1b), np.asarray(y2b),
                               rtol=1e-5, atol=1e-5)


def test_fm_disc_pallas_matches_xla():
    """Fused product+poly-atan2 FM discriminator kernel (interpret mode)
    vs the XLA arctan2 path, including the carried boundary sample."""
    import jax
    import jax.numpy as jnp

    from uhsdr_tpu.pallas import elemwise

    rng = np.random.default_rng(0)
    C, T = 8, 1024
    z = (rng.standard_normal((C, T)) + 1j * rng.standard_normal((C, T))
         ).astype(np.complex64)
    zprev = (rng.standard_normal(C) + 1j * rng.standard_normal(C)
             ).astype(np.complex64)

    z_d = np.concatenate([zprev[:, None], z[:, :-1]], axis=-1)
    prod = np.conj(z_d) * z
    ref = np.arctan2(prod.imag, prod.real)

    prev_col = jnp.stack([jnp.asarray(zprev.real), jnp.asarray(zprev.imag)],
                         axis=-1)
    got = elemwise.fm_disc_pallas(prev_col, jnp.asarray(z.real),
                                  jnp.asarray(z.imag), tile_c=8,
                                  tile_t=512, interpret=True)
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-6)


def test_pallas_fir_real_taps_nco_fused():
    """REAL-taps fast path (the front decimators are purely real): the
    2-matmul kernel with fused NCO == the generic complex path, complex
    out and real_out, with streaming carry continuity."""
    from uhsdr_tpu.ops import nco
    rng = np.random.default_rng(5)
    C, B, taps, decim = 8, 4096, 89, 4
    h_real = (rng.standard_normal(taps) * 0.05).astype(np.float32)
    h_c = h_real.astype(np.complex64)           # same taps, complex dtype
    # force the generic complex kernel by adding a negligible imag tap
    h_generic = h_c.copy()
    h_generic[0] += 1e-30j
    x = (rng.standard_normal((C, 2 * B)) +
         1j * rng.standard_normal((C, 2 * B))).astype(np.complex64)
    delta = nco.freq_to_delta(-6000.0, 48000.0)

    for kwargs in ({}, {"nco": (jnp.zeros((), jnp.uint32),
                                jnp.uint32(delta))}):
        c_rt = jnp.zeros((C, taps - 1), jnp.complex64)
        c_gen = jnp.zeros((C, taps - 1), jnp.complex64)
        ph0 = jnp.zeros((), jnp.uint32)
        for blk in (x[:, :B], x[:, B:]):
            kw = dict(kwargs)
            if "nco" in kw:
                kw["nco"] = (ph0, jnp.uint32(delta))
            y_rt, c_rt = pfir.fir_decimate_pallas(
                h_c, c_rt, jnp.asarray(blk), decim, tile_c=8,
                tile_t=512, interpret=True, **kw)
            y_gen, c_gen = pfir.fir_decimate_pallas(
                h_generic, c_gen, jnp.asarray(blk), decim, tile_c=8,
                tile_t=512, interpret=True, **kw)
            if "nco" in kwargs:
                ph0 = nco.advance(ph0, jnp.uint32(delta), B)
            np.testing.assert_allclose(np.asarray(y_rt),
                                       np.asarray(y_gen), atol=2e-4)

    # real_out + real taps: single-matmul output == Re(complex output)
    c0 = jnp.zeros((C, taps - 1), jnp.complex64)
    y_c, _ = pfir.fir_decimate_pallas(h_c, c0, jnp.asarray(x[:, :B]),
                                      decim, tile_c=8, tile_t=512,
                                      interpret=True)
    y_r, _ = pfir.fir_decimate_pallas(h_c, c0, jnp.asarray(x[:, :B]),
                                      decim, tile_c=8, tile_t=512,
                                      interpret=True, real_out=True)
    np.testing.assert_allclose(np.asarray(y_r), np.real(np.asarray(y_c)),
                               atol=1e-6)


def test_pallas_fir_fused_peaks():
    """peaks_out: the kernel's fused raw-input peak == XLA max(|i|,|q|)."""
    from uhsdr_tpu.ops import nco
    rng = np.random.default_rng(6)
    C, B, taps, decim = 8, 4096, 89, 4
    h = (rng.standard_normal(taps) * 0.05).astype(np.float32) \
        .astype(np.complex64)
    x = (rng.standard_normal((C, B)) +
         1j * rng.standard_normal((C, B))).astype(np.complex64)
    delta = nco.freq_to_delta(-6000.0, 48000.0)
    c0 = jnp.zeros((C, taps - 1), jnp.complex64)
    y, c2, pk = pfir.fir_decimate_pallas(
        h, c0, jnp.asarray(x), decim, tile_c=8, tile_t=512,
        interpret=True, nco=(jnp.zeros((), jnp.uint32), jnp.uint32(delta)),
        peaks_out=True)
    peak = np.max(np.asarray(pk), axis=-1)
    want = np.maximum(np.max(np.abs(x.real), -1), np.max(np.abs(x.imag), -1))
    np.testing.assert_allclose(peak, want, rtol=1e-6)


def test_fused_stage_b_matches_two_stage():
    """`fuse2` (stage-B Hilbert-combine in the stage-A epilogue,
    `_fir_kernel_rt_s2`) vs the two separate kernels: same audio, same
    peaks, same front2 carry, and exact streaming continuity across a
    block split with the NCO phase advanced."""
    from uhsdr_tpu.ops import nco as nco_mod

    rng = np.random.default_rng(5)
    C, B, decim = 8, 4096, 2
    taps, taps2 = 89, 199
    h = np.hanning(taps).astype(np.float32)
    h /= h.sum()
    g2 = (np.hanning(taps2)
          * np.exp(1j * np.linspace(0, 3, taps2))).astype(np.complex64)
    i_p = jnp.asarray(rng.standard_normal((C, B)).astype(np.float32) * 0.1)
    q_p = jnp.asarray(rng.standard_normal((C, B)).astype(np.float32) * 0.1)
    carry = (jnp.zeros((C, taps - 1), jnp.float32),
             jnp.zeros((C, taps - 1), jnp.float32))
    c2 = (jnp.zeros((C, taps2 - 1), jnp.float32),
          jnp.zeros((C, taps2 - 1), jnp.float32))
    phase0, delta = jnp.uint32(12345), jnp.uint32(987654321)

    y, nc, pk, (f2r, f2i) = pfir.fir_decimate_pallas(
        h, carry, (i_p, q_p), decim, tile_c=8, tile_t=256,
        nco=(phase0, delta), peaks_out=True, fuse2=(g2, c2),
        interpret=True)

    (ar, ai), _, pk2 = pfir.fir_decimate_pallas(
        h, carry, (i_p, q_p), decim, tile_c=8, tile_t=256,
        nco=(phase0, delta), peaks_out=True, planes_out=True,
        interpret=True)
    y2, _ = pfir.fir_decimate_pallas(
        g2, jax.lax.complex(c2[0], c2[1]), jax.lax.complex(ar, ai), 1,
        tile_c=8, tile_t=256, real_out=True, interpret=True)

    np.testing.assert_allclose(np.asarray(y), np.asarray(y2),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pk), np.asarray(pk2))
    np.testing.assert_allclose(np.asarray(f2r),
                               np.asarray(ar)[:, -(taps2 - 1):], atol=1e-6)

    # streaming: two chained half blocks == one full block (carry + NCO
    # phase advance + front2 carry all hand off through the kernel)
    y_1, nc_1, _, f2_1 = pfir.fir_decimate_pallas(
        h, carry, (i_p[:, :B // 2], q_p[:, :B // 2]), decim, tile_c=8,
        tile_t=256, nco=(phase0, delta), peaks_out=True, fuse2=(g2, c2),
        interpret=True)
    ph2 = nco_mod.advance(jnp.broadcast_to(phase0, (1,)),
                          jnp.broadcast_to(delta, (1,)), B // 2)[0]
    y_2, _, _, _ = pfir.fir_decimate_pallas(
        h, nc_1, (i_p[:, B // 2:], q_p[:, B // 2:]), decim, tile_c=8,
        tile_t=256, nco=(ph2, delta), peaks_out=True, fuse2=(g2, f2_1),
        interpret=True)
    np.testing.assert_array_equal(
        np.concatenate([np.asarray(y_1), np.asarray(y_2)], axis=-1),
        np.asarray(y))


def test_pallas_fir_int16_ingest():
    """int16 plane ingest (the codec's native sample width): the kernel
    converts i16 -> normalized f32 in VMEM and must match feeding the
    converted planes to float rounding (XLA may reassociate the constant
    scale into the NCO rotation, ~2 ulp) — audio, peaks, stage-B planes
    and the carried history (returned complex f32) — on the rt_s and
    fused rt_s2 paths and across a streamed block split (the same
    reassociation applies to the carry-domain rotation)."""
    from uhsdr_tpu.ops import nco as nco_mod

    rng = np.random.default_rng(7)
    C, B, decim = 8, 4096, 2
    taps, taps2 = 89, 199
    h = np.hanning(taps).astype(np.float32)
    h /= h.sum()
    g2 = (np.hanning(taps2)
          * np.exp(1j * np.linspace(0, 3, taps2))).astype(np.complex64)
    i16 = jnp.asarray(
        np.clip(rng.standard_normal((C, B)) * 3277, -32767,
                32767).astype(np.int16))
    q16 = jnp.asarray(
        np.clip(rng.standard_normal((C, B)) * 3277, -32767,
                32767).astype(np.int16))
    sc = np.float32(1.0 / 32768.0)
    i_f = i16.astype(jnp.float32) * sc
    q_f = q16.astype(jnp.float32) * sc
    carry_c = jnp.zeros((C, taps - 1), jnp.complex64)
    carry_p = (jnp.zeros((C, taps - 1), jnp.float32),
               jnp.zeros((C, taps - 1), jnp.float32))
    c2 = (jnp.zeros((C, taps2 - 1), jnp.float32),
          jnp.zeros((C, taps2 - 1), jnp.float32))
    phase0, delta = jnp.uint32(12345), jnp.uint32(987654321)

    # fused stage-B (rt_s2) path
    y16, nc16, pk16, f2_16 = pfir.fir_decimate_pallas(
        h, carry_c, (i16, q16), decim, tile_c=8, tile_t=256,
        nco=(phase0, delta), peaks_out=True, fuse2=(g2, c2),
        interpret=True)
    yf, ncf, pkf, f2_f = pfir.fir_decimate_pallas(
        h, carry_p, (i_f, q_f), decim, tile_c=8, tile_t=256,
        nco=(phase0, delta), peaks_out=True, fuse2=(g2, c2),
        interpret=True)
    np.testing.assert_allclose(np.asarray(y16), np.asarray(yf), atol=2e-6)
    np.testing.assert_allclose(np.asarray(pk16), np.asarray(pkf), atol=2e-6)
    np.testing.assert_allclose(np.asarray(f2_16[0]), np.asarray(f2_f[0]),
                               atol=2e-6)
    assert jnp.iscomplexobj(nc16)   # i16 in -> complex f32 history out
    np.testing.assert_allclose(np.asarray(nc16),
                               np.asarray(jax.lax.complex(*ncf)), atol=2e-6)

    # rt_s path (planes out, no fusion)
    (a16r, a16i), c16b, _ = pfir.fir_decimate_pallas(
        h, carry_c, (i16, q16), decim, tile_c=8, tile_t=256,
        nco=(phase0, delta), peaks_out=True, planes_out=True,
        interpret=True)
    (afr, afi), cfb, _ = pfir.fir_decimate_pallas(
        h, carry_p, (i_f, q_f), decim, tile_c=8, tile_t=256,
        nco=(phase0, delta), peaks_out=True, planes_out=True,
        interpret=True)
    np.testing.assert_allclose(np.asarray(a16r), np.asarray(afr), atol=2e-6)
    np.testing.assert_allclose(np.asarray(a16i), np.asarray(afi), atol=2e-6)
    np.testing.assert_allclose(np.asarray(c16b),
                               np.asarray(jax.lax.complex(*cfb)), atol=2e-6)

    # streaming: two chained i16 half-blocks == one full block (the
    # second call's carry is the f32 complex history from the first)
    y_1, nc_1, _, f2_1 = pfir.fir_decimate_pallas(
        h, carry_c, (i16[:, :B // 2], q16[:, :B // 2]), decim, tile_c=8,
        tile_t=256, nco=(phase0, delta), peaks_out=True, fuse2=(g2, c2),
        interpret=True)
    ph2 = nco_mod.advance(jnp.broadcast_to(phase0, (1,)),
                          jnp.broadcast_to(delta, (1,)), B // 2)[0]
    y_2, _, _, _ = pfir.fir_decimate_pallas(
        h, nc_1, (i16[:, B // 2:], q16[:, B // 2:]), decim, tile_c=8,
        tile_t=256, nco=(ph2, delta), peaks_out=True, fuse2=(g2, f2_1),
        interpret=True)
    np.testing.assert_allclose(
        np.concatenate([np.asarray(y_1), np.asarray(y_2)], axis=-1),
        np.asarray(y16), atol=2e-6)


def test_rotor_plane_fast_path_matches_transcendental(monkeypatch):
    """`nco_static_delta` (precomputed cos/sin(delta*k) rotor planes +
    per-tile scalar rotor) vs the in-kernel full-rate transcendental
    rotation — both the rt_s kernel and the fuse2 (stage-B-in-epilogue)
    kernel, at a nonzero starting phase and across a streamed split.
    UHSDR_FRONT_MT=1 makes the fuse2+static combination take the
    modulated-taps kernel (ships off by default — measured slower on
    the full chain — but stays correctness-tested here)."""
    monkeypatch.setenv("UHSDR_FRONT_MT", "1")
    rng = np.random.default_rng(9)
    C, B, decim = 8, 4096, 2
    taps, taps2 = 89, 199
    h = np.hanning(taps).astype(np.float32)
    h /= h.sum()
    g2 = (np.hanning(taps2)
          * np.exp(1j * np.linspace(0, 3, taps2))).astype(np.complex64)
    i_p = jnp.asarray(rng.standard_normal((C, B)).astype(np.float32) * 0.1)
    q_p = jnp.asarray(rng.standard_normal((C, B)).astype(np.float32) * 0.1)
    carry = (jnp.zeros((C, taps - 1), jnp.float32),
             jnp.zeros((C, taps - 1), jnp.float32))
    c2 = (jnp.zeros((C, taps2 - 1), jnp.float32),
          jnp.zeros((C, taps2 - 1), jnp.float32))
    phase0, delta = jnp.uint32(12345), jnp.uint32(987654321)

    # fuse2 kernel + static delta = the MODULATED-TAPS kernel
    # (`_fir_kernel_rt_s2_mt`): taps carry the translation, the slab is
    # never rotated, the absolute rotor applies at the decimated rate.
    # It runs its dots in explicit bf16 (the arithmetic the DEFAULT-
    # precision TPU dot performs), so the comparison tolerance is the
    # one-bf16-pass floor, not f32.
    y_t, nc_t, pk_t, (f2r_t, f2i_t) = pfir.fir_decimate_pallas(
        h, carry, (i_p, q_p), decim, tile_c=8, tile_t=256,
        nco=(phase0, delta), peaks_out=True, fuse2=(g2, c2),
        interpret=True)
    y_r, nc_r, pk_r, (f2r_r, f2i_r) = pfir.fir_decimate_pallas(
        h, carry, (i_p, q_p), decim, tile_c=8, tile_t=256,
        nco=(phase0, delta), nco_static_delta=987654321,
        peaks_out=True, fuse2=(g2, c2), interpret=True)
    scale = float(np.max(np.abs(np.asarray(y_t))))
    np.testing.assert_allclose(np.asarray(y_r), np.asarray(y_t),
                               rtol=0, atol=2e-2 * scale)
    np.testing.assert_allclose(np.asarray(f2r_r), np.asarray(f2r_t),
                               rtol=0, atol=2e-2 * scale)
    np.testing.assert_array_equal(np.asarray(pk_r), np.asarray(pk_t))

    # rt_s kernel (planes out, no fuse2)
    (ar_t, ai_t), _, pkx = pfir.fir_decimate_pallas(
        h, carry, (i_p, q_p), decim, tile_c=8, tile_t=256,
        nco=(phase0, delta), peaks_out=True, planes_out=True,
        interpret=True)
    (ar_r, ai_r), _, _ = pfir.fir_decimate_pallas(
        h, carry, (i_p, q_p), decim, tile_c=8, tile_t=256,
        nco=(phase0, delta), nco_static_delta=987654321,
        peaks_out=True, planes_out=True, interpret=True)
    np.testing.assert_allclose(np.asarray(ar_r), np.asarray(ar_t),
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(ai_r), np.asarray(ai_t),
                               rtol=0, atol=2e-5)

    # streaming continuity on the mt fast path itself: two chained half
    # blocks must equal the single full-block run EXACTLY (the carry
    # hand-off and the per-tile rotor share the same arithmetic)
    from uhsdr_tpu.ops import nco as nco_mod
    y_1, nc_1, _, f2_1 = pfir.fir_decimate_pallas(
        h, carry, (i_p[:, :B // 2], q_p[:, :B // 2]), decim, tile_c=8,
        tile_t=256, nco=(phase0, delta), nco_static_delta=987654321,
        peaks_out=True, fuse2=(g2, c2), interpret=True)
    ph2 = nco_mod.advance(jnp.broadcast_to(phase0, (1,)),
                          jnp.broadcast_to(delta, (1,)), B // 2)[0]
    y_2, _, _, _ = pfir.fir_decimate_pallas(
        h, nc_1, (i_p[:, B // 2:], q_p[:, B // 2:]), decim, tile_c=8,
        tile_t=256, nco=(ph2, delta), nco_static_delta=987654321,
        peaks_out=True, fuse2=(g2, f2_1), interpret=True)
    np.testing.assert_allclose(
        np.concatenate([np.asarray(y_1), np.asarray(y_2)], axis=-1),
        np.asarray(y_r), rtol=0, atol=1e-6 * scale)

    # with mt off (the shipping default), fuse2+static takes the
    # rotor-PLANE path: same f32 dot structure as the transcendental
    # kernel, so the match is tight
    monkeypatch.delenv("UHSDR_FRONT_MT")
    y_p, _, _, _ = pfir.fir_decimate_pallas(
        h, carry, (i_p, q_p), decim, tile_c=8, tile_t=256,
        nco=(phase0, delta), nco_static_delta=987654321,
        peaks_out=True, fuse2=(g2, c2), interpret=True)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_t),
                               rtol=0, atol=1e-6 * scale)
