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
