"""Batched spectrum estimation.

The reference senses by running liquid-dsp's scalar 512-point FFT on one
buffer at a time and accumulating magnitude averages on the CPU
(CE_Predictive_Node.cpp:148-155).  On TPU the same math is expressed as large
batched matmuls so it lands on the MXU:

* a length-N DFT is four real (B, N) @ (N, N) matmuls (real/imag split), which
  for small N (64-1024) is far better MXU utilisation than a scalar FFT and
  lets XLA fuse the magnitude + averaging + band-reduction epilogue into one
  kernel;
* ``mode="xla"`` falls back to ``jnp.fft.fft`` for large N where O(N log N)
  wins.

All functions are shape-polymorphic over leading batch dims and jit-safe.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["dft_matrices", "spectrum_magnitude", "averaged_magnitude_spectrum"]

# Cooley-Tukey split used by mode="ct_matmul": N = N1 * 128 with a cheap
# radix-N1 first stage (N1 in {2, 4}: twiddles are +-1 / +-i -> pure VPU
# adds) and a 128-point DFT second stage as (rows, 128) @ (128, 128) MXU
# matmuls at full systolic-array utilization. Cuts MXU flops per sample
# ~4x vs the dense (N, N) DFT matmul at N=512.
_CT_N2 = 128


@functools.lru_cache(maxsize=16)
def _dft_matrices_np(n: int) -> tuple[np.ndarray, np.ndarray]:
    k = np.arange(n)
    # Build the angle in float64 then cast: for n<=4096 this keeps the DFT
    # matrix entries accurate to f32 ulp, which the golden tests rely on.
    ang = -2.0 * np.pi * np.outer(k, k) / n
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def dft_matrices(n: int, dtype=jnp.float32) -> tuple[jax.Array, jax.Array]:
    """Real and imaginary parts of the forward DFT matrix ``exp(-2*pi*i*jk/n)``."""
    fre, fim = _dft_matrices_np(n)
    return jnp.asarray(fre, dtype), jnp.asarray(fim, dtype)


_PRECISIONS = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,
}


@functools.lru_cache(maxsize=16)
def _ct_twiddles_np(n1: int, n2: int) -> tuple[np.ndarray, np.ndarray]:
    """W_N^(k1*n2) over (k1, n2), N = n1*n2, in float64 -> f32."""
    k1 = np.arange(n1)[:, None]
    n2i = np.arange(n2)[None, :]
    ang = -2.0 * np.pi * k1 * n2i / (n1 * n2)
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def _ct_spectrum_sq(xr: jax.Array, xi: jax.Array, prec) -> jax.Array:
    """|FFT|^2 via the N = n1 x 128 Cooley-Tukey split (n1 in {2, 4}).

    Stage 1 (VPU): radix-n1 butterflies over x[n] = x[128*m1 + n2] — the
    length-n1 DFT twiddles are +-1 / +-i, so this is adds/swaps only.
    Stage 2 (VPU): twiddle multiply by W_N^(k1*n2).
    Stage 3 (MXU): length-128 DFT as four (rows*n1, 128) @ (128, 128)
    real-split matmuls.
    Output bin k = k1 + n1*k2 -> transpose (k1, k2) axes and reshape.
    """
    n = xr.shape[-1]
    n1 = n // _CT_N2
    lead = xr.shape[:-1]
    xr = xr.reshape(*lead, n1, _CT_N2)
    xi = xi.reshape(*lead, n1, _CT_N2)
    if n1 == 2:
        yr = jnp.stack([xr[..., 0, :] + xr[..., 1, :], xr[..., 0, :] - xr[..., 1, :]], -2)
        yi = jnp.stack([xi[..., 0, :] + xi[..., 1, :], xi[..., 0, :] - xi[..., 1, :]], -2)
    else:  # n1 == 4
        x0r, x1r, x2r, x3r = (xr[..., j, :] for j in range(4))
        x0i, x1i, x2i, x3i = (xi[..., j, :] for j in range(4))
        a_r, a_i = x0r + x2r, x0i + x2i  # x0 + x2
        b_r, b_i = x0r - x2r, x0i - x2i  # x0 - x2
        c_r, c_i = x1r + x3r, x1i + x3i  # x1 + x3
        d_r, d_i = x1r - x3r, x1i - x3i  # x1 - x3
        # k1 = 0: a+c; k1 = 2: a-c; k1 = 1: b - i*d; k1 = 3: b + i*d
        yr = jnp.stack([a_r + c_r, b_r + d_i, a_r - c_r, b_r - d_i], -2)
        yi = jnp.stack([a_i + c_i, b_i - d_r, a_i - c_i, b_i + d_r], -2)
    twr, twi = _ct_twiddles_np(n1, _CT_N2)
    twr = jnp.asarray(twr)
    twi = jnp.asarray(twi)
    zr = yr * twr - yi * twi
    zi = yr * twi + yi * twr
    fre, fim = dft_matrices(_CT_N2)

    def mm(a, b):
        return jnp.matmul(a, b, precision=prec, preferred_element_type=jnp.float32)

    xre = mm(zr, fre) - mm(zi, fim)  # (..., n1, 128) indexed [k1, k2]
    xim = mm(zr, fim) + mm(zi, fre)
    sq = xre * xre + xim * xim
    # bin k = k1 + n1*k2: put k2 before k1, then flatten
    return jnp.swapaxes(sq, -1, -2).reshape(*lead, n)


def spectrum_magnitude(
    x: jax.Array, *, mode: str = "dft_matmul", precision: str = "high"
) -> jax.Array:
    """|FFT(x)| over the sample axis.

    x: complex (..., N) or float32 IQ planes (..., N, 2).
    Returns float32 (..., N) — the ``cabsf(buffer_F[i])`` of
    CE_Predictive_Node.cpp:153, batched.

    Modes:
      ``ct_matmul`` — Cooley-Tukey N1 x 128 factorization (radix-N1 VPU
        stage + full-tile 128-point MXU matmuls), ~4x fewer MXU flops at
        N=512; requires N in {256, 512} (falls back to dft_matmul else).
      ``dft_matmul`` — dense X = x @ F with the real/imag split
        (Xre = xr@Fre - xi@Fim, Xim = xr@Fim + xi@Fre): four (N, N) matmuls.
      ``xla`` — jnp.fft.fft, for large N where O(N log N) wins.
    ``precision``: "highest" (true f32 — the strict bit-match mode),
    "high" (bf16_3x passes, ~5e-5 relative error, faster on the MXU —
    the default), or "default" (single bf16 pass, ~1e-2 error, fastest).
    """
    from cognitive_radio_network_tpu.signal.iq import split_iq

    xr, xi = split_iq(x)
    n = xr.shape[-1]
    if mode == "xla":
        z = (xr + 1j * xi).astype(jnp.complex64)
        return jnp.abs(jnp.fft.fft(z, axis=-1)).astype(jnp.float32)
    if mode == "ct_matmul" and n // _CT_N2 in (2, 4) and n % _CT_N2 == 0:
        return jnp.sqrt(_ct_spectrum_sq(xr, xi, _PRECISIONS[precision]))
    if mode not in ("dft_matmul", "ct_matmul"):
        raise ValueError(f"unknown spectrum mode: {mode}")
    prec = _PRECISIONS[precision]
    fre, fim = dft_matrices(n)

    def mm(a, b):
        return jnp.matmul(a, b, precision=prec, preferred_element_type=jnp.float32)

    xre = mm(xr, fre) - mm(xi, fim)
    xim = mm(xr, fim) + mm(xi, fre)
    return jnp.sqrt(xre * xre + xim * xim)


def averaged_magnitude_spectrum(
    blocks: jax.Array,
    *,
    averaging: int | None = None,
    mode: str = "dft_matmul",
    precision: str = "high",
) -> jax.Array:
    """Magnitude-average spectra over an averaging axis.

    blocks: complex (..., A, N) or planes (..., A, N, 2) — A consecutive FFT
    buffers per sense cycle.
    Returns float32 (..., N): ``fft_avg[i] = sum_a |X_a[i]| / A`` exactly as
    CE_Predictive_Node.cpp:152-154 (accumulate |X|/fft_averaging).

    Accumulation order note: the reference adds |X|/A buffer-by-buffer in f32;
    we sum then divide, which differs only by f32 rounding. The golden tests
    bound this below the decision SNR margin.
    """
    mags = spectrum_magnitude(blocks, mode=mode, precision=precision)
    if averaging is not None and mags.shape[-2] != averaging:
        raise ValueError(
            f"expected averaging axis {averaging}, got shape {blocks.shape}"
        )
    return jnp.mean(mags, axis=-2)
