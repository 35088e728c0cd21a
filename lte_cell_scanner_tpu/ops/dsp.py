"""DSP substrate: the L2 numeric layer, as vectorized JAX ops.

Behavioral contracts mirror the reference's thin IT++/FFTW veneer
(/root/reference/include/dsp.h, src/dsp.cpp, include/itpp_ext.h) but the
implementations are array programs: the per-sample trig mixer becomes a
vectorized phase ramp, tshift becomes jnp.roll, interp1 becomes a
searchsorted gather, etc.  All functions are dtype-polymorphic: feed
complex128 (x64 mode, CPU verification) or complex64 (TPU production).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.scipy.special import gammainc


# ---------------------------------------------------------------------------
# Matlab-semantics helpers (reference include/itpp_ext.h:24-104)
# ---------------------------------------------------------------------------

def matlab_mod(k, n):
    """Matlab-compatible mod for ints and floats: k - n*floor(k/n), n==0 -> k."""
    if isinstance(k, (int, np.integer)) and isinstance(n, (int, np.integer)):
        return int(k - n * np.floor(k / n)) if n != 0 else int(k)
    if isinstance(k, (float, np.floating)):
        return float(k - n * np.floor(k / n)) if n != 0 else float(k)
    k = jnp.asarray(k)
    return jnp.where(n == 0, k, k - n * jnp.floor(k / n)).astype(k.dtype) \
        if jnp.issubdtype(k.dtype, jnp.floating) else \
        jnp.where(n == 0, k, k - n * jnp.floor_divide(k, n))


def matlab_range(first, incr, last) -> np.ndarray:
    """The matlab a:b:c range, numpy host-side (used for index planning).

    Matches reference itpp_ext::matlab_range (src/itpp_ext.cpp:97-149):
    length = floor((last-first)/incr)+1, elements first + t*incr; empty if
    the range runs the wrong way.
    """
    if np.sign(last - first) * np.sign(incr) < 0:
        return np.array([], dtype=np.result_type(first, incr, last))
    n = int(np.floor((last - first) / incr)) + 1
    return first + np.arange(n) * incr


def wrap(x, small, large):
    """WRAP macro: wrap x into [small, large) (reference macros.h:49)."""
    return matlab_mod(x - small, large - small) + small


# ---------------------------------------------------------------------------
# Power / dB
# ---------------------------------------------------------------------------

def sigpower(v) -> jnp.ndarray:
    """Mean |v|^2 (reference dsp.h:23-29)."""
    v = jnp.asarray(v)
    return jnp.mean(jnp.real(v) ** 2 + jnp.imag(v) ** 2)


def db10(x):
    return 10.0 * jnp.log10(x)


def udb10(x):
    return 10.0 ** (jnp.asarray(x) / 10.0)


# ---------------------------------------------------------------------------
# FFT wrappers: unitary scaling so sigpower(dft(x)) == sigpower(x)
# (reference dsp.h:33-34)
# ---------------------------------------------------------------------------

def dft(x, axis: int = -1):
    x = jnp.asarray(x)
    n = x.shape[axis]
    return jnp.fft.fft(x, axis=axis) / jnp.sqrt(jnp.asarray(n, x.real.dtype))


def idft(x, axis: int = -1):
    x = jnp.asarray(x)
    n = x.shape[axis]
    return jnp.fft.ifft(x, axis=axis) * jnp.sqrt(jnp.asarray(n, x.real.dtype))


# ---------------------------------------------------------------------------
# Mixers / shifts
# ---------------------------------------------------------------------------

def fshift_ramp(n: int, f, fs, dtype=jnp.complex128, t0=0) -> jnp.ndarray:
    """exp(j*2*pi*f*(t0 + [0..n-1])/fs) as a vector (the fshift phase ramp).

    The reference computes cos/sin per sample with phase k*t where
    k = pi*f/(fs/2) (dsp.h:40-57); this is the same ramp, vectorized.
    """
    rdt = jnp.float64 if dtype == jnp.complex128 else jnp.float32
    t = t0 + jnp.arange(n, dtype=rdt)
    k = jnp.asarray(2.0 * np.pi, rdt) * jnp.asarray(f, rdt) / jnp.asarray(fs, rdt)
    ang = k * t
    return (jnp.cos(ang) + 1j * jnp.sin(ang)).astype(dtype)


def fshift(seq, f, fs=2.0):
    """Shift seq up in frequency by f Hz, sampled at fs Hz."""
    seq = jnp.asarray(seq)
    return seq * fshift_ramp(seq.shape[-1], f, fs, dtype=seq.dtype)


def tshift(v, n: int):
    """Cyclically shift vector right by n samples (reference dsp.h:77-97)."""
    return jnp.roll(v, int(n), axis=-1)


# ---------------------------------------------------------------------------
# Interpolation
# ---------------------------------------------------------------------------

def interp1(X, Y, x):
    """Linear interpolation with linear extrapolation at the edges.

    Matches reference interp1 (dsp.h:152-185): X strictly increasing;
    values outside [X[0], X[-1]] extrapolate from the edge segment.
    """
    X = jnp.asarray(X)
    Y = jnp.asarray(Y)
    x = jnp.asarray(x)
    if X.shape[0] == 1:
        return jnp.broadcast_to(Y[0], x.shape)
    # Segment index: left edge of the bracketing interval, clipped so that
    # out-of-range points use the first/last segment (=> extrapolation).
    idx = jnp.clip(jnp.searchsorted(X, x, side="right") - 1, 0, X.shape[0] - 2)
    x0 = X[idx]
    x1 = X[idx + 1]
    y0 = Y[idx]
    y1 = Y[idx + 1]
    w = ((x - x0) / (x1 - x0)).astype(Y.real.dtype)
    return y0 + w * (y1 - y0)


def interpft(x, n_y: int):
    """FFT-based resampling of x to length n_y (reference dsp.cpp:52-91).

    Matlab interpft semantics: upsample by zero-padding the spectrum in the
    middle; if n_y is not an integer multiple, upsample to a multiple then
    decimate.
    """
    x = jnp.asarray(x)
    n_x = x.shape[-1]
    if n_y <= 0:
        raise ValueError("n_y must be positive")
    # Upsample target: smallest multiple of n_x that is >= n_y
    n_up = int(np.ceil(n_y / n_x)) * n_x
    X = jnp.fft.fft(x, axis=-1)
    nyqst = (n_x + 1) // 2
    head = X[..., :nyqst]
    tail = X[..., nyqst:]
    pad = jnp.zeros(x.shape[:-1] + (n_up - n_x,), dtype=X.dtype)
    # Split the Nyquist bin if n_x is even (matlab interpft contract).
    # Built by concatenation (not scatter: complex scatter is unimplemented
    # on some TPU runtimes).
    if n_x % 2 == 0:
        nyq = X[..., nyqst: nyqst + 1] / 2.0
        Xup = jnp.concatenate(
            [head[..., :nyqst], nyq, pad[..., :-1], nyq,
             tail[..., 1:]], axis=-1)
    else:
        Xup = jnp.concatenate([head, pad, tail], axis=-1)
    y = jnp.fft.ifft(Xup, axis=-1) * (n_up / n_x)
    step = n_up // n_y if n_up % n_y == 0 else 1
    if n_up != n_y and n_up % n_y == 0:
        y = y[..., ::step]
    else:
        y = y[..., :n_y]
    return y


def interpft_host(x: np.ndarray, n_y: int) -> np.ndarray:
    """interpft on HOST numpy (identical matlab semantics).

    The simulation channel models resample arbitrary-length chunks;
    on TPU a non-power-of-two jnp.fft lowers to a DENSE O(N^2) DFT
    matmul (a 262k-sample chunk would allocate a 275 GB matrix), so
    source-model resampling runs on the host where pocketfft handles
    any length."""
    x = np.asarray(x)
    n_x = x.shape[-1]
    if n_y <= 0:
        raise ValueError("n_y must be positive")
    n_up = int(np.ceil(n_y / n_x)) * n_x
    X = np.fft.fft(x, axis=-1)
    nyqst = (n_x + 1) // 2
    head = X[..., :nyqst]
    tail = X[..., nyqst:]
    pad = np.zeros(x.shape[:-1] + (n_up - n_x,), dtype=X.dtype)
    if n_x % 2 == 0:
        nyq = X[..., nyqst: nyqst + 1] / 2.0
        Xup = np.concatenate(
            [head[..., :nyqst], nyq, pad[..., :-1], nyq,
             tail[..., 1:]], axis=-1)
    else:
        Xup = np.concatenate([head, pad, tail], axis=-1)
    y = np.fft.ifft(Xup, axis=-1) * (n_up / n_x)
    if n_up != n_y and n_up % n_y == 0:
        return y[..., :: n_up // n_y]
    return y[..., :n_y]


# ---------------------------------------------------------------------------
# Chi-squared distribution (reference dsp.h:188-201 via boost gamma)
# ---------------------------------------------------------------------------

def chi2cdf(x, k):
    """Chi-squared CDF at x with k degrees of freedom."""
    return gammainc(k / 2.0, jnp.asarray(x) / 2.0)


def chi2cdf_inv(p: float, k: float) -> float:
    """Inverse chi-squared CDF: host-side scalar (used for Z_th1 once).

    Uses scipy's igammainv equivalent via a Newton refinement of the
    gammaincinv; evaluated in float64 on host.
    """
    from scipy.special import gammaincinv
    return float(2.0 * gammaincinv(k / 2.0, p))


# ---------------------------------------------------------------------------
# OFDM helpers
# ---------------------------------------------------------------------------

def extract_center_subcarriers(dft_out, n_sc: int):
    """Extract the n_sc center subcarriers (excluding DC) of a 128-pt DFT.

    For n_sc=62 this is concat(dft[-31:], dft[1:32]) -- the PSS/SSS band
    (reference searcher.cpp:529); for n_sc=72 the full used band
    (searcher.cpp:905).
    """
    h = n_sc // 2
    return jnp.concatenate([dft_out[..., -h:], dft_out[..., 1:h + 1]], axis=-1)
