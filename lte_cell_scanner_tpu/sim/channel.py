"""Channel impairments for self-tests and fault injection.

Mirrors the reference's simulation toolbox: AWGN injection (the
--noise-power flag / blnoise, reference dsp.h:143-147,
LTE-Tracker.cpp:248-255), carrier frequency offset, and the coupled
sample-clock offset implied by the shared crystal (k_factor model,
searcher.cpp:18-43).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..constants import FS_WORK


def awgn(sig: np.ndarray, snr_db: float,
         rng: Optional[np.random.Generator] = None,
         signal_power: Optional[float] = None) -> np.ndarray:
    """Add complex white Gaussian noise at the given SNR."""
    rng = rng or np.random.default_rng()
    sp = signal_power if signal_power is not None \
        else float(np.mean(np.abs(sig) ** 2))
    npow = sp / (10.0 ** (snr_db / 10.0))
    noise = (rng.normal(size=len(sig)) + 1j * rng.normal(size=len(sig))) \
        * np.sqrt(npow / 2.0)
    return sig + noise


def apply_freq_offset(sig: np.ndarray, f_off: float,
                      fs: float = FS_WORK) -> np.ndarray:
    """Mix the signal up by f_off Hz."""
    t = np.arange(len(sig))
    return sig * np.exp(1j * 2 * np.pi * f_off * t / fs)


def multipath_channel(sig: np.ndarray, n_taps: int = 4,
                      delay_spread: float = 1.5,
                      rng: Optional[np.random.Generator] = None
                      ) -> np.ndarray:
    """Random static multipath FIR channel.

    Rayleigh taps with an exponential power-delay profile
    (tap k power ~ e^{-k/delay_spread}), normalized to unit average
    gain.  Stands in for the external ``channel_gen`` the reference's
    Monte-Carlo harness uses (Matlab/pss_search_final.m:143-156,
    Matlab/README:5-6) for frequency-selective fading trials.
    """
    rng = rng or np.random.default_rng()
    pdp = np.exp(-np.arange(n_taps) / delay_spread)
    pdp = pdp / pdp.sum()
    taps = (rng.normal(size=n_taps) + 1j * rng.normal(size=n_taps)) \
        * np.sqrt(pdp / 2.0)          # E[sum |h_k|^2] = sum pdp = 1
    return np.convolve(sig, taps)[: len(sig)]


def apply_clock_offset(sig: np.ndarray, k_factor: float) -> np.ndarray:
    """Resample by the crystal scale factor (receiver samples at fs*k).

    Linear interpolation at positions t*k_factor -- adequate for the
    sub-ppm-to-100-ppm offsets the scanner must tolerate.
    """
    n = len(sig)
    pos = np.arange(n) * k_factor
    pos = pos[pos <= n - 1]
    i0 = np.floor(pos).astype(np.int64)
    i1 = np.minimum(i0 + 1, n - 1)
    w = pos - i0
    return sig[i0] * (1 - w) + sig[i1] * w
