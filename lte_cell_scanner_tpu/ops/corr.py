"""Sliding cross-correlation of the capture against PSS templates.

This is the dominant-cost op of the whole framework (reference
xc_correlate, /root/reference/src/searcher.cpp:113-174: 3 PSS x n_f
frequency hypotheses x ~153k lags x 137 taps of complex MACs, OpenMP over
lags).  TPU-native design: the (pss, hypothesis) axes collapse into one
template axis T = 3*n_f and the whole job becomes a single tall matmul

    xc[l, T] = sum_m  win[l, m] * tmpl[T, m]

that the MXU executes directly.  Three interchangeable strategies:

- "dot":  im2col (137 shifted slices) + one complex einsum.  Simple,
          XLA fuses well; costs a 137x temporary.
- "conv": real-decomposed lax.conv_general_dilated (XLA conv is already
          cross-correlation: no kernel flip).
- "fft":  overlap-free full-length FFT product (O(n log n), radix-friendly
          padded length).

All return xc with shape [T, n_lags] in the complex dtype of the inputs.
"dot" with a fused |.|^2 consumer is the production TPU path (measured
fastest on the target chip); the hand-written Pallas kernel
(corr_pallas.py) is the explicit-kernel alternative verified against
these.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


def _windows(x: jnp.ndarray, w: int) -> jnp.ndarray:
    """[n] -> [n-w+1, w] sliding windows via w static slices (no gather)."""
    n_lags = x.shape[0] - w + 1
    cols = [jax.lax.dynamic_slice_in_dim(x, m, n_lags) for m in range(w)]
    return jnp.stack(cols, axis=1)


@partial(jax.jit, static_argnames=("method",))
def correlate(capbuf: jnp.ndarray, templates: jnp.ndarray,
              method: str = "dot") -> jnp.ndarray:
    """Correlate capbuf [n] against templates [T, w] at every lag.

    Returns xc [T, n - w + 1]: xc[t, k] = sum_m templates[t, m] * capbuf[k+m].
    """
    t_count, w = templates.shape
    n_lags = capbuf.shape[0] - w + 1

    if method == "dot":
        win = _windows(capbuf, w)                      # [n_lags, w]
        return jnp.einsum("lm,tm->tl", win, templates,
                          preferred_element_type=capbuf.dtype)

    if method == "conv":
        rdt = jnp.real(capbuf).dtype
        xr = jnp.stack([jnp.real(capbuf), jnp.imag(capbuf)])[None]  # [1,2,n]
        tr = jnp.real(templates)
        ti = jnp.imag(templates)
        # out channels: first T real parts, then T imag parts
        k_real = jnp.stack([tr, -ti], axis=1)          # [T,2,w]
        k_imag = jnp.stack([ti, tr], axis=1)           # [T,2,w]
        kern = jnp.concatenate([k_real, k_imag], axis=0).astype(rdt)
        out = jax.lax.conv_general_dilated(
            xr.astype(rdt), kern, window_strides=(1,), padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"))
        return (out[0, :t_count] + 1j * out[0, t_count:]).astype(capbuf.dtype)

    if method == "fft":
        n = capbuf.shape[0]
        nfft = 1 << int(np.ceil(np.log2(n + w)))
        cf = jnp.fft.fft(capbuf, nfft)
        # correlation (not convolution): conj-reverse trick via fft of
        # template zero-padded then conjugated product reversed; simpler:
        # xc[k] = ifft( fft(capbuf) * fft(templates reversed) ) shifted.
        tf = jnp.fft.fft(templates[:, ::-1], nfft, axis=-1)
        prod = cf[None, :] * tf
        full = jnp.fft.ifft(prod, axis=-1)
        # full[k] = sum_m tmpl[w-1-m'] ... alignment: lag l at index l + w - 1
        return full[:, w - 1: w - 1 + n_lags].astype(capbuf.dtype)

    raise ValueError(f"unknown method {method!r}")
