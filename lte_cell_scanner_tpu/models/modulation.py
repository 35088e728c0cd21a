"""QPSK/QAM16/QAM64 modulation and soft demodulation.

Behavioral contract: reference Mod_map / lte_modulate / lte_demodulate
(/root/reference/src/lte_lib.cpp:559-634): LTE 36.211 Gray constellations;
soft demod returns ln(P(bit==0)/P(bit==1)) with per-symbol noise weighting
(the channel is assumed already removed; symbols are scaled by 1/sqrt(np)
and demodulated with unit noise variance -- exact log-MAP).

TPU-native design: constellation tables are generated from the 36.211
nesting formula (not hard-coded); soft demod is one vectorized
logsumexp over the constellation, batched over symbols, jit/vmap-friendly.
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.scipy.special import logsumexp

_BPS = {"qpsk": 2, "qam16": 4, "qam64": 6}
_NORM = {"qpsk": np.sqrt(2.0), "qam16": np.sqrt(10.0), "qam64": np.sqrt(42.0)}


def _level(bits) -> float:
    """I/Q amplitude for one axis, bits MSB-first (1, 2 or 3 bits).

    36.211 nesting: level(b) = 1-2b ; level(b0,rest) =
    (1-2b0) * (2^len(rest) - level(rest)).
    """
    if len(bits) == 1:
        return 1.0 - 2.0 * bits[0]
    return (1.0 - 2.0 * bits[0]) * (2 ** len(bits[1:]) - _level(bits[1:]))


@lru_cache(maxsize=None)
def mod_map(modulation: str) -> np.ndarray:
    """Constellation table indexed by the bit word (MSB-first), complex128.

    Matches the reference hard-coded tables (lte_lib.cpp:559-570): I bits
    are the even positions (b0, b2, b4), Q bits the odd ones.
    """
    bps = _BPS[modulation]
    n = 1 << bps
    table = np.zeros(n, dtype=np.complex128)
    for idx in range(n):
        bits = [(idx >> (bps - 1 - k)) & 1 for k in range(bps)]
        i_val = _level(tuple(bits[0::2]))
        q_val = _level(tuple(bits[1::2]))
        table[idx] = (i_val + 1j * q_val) / _NORM[modulation]
    return table


def lte_modulate(bits: np.ndarray, modulation: str = "qpsk") -> np.ndarray:
    """Map bits (len divisible by bps) to constellation symbols."""
    bits = np.asarray(bits, dtype=np.int64).reshape(-1, _BPS[modulation])
    weights = 1 << np.arange(_BPS[modulation])[::-1]
    idx = bits @ weights
    return mod_map(modulation)[idx]


@partial(jax.jit, static_argnames=("modulation",))
def lte_demodulate(syms, np_vec, modulation: str = "qpsk") -> jnp.ndarray:
    """Exact log-MAP soft bits: ln(P(b==0|r)/P(b==1|r)), [n_sym*bps].

    syms: channel-compensated symbols; np_vec: per-symbol noise power.
    Matches IT++ demodulate_soft_bits(syms/sqrt(np), 1/sqrt(np), 1, LOGMAP)
    as called at reference lte_lib.cpp:630-631.  Jitted (one compile per
    shape/modulation).
    """
    syms = jnp.asarray(syms)
    np_vec = jnp.asarray(np_vec)
    bps = _BPS[modulation]
    table = jnp.asarray(mod_map(modulation))            # [M]

    # -|r - s|^2 / np per (symbol, constellation point)
    d = syms[:, None] - table[None, :]
    metric = -(jnp.real(d) ** 2 + jnp.imag(d) ** 2) / np_vec[:, None]

    idx = np.arange(table.shape[0])
    out = []
    for b in range(bps):
        bit = (idx >> (bps - 1 - b)) & 1
        m0 = logsumexp(metric, axis=1, b=jnp.asarray(bit == 0, syms.real.dtype))
        m1 = logsumexp(metric, axis=1, b=jnp.asarray(bit == 1, syms.real.dtype))
        out.append(m0 - m1)
    return jnp.stack(out, axis=1).reshape(-1)


def lte_demodulate_host(syms: np.ndarray, np_vec: np.ndarray,
                        modulation: str = "qpsk") -> np.ndarray:
    """Numpy lte_demodulate (identical log-MAP math, no jit dispatch) --
    the tracker's per-40 ms MIB re-decode path; parity pinned in
    tests/test_coding.py."""
    syms = np.asarray(syms)
    np_vec = np.asarray(np_vec, dtype=np.float64)
    bps = _BPS[modulation]
    if modulation == "qpsk":
        # exact log-MAP closed form: the log(2cosh) term of the other
        # bit axis cancels in m0-m1, leaving llr = 2*sqrt(2)*I_or_Q/np
        # (pinned against the generic path in tests/test_coding.py)
        s = (2.0 * np.sqrt(2.0)) / np_vec
        out = np.empty((syms.shape[0], 2))
        out[:, 0] = syms.real * s
        out[:, 1] = syms.imag * s
        return out.reshape(-1)
    table = mod_map(modulation)

    d = syms[:, None] - table[None, :]
    metric = -(d.real ** 2 + d.imag ** 2) / np_vec[:, None]

    idx = np.arange(table.shape[0])
    out = np.empty((syms.shape[0], bps))
    for b in range(bps):
        bit = (idx >> (bps - 1 - b)) & 1
        m0 = np.logaddexp.reduce(
            np.where(bit == 0, metric, -np.inf), axis=1)
        m1 = np.logaddexp.reduce(
            np.where(bit == 1, metric, -np.inf), axis=1)
        out[:, b] = m0 - m1
    return out.reshape(-1)
