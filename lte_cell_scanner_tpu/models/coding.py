"""Channel coding: tail-biting convolutional code, rate matching, CRC.

Behavioral contracts (reference /root/reference/src/lte_lib.cpp):

- lte_conv_encode / lte_conv_decode (:520-551): K=7 tail-biting
  convolutional code, generators (133,171,165) octal, soft-input decode.
- lte_conv_ratematch / lte_conv_deratematch (:409-518): PBCH sub-block
  interleaver (32-column permutation) + circular-buffer bit selection; the
  de-ratematcher averages repeated LLR observations.
- lte_calc_crc (:637-663): CRC8/16/24A/24B as polynomial division parity.

TPU-native design: the encoder and CRC are GF(2) linear maps -- both are
expressed as precomputed 0/1 matrices so they run as int matmuls under jit.
The tail-biting Viterbi decoder is a vectorized forward pass over all 64
start-state hypotheses at once (the IT++ decode_tailbite contract: best
metric among start==end constrained paths), implemented with lax.scan and
register-exchange-free traceback; it vmaps cleanly over blind MIB
candidates.  Rate-matching permutations are discovered once on host (the
reference's probe trick) and become gather/scatter index plans.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

# Generators (133,171,165) octal, MSB = current input bit (g[0] = D^0 tap).
_GENS = (0o133, 0o171, 0o165)
_K = 7


def _gen_taps() -> np.ndarray:
    """[3, 7] 0/1 taps: g[i, j] = coefficient of D^j in generator i."""
    taps = np.zeros((3, _K), dtype=np.uint8)
    for i, g in enumerate(_GENS):
        for j in range(_K):
            taps[i, j] = (g >> (_K - 1 - j)) & 1
    return taps


def conv_encode(c: np.ndarray) -> np.ndarray:
    """Tail-biting convolutional encode: bits [n] -> [3, n].

    d[i, k] = sum_j g_i[j] * c[(k - j) mod n]  (state preloaded with the
    last K-1 input bits, reference lte_lib.cpp:520-533).
    """
    c = np.asarray(c, dtype=np.uint8)
    n = c.shape[0]
    taps = _gen_taps()
    d = np.zeros((3, n), dtype=np.uint8)
    for j in range(_K):
        shifted = np.roll(c, j)
        for i in range(3):
            if taps[i, j]:
                d[i] ^= shifted
    return d


@lru_cache(maxsize=None)
def _trellis(n_states: int = 64):
    """Trellis tables: next_state[state, bit], out_bits[state, bit, 3].

    State = (c_{k-1} ... c_{k-6}) packed with c_{k-1} as the MSB.
    """
    taps = _gen_taps()
    next_state = np.zeros((n_states, 2), dtype=np.int32)
    out_bits = np.zeros((n_states, 2, 3), dtype=np.int8)
    for s in range(n_states):
        past = [(s >> (5 - i)) & 1 for i in range(6)]  # c_{k-1}..c_{k-6}
        for b in range(2):
            window = [b] + past  # c_k, c_{k-1}, ..., c_{k-6}
            for i in range(3):
                out_bits[s, b, i] = int(np.bitwise_xor.reduce(
                    [window[j] & taps[i, j] for j in range(_K)]))
            next_state[s, b] = (b << 5) | (s >> 1)
    return next_state, out_bits


@jax.jit
def conv_decode_tailbite(d_llr) -> jnp.ndarray:
    """Soft tail-biting Viterbi decode: LLRs [3, n] -> bits [n] (int32).

    d_llr[i, k] = ln(P(d==0)/P(d==1)).  All 64 start-state hypotheses run
    in one vectorized pass; the winner is the best path with start == end
    state (IT++ Convolutional_Code::decode_tailbite contract).  Jitted:
    the MIB shape [3, 40] compiles once per process (recompiles were the
    tracker's dominant cost before).
    """
    d_llr = jnp.asarray(d_llr)
    n = d_llr.shape[1]
    next_state, out_bits = _trellis()
    ns = jnp.asarray(next_state)                        # [64, 2]
    # Branch "gain": sum_i llr_i * (+1 if out bit 0 else -1) / 2
    signs = jnp.asarray(1 - 2 * out_bits.astype(np.int32))  # [64, 2, 3]
    rdt = d_llr.dtype

    neg = jnp.asarray(-1e30, rdt)
    pm0 = jnp.full((64, 64), neg).at[jnp.arange(64), jnp.arange(64)].set(0.0)

    # scatter-style ACS: for each (old_state, bit) edge compute candidate
    # metric at its target state; combine by segment max.
    flat_target = np.asarray(next_state).reshape(-1)    # [128]
    # For each new state, its two (old_state, bit) predecessors:
    preds = np.zeros((64, 2), dtype=np.int32)           # flat edge index
    for t in range(64):
        preds[t] = np.nonzero(flat_target == t)[0]
    preds = jnp.asarray(preds)

    def step(pm, llr_k):
        # pm: [64 starts, 64 states]; llr_k: [3]
        gain = jnp.einsum("sbi,i->sb", signs.astype(rdt), llr_k) * 0.5  # [64,2]
        cand = pm[:, :, None] + gain[None, :, :]        # [start, old, bit]
        cand_flat = cand.reshape(cand.shape[0], 128)
        c2 = cand_flat[:, preds]                        # [start, new, 2]
        choice = jnp.argmax(c2, axis=-1)                # [start, new]
        new_pm = jnp.max(c2, axis=-1)
        return new_pm, choice

    pm_final, choices = jax.lax.scan(step, pm0, d_llr.T)  # choices [n,64,64]

    # Enforce start == end, pick the best start-state hypothesis.
    final_metrics = pm_final[jnp.arange(64), jnp.arange(64)]
    best_start = jnp.argmax(final_metrics)

    # Traceback along the best start hypothesis.
    pred_state = jnp.asarray(preds // 2, dtype=jnp.int32)   # [64,2] old state
    pred_bit = jnp.asarray(preds % 2, dtype=jnp.int32)      # [64,2] input bit

    def back(state, choice_k):
        b = choice_k[state]
        bit = pred_bit[state, b]
        prev = pred_state[state, b]
        return prev, bit

    _, bits_rev = jax.lax.scan(back, best_start.astype(jnp.int32),
                               choices[:, best_start, :], reverse=True)
    return bits_rev.astype(jnp.int32)


def conv_decode_tailbite_host(d_llr: np.ndarray) -> np.ndarray:
    """Host-path tail-biting Viterbi with the exact conv_decode_tailbite
    contract: native C (native/tracker_math.cpp viterbi_tailbite) when
    available, vectorized numpy otherwise.  Used by the tracker's
    per-40 ms MIB re-decode where a jit dispatch per call dominates the
    actual trellis work; parity pinned in tests/test_coding.py."""
    from ..io.native import get_lib

    d_llr = np.ascontiguousarray(d_llr, dtype=np.float64)
    n = d_llr.shape[1]
    lib = get_lib()
    if lib is not None:
        bits = np.empty(n, dtype=np.int32)
        lib.viterbi_tailbite(d_llr.ctypes.data, n, bits.ctypes.data)
        return bits

    next_state, out_bits = _trellis()
    signs = (1 - 2 * out_bits.astype(np.int64)).astype(np.float64)
    flat_target = next_state.reshape(-1)
    preds = np.zeros((64, 2), dtype=np.int64)
    for t in range(64):
        preds[t] = np.nonzero(flat_target == t)[0]
    pm = np.full((64, 64), -1e30)
    pm[np.arange(64), np.arange(64)] = 0.0
    choices = np.zeros((n, 64, 64), dtype=np.int64)
    for k in range(n):
        gain = signs @ d_llr[:, k] * 0.5                # [64, 2]
        cand = (pm[:, :, None] + gain[None, :, :]).reshape(64, 128)
        c2 = cand[:, preds]                             # [start, new, 2]
        choices[k] = np.argmax(c2, axis=-1)
        pm = np.max(c2, axis=-1)
    best_start = int(np.argmax(pm[np.arange(64), np.arange(64)]))
    pred_state = preds // 2
    pred_bit = preds % 2
    bits = np.zeros(n, dtype=np.int32)
    state = best_start
    for k in range(n - 1, -1, -1):
        b = choices[k, best_start, state]
        bits[k] = pred_bit[state, b]
        state = pred_state[state, b]
    return bits


# ---------------------------------------------------------------------------
# Rate matching
# ---------------------------------------------------------------------------

_PERM = np.array([1, 17, 9, 25, 5, 21, 13, 29, 3, 19, 11, 27, 7, 23, 15, 31,
                  0, 16, 8, 24, 4, 20, 12, 28, 2, 18, 10, 26, 6, 22, 14, 30])


@lru_cache(maxsize=None)
def ratematch_map(n_c: int, n_e: int) -> np.ndarray:
    """[n_e, 2] map: e-bit index -> (stream r in 0..2, coded-bit col c).

    Derived by running the reference's sub-block interleave + circular
    selection on coordinates (the probe trick, lte_lib.cpp:469-478).
    """
    n_cols = 32
    n_r = int(np.ceil(n_c / n_cols))
    pad = n_r * n_cols - n_c
    w = []
    for r in range(3):
        row = np.concatenate([np.full(pad, -1, dtype=np.int64),
                              np.arange(n_c, dtype=np.int64)])
        y = row.reshape(n_r, n_cols)
        y_perm = y[:, _PERM]
        # column-major readout: the block interleaver is read out down the
        # permuted columns (itpp cvectorize semantics, lte_lib.cpp:441-445)
        w.append(y_perm.T.reshape(-1))
    w = np.concatenate(w)  # stream-major circular buffer, -1 = pad
    out = np.zeros((n_e, 2), dtype=np.int64)
    k = 0
    j = 0
    total = 3 * n_r * n_cols
    while k < n_e:
        if w[j] >= 0:
            out[k, 0] = j // (n_r * n_cols)
            out[k, 1] = w[j]
            k += 1
        j = (j + 1) % total
    return out


def conv_ratematch(d: np.ndarray, n_e: int) -> np.ndarray:
    """Rate-match coded bits/symbols d [3, n_c] to length n_e."""
    d = np.asarray(d)
    m = ratematch_map(d.shape[1], n_e)
    return d[m[:, 0], m[:, 1]]


@partial(jax.jit, static_argnames=("n_c",))
def _deratematch_core(e_llr, flat_idx, n_c: int):
    sums = jnp.zeros(3 * n_c, e_llr.dtype).at[flat_idx].add(e_llr)
    counts = jnp.zeros(3 * n_c, e_llr.dtype).at[flat_idx].add(1.0)
    avg = jnp.where(counts > 1, sums / jnp.maximum(counts, 1), sums)
    return avg.reshape(3, n_c)


@lru_cache(maxsize=None)
def _ratematch_flat_idx(n_c: int, n_e: int):
    m = ratematch_map(n_c, n_e)
    return np.ascontiguousarray(m[:, 0] * n_c + m[:, 1])


def conv_deratematch(e_llr, n_c: int) -> jnp.ndarray:
    """Invert rate matching, averaging repeated LLR observations.

    e_llr [n_e] of ln(P(0)/P(1)) -> d_llr [3, n_c]
    (reference lte_lib.cpp:493-509: positions seen more than once are
    averaged; unseen positions are 0 = erasure).
    """
    e_llr = jnp.asarray(e_llr)
    flat_idx = jnp.asarray(_ratematch_flat_idx(n_c, int(e_llr.shape[0])))
    return _deratematch_core(e_llr, flat_idx, n_c)


@lru_cache(maxsize=None)
def _deratematch_counts(n_c: int, n_e: int) -> np.ndarray:
    idx = _ratematch_flat_idx(n_c, n_e)
    return np.bincount(idx, minlength=3 * n_c).astype(np.float64)


def conv_deratematch_host(e_llr: np.ndarray, n_c: int) -> np.ndarray:
    """Numpy conv_deratematch (same averaging contract, no jit dispatch):
    one bincount against the cached index plan."""
    e_llr = np.asarray(e_llr, dtype=np.float64)
    idx = _ratematch_flat_idx(n_c, len(e_llr))
    counts = _deratematch_counts(n_c, len(e_llr))
    sums = np.bincount(idx, weights=e_llr, minlength=3 * n_c)
    avg = np.where(counts > 1, sums / np.maximum(counts, 1.0), sums)
    return avg.reshape(3, n_c)


# ---------------------------------------------------------------------------
# CRC
# ---------------------------------------------------------------------------

_CRC_POLYS = {
    "crc8": [1, 1, 0, 0, 1, 1, 0, 1, 1],
    "crc16": [1, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1],
    "crc24a": [1, 1, 0, 0, 0, 0, 1, 1, 0, 0, 1, 0, 0, 1, 1, 0, 0, 1, 1, 1,
               1, 1, 0, 1, 1],
    "crc24b": [1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1,
               0, 0, 0, 1, 1],
}


def crc_parity(a: np.ndarray, crc: str) -> np.ndarray:
    """Parity bits: remainder of a(x)*x^L / g(x) over GF(2) (host path)."""
    poly = np.array(_CRC_POLYS[crc], dtype=np.uint8)
    L = len(poly) - 1
    reg = np.concatenate([np.asarray(a, dtype=np.uint8),
                          np.zeros(L, dtype=np.uint8)])
    for i in range(len(a)):
        if reg[i]:
            reg[i: i + L + 1] ^= poly
    return reg[-L:]


@lru_cache(maxsize=None)
def crc_matrix(n_in: int, crc: str) -> np.ndarray:
    """[n_in, L] GF(2) matrix M with parity(a) = a @ M mod 2 (jit path)."""
    L = len(_CRC_POLYS[crc]) - 1
    m = np.zeros((n_in, L), dtype=np.uint8)
    for i in range(n_in):
        unit = np.zeros(n_in, dtype=np.uint8)
        unit[i] = 1
        m[i] = crc_parity(unit, crc)
    return m
