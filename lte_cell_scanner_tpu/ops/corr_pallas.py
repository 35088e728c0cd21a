"""Pallas TPU kernel: fused PSS correlation + squared magnitude.

The production hot path.  Differences from the portable XLA versions in
ops/corr.py:

- the complex im2col + matmul + |.|^2 chain is fused in VMEM: the 114 MB
  complex correlation tensor never round-trips through HBM -- each lag
  block builds its windows in VMEM, runs the 4 real MXU matmuls, squares,
  and writes only the float32 power output;
- the 136-sample window overlap between lag blocks is expressed as a
  second, offset BlockSpec view of the same capture array (no manual DMA
  needed): block i reads [i*BL, i*BL+BL) plus the leading 256 samples of
  block i+1.

Layout: capture as [rows, 128] float32 planes (re, im); templates
[137, T] planes; output xc2 [n_lag_blocks * BL, T] float32, transposed and
truncated by the caller.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import PSS_TD_LEN

BL = 1024          # lags per program (8 sublane rows of 128)
_HALO = 256        # >= 136 halo samples taken from the next block


def _corr_kernel(a_re, a_im, b_re, b_im, t_re, t_im, out_ref):
    # b_* is the full next block; only its leading _HALO samples are used
    cap_re = jnp.concatenate([a_re[:].reshape(-1),
                              b_re[:].reshape(-1)[:_HALO]])
    cap_im = jnp.concatenate([a_im[:].reshape(-1),
                              b_im[:].reshape(-1)[:_HALO]])

    win_re = jnp.stack([cap_re[m: m + BL] for m in range(PSS_TD_LEN)], axis=1)
    win_im = jnp.stack([cap_im[m: m + BL] for m in range(PSS_TD_LEN)], axis=1)

    tr = t_re[:]
    ti = t_im[:]
    xr = jnp.dot(win_re, tr, preferred_element_type=jnp.float32) \
        - jnp.dot(win_im, ti, preferred_element_type=jnp.float32)
    xi = jnp.dot(win_re, ti, preferred_element_type=jnp.float32) \
        + jnp.dot(win_im, tr, preferred_element_type=jnp.float32)
    out_ref[:] = xr * xr + xi * xi


@partial(jax.jit, static_argnames=("n_lags",))
def correlate_pow_pallas(capbuf, templates, n_lags: int):
    """|correlation|^2 of capbuf against templates at every lag.

    capbuf [n_cap] complex64; templates [T, 137] complex64.
    Returns xc2 [T, n_lags] float32.
    """
    t_count = templates.shape[0]
    n_blocks = int(np.ceil(n_lags / BL))
    # pad so every block plus its full next-block halo view is in range
    n_pad_rows = (n_blocks + 1) * (BL // 128)
    cap = jnp.zeros(n_pad_rows * 128, jnp.complex64).at[: capbuf.shape[0]] \
        .set(capbuf.astype(jnp.complex64))
    cap_re = jnp.real(cap).reshape(n_pad_rows, 128)
    cap_im = jnp.imag(cap).reshape(n_pad_rows, 128)

    t_re = jnp.real(templates).astype(jnp.float32).T   # [137, T]
    t_im = jnp.imag(templates).astype(jnp.float32).T

    rows_per_block = BL // 128
    grid = (n_blocks,)
    out = pl.pallas_call(
        _corr_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows_per_block, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_per_block, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_per_block, 128), lambda i: (i + 1, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_per_block, 128), lambda i: (i + 1, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((PSS_TD_LEN, t_count), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((PSS_TD_LEN, t_count), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BL, t_count), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_blocks * BL, t_count), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=8 * n_blocks * BL * PSS_TD_LEN * t_count,
            bytes_accessed=(n_blocks * BL * 8 + n_blocks * BL * t_count * 4),
            transcendentals=0,
        ),
    )(cap_re, cap_im, cap_re, cap_im, t_re, t_im)
    return out[:n_lags].T
