"""Device-mesh sharding of the PSS search front end.

The reference's parallelism (OpenMP over correlation lags + serially
scanned carriers/hypotheses, SURVEY.md section 2.4) maps onto a 2-D TPU
mesh:

- axis "t": the capture's time/lag axis, block-sharded.  The 137-tap
  correlation is overlap-save: each device fetches a halo of boundary
  samples from its right neighbor over ICI (jax.lax.ppermute) instead of
  the reference's shared-memory array.
- axis "f": the (pss x frequency-hypothesis) template axis, sharded so each
  device correlates only its hypothesis subset.

The mod-9600 incoherent fold becomes a masked scatter-add into a
half-frame accumulator followed by a psum over "t"; the final collapse
over hypotheses is a pmax over "f" with index recovery.  Carriers (the
embarrassingly-parallel outer loop) layer on top as a data-parallel batch
axis or as independent hosts (DCN).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..constants import HALF_FRAME_LEN, PSS_TD_LEN

_HALO = 280  # covers the 136-lag correlation halo and the 273-lag sp window


def make_mesh(n_time: int, n_hyp: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= n_time * n_hyp, "not enough devices"
    arr = np.asarray(devices[: n_time * n_hyp]).reshape(n_time, n_hyp)
    return Mesh(arr, axis_names=("t", "f"))


def _fold_local(xc2, lag0, n_comb_xc: int, starts, n_valid_lags):
    """Fold local |xc|^2 lags into the half-frame accumulator.

    xc2: [T, B] local squared correlations (T = local templates);
    lag0: global lag of local index 0; starts: [n_comb] fold start indices
    for this device's hypothesis (already sliced per template).

    Formulated as per-period DYNAMIC SLICES out of a zero-padded copy
    (out[t, k] += xc2[t, k + starts[t, m] - lag0]) -- the natural
    TPU-friendly gather.  The original scatter-add formulation
    (acc.at[t, idx].add) lowered to a per-element scatter and measured
    ~300x slower on the chip (1.9 s vs a few ms for the whole sharded
    front end)."""
    T, B = xc2.shape
    lags = lag0 + jnp.arange(B)
    # zero the tail beyond the valid global lag range once, then pad so
    # every period's 9600-lag window slices in-bounds (zeros outside)
    xc2 = jnp.where((lags < n_valid_lags)[None, :], xc2, 0.0)
    padded = jnp.concatenate(
        [jnp.zeros((T, HALF_FRAME_LEN), xc2.dtype), xc2,
         jnp.zeros((T, HALF_FRAME_LEN), xc2.dtype)], axis=1)

    slice_row = jax.vmap(
        lambda row, s: jax.lax.dynamic_slice_in_dim(row, s, HALF_FRAME_LEN))

    def body(m, acc):
        s = starts[:, m] if starts.ndim == 2 else jnp.full((T,), starts[m])
        # local offset of fold position 0 for period m, shifted by the
        # left padding; clamp only guards degenerate all-out-of-range
        off = jnp.clip(s - lag0 + HALF_FRAME_LEN, 0, B + HALF_FRAME_LEN)
        return acc + slice_row(padded, off)

    acc = jax.lax.fori_loop(0, n_comb_xc, body,
                            jnp.zeros((T, HALF_FRAME_LEN), xc2.dtype))
    return acc / n_comb_xc


def plan_sharded_bands(tmpl_flat: np.ndarray, n_f_axis: int,
                       precision: str = "bf16"):
    """Per-shard Pallas band matrices for the "f" axis of the (t x f)
    mesh: shard s's rows of ``tmpl_flat`` (the plan_sharded_inputs
    layout) become one v2/v3 im2col coefficient set, stacked along axis
    0 so P("f") sharding hands each device exactly its own bands.  Feed
    the result as ``*bands`` to sharded_xcorr to route the local
    correlation through the production TPU kernel
    (ops/corr_pallas.py)."""
    from ..ops.corr_pallas import PROD_V2_POST, bands_v2_for_templates

    T = tmpl_flat.shape[0]
    assert T % n_f_axis == 0
    t_loc = T // n_f_axis
    gs = [bands_v2_for_templates(
        np.asarray(tmpl_flat[s * t_loc:(s + 1) * t_loc]).astype(
            np.complex64), precision=precision,
        tc_major=(PROD_V2_POST == "kernel"))
        for s in range(n_f_axis)]
    return (jnp.concatenate(gs, axis=0),)


@partial(jax.jit, static_argnames=("mesh", "ds_comb_arm", "n_comb_xc",
                                  "n_valid_lags", "n_comb_sp"))
def sharded_xcorr(mesh: Mesh, capbuf_blocks, templates, start_idx,
                  ds_comb_arm: int, n_comb_xc: int, n_valid_lags: int,
                  n_comb_sp: int = 0, *bands):
    """Sharded xcorr front end.

    capbuf_blocks: [n_cap_padded] complex, sharded along "t".
    templates: [3 * n_f, 137] complex, sharded along "f" (first axis).
    start_idx: [3 * n_f, n_comb] int32 fold starts, sharded along "f".

    Returns (pow [3, 9600], frq [3, 9600]) replicated: the
    hypothesis-collapsed peak map, equivalent to the reference's
    xc_incoherent_collapsed_{pow,frq} (searcher.cpp:349-383).

    With n_comb_sp > 0, additionally returns the aux outputs the full
    CellSearch flow needs (pow, frq, sp_incoherent [9600],
    xc_incoherent_single [3, n_f, 9600]): the sliding 274-sample power
    fold rides the same halo exchange, and the pre-delay-spread fold is
    gathered over the "f" shards -- this is what lets peak_search +
    Z_th1 + per-peak refinement run off a multi-chip front end (the
    streaming tracker's sharded searcher path).

    ``*bands``: optional (g_re, g_im) from plan_sharded_bands -- routes
    each shard's local correlation through the Pallas block-Toeplitz
    kernel (the TPU production backend) instead of the XLA windows
    matmul; sharded over "f" like the templates."""
    n_t = mesh.shape["t"]
    n_f_axis = mesh.shape["f"]
    n_tmpl = templates.shape[0]

    def local_fn(cap_local, tmpl_local, starts_local, *bands_local):
        # cap_local: [B]; tmpl_local: [T_local, 137]; starts: [T_local, n_comb]
        t_idx = jax.lax.axis_index("t")
        f_idx = jax.lax.axis_index("f")
        B = cap_local.shape[0]

        # --- halo exchange: fetch leading _HALO samples of right neighbor --
        lead = cap_local[:_HALO]
        perm = [(i, i - 1) for i in range(1, n_t)]  # device i sends to i-1
        halo = jax.lax.ppermute(lead, "t", perm)    # device n_t-1 gets zeros
        cap_ext = jnp.concatenate([cap_local, halo])  # [B + _HALO]

        if bands_local:
            # --- local correlation: production Pallas v2/v3 kernel --------
            from ..ops.corr_pallas import (PROD_V2_OUT_DTYPE,
                                           PROD_V2_POST,
                                           corr_pow_core_v2,
                                           plan_pallas_v2)
            (g_loc,) = bands_local
            t_loc = tmpl_local.shape[0]
            t_pad, n_tc, n_rows, n_rb = plan_pallas_v2(t_loc, B)
            prec = "bf16" if g_loc.dtype == jnp.bfloat16 else "f32"
            odt = PROD_V2_OUT_DTYPE if prec == "bf16" else jnp.float32
            interp = jax.default_backend() != "tpu"
            xc2 = corr_pow_core_v2(
                jnp.real(cap_ext).astype(jnp.float32),
                jnp.imag(cap_ext).astype(jnp.float32),
                g_loc, B, t_loc, t_pad, n_tc, n_rows, n_rb,
                interpret=interp, precision=prec, post=PROD_V2_POST,
                out_dtype=odt)
            xc2 = xc2.astype(jnp.real(cap_local).dtype)  # [T_local, B]
        else:
            # --- local correlation: windows matmul on the MXU --------------
            n_loc_lags = B
            win = jnp.stack(
                [jax.lax.dynamic_slice_in_dim(cap_ext, m, n_loc_lags)
                 for m in range(PSS_TD_LEN)], axis=1)     # [B, 137]
            xc = jnp.einsum("lm,tm->tl", win, tmpl_local,
                            preferred_element_type=cap_ext.dtype)
            xc2 = jnp.real(xc) ** 2 + jnp.imag(xc) ** 2   # [T_local, B]

        # --- fold mod half-frame, combined across time shards --------------
        lag0 = t_idx * B
        acc = _fold_local(xc2, lag0, n_comb_xc, starts_local, n_valid_lags)
        acc = jax.lax.psum(acc, "t")                  # [T_local, 9600]

        # --- delay-spread combining ---------------------------------------
        inc = acc
        for d in range(1, ds_comb_arm + 1):
            inc = inc + jnp.roll(acc, d, axis=-1) + jnp.roll(acc, -d, axis=-1)
        inc = inc / (2 * ds_comb_arm + 1)

        # --- collapse the local hypothesis axis ---------------------------
        T_local = inc.shape[0]
        n_f_local = T_local // 3
        inc3 = inc.reshape(3, n_f_local, HALF_FRAME_LEN)
        pow_loc = jnp.max(inc3, axis=1)               # [3, 9600]
        frq_loc = jnp.argmax(inc3, axis=1).astype(jnp.int32) \
            + f_idx * n_f_local

        # --- global collapse over the hypothesis shards -------------------
        pow_glob = jax.lax.pmax(pow_loc, "f")
        frq_glob = jax.lax.pmax(
            jnp.where(pow_loc == pow_glob, frq_loc, -1), "f")
        if n_comb_sp == 0:
            return pow_glob, frq_glob

        # --- aux: sp_est fold over the same halo-extended block -----------
        # (reference sp_est, searcher.cpp:185-221: 274-sample running
        # mean power, folded mod 9600, tshifted by 137)
        p_ext = jnp.real(cap_ext) ** 2 + jnp.imag(cap_ext) ** 2
        cs = jnp.concatenate([jnp.zeros(1, p_ext.dtype), jnp.cumsum(p_ext)])
        sp_loc = (cs[274: 274 + B] - cs[:B]) / 274.0          # [B]
        g = lag0 + jnp.arange(B)
        n_sp = n_comb_sp * HALF_FRAME_LEN
        pos = g % HALF_FRAME_LEN
        sp_acc = jnp.zeros(HALF_FRAME_LEN, p_ext.dtype).at[pos].add(
            jnp.where(g < n_sp, sp_loc, 0.0))
        sp_inc = jax.lax.psum(sp_acc, "t") / n_comb_sp
        sp_inc = jnp.roll(sp_inc, 137)

        # pre-delay-spread fold = xc_incoherent_single rows of this shard
        single_loc = acc.reshape(3, n_f_local, HALF_FRAME_LEN)
        return pow_glob, frq_glob, sp_inc, single_loc

    if n_comb_sp == 0:
        out_specs = (P(), P())
    else:
        out_specs = (P(), P(), P(), P(None, "f", None))
    f = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P("t"), P("f", None), P("f", None))
        + (P("f", None),) * len(bands),
        out_specs=out_specs,
        check_vma=False,
    )
    return f(capbuf_blocks, templates, start_idx, *bands)


def plan_sharded_inputs(capbuf: np.ndarray, f_search_set: np.ndarray,
                        fc_requested: float, fc_programmed: float,
                        fs_programmed: float, mesh: Mesh,
                        dtype=np.complex64):
    """Pad/shape host inputs for sharded_xcorr.

    Returns (capbuf_padded, templates [3*n_f, 137], start_idx [3*n_f, n_comb],
    n_comb_xc, n_valid_lags).  The template axis interleaves PSS-major
    ([pss, hyp] row-major) so each "f" shard gets whole (pss, hyp) rows;
    n_f must divide evenly across the "f" axis.
    """
    from ..models.xcorr import combine_start_indices, pss_templates

    n_t = mesh.shape["t"]
    n_f = len(f_search_set)
    n_f_axis = mesh.shape["f"]
    assert n_f % n_f_axis == 0, "hypothesis count must divide the f axis"

    n_cap = len(capbuf)
    n_lags = n_cap - (PSS_TD_LEN - 1)
    n_comb_xc = (n_lags - 100) // HALF_FRAME_LEN

    B = int(np.ceil(n_cap / n_t))
    padded = np.zeros(B * n_t, dtype=dtype)
    padded[:n_cap] = capbuf

    tmpl = pss_templates(f_search_set, fc_requested, fc_programmed,
                         fs_programmed, dtype)         # [3, n_f, 137]
    starts = combine_start_indices(f_search_set, fc_requested, fc_programmed,
                                   fs_programmed, n_comb_xc)  # [n_f, n_comb]
    # reorder to [f_shard-friendly] layout: group hypotheses so that each
    # shard holds all 3 PSS of its hypothesis subset: [n_f, 3, ...] rows
    tmpl_rows = np.transpose(tmpl, (1, 0, 2))          # [n_f, 3, 137]
    n_f_local = n_f // n_f_axis
    tmpl_rows = tmpl_rows.reshape(n_f_axis, n_f_local, 3, 137)
    tmpl_rows = np.transpose(tmpl_rows, (0, 2, 1, 3))  # [shard, 3, n_f_loc, 137]
    tmpl_flat = tmpl_rows.reshape(3 * n_f, 137)

    starts_rows = starts.reshape(n_f_axis, n_f_local, -1)
    starts_rows = np.broadcast_to(starts_rows[:, None], (n_f_axis, 3,
                                                         n_f_local,
                                                         starts.shape[1]))
    starts_flat = starts_rows.reshape(3 * n_f, -1).astype(np.int32)

    return padded, tmpl_flat, starts_flat, n_comb_xc, n_lags
