"""Float-boundary jit: keep complex buffers off the host<->device edge.

The container's experimental axon TPU client executes complex math
inside a program correctly, but cannot transfer ANY output of a program
that has a complex-typed parameter -- and the taint propagates: buffers
produced by such a program poison every downstream program's outputs
too (measured: UNIMPLEMENTED on device->host copy).  Measured stronger
still: once one complex-parameter program has EXECUTED in a process,
later transfers fail process-wide even for all-float programs on fresh
inputs -- so a process must be all-boundary or all-device-resident,
never mixed (tools/bench_kernels.py runs its parity pass in a separate
process for this reason).  Real TPU hardware has the same shape of
constraint one level down: the MXU/VPU have no complex datapath, XLA
lowers complex to planar real pairs anyway.

``safe_jit`` therefore moves the complex<->planar conversion to the
host boundary: every complex argument crosses as a (real, imag) float
pair -- split on HOST with numpy, never on device -- and is reassembled
with ``lax.complex`` inside the trace; complex results are split inside
the trace and reassembled on host.  The transform is numerically exact
(a complex array IS its two float planes) and free on device (XLA fuses
the pack/unpack).

Activation: ``LTE_TPU_FLOAT_BOUNDARY=always|never|auto`` (default
``auto``: active only on the axon backend).  When inactive, ``safe_jit``
IS ``jax.jit`` -- the CPU/standard-TPU paths are byte-identical to the
unwrapped ones.

``device_complex(x)`` is the companion for call sites that keep a
capture device-resident across several programs: under an active
boundary it returns a ``ComplexPair`` of two device float planes
(host-split once), otherwise a plain ``jnp.asarray``.

Under an active boundary the wrapped call returns HOST numpy arrays for
every output (one batched device_get) -- the entry points wrapped here
are exactly the pipeline stages whose outputs feed host decisions.
When inactive, outputs stay device-resident as with plain jax.jit.
"""

from __future__ import annotations

import inspect
import os
from typing import Any, Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp


def needs_float_boundary() -> bool:
    """Read per call (not cached) so tests can toggle the env var."""
    mode = os.environ.get("LTE_TPU_FLOAT_BOUNDARY", "auto")
    if mode == "always":
        return True
    if mode == "never":
        return False
    try:
        if jax.default_backend() != "tpu":
            return False
        # the axon client self-identifies only in platform_version
        # ("axon 0.1.0; ..."); real TPU runtimes don't carry the tag
        ver = jax.devices()[0].client.platform_version
        return "axon" in ver
    except Exception:
        return False


class ComplexPair:
    """A complex array as two device-resident float planes."""

    __slots__ = ("re", "im")

    def __init__(self, re, im):
        self.re = re
        self.im = im

    @property
    def shape(self):
        return self.re.shape

    @property
    def dtype(self):
        return np.result_type(self.re.dtype, np.complex64)

    def __len__(self):
        return self.re.shape[0]

    def __getitem__(self, i):
        """Materialize one row on host (rare fallback paths only --
        the planes transfer fine because they are float)."""
        return np.asarray(self.re[i]) + 1j * np.asarray(self.im[i])


def device_complex(x):
    """Put an array on device for use with safe_jit entry points.

    Complex input under an active boundary -> ComplexPair (host-split);
    anything else -> jnp.asarray (today's behavior).
    """
    if isinstance(x, ComplexPair):
        return x
    if needs_float_boundary() and np.iscomplexobj(np.asarray(x)):
        x = np.asarray(x)
        return ComplexPair(jnp.asarray(np.ascontiguousarray(x.real)),
                           jnp.asarray(np.ascontiguousarray(x.imag)))
    return jnp.asarray(x)


def device_complex_adc(x):
    """device_complex with a LOSSLESS uint8 wire for ADC-grid captures.

    The reference dongle's samples are (byte - 127)/128 (capbuf.cpp
    :174); for captures on that grid the planes cross the link as the
    raw uint8 codes (4x fewer bytes than float32 -- through a remote
    tunnel the capture upload dominates band-scan wall time) and a
    tiny jitted program reconstructs exact float32 planes on device,
    returned as a device-resident ComplexPair.  The +128 saturated
    code is representable (uint8, offset +127), so unlike the int8
    CORRELATION quantization this path is bit-exact for every capture
    the grid check accepts.  Non-grid captures fall back to
    device_complex unchanged; so do plain-jit (non-boundary) backends,
    where keeping complex device arrays is already free."""
    if isinstance(x, ComplexPair) or not needs_float_boundary():
        return device_complex(x)
    from .corr_pallas import is_adc_grid
    x = np.asarray(x)
    if not is_adc_grid(x):
        return device_complex(x)
    k_re = (np.round(x.real * 128.0) + 127.0).astype(np.uint8)
    k_im = (np.round(x.imag * 128.0) + 127.0).astype(np.uint8)
    # decode to the dtype the float-plane path would have used (f64 for
    # complex128 captures on x64 hosts -- the golden CPU paths keep
    # their precision; without x64 this resolves to f32 anyway)
    dec = _adc_decoder(str(x.real.dtype))
    return ComplexPair(dec(jnp.asarray(k_re)), dec(jnp.asarray(k_im)))


_adc_dec_cache: Dict[str, Any] = {}


def _adc_decoder(dtype_name: str):
    """Cached per-dtype jitted uint8 -> float decoder (a fresh jax.jit
    per call would re-trace -- and through the tunnel, re-COMPILE --
    on every capture, measured at ~400 ms per upload)."""
    fn = _adc_dec_cache.get(dtype_name)
    if fn is None:
        rdt = jnp.dtype(dtype_name)

        def dec(k):
            return (k.astype(rdt) - 127.0) / 128.0

        fn = _adc_dec_cache[dtype_name] = jax.jit(dec)
    return fn


def _split_arg(a):
    """-> (tag, [leaves]) for one positional argument."""
    if isinstance(a, ComplexPair):
        return "c", [a.re, a.im]
    if isinstance(a, jax.Array) and jnp.iscomplexobj(a):
        # a device-resident complex array cannot be pulled back to split
        # on host; the split must happen before transfer
        raise TypeError(
            "safe_jit: got a device-resident complex array under an "
            "active float boundary; pass the host array or use "
            "device_complex() at the transfer point")
    a_np = np.asarray(a) if not isinstance(a, jax.Array) else None
    if a_np is not None and np.iscomplexobj(a_np):
        return "c", [jnp.asarray(np.ascontiguousarray(a_np.real)),
                     jnp.asarray(np.ascontiguousarray(a_np.imag))]
    return "r", [a]


def safe_jit(fn, static_argnames: Tuple[str, ...] = ()):
    """jax.jit that never passes complex buffers across the boundary.

    Positional array/scalar arguments only (statics may be positional or
    keyword; they are resolved by name against fn's signature).  When
    the boundary is inactive this returns plain jax.jit(fn).
    """
    plain = jax.jit(fn, static_argnames=static_argnames)
    try:
        params = list(inspect.signature(fn).parameters)
    except (TypeError, ValueError):
        params = []
    inner_cache: Dict[Any, Any] = {}

    def wrapped(*args, **kwargs):
        if not needs_float_boundary():
            return plain(*args, **kwargs)
        if any(isinstance(a, jax.core.Tracer) for a in args):
            # called inside an outer trace (e.g. the sharded front end):
            # no host boundary is being crossed here, so no splitting
            return plain(*args, **kwargs)

        # slot map over the ORIGINAL positional list: statics stay in
        # place (re-inserted positionally at trace time), dynamics are
        # split into float leaves -- statics may therefore appear
        # anywhere, including between dynamic args
        slots = []           # ("s", value) | ("d", tag)
        flat = []
        kw_statics = {}
        for i, a in enumerate(args):
            name = params[i] if i < len(params) else None
            if name in static_argnames:
                slots.append(("s", a))
            else:
                t, leaves = _split_arg(a)
                slots.append(("d", t))
                flat.extend(leaves)
        for k, v in kwargs.items():
            if k in static_argnames:
                kw_statics[k] = v
            else:
                raise TypeError(f"safe_jit: non-static kwarg {k!r}")

        key = (tuple(slots), tuple(sorted(kw_statics.items())))

        if key not in inner_cache:
            meta: Dict[str, Any] = {}
            slots_k = tuple(slots)
            kw_k = dict(kw_statics)

            def inner(*flat_args):
                rebuilt = []
                i = 0
                for kind, v in slots_k:
                    if kind == "s":
                        rebuilt.append(v)
                    elif v == "c":
                        rebuilt.append(jax.lax.complex(flat_args[i],
                                                       flat_args[i + 1]))
                        i += 2
                    else:
                        rebuilt.append(flat_args[i])
                        i += 1
                out = fn(*rebuilt, **kw_k)
                leaves, odef = jax.tree_util.tree_flatten(out)
                oleaves = []
                otags = []
                for leaf in leaves:
                    if jnp.iscomplexobj(leaf):
                        otags.append(True)
                        oleaves.append((jnp.real(leaf), jnp.imag(leaf)))
                    else:
                        otags.append(False)
                        oleaves.append(leaf)
                meta["otags"] = otags
                meta["odef"] = odef
                return oleaves
            inner_cache[key] = (jax.jit(inner), meta)

        inner_jit, meta = inner_cache[key]
        oleaves = inner_jit(*flat)
        # ONE batched device_get: copy_to_host_async is issued for every
        # leaf before any blocking wait, so the tunnel's ~20 ms per-RPC
        # latency is paid once, not once per output array
        oleaves = jax.device_get(oleaves)
        out_leaves = [leaf[0] + 1j * leaf[1] if tag else leaf
                      for tag, leaf in zip(meta["otags"], oleaves)]
        return jax.tree_util.tree_unflatten(meta["odef"], out_leaves)

    wrapped.__name__ = getattr(fn, "__name__", "safe_jit")
    wrapped.__doc__ = fn.__doc__
    return wrapped
