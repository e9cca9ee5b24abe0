"""Transport-safe host<->device transfer shims.

The axon TPU relay in this environment has a partially-implemented PJRT
transfer surface (probed empirically, 2026-08-19 — see docs/PERFORMANCE.md):

==========================================  ==============
path                                        status
==========================================  ==============
float/int H2D (any rank, incl. 0-d)         works
complex64/128 H2D (any rank, incl. scalar)  UNIMPLEMENTED
float/int D2H, >=1 element                  works
0-d D2H (ANY dtype)                         UNIMPLEMENTED
complex D2H (any rank)                      UNIMPLEMENTED
on-device complex compute                   works
complex constants embedded in a jit         works
complex device arrays passed between jits   works
==========================================  ==============

Because the relay also DEFERS execution, a poisoned transfer surfaces as a
``JaxRuntimeError: UNIMPLEMENTED`` (or a hang) at the first *readback*
downstream — which is how it masqueraded as a whole-transport outage for all
of round 2.

The shims here route every transfer through the always-working subset:

- :func:`safe_put` — pytree H2D; complex leaves are split into float
  real/imag planes, transferred, and recombined by a tiny on-device jit.
- :func:`safe_get` — pytree D2H; one jit packs each leaf into a
  transfer-safe form (complex -> ``stack([re, im], -1)`` float, 0-d ->
  shape ``(1,)``), the floats are pulled, and the leaves are re-assembled
  host-side (dtype- and shape-exact).
- :func:`safe_scalar` — read back one scalar (device 0-d or 0-d-producing
  expression) as a float.

These are no-ops in spirit on healthy backends (CPU, real pods) — only a
cheap reshape/stack — so they are safe to use unconditionally at every
framework host<->device boundary (feeders, sinks, checkpoints, benches).

Reference analog: the reference moves samples across its process boundary
through the double-mapped ring (`CircularBuffer.hpp:75`); this module is the
equivalent "last hop" layer for the TPU build, hardened for the relay.
"""

from __future__ import annotations

import functools
from typing import Any

import numpy as np

__all__ = ["safe_put", "safe_get", "safe_scalar", "pack_for_transfer",
           "unpack_host"]


def _jax():
    import jax
    import jax.numpy as jnp
    return jax, jnp


@functools.lru_cache(maxsize=None)
def _combiner(real_dtype: str):
    jax, jnp = _jax()

    def comb(r, i):
        return (r + 1j * i).astype(
            jnp.complex64 if real_dtype == "float32" else jnp.complex128)

    return jax.jit(comb)


def _is_complex(x: Any) -> bool:
    dt = getattr(x, "dtype", None)
    if dt is not None:
        return np.issubdtype(np.dtype(dt), np.complexfloating)
    return isinstance(x, complex)


def _put_leaf(x: Any, device=None):
    jax, jnp = _jax()
    if isinstance(x, jax.Array):
        return x if device is None else jax.device_put(x, device)
    if _is_complex(x):
        a = np.asarray(x)
        real_dt = "float32" if a.dtype != np.complex128 else "float64"
        # ascontiguousarray PROMOTES 0-d to 1-d — reshape back so a complex
        # scalar round-trips as a scalar (caught by the biquad carry tests)
        r = jax.device_put(np.ascontiguousarray(a.real).reshape(a.shape),
                           device)
        i = jax.device_put(np.ascontiguousarray(a.imag).reshape(a.shape),
                           device)
        return _combiner(real_dt)(r, i)
    return jax.device_put(x, device)


def safe_put(tree: Any, device=None) -> Any:
    """H2D a pytree; complex leaves travel as float planes (relay-safe)."""
    jax, _ = _jax()
    return jax.tree_util.tree_map(lambda x: _put_leaf(x, device), tree)


def pack_for_transfer(x):
    """On-device packing of one array into a D2H-safe float form.

    Must be called INSIDE a jit (or on traced values): complex ->
    ``stack([re, im], -1)``; 0-d -> shape ``(1,)``; bool -> uint8.
    Returns ``(packed, kind)`` where ``kind`` is the recipe
    :func:`unpack_host` needs.
    """
    _, jnp = _jax()
    x = jnp.asarray(x)
    kind = {"shape": x.shape, "dtype": str(x.dtype)}
    if jnp.issubdtype(x.dtype, jnp.complexfloating):
        x = jnp.stack([x.real, x.imag], axis=-1)
        kind["complex"] = True
    if x.dtype == jnp.bool_:
        x = x.astype(jnp.uint8)
        kind["bool"] = True
    if x.ndim == 0:
        x = x.reshape(1)
    return x, kind


def unpack_host(h: np.ndarray, kind: dict) -> np.ndarray:
    """Host-side inverse of :func:`pack_for_transfer`."""
    a = np.asarray(h)
    if kind.get("complex"):
        a = (a[..., 0] + 1j * a[..., 1]).astype(kind["dtype"])
    if kind.get("bool"):
        a = a.astype(bool)
    return a.reshape(kind["shape"])


def _kind_of(x) -> dict:
    """Static transfer recipe for one leaf (host-side, no trace needed)."""
    # NB: hasattr first — getattr(x, "dtype", np.asarray(x).dtype) would
    # evaluate the default EAGERLY and trigger the very raw complex D2H
    # this module exists to avoid (found by the TPU suite run)
    a = np.dtype(x.dtype) if hasattr(x, "dtype") else np.asarray(x).dtype
    shape = tuple(x.shape) if hasattr(x, "shape") else np.shape(x)
    kind = {"shape": shape, "dtype": str(a)}
    if np.issubdtype(a, np.complexfloating):
        kind["complex"] = True
    if a == np.bool_:
        kind["bool"] = True
    return kind


@functools.lru_cache(maxsize=None)
def _packer(n_leaves: int):
    jax, _ = _jax()

    def pack_all(ls):
        return [pack_for_transfer(x)[0] for x in ls]

    return jax.jit(pack_all)


def _is_extended(x) -> bool:
    import jax
    dt = getattr(x, "dtype", None)
    try:
        return dt is not None and jax.numpy.issubdtype(dt, jax.dtypes.extended)
    except TypeError:
        return False


def safe_get(tree: Any) -> Any:
    """D2H a pytree of device arrays through the relay-safe float path.

    PRNG-key leaves (extended dtypes) pass through ``jax.device_get``
    unchanged — their underlying data is unsigned ints (relay-safe) and
    they cannot be expressed as numpy arrays."""
    jax, _ = _jax()
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    if not leaves:
        return tree
    ext = [_is_extended(x) for x in leaves]
    plain = [x for x, e in zip(leaves, ext) if not e]
    host_plain: list = []
    if plain:
        kinds = [_kind_of(x) for x in plain]
        packed = _packer(len(plain))(plain)
        host_plain = [unpack_host(np.asarray(p), k)
                      for p, k in zip(packed, kinds)]
    it = iter(host_plain)
    host = [jax.device_get(x) if e else next(it)
            for x, e in zip(leaves, ext)]
    return jax.tree_util.tree_unflatten(treedef, host)


@functools.lru_cache(maxsize=None)
def _zeros_fn(shape: tuple, dtype_str: str):
    jax, jnp = _jax()
    return jax.jit(lambda: jnp.zeros(shape, dtype_str))


def device_zeros(shape, dtype):
    """``jnp.zeros`` that is relay-safe for complex dtypes.

    Eager ``jnp.zeros(..., complex64)`` materializes the constant host-side
    and ships it through complex H2D — UNIMPLEMENTED on the axon relay, and
    the deferred-execution poison surfaces at an unrelated later readback.
    Producing the zeros INSIDE a jit keeps them device-born. Safe to call
    both eagerly (compiles one tiny cached program per shape/dtype) and
    under an outer trace (inlines)."""
    shape = (shape,) if isinstance(shape, int) else tuple(shape)
    return _zeros_fn(shape, np.dtype(dtype).name)()


_CPU_BACKEND: bool | None = None


def host_array(a) -> np.ndarray:
    """One device array → host numpy, routing complex/0-d leaves through the
    relay-safe path. The float fast path stays a plain ``np.asarray``; on the
    CPU backend everything does (no relay)."""
    global _CPU_BACKEND
    if isinstance(a, np.ndarray) or not hasattr(a, "dtype"):
        return np.asarray(a)
    if _CPU_BACKEND is None:
        import jax
        _CPU_BACKEND = jax.default_backend() == "cpu"
    if _CPU_BACKEND:
        return np.asarray(a)
    if np.issubdtype(np.dtype(a.dtype), np.complexfloating) or a.ndim == 0:
        return safe_get(a)
    return np.asarray(a)


def safe_scalar(x) -> float:
    """Read one scalar back as a Python float (0-d D2H is UNIMPLEMENTED on
    the relay — broadcast to 8 lanes and take lane 0)."""
    jax, jnp = _jax()
    v = jax.jit(lambda t: jnp.broadcast_to(
        jnp.asarray(t, jnp.float32).reshape(()), (8,)))(x)
    return float(np.asarray(v)[0])


@functools.lru_cache(maxsize=1)
def host_callbacks_supported() -> bool:
    """Whether the active backend supports host send/recv callbacks
    (``jax.pure_callback`` / ``io_callback`` / ``debug.callback``).

    The axon PJRT relay does NOT ("axon_pjrt does not support host
    send/recv callbacks") — blocks built on callbacks (PolarDecoder's SC
    walk, ReedSolomon stream blocks, PythonBlock host mode) cannot run
    there, while real TPU runtimes support them. Detected from the PJRT
    platform_version string, never by probing (a failed call would poison
    the client)."""
    import jax
    if jax.default_backend() == "cpu":
        return True
    try:
        ver = getattr(jax.devices()[0].client, "platform_version", "")
    except Exception:
        return True
    return "axon" not in str(ver)
