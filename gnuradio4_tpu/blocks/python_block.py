"""User-function blocks (≈ reference blocks/basic PythonBlock.hpp:22 — embedded
CPython user blocks).

In a Python-first framework the "PythonBlock" degenerates to wrapping a user
callable. Two flavors:

- :class:`LambdaBlock` — pure jax function over the sample block (traced into the
  fused device program; the fast path);
- :class:`HostBlock` — arbitrary host NumPy function executed OUTSIDE the jitted
  step via ``jax.pure_callback`` (escape hatch for non-traceable code; slow path,
  device round-trip per step — same perf caveat as the reference's embedded
  interpreter).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..core.block import Block, Port
from ..core.registry import register_block
from ..core.settings import Setting


@register_block("LambdaBlock")
class LambdaBlock(Block):
    """Wrap a pure jax function ``fn(x, ctx) -> y`` (or ``fn(x) -> y``)."""

    IN = (Port("in"),)
    OUT = (Port("out"),)

    def __init__(self, fn: Callable = None, name=None, n_inputs: int = 1,
                 **settings):
        super().__init__(name=name, **settings)
        if fn is None:
            fn = lambda x: x
        self.fn = fn
        if n_inputs != 1:
            self.in_ports = tuple(Port(f"in{i}") for i in range(n_inputs))

    def apply(self, state, ins, ctx):
        args = [ins[p.name] for p in self.in_ports]
        try:
            y = self.fn(*args, ctx=ctx)
        except TypeError:
            y = self.fn(*args)
        return state, {"out": y}


@register_block("HostBlock")
class HostBlock(Block):
    """Run a host NumPy function inside the traced step via pure_callback.

    ``fn(np.ndarray) -> np.ndarray`` must preserve shape/dtype (or declare
    ``out_shape_fn``). Every step pays a device↔host round-trip — use for
    prototyping only (same caveat as the reference's PythonBlock).
    """

    IN = (Port("in"),)
    OUT = (Port("out"),)

    def __init__(self, fn: Callable[[np.ndarray], np.ndarray] = None,
                 name=None, out_shape_fn: Callable | None = None, **settings):
        super().__init__(name=name, **settings)
        self.fn = fn or (lambda x: x)
        self.out_shape_fn = out_shape_fn

    def apply(self, state, ins, ctx):
        if jax.default_backend() == "tpu":
            # some TPU transports (e.g. the axon tunnel) cannot do host
            # send/recv callbacks at all — fail with guidance instead of a
            # runtime UNIMPLEMENTED deep inside XLA
            from ..core.errors import GrError
            raise GrError(
                f"{self.name}: HostBlock (pure_callback) is not supported on "
                f"this TPU transport; run the graph on CPU, or port the "
                f"function to jax and use LambdaBlock")
        x = ins["in"]
        shape = jax.ShapeDtypeStruct(x.shape, x.dtype) if self.out_shape_fn is None \
            else self.out_shape_fn(x)
        y = jax.pure_callback(self.fn, shape, x, vmap_method="sequential")
        return state, {"out": y}
