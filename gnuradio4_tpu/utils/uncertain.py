"""UncertainValue — value ± uncertainty arithmetic
(≈ reference meta/UncertainValue.hpp: a first-class sample type for math/filter/
electrical blocks).

Registered as a jax pytree, so UncertainValue arrays flow through jitted block
functions; propagation follows first-order (Gaussian, uncorrelated) rules.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class UncertainValue:
    value: Any
    uncertainty: Any = 0.0

    def tree_flatten(self):
        return (self.value, self.uncertainty), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    # -- arithmetic (uncorrelated first-order propagation) --------------------
    def _coerce(self, other) -> "UncertainValue":
        if isinstance(other, UncertainValue):
            return other
        return UncertainValue(other, jnp.zeros_like(jnp.asarray(other)) * 0.0)

    def __add__(self, other):
        o = self._coerce(other)
        return UncertainValue(self.value + o.value,
                              jnp.hypot(jnp.asarray(self.uncertainty, jnp.float32),
                                        jnp.asarray(o.uncertainty, jnp.float32)))

    __radd__ = __add__

    def __sub__(self, other):
        o = self._coerce(other)
        return UncertainValue(self.value - o.value,
                              jnp.hypot(jnp.asarray(self.uncertainty, jnp.float32),
                                        jnp.asarray(o.uncertainty, jnp.float32)))

    def __rsub__(self, other):
        return self._coerce(other).__sub__(self)

    def __mul__(self, other):
        o = self._coerce(other)
        v = self.value * o.value
        u = jnp.hypot(jnp.asarray(self.uncertainty) * o.value,
                      jnp.asarray(o.uncertainty) * self.value)
        return UncertainValue(v, jnp.abs(u))

    __rmul__ = __mul__

    def __truediv__(self, other):
        o = self._coerce(other)
        v = self.value / o.value
        u = jnp.hypot(jnp.asarray(self.uncertainty) / o.value,
                      jnp.asarray(o.uncertainty) * self.value / (o.value * o.value))
        return UncertainValue(v, jnp.abs(u))

    def __rtruediv__(self, other):
        return self._coerce(other).__truediv__(self)

    def __neg__(self):
        return UncertainValue(-self.value, self.uncertainty)

    def sqrt(self):
        v = jnp.sqrt(self.value)
        return UncertainValue(v, jnp.asarray(self.uncertainty) / (2.0 * v))

    def __repr__(self):
        return f"UncertainValue({self.value!r} ± {self.uncertainty!r})"

    def nominal(self):
        return self.value

    def relative(self):
        return jnp.abs(jnp.asarray(self.uncertainty) / self.value)
