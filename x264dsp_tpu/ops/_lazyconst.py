"""Lazy device constants.

Module-level ``jnp.asarray(...)`` table constants initialize the JAX
backend as an *import side effect*: ``import x264dsp_tpu`` would block
on accelerator init (minutes on a cold TPU runtime, forever on a wedged
one) and pre-empt any platform pinning the caller wants to do via
``jax.config`` — pure host-side tools (entropy benchmarks, YUV IO)
could never import the package safely. ``LazyConst`` keeps the NumPy
value and materializes the device array on first *use*, which for all
in-repo uses happens inside a jit trace (where it embeds as a constant
exactly like the eager module-level array did).
"""

from __future__ import annotations

import numpy as np


class LazyConst:
    """A module-level constant that becomes a jax array on first use.

    Supports the access patterns the kernels use: indexing (including
    by tracers), ``shape``/``dtype``/``ndim`` without materializing,
    ``__jax_array__`` so jnp operations accept it as an operand, and
    attribute delegation (``.T``, ``.astype``, ``.reshape``, ...) to
    the materialized array.
    """

    def __init__(self, arr):
        self._np = np.asarray(arr)
        self._j = None

    def _mat(self):
        j = self._j
        if j is None:
            import jax
            import jax.numpy as jnp
            j = jnp.asarray(self._np)
            # inside a jit trace asarray stages a device_put and returns
            # a tracer — caching it would leak it out of the trace; only
            # the eager (concrete) array is cached
            if not isinstance(j, jax.core.Tracer):
                self._j = j
        return j

    def __jax_array__(self):
        return self._mat()

    def __getitem__(self, idx):
        return self._mat()[idx]

    @property
    def shape(self):
        return self._np.shape

    @property
    def dtype(self):
        return self._np.dtype

    @property
    def ndim(self):
        return self._np.ndim

    def __len__(self):
        return len(self._np)

    def __getattr__(self, name):
        # only called when normal lookup fails: delegate to the array
        return getattr(self._mat(), name)

    # Implicit special-method lookup bypasses __getattr__ (it reads the
    # TYPE, not the instance), so arithmetic/comparison operators are
    # delegated explicitly.
    def __add__(self, o):
        return self._mat() + o

    def __radd__(self, o):
        return o + self._mat()

    def __sub__(self, o):
        return self._mat() - o

    def __rsub__(self, o):
        return o - self._mat()

    def __mul__(self, o):
        return self._mat() * o

    def __rmul__(self, o):
        return o * self._mat()

    def __rshift__(self, o):
        return self._mat() >> o

    def __lshift__(self, o):
        return self._mat() << o

    def __and__(self, o):
        return self._mat() & o

    def __neg__(self):
        return -self._mat()

    def __eq__(self, o):
        return self._mat() == o

    def __ne__(self, o):
        return self._mat() != o

    def __lt__(self, o):
        return self._mat() < o

    def __le__(self, o):
        return self._mat() <= o

    def __gt__(self, o):
        return self._mat() > o

    def __ge__(self, o):
        return self._mat() >= o

    __hash__ = None
