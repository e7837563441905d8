"""Trustworthy timing on the tunneled TPU.

The attached runtime dispatches asynchronously through a tunnel with a
~45 ms host round-trip, and jax.block_until_ready does not reliably wait
for device completion. The only trustworthy measurement is: dispatch one
call, pull one element of every output to host, subtract the round-trip
baseline (measured with a trivial op). Helpers here implement that.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

try:  # the env-var prologue is a no-op on this image (see jaxcache.py)
    from x264dsp_tpu.utils.jaxcache import ensure_compile_cache
    ensure_compile_cache()
except ImportError:
    pass

_BASELINE = None


def _pull(out):
    # one element of ONE leaf: all outputs of a single executable
    # complete together, and each device_get is a ~40 ms tunnel RPC —
    # pulling every leaf charges phantom round trips to multi-output
    # functions (a 16-plane list would be billed ~640 ms of RPCs)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[0]))


def baseline(force: bool = False) -> float:
    """Median host round-trip of a trivial jitted op, seconds."""
    global _BASELINE
    if _BASELINE is not None and not force:
        return _BASELINE
    f = jax.jit(lambda x, i: x * i)
    x = jnp.ones((8, 128))
    _pull(f(x, jnp.float32(0)))
    ts = []
    for i in range(1, 8):
        t0 = time.perf_counter()
        _pull(f(x, jnp.float32(i)))
        ts.append(time.perf_counter() - t0)
    _BASELINE = float(np.median(ts))
    return _BASELINE


def sync_time_ms(fn, argsets, n: int = 5) -> float:
    """Median per-call device time of fn in ms: per-call host sync minus
    the round-trip baseline. argsets: list of arg tuples (vary inputs —
    the runtime memoizes identical executions)."""
    base = baseline()
    _pull(fn(*argsets[0]))  # compile + warm
    ts = []
    for i in range(1, n + 1):
        args = argsets[i % len(argsets)]
        t0 = time.perf_counter()
        _pull(fn(*args))
        ts.append(time.perf_counter() - t0)
    return max(0.0, (float(np.median(ts)) - base) * 1e3)
