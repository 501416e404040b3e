"""Shared honest scan-timing helper.

The naive protocol — jit a `lax.scan` of REPS identical calls and divide by
REPS — is INVALID on this stack: XLA's while-loop invariant code motion can
hoist the entire loop-invariant body, so the scan measures ONE execution
divided by REPS. Verified on the real chip 2026-08-16: a full Hengshuang
train step measured 22 ms under the naive protocol vs 193 ms with a
carry-dependent input — and 193 ms matches the e2e CLI epoch rate.
(Round-1/2 kernel microbenches in BASELINE.md used the naive protocol; their
*ratios* remained meaningful — hoisting divides both sides equally when it
fires — but absolute ms were unreliable. E2E CLI rates were never affected.)

`timeit` here threads the f32 scan carry into the first floating-point
argument leaf (x + c * 1e-12) so every iteration depends on the previous
one and the body must re-execute. Synchronization is by scalar fetch:
jax.block_until_ready can return early on the tunneled axon backend.
"""

import time

import jax
import jax.numpy as jnp

REPS = 10


def _perturb_first_float_leaf(args, c):
    """Return args with `c * 1e-12` added to the first float array leaf."""
    done = [False]

    def visit(x):
        if (not done[0] and hasattr(x, "dtype")
                and jnp.issubdtype(x.dtype, jnp.floating)):
            done[0] = True
            return x + (c * 1e-12).astype(x.dtype)
        return x

    out = jax.tree_util.tree_map(visit, list(args))
    if not done[0]:
        raise ValueError("timeit needs at least one float array argument")
    return tuple(out)


def timeit(name, fn, *args, reps=REPS):
    """Honest scan timing: fn(*args) -> array; prints and returns ms/call."""

    def scanned(*a):
        def body(c, _):
            r = fn(*_perturb_first_float_leaf(a, c))
            return c + r.reshape(-1)[0].astype(jnp.float32), None

        out, _ = jax.lax.scan(body, jnp.float32(0), None, length=reps)
        return out

    f = jax.jit(scanned)
    float(f(*args))  # compile + warmup
    t0 = time.time()
    float(f(*args))
    dt = (time.time() - t0) / reps * 1000
    print(f"{name:56s} {dt:8.2f} ms", flush=True)
    return dt
