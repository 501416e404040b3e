"""Shared honest scan-timing helper.

Two invalidating effects on this stack, both verified on the real chip
(2026-08-16):

1. LICM hoisting. The naive protocol — jit a `lax.scan` of REPS identical
   calls and divide by REPS — is INVALID: XLA's while-loop invariant code
   motion can hoist the entire loop-invariant body, so the scan measures ONE
   execution divided by REPS (a full Hengshuang train step measured 22 ms
   naive vs 193 ms carry-dependent; 193 matches the e2e CLI epoch rate).
   `timeit` threads the f32 scan carry into the first floating-point
   argument leaf (x + c * 1e-12) so every iteration must re-execute.

2. Dispatch floor. One synchronized call through the tunnel costs ~24-33 ms
   regardless of body size, so ms/call = total/REPS carries a +floor/REPS
   bias — at the old REPS=10 that was ~2.4-3 ms added to every number, which
   swamps sub-5 ms kernels (a [4100,768]x[768,768] f/b reads as 2.7 ms when
   it really runs ~0.3). `timeit` now measures the floor once per process
   (trivial-body scan at the same rep count) and subtracts it.

Synchronization is by scalar fetch: jax.block_until_ready can return early
on the tunneled axon backend.
"""

import time

import jax
import jax.numpy as jnp

REPS = 50

_floor_ms = {}


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


def _run(fn, args, reps):
    def scanned(*a):
        def body(c, _):
            r = fn(*_perturb_first_float_leaf(a, c))
            # anchor the MEAN of every output element, not element [0]: a
            # single-element anchor lets XLA slice whole batch rows out of
            # shape-preserving forwards (ViP-3D stage1+ blocks measured
            # 0.02 ms for 6.6 GFLOP — 330 TFLOP/s, impossible — under the
            # old [0] anchor; round-4). The mean makes every element live.
            return c + jnp.mean(r).astype(jnp.float32), None

        out, _ = jax.lax.scan(body, jnp.float32(0), None, length=reps)
        return out

    f = jax.jit(scanned)
    float(f(*args))  # compile + warmup
    t0 = time.time()
    float(f(*args))
    return (time.time() - t0) / reps * 1000


def dispatch_floor(reps=REPS):
    """ms/rep cost of an empty synchronized scan (cached per rep count)."""
    if reps not in _floor_ms:
        x = jnp.ones((8, 128), jnp.float32)
        _floor_ms[reps] = _run(lambda x: x * 1.000001, (x,), reps)
    return _floor_ms[reps]


def timeit(name, fn, *args, reps=REPS):
    """Honest scan timing: fn(*args) -> array; prints and returns ms/call
    net of the per-dispatch floor."""
    dt = _run(fn, args, reps) - dispatch_floor(reps)
    print(f"{name:56s} {dt:8.2f} ms", flush=True)
    return dt


def time_carried(name, step, carry, args, reps=30):
    """ms/call of carry' = step(carry, args) with the full result tree
    threaded as the scan carry.

    For whole-tree workloads (optimizer passes) `timeit` is INVALID three
    ways: it perturbs only the first float leaf (other leaves hoist via
    LICM), a scalar-reduced return lets XLA dead-code-eliminate sibling
    leaves, and moment-style outputs that only feed elementwise consumers
    are never materialized to HBM even when "live". Threading the tree as
    the carry forces every iteration to read the previous iteration's
    materialized buffers and write its own — the production scanned-train-
    step regime. `args` stays loop-invariant (safe only when every output
    also depends on the carry, as in an optimizer update; a pure function
    of args alone would still hoist)."""
    def scanned(c, a):
        out, _ = jax.lax.scan(lambda cc, _: (step(cc, a), None), c, None,
                              length=reps)
        return out

    f = jax.jit(scanned)

    def sync(out):
        float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])

    sync(f(carry, args))  # compile + warmup
    t0 = time.time()
    sync(f(carry, args))
    dt = (time.time() - t0) / reps * 1000 - dispatch_floor(reps)
    print(f"{name:56s} {dt:8.2f} ms", flush=True)
    return dt
