"""Pallas TPU kernel: fully fused Adam update (experiment, VERDICT r2 #6).

The flagship step anatomy (BASELINE.md round-2e) names the optimizer pass as
the largest non-matmul term: ~0.46 ms of a 2.1 ms step over 21.5M f32 params.
The production path is optax scale_by_adam -> apply_lr -> apply_updates —
three tree_maps whose per-leaf lambdas XLA fuses per leaf, with the
intermediate `updates` array materialized between the optimizer and the
apply. The theoretical floor is pure HBM traffic: read (p, m, v, g) + write
(p, m, v) = 7 passes = ~600 MB at the flagship size.

This kernel does the whole update in ONE pallas_call per leaf-group: inputs
aliased to outputs (in-place semantics), one VMEM tile pass, zero
intermediates:

    m' = b1 m + (1-b1) g
    v' = b2 v + (1-b2) g^2
    p' = p - lr * (m'/(1-b1^t)) / (sqrt(v'/(1-b2^t)) + eps)

identical math to optax.scale_by_adam(b1, b2, eps) + apply_lr (bias
correction included), verified elementwise in tests.

Measured verdict: see BASELINE.md round-3 — kept as an experiment with the
A/B recorded either way, like the round-2 attention kernels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_SUBL = 8
_TILE_ROWS = 512  # rows of 128 lanes per grid step: 512*128*4B*7 ~ 1.8 MB VMEM


def _adam_kernel(sc_ref, p_ref, m_ref, v_ref, g_ref,
                 po_ref, mo_ref, vo_ref, *, b1, b2, eps):
    # [lr, bc1, bc2] ride in SMEM as runtime scalars: lr may be a traced
    # value (LR schedules), and the bias corrections 1-b**t are computed
    # OUTSIDE the kernel — Mosaic cannot legalize math.powf with a traced
    # exponent — and divided here to match optax's rounding exactly.
    lr, bc1, bc2 = sc_ref[0], sc_ref[1], sc_ref[2]
    g = g_ref[...]
    m = b1 * m_ref[...] + (1.0 - b1) * g
    v = b2 * v_ref[...] + (1.0 - b2) * g * g
    mhat = m / bc1
    vhat = v / bc2
    po_ref[...] = p_ref[...] - lr * mhat / (jnp.sqrt(vhat) + eps)
    mo_ref[...] = m
    vo_ref[...] = v


def _fused_adam_flat(p, m, v, g, count, lr, b1, b2, eps,
                     interpret=False):
    """One fused update over flat f32 arrays of identical length."""
    n = p.size
    rows = -(-n // _LANES)
    rows_pad = -(-rows // _TILE_ROWS) * _TILE_ROWS

    def pack(x):
        x = jnp.pad(x.reshape(-1), (0, rows_pad * _LANES - n))
        return x.reshape(rows_pad, _LANES)

    grid = rows_pad // _TILE_ROWS
    spec = pl.BlockSpec((_TILE_ROWS, _LANES), lambda i: (i, 0))
    kernel = functools.partial(_adam_kernel, b1=b1, b2=b2, eps=eps)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    t = count.astype(jnp.float32)
    scalars = jnp.stack([
        jnp.asarray(lr, jnp.float32).reshape(()),
        1.0 - b1 ** t, 1.0 - b2 ** t])
    po, mo, vo = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[smem] + [spec] * 4,
        out_specs=[spec] * 3,
        out_shape=[jax.ShapeDtypeStruct((rows_pad, _LANES), jnp.float32)] * 3,
        input_output_aliases={1: 0, 2: 1, 3: 2},
        interpret=interpret,
    )(scalars, pack(p), pack(m), pack(v), pack(g))
    return (po.reshape(-1)[:n].reshape(p.shape),
            mo.reshape(-1)[:n].reshape(p.shape),
            vo.reshape(-1)[:n].reshape(p.shape))


def fused_adam_update(params, grads, mu, nu, count, lr,
                      b1=0.9, b2=0.999, eps=1e-8, interpret=False):
    """Tree-wise fused Adam. Returns (new_params, new_mu, new_nu).

    `count` is the post-increment step (optax convention: first update uses
    count=1). Small leaves (< one tile) go through plain jnp — a Pallas
    dispatch per 1-KB bias tensor costs more than it saves.
    """
    leaves, treedef = jax.tree_util.tree_flatten(params)
    gl = treedef.flatten_up_to(grads)
    ml = treedef.flatten_up_to(mu)
    nl = treedef.flatten_up_to(nu)
    count = count.astype(jnp.int32)
    new_p, new_m, new_v = [], [], []
    for p, g, m, v in zip(leaves, gl, ml, nl):
        # dtype guard: _fused_adam_flat hardcodes f32 tiles and aliases
        # inputs to f32 outputs; non-f32 leaves take the jnp path (where
        # the arithmetic follows the leaf's own dtype promotion)
        if p.size >= _TILE_ROWS * _LANES and p.dtype == jnp.float32:
            po, mo, vo = _fused_adam_flat(p, m, v, g, count, lr, b1, b2,
                                          eps, interpret)
        else:
            t = count.astype(jnp.float32)
            mo = b1 * m + (1.0 - b1) * g
            vo = b2 * v + (1.0 - b2) * g * g
            mhat = mo / (1.0 - b1 ** t)
            vhat = vo / (1.0 - b2 ** t)
            po = p - lr * mhat / (jnp.sqrt(vhat) + eps)
        new_p.append(po)
        new_m.append(mo)
        new_v.append(vo)
    unf = jax.tree_util.tree_unflatten
    return unf(treedef, new_p), unf(treedef, new_m), unf(treedef, new_v)


# ---------------------------------------------------------------------------
# e2e integration: a (tx, opt_update_fn) pair pluggable into
# train.loop.make_scanned_train_steps(opt_update_fn=...). Matches the
# production path exactly: multi_transform-frozen leaves (trainable_mask
# False) receive zero updates and carry NO optimizer state — the fused path
# skips them entirely, which also skips the production path's read+write of
# every frozen param in optax.apply_updates.
# ---------------------------------------------------------------------------


def fused_adam_pair(trainable_mask=None, b1=0.9, b2=0.999, eps=1e-8,
                    interpret=False):
    """Returns (tx, opt_update_fn) for the fused-Adam train-step path.

    tx is an optax.GradientTransformation whose init builds
    {"count", "mu", "nu"} state (moments only for trainable leaves; frozen
    leaves hold zero-size placeholders) so create_train_state works
    unchanged. tx.update raises — the train step must be built with
    ``opt_update_fn``, which performs the whole
    grads -> (new_params, new_opt_state) update in one fused kernel pass
    per leaf, lr included (no separate apply_lr/apply_updates stage).
    """
    import optax

    def mask_of(params):
        if trainable_mask is None:
            return jax.tree_util.tree_map(lambda _: True, params)
        return trainable_mask

    def init(params):
        m = mask_of(params)
        zeros = jax.tree_util.tree_map(
            lambda p, t: jnp.zeros_like(p) if t
            else jnp.zeros((0,), p.dtype), params, m)
        return {"count": jnp.zeros((), jnp.int32), "mu": zeros,
                "nu": jax.tree_util.tree_map(jnp.copy, zeros)}

    def update(grads, state, params=None):
        raise NotImplementedError(
            "fused_adam_pair's tx is init-only; build the train step with "
            "opt_update_fn=pair[1]")

    def opt_update_fn(grads, state, params, lr):
        count = state["count"] + 1
        m = mask_of(params)
        leaves, treedef = jax.tree_util.tree_flatten(params)
        gl = treedef.flatten_up_to(grads)
        ml = treedef.flatten_up_to(state["mu"])
        nl = treedef.flatten_up_to(state["nu"])
        tl = treedef.flatten_up_to(m)
        new_p, new_m, new_v = [], [], []
        for p, g, mu_l, nu_l, train in zip(leaves, gl, ml, nl, tl):
            if not train:
                new_p.append(p)
                new_m.append(mu_l)
                new_v.append(nu_l)
                continue
            po, mo, vo = fused_adam_update(
                p, g, mu_l, nu_l, count, lr, b1=b1, b2=b2, eps=eps,
                interpret=interpret)
            new_p.append(po)
            new_m.append(mo)
            new_v.append(vo)
        unf = jax.tree_util.tree_unflatten
        return unf(treedef, new_p), {
            "count": count, "mu": unf(treedef, new_m),
            "nu": unf(treedef, new_v)}

    return optax.GradientTransformation(init, update), opt_update_fn
