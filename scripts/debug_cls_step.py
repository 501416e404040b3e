"""Bisect the Hengshuang train_cls step: why is the e2e scanned step slower
than the bare fwd+bwd profile? Builds the exact CLI pieces and times one
S-step dispatch under variations (augment on/off, SGD vs Adam, S length)."""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from simple3dformer_tpu.data import augment, datasets  # noqa: E402
from simple3dformer_tpu.data.pipeline import DeviceResidentDataset  # noqa: E402
from simple3dformer_tpu.models.hengshuang import PointTransformerCls  # noqa: E402
from simple3dformer_tpu.parallel.mesh import ShardingRules, make_mesh  # noqa: E402
from simple3dformer_tpu.train.loop import (  # noqa: E402
    create_train_state, make_scanned_train_steps)
from simple3dformer_tpu.train.optim import make_optimizer  # noqa: E402

B, N, S = 64, 1024, 16


def main(dtype=jnp.bfloat16):
    mesh = make_mesh()
    rules = ShardingRules(mesh)
    model = PointTransformerCls(num_point=N, num_class=40, input_dim=6,
                                dtype=dtype)

    rng = np.random.RandomState(0)
    tr = datasets.synthetic_points(1024, N, 6, 40, seed=9)
    ds = DeviceResidentDataset({"x": tr[0], "y": tr[1]}, mesh=mesh)

    variables = jax.jit(model.init)(jax.random.key(0),
                                    jnp.zeros((2, N, 6)))
    has_bn = "batch_stats" in variables

    for name, opt, aug in [
        ("SGD+momentum, augment", make_optimizer("SGD"), augment.device_cls_augment),
        ("SGD+momentum, no augment", make_optimizer("SGD"), None),
        ("Adam, no augment", make_optimizer("Adam"), None),
    ]:
        try:
            tx = opt
        except Exception as e:
            print(name, "opt build failed:", e)
            continue
        clone = jax.jit(lambda t: jax.tree_util.tree_map(lambda a: a + 0, t))
        state = create_train_state(clone(variables["params"]),
                                   tx, clone(variables.get("batch_stats")))
        state = jax.device_put(state, rules.params)
        run = make_scanned_train_steps(model, tx, ds, rules,
                                       has_batch_stats=has_bn,
                                       augment_fn=aug)
        idx = rules.put_scan_idx(
            rng.randint(0, 1024, size=(S, B)).astype(np.int32))
        state, m = run(state, idx, 1e-2, jax.random.key(1))
        float(m["loss"][-1])
        t0 = time.time()
        state, m = run(state, idx, 1e-2, jax.random.key(1))
        float(m["loss"][-1])
        dt = time.time() - t0
        print(f"{name:30s} {dt / S * 1000:8.1f} ms/step "
              f"({B * S / dt:.0f} samples/sec)", flush=True)


if __name__ == "__main__":
    tag = sys.argv[1] if len(sys.argv) > 1 else "bf16"
    main(jnp.bfloat16 if tag == "bf16" else None)
