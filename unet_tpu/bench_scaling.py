"""Compiled-collective scaling sanity bench (virtual CPU mesh).

Real multi-chip hardware is not available on this rig (one TPU via the axon
tunnel), so this measures WEAK SCALING OF THE COMPILED PROGRAM, NOT REAL
ICI: the sharded train step is jitted over N=1..8 virtual CPU devices
(``--xla_force_host_platform_device_count``) with a fixed per-device batch,
and per-step wall times are reported. All N devices share this machine's
single physical core, so ideal weak scaling here is step time ∝ N; the
meaningful signal is the ratio's DEVIATION beyond N× — partition/collective
overhead XLA inserts for the mesh — plus proof that the GSPMD program
(batch-sharded activations, replicated params, psum'd grads and BN stats)
compiles and runs at every mesh size.

Run as a subprocess (``python -m unet_tpu.bench_scaling``) so the flag can
be set before JAX initializes; bench.run_benchmark embeds the JSON result
as the ``scaling`` block with this caveat recorded.
"""

from __future__ import annotations

import json
import os
import sys


def main() -> dict:
    from .utils.platform import force_cpu_backend

    force_cpu_backend(device_count=8)

    import jax

    import time
    from functools import partial

    import jax.numpy as jnp
    import numpy as np
    import optax

    from .models import build_unet
    from .parallel.mesh import make_mesh, replicate_tree, shard_batch
    from .train.losses import cross_entropy, fold_loss_layout
    from .train.optimizer import one_cycle_adam

    tile, c_in, n_classes, per_dev = 64, 3, 3, 2
    model = build_unet("xresnet18", n_out=n_classes, c_in=c_in,
                       dtype=jnp.float32, tpu_opt=True)
    rng = np.random.default_rng(0)

    results = {}
    t1 = None
    for n_dev in (1, 2, 4, 8):
        devices = jax.devices()[:n_dev]
        if len(devices) < n_dev:
            break
        mesh = make_mesh(devices)
        batch = per_dev * n_dev
        x = rng.integers(0, 255, (batch, tile, tile, c_in)).astype(np.float32)
        m = rng.integers(0, n_classes, (batch, tile, tile)).astype(np.int32)
        variables = jax.jit(partial(model.init, train=False))(
            jax.random.PRNGKey(0), jnp.zeros((batch, tile, tile, c_in)))
        tx, _ = one_cycle_adam(variables["params"], 1e-4, total_steps=100)
        params = replicate_tree(mesh, variables["params"])
        stats = replicate_tree(mesh, variables["batch_stats"])
        opt_state = replicate_tree(mesh, tx.init(variables["params"]))
        xs, ms = shard_batch(mesh, x, m)

        def loss_fn(params, stats, x, m):
            logits, upd = model.apply(
                {"params": params, "batch_stats": stats}, x,
                train=True, fold_logits=True, mutable=["batch_stats"])
            if logits.shape[1] != m.shape[1]:
                logits, m = fold_loss_layout(logits, m)
            return cross_entropy(logits, m), upd["batch_stats"]

        @partial(jax.jit, donate_argnums=(0, 1, 2))
        def step(params, stats, opt_state, x, m):
            (l, new_stats), g = jax.value_and_grad(loss_fn, has_aux=True)(
                params, stats, x, m)
            updates, opt_state = tx.update(g, opt_state, params)
            return optax.apply_updates(params, updates), new_stats, opt_state, l

        for _ in range(2):  # compile + warm
            params, stats, opt_state, loss = step(params, stats, opt_state, xs, ms)
        jax.block_until_ready(loss)
        t0 = time.perf_counter()
        K = 5
        for _ in range(K):
            params, stats, opt_state, loss = step(params, stats, opt_state, xs, ms)
        jax.block_until_ready(loss)
        step_ms = (time.perf_counter() - t0) / K * 1e3
        if t1 is None:
            t1 = step_ms
        results[f"n{n_dev}"] = {
            "step_ms": round(step_ms, 2),
            "ratio_vs_1dev": round(step_ms / t1, 3),
            "global_batch": batch,
        }
        assert np.isfinite(float(loss)), f"non-finite loss at n_dev={n_dev}"

    out = {
        "caveat": "virtual CPU mesh on one physical core: weak scaling of "
                  "the compiled GSPMD program, NOT real ICI; ideal ratio "
                  "is ~N on this rig",
        "per_device_batch": per_dev,
        "tile": tile,
        **results,
    }
    return out


if __name__ == "__main__":
    print(json.dumps(main()))
    sys.exit(0)
