"""Two-process ``jax.distributed`` integration test (SURVEY.md §2.3 DCN).

Spawns two subprocesses, each a JAX "host" with 2 virtual CPU devices, that
rendezvous at a localhost coordinator, build one 4-device global mesh
through ``init_distributed`` + ``make_mesh``, and run a real data-parallel
train step (forward/backward + psum-by-sharding + optimizer) on tiny
shapes. Verifies the multi-host path the reference never had
(/root/reference has no torch.distributed — SURVEY.md §2.3).
"""

import os
import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import pytest

WORKER = textwrap.dedent(
    """
    import os, sys
    import numpy as np

    proc_id = int(sys.argv[1])
    n_procs = int(sys.argv[2])
    coord = sys.argv[3]

    import jax
    import jax.numpy as jnp
    from unet_tpu.parallel.mesh import (
        init_distributed, make_mesh, batch_sharding, replicate_tree, shard_batch)

    init_distributed(coordinator_address=coord, num_processes=n_procs,
                     process_id=proc_id)
    assert jax.process_count() == n_procs, jax.process_count()
    assert jax.device_count() == 4, jax.devices()          # 2 hosts x 2 dev
    assert len(jax.local_devices()) == 2

    mesh = make_mesh()
    assert mesh.devices.size == 4

    # a real (tiny) model + train step across both processes
    from functools import partial
    from flax import linen as nn
    import optax
    from unet_tpu.train.optimizer import one_cycle_adam

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(8, (3, 3), padding="SAME")(x)
            x = nn.relu(x)
            return nn.Conv(3, (1, 1))(x)

    model = Tiny()
    x_local = np.random.default_rng(proc_id).normal(
        size=(2, 16, 16, 3)).astype(np.float32)   # global batch 4, 1/dev
    y_local = np.random.default_rng(100 + proc_id).integers(
        0, 3, size=(2, 16, 16)).astype(np.int32)

    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))["params"]
    tx, _ = one_cycle_adam(params, 1e-3, total_steps=10, n_groups=1)
    opt_state = tx.init(params)
    params = replicate_tree(mesh, params)
    opt_state = replicate_tree(mesh, opt_state)

    # global sharded batch from per-process shards
    sh = batch_sharding(mesh)
    gshape = (4, 16, 16, 3)
    xs = jax.make_array_from_process_local_data(sh, x_local, gshape)
    ys = jax.make_array_from_process_local_data(sh, y_local, (4, 16, 16))

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            logits = model.apply({"params": p}, x)
            oh = jax.nn.one_hot(y, 3)
            return -jnp.mean(jnp.sum(jax.nn.log_softmax(logits) * oh, -1))
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    l0 = None
    for i in range(3):
        params, opt_state, loss = step(params, opt_state, xs, ys)
        l = float(jax.device_get(loss))
        if l0 is None:
            l0 = l
    assert np.isfinite(l), l
    assert l < l0, (l0, l)  # loss decreased => gradients synchronized
    print(f"proc{proc_id} OK loss {l0:.4f}->{l:.4f}", flush=True)
    """
)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed_train_step(tmp_path):
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = dict(os.environ)
    # bare JAX_PLATFORMS=cpu is not enough: with the axon plugin env var
    # present the TPU-tunnel backend factory registers in the workers and
    # can block forever when the tunnel is down (utils/platform.py)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.update(
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        PYTHONPATH=str(Path(__file__).resolve().parents[1]),
    )
    env.pop("JAX_NUM_PROCESSES", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), "2", coord],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("distributed workers timed out:\n" + "\n".join(outs))
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{i} failed:\n{out}"
        assert f"proc{i} OK" in out, out
