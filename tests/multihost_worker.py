"""Worker for the 2-process multi-host train-step test (test_multihost.py).

Each process owns 2 virtual CPU devices (4 global). Runs the REAL stage-1
SPMD train step (train.state.makeTrainStep) over the global ('data','model')
mesh with ZeRO-sharded optimizer state, feeding per-process local batch
shards — the jax.distributed analogue of the reference's torchrun+NCCL world
(SURVEY.md §2.3), executable on one machine.

usage: multihost_worker.py <processId> <numProcesses> <port>
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nproc, process_id=pid)
    import jax.numpy as jnp
    import numpy as np
    import optax
    from jax.sharding import NamedSharding, PartitionSpec

    from mcquic_tpu.loss import LossRegistry
    from mcquic_tpu.models.compressor import Compressor
    from mcquic_tpu.parallel import (batchSharding, makeMesh, replicated,
                                     zeroShardings)
    from mcquic_tpu.train.state import TrainState, makeTrainStep

    globalDevices = jax.devices()
    assert len(globalDevices) == 2 * nproc, len(globalDevices)
    mesh = makeMesh(dataParallel=len(globalDevices), modelParallel=1,
                    devices=globalDevices)

    module = Compressor(channel=8, m=2, k=(16, 8))
    tx = optax.adam(1e-4)
    distortion = LossRegistry.get("PSNR")()
    stepFn = makeTrainStep(module, tx, distortion)

    variables = module.init({"params": jax.random.PRNGKey(0),
                             "gumbel": jax.random.PRNGKey(1)},
                            jnp.zeros((1, 32, 32, 3)), train=True)
    state = TrainState.create(variables, tx, jax.random.PRNGKey(2))
    rep = replicated(mesh)
    shardings = TrainState(
        step=rep,
        params=jax.tree_util.tree_map(lambda _: rep, state.params),
        coder=jax.tree_util.tree_map(lambda _: rep, state.coder),
        optState=zeroShardings(mesh, state.optState),
        rng=rep)
    state = jax.device_put(state, shardings)
    bSharding = batchSharding(mesh)

    # per-process local shard of the global batch (2 images per process)
    rng = np.random.default_rng(7)  # SAME seed everywhere: global batch is
    globalBatch = rng.uniform(-1, 1, (len(globalDevices), 32, 32, 3)).astype(np.float32)
    local = globalBatch[pid * 2:(pid + 1) * 2]
    batch = jax.make_array_from_process_local_data(bSharding, local,
                                                   globalBatch.shape)

    jitStep = jax.jit(stepFn, in_shardings=(shardings, bSharding),
                      out_shardings=(shardings, None))
    metrics = None
    for _ in range(2):
        state, metrics = jitStep(state, batch)

    # every process must agree on the replicated loss and a param checksum
    loss = float(metrics["loss"])
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    checksum = float(jnp.sum(jnp.abs(leaf.astype(jnp.float64) if False else leaf)))
    print(f"MHRESULT pid={pid} step={int(state.step)} "
          f"loss={loss:.8f} checksum={checksum:.8f}", flush=True)


if __name__ == "__main__":
    main()
