#!/usr/bin/env python
"""Multi-chip dryrun worker: one full GAN train step on an N-device mesh.

Run by ``__graft_entry__.dryrun_multichip`` in a subprocess whose
environment forces the CPU platform with N virtual devices
(``JAX_PLATFORMS=cpu``, ``--xla_force_host_platform_device_count=N``) and
disables the persistent compilation cache — so the run can never be
hijacked by an ambient TPU backend or a stale AOT cache entry (both
failure modes observed in round 1).

The step is the REAL jitted 3-phase train step (G+enc+SR / D / SRD, five
nets, batch-sharded inputs, replicated params; the SPMD partitioner
inserts the gradient psum — the XLA equivalent of the reference's
DDP/NCCL contract, ``Train/options/train.yml:191-195``). The nets run at
a reduced-but-parameterized channel width (``MARCONetTrainer(width=...)``:
identical code path, fewer channels) because a full-size 5-net XLA:CPU
compile takes tens of minutes and >70 GB RSS on this class of host.
"""

import os
import sys
import time

import numpy as np


def main(n_devices: int) -> None:
    import jax

    # The environment's sitecustomize registers the axon TPU plugin and
    # pins the platform at interpreter start — the JAX_PLATFORMS env var
    # alone does not stick (see tests/conftest.py); update the live
    # config before the backend initializes.
    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    assert jax.default_backend() == "cpu", (
        f"dryrun must run on the CPU platform, got {jax.default_backend()}")
    assert jax.device_count() == n_devices, (
        f"expected {n_devices} virtual devices, got {jax.device_count()}")

    from marconet_tpu.alphabet import BLANK_INDEX
    from marconet_tpu.data.batch_prep import prepare_train_batch
    from marconet_tpu.parallel import make_mesh, shard_batch
    from marconet_tpu.parallel.mesh import replicate_tree
    from marconet_tpu.train.train_step import (MARCONetTrainer, TrainBatch,
                                               TrainConfig)

    width = float(os.environ.get("MARCONET_DRYRUN_WIDTH", "0.125"))
    mesh = make_mesh(n_devices)
    trainer = MARCONetTrainer(TrainConfig(), width=width)
    state = trainer.init_state(jax.random.PRNGKey(0))
    state = replicate_tree(mesh, state)

    rng = np.random.default_rng(0)
    b = n_devices
    gt = rng.uniform(-1, 1, (b, 128, 2048, 3)).astype(np.float32)
    ink = (rng.uniform(0, 1, (b, 128, 2048, 3)) > 0.7).astype(np.float32)
    lq = rng.uniform(-1, 1, (b, 32, 512, 3)).astype(np.float32)
    labels = np.full((b, 16), BLANK_INDEX, np.int64)
    box = np.zeros((b, 32), np.float32)
    for i in range(b):
        labels[i, :3] = [5, 9, 100]
        for c, left in enumerate((0.05, 0.2, 0.4)):
            box[i, 2 * c] = left
            box[i, 2 * c + 1] = left + 0.05
    raw = prepare_train_batch(gt, ink, labels, box, lq)
    batch = TrainBatch(**{k: jnp.asarray(v) for k, v in raw.items()})
    batch = TrainBatch(*shard_batch(mesh, tuple(batch)))

    t0 = time.time()
    step = jax.jit(trainer.train_step, donate_argnums=0)
    new_state, metrics = step(state, batch)
    jax.block_until_ready(metrics)
    assert int(new_state.step) == 1
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"{k} not finite"
    print(f"dryrun_multichip({n_devices}) OK — width={width}, "
          f"l_g_total={float(metrics['l_g_total']):.4f}, "
          f"compile+step {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
