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
a reduced-but-parameterized channel width and slot count
(``MARCONetTrainer(width=..., max_chars=...)``: identical code path,
fewer channels / narrower canvases) because a full-size 5-net XLA:CPU
compile takes tens of minutes and >70 GB RSS on this class of host, and
the driver's dryrun budget is a few minutes of wall time (round-2
failure mode: correct but too slow, MULTICHIP_r02.json rc=124).
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

    # Dedicated persistent compile cache for THIS worker only (never the
    # session-wide one — a stale ambient TPU AOT cache broke round 1).
    # jax keys entries by backend + compile options, so the CPU-only
    # entries here can't collide with TPU runs; a pre-warmed cache cuts
    # the driver's dryrun wall time by ~1-2 min on this 1-core host.
    # The directory is additionally keyed on the HOST CPU's feature set:
    # XLA:CPU AOT results embed machine features, and loading an entry
    # compiled on a different host generation warns (observed round 5:
    # "+prefer-no-gather not supported on the host machine ... could
    # lead to SIGILL") or kills the process outright.
    from marconet_tpu.utils.jaxcache import host_cpu_fingerprint

    host_key = host_cpu_fingerprint()
    cache_dir = os.environ.get(
        "MARCONET_DRYRUN_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".dryrun_xla_cache", host_key))
    if cache_dir and cache_dir != "off":
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from marconet_tpu.alphabet import BLANK_INDEX
    from marconet_tpu.data.batch_prep import prepare_train_batch
    from marconet_tpu.parallel import make_mesh, shard_batch
    from marconet_tpu.parallel.mesh import replicate_tree
    from marconet_tpu.train.train_step import (MARCONetTrainer, TrainBatch,
                                               TrainConfig)

    width = float(os.environ.get("MARCONET_DRYRUN_WIDTH", "0.0625"))
    slots = int(os.environ.get("MARCONET_DRYRUN_SLOTS", "2"))
    t_start = time.time()
    mesh = make_mesh(n_devices)
    trainer = MARCONetTrainer(TrainConfig(), width=width, max_chars=slots)

    # jit the whole init: one compiled program instead of hundreds of
    # op-by-op eager dispatches (~2x faster on this 1-core host, and the
    # persistent cache makes reruns near-instant). init_state stores the
    # LPIPS variables on the trainer as a side effect — under jit those
    # would be leaked tracers, so return them as outputs and write the
    # concrete values back.
    def make_state(key):
        st = trainer.init_state(key)
        return st, trainer.lpips_variables

    state, trainer.lpips_variables = jax.jit(make_state)(
        jax.random.PRNGKey(0))
    state = replicate_tree(mesh, state)
    print(f"[dryrun] init_state+replicate {time.time() - t_start:.1f}s",
          flush=True)

    rng = np.random.default_rng(0)
    b = n_devices
    gt_w = 128 * slots
    gt = rng.uniform(-1, 1, (b, 128, gt_w, 3)).astype(np.float32)
    ink = (rng.uniform(0, 1, (b, 128, gt_w, 3)) > 0.7).astype(np.float32)
    lq = rng.uniform(-1, 1, (b, 32, gt_w // 4, 3)).astype(np.float32)
    labels = np.full((b, slots), BLANK_INDEX, np.int64)
    box = np.zeros((b, 2 * slots), np.float32)
    n_chars = min(3, slots)
    for i in range(b):
        labels[i, :n_chars] = [5, 9, 100][:n_chars]
        for c, left in enumerate((0.05, 0.2, 0.4)[:n_chars]):
            box[i, 2 * c] = left
            box[i, 2 * c + 1] = left + 0.05
    raw = prepare_train_batch(gt, ink, labels, box, lq)
    batch = TrainBatch(**{k: jnp.asarray(v) for k, v in raw.items()})
    batch = TrainBatch(*shard_batch(mesh, tuple(batch)))

    t0 = time.time()
    step = jax.jit(trainer.train_step, donate_argnums=0)
    lowered = step.lower(state, batch)
    t_trace = time.time() - t0
    compiled = lowered.compile()
    t_compile = time.time() - t0 - t_trace
    new_state, metrics = compiled(state, batch)
    jax.block_until_ready(metrics)
    t_exec = time.time() - t0 - t_trace - t_compile
    assert int(new_state.step) == 1
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"{k} not finite"

    # replica consistency: params are replicated — after the psum-reduced
    # update every device must hold bit-identical values. A sharding-spec
    # regression (e.g. a param silently batch-sharded) fails here.
    for name, tree in (("encoder", new_state.encoder),
                       ("net_d", new_state.net_d)):
        leaf = jax.tree.leaves(tree["params"])[0]
        shards = [np.asarray(s.data) for s in leaf.addressable_shards]
        assert len(shards) == n_devices, (
            f"{name} param not replicated on all devices "
            f"({len(shards)}/{n_devices} shards)")
        for i, s in enumerate(shards[1:], 1):
            np.testing.assert_array_equal(
                shards[0], s,
                err_msg=f"{name} params diverge between replica 0 and {i}")

    print(f"dryrun_multichip({n_devices}) OK — width={width}, "
          f"slots={slots}, "
          f"l_g_total={float(metrics['l_g_total']):.4f}, "
          f"trace {t_trace:.1f}s, compile {t_compile:.1f}s, "
          f"step {t_exec:.1f}s")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
