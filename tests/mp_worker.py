"""Worker for the 2-process x 4-virtual-CPU-device launch test.

Spawned by ``tests/test_distributed.py`` (same subprocess trick as
``tools/dryrun_worker.py``): each process owns 4 virtual CPU devices,
connects through ``marconet_tpu.parallel.maybe_initialize`` (the wiring
``tools/train.py`` uses on a pod), materializes the SAME deterministic
global batch, keeps only its own rows (``local_batch_slice``), assembles
the global batch with ``make_global_batch``
(``jax.make_array_from_process_local_data``), and runs ONE real reduced
train step. Process 0 prints the metrics for the parent to compare with
the single-process 8-device run — the TPU-native analogue of validating
the reference's DDP launch (``Train/options/train.yml:191-195``).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(pid: int, n_local: int, coordinator: str) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")

    cache = os.environ.get("MARCONET_TEST_CACHE")
    if cache and cache != "off":
        # same host-CPU keying as tests/conftest.py (XLA:CPU AOT entries
        # are machine-feature specific; cross-host loads risk SIGILL)
        from marconet_tpu.utils.jaxcache import host_cpu_fingerprint

        cache = os.path.join(cache, host_cpu_fingerprint())
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from marconet_tpu.parallel import (local_batch_slice, make_global_batch,
                                       make_mesh, maybe_initialize)

    maybe_initialize(coordinator=coordinator, num_processes=2,
                     process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.local_device_count() == n_local, jax.local_device_count()
    assert jax.device_count() == 2 * n_local, jax.device_count()

    import jax.numpy as jnp
    import numpy as np

    from marconet_tpu.parallel.mesh import replicate_tree
    from marconet_tpu.train.train_step import (MARCONetTrainer, TrainBatch,
                                               TrainConfig)
    from tests.train_fixtures import tiny_batch

    width = float(os.environ.get("MARCONET_MP_WIDTH", "0.0625"))
    slots = int(os.environ.get("MARCONET_MP_SLOTS", "4"))
    b = 2 * n_local

    mesh = make_mesh(2 * n_local)
    trainer = MARCONetTrainer(TrainConfig(), width=width, max_chars=slots)

    def make_state(key):
        st = trainer.init_state(key)
        return st, trainer.lpips_variables

    state, trainer.lpips_variables = jax.jit(make_state)(
        jax.random.PRNGKey(0))
    state = replicate_tree(mesh, state)

    rng = np.random.default_rng(0)
    raw = tiny_batch(rng, b=b, n_chars=slots)
    local = local_batch_slice(raw, b)
    batch = TrainBatch(**make_global_batch(mesh, local))

    # AOT-compile BEFORE touching any cross-process collective: XLA:CPU's
    # gloo context init has a hard 30 s key-value timeout, and on a
    # 1-core host the persistent-cache race lets one process reach
    # execution minutes before the other is done compiling. Compile
    # locally, then hold everyone at a coordination-service barrier
    # (which takes an explicit long timeout) so execution starts in
    # lockstep.
    compiled = jax.jit(trainer.train_step, donate_argnums=0) \
        .lower(state, batch).compile()
    from jax._src import distributed
    distributed.global_state.client.wait_at_barrier(
        "mp_worker_compiled", timeout_in_ms=30 * 60 * 1000)
    new_state, metrics = compiled(state, batch)
    jax.block_until_ready(metrics)
    assert int(new_state.step) == 1
    if pid == 0:
        out = {k: float(v) for k, v in metrics.items()}
        print("MP_METRICS " + json.dumps(out), flush=True)

    # rank-0 visual validation under multi-process (train/loop.py
    # log_visuals): the visual forward is a collective SPMD program every
    # process enters; each process's addressable rows of any batch-axis
    # array are exactly the rows it fed, in feed order — pin that
    # round-trip (make_global_batch -> local_rows), then assert rank 0
    # can assemble its own SR rows without a cross-host gather.
    from marconet_tpu.parallel import local_rows

    np.testing.assert_array_equal(local_rows(batch.gt),
                                  np.asarray(local["gt"]))
    vis_c = jax.jit(trainer.visual_forward).lower(
        new_state, batch).compile()
    distributed.global_state.client.wait_at_barrier(
        "mp_worker_vis_compiled", timeout_in_ms=30 * 60 * 1000)
    vis = vis_c(new_state, batch)
    sr_rows = local_rows(vis["sr"])
    assert sr_rows.shape[0] == b // 2, sr_rows.shape
    assert np.isfinite(sr_rows).all()
    if pid == 0:
        print("MP_VIS " + json.dumps({"sr_rows": list(sr_rows.shape)}),
              flush=True)
    # every process must reach here for the run to count
    print(f"MP_OK p{pid}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), sys.argv[3])
