"""Training loop: data workers, device feed, logging, checkpointing.

TPU-native counterpart of basicsr's ``train_pipeline`` (reference
``Train/tspgan/train.py:1-11``): multiprocessing batch synthesis on the
host, a jit-compiled data-parallel train step over the device mesh,
TensorBoard scalars + periodic image grids, Orbax checkpoint/resume, and
an opt-in ``jax.profiler`` trace window — the observability the reference
lacks (SURVEY.md §5.1).
"""

from __future__ import annotations

import multiprocessing as mp
import os
import queue
import time
from typing import Any, Dict, Iterator, Optional

import numpy as np

from marconet_tpu.train.config import FullConfig, LoopConfig


# ---------------------------------------------------------------------------
# host-side batch workers
# ---------------------------------------------------------------------------


def _worker(cfg: LoopConfig, batch_size: int, seed: int, q,
            max_chars=None):
    from marconet_tpu.data.synth import SynthConfig, TextLineSynthesizer

    synth = TextLineSynthesizer(SynthConfig(
        font_dir=cfg.font_dir, bg_dir=cfg.bg_dir,
        corpus_paths=cfg.corpus_paths))
    rng = np.random.default_rng(seed)
    while True:
        q.put(synth.batch(batch_size, rng, max_chars=max_chars))


class BatchLoader:
    """Process-pool batch producer with a bounded prefetch queue."""

    def __init__(self, cfg: LoopConfig, global_batch: int,
                 num_workers: Optional[int] = None, prefetch: int = 8,
                 max_chars: Optional[int] = None, seed_offset: int = 0):
        self.cfg = cfg
        self.global_batch = global_batch
        self.num_workers = num_workers or max(cfg.num_workers, 1)
        ctx = mp.get_context("spawn")
        self.q = ctx.Queue(maxsize=prefetch)
        self.procs = [
            ctx.Process(target=_worker,
                        args=(cfg, global_batch,
                              cfg.seed + 1000 + seed_offset + i,
                              self.q, max_chars),
                        daemon=True)
            for i in range(self.num_workers)
        ]
        for p in self.procs:
            p.start()

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        while True:
            yield self.q.get()

    def close(self):
        for p in self.procs:
            p.terminate()


# ---------------------------------------------------------------------------
# training driver
# ---------------------------------------------------------------------------


def warm_start(trainer, state, pretrain_dir: str):
    """Load the released torch checkpoints into a fresh TrainState
    (reference ``train.yml:65-73`` warm-start paths)."""
    import jax.numpy as jnp
    import jax

    from marconet_tpu.convert.torch_import import (
        convert_discriminator, convert_encoder, convert_prior,
        convert_srnet, load_torch_state_dict)

    def load(fname, converter, param_key="params"):
        path = os.path.join(pretrain_dir, fname)
        if not os.path.exists(path):
            print(f"warm start: {fname} not found, keeping random init")
            return None
        print(f"warm start: loading {fname}")
        return jax.tree.map(jnp.asarray,
                            converter(load_torch_state_dict(
                                path, param_key)))

    updates = {
        "encoder": load("net_transformer_encoder.pth", convert_encoder,
                        "params_ema"),
        "prior": load("net_prior_generation.pth", convert_prior,
                      "params_ema"),
        "srnet": load("net_sr.pth", convert_srnet, "params_ema"),
        "net_d": load("net_d.pth", convert_discriminator),
        "net_srd": load("net_srd.pth", convert_discriminator),
    }
    for name, vars_ in updates.items():
        if vars_ is None:
            continue
        merged = dict(getattr(state, name))
        merged.update(vars_)
        state = state._replace(**{name: merged})
    return state


def train(config: FullConfig, max_steps: Optional[int] = None):
    import jax
    import jax.numpy as jnp

    from marconet_tpu.parallel import (local_rows, make_global_batch,
                                       make_mesh, maybe_initialize,
                                       shard_batch)
    from marconet_tpu.parallel.mesh import replicate_tree
    from marconet_tpu.train import checkpoint as ckpt
    from marconet_tpu.train.train_step import (MARCONetTrainer, TrainBatch,
                                               TrainConfig)

    # Multi-host: connect to the JAX distributed runtime before the first
    # device query (no-op for a plain single-process run). The reference's
    # analogue is basicsr's init_dist(nccl) inside train_pipeline
    # (Train/options/train.yml:191-194).
    maybe_initialize()

    loop = config.loop
    run_dir = os.path.join(loop.experiments_root, loop.name)
    ckpt_dir = os.path.join(run_dir, "checkpoints")
    os.makedirs(run_dir, exist_ok=True)

    mesh = make_mesh(loop.num_devices)
    n_dev = mesh.devices.size
    n_proc = jax.process_count()
    is_main = jax.process_index() == 0
    global_batch = loop.batch_size * n_dev
    if global_batch % n_proc:
        raise SystemExit(f"global batch {global_batch} not divisible by "
                         f"{n_proc} processes")
    local_batch = global_batch // n_proc
    print(f"mesh: {n_dev} device(s) / {n_proc} process(es); "
          f"global batch {global_batch} (local {local_batch})")

    # perceptual loss: pretrained VGG16+lin weights, or fail loudly — a
    # random-VGG LPIPS is a silently different objective (reference uses
    # pretrained lpips, Train/tspgan/losses/text_loss.py:77-105)
    from marconet_tpu.train.lpips import load_lpips_variables

    lpips_vars = load_lpips_variables(loop.pretrain_dir)
    if lpips_vars is None:
        msg = ("LPIPS weights (vgg16-397923af.pth + lpips_vgg.pth) not "
               f"found under pretrain_dir={loop.pretrain_dir!r}")
        if not loop.allow_random_lpips:
            raise SystemExit(
                msg + " — refusing to train with a random-VGG perceptual "
                "loss. Provide the weights or set "
                "train.allow_random_lpips / --allow_random_lpips.")
        print(f"WARNING: {msg}; TRAINING WITH RANDOM VGG WEIGHTS "
              "(allow_random_lpips set)")
    lpips_vars = jax.tree.map(jnp.asarray, lpips_vars) \
        if lpips_vars is not None else None

    trainer = MARCONetTrainer(config.train, lpips_variables=lpips_vars)

    # jit the whole init: one compiled program instead of hundreds of
    # small dispatches (each SNConv init runs a 15-step power iteration;
    # eager init of the 5-net state measured ~10x slower — same trick as
    # tools/dryrun_worker.py). init_state stores the LPIPS variables on
    # the trainer as a side effect — under jit that write holds tracers,
    # so return them explicitly and store the concrete values.
    def make_state(key):
        st = trainer.init_state(key)
        return st, trainer.lpips_variables

    state, trainer.lpips_variables = jax.jit(make_state)(
        jax.random.PRNGKey(loop.seed))

    start_step = 0
    if loop.resume_state:
        state = ckpt.restore_state(loop.resume_state, state)
        start_step = int(state.step)
        print(f"resumed from {loop.resume_state} at step {start_step}")
    elif loop.pretrain_dir:
        state = warm_start(trainer, state, loop.pretrain_dir)
    state = replicate_tree(mesh, state)

    writer = None
    if loop.use_tb_logger and is_main:
        try:
            from tensorboardX import SummaryWriter

            writer = SummaryWriter(os.path.join(run_dir, "tb"))
        except Exception as e:
            print(f"tensorboard unavailable: {e}")

    step_fn = jax.jit(trainer.train_step, donate_argnums=0)
    visual_fn = jax.jit(trainer.visual_forward)
    # each process synthesizes only its own rows of the global batch,
    # with disjoint worker seeds across hosts (SURVEY.md §5.8: per-host
    # loading; data never crosses DCN)
    loader = BatchLoader(loop, local_batch,
                         max_chars=trainer.max_chars,
                         seed_offset=jax.process_index() * 10_000)

    def log_visuals(state, batch: TrainBatch, step: int):
        """TB image grids every val_freq iters (reference
        ``tspgan_model.py:615-621``).

        SPMD: EVERY process enters (the jitted forward over global
        arrays is a collective program); only the main process then
        assembles grids — from its own addressable shard rows, so no
        host ever needs rows it doesn't hold. Rank-0 visual logging
        under multi-process matches the reference's DDP rank-0
        validation (``tspgan_model.py:610-612``).
        """
        from marconet_tpu.train.visuals import build_visual_grids

        vis_dev = visual_fn(state, batch)
        if writer is None:
            return
        vis = {k: local_rows(v) for k, v in vis_dev.items()}
        font = None
        if loop.font_dir and os.path.isdir(loop.font_dir):
            cands = sorted(os.listdir(loop.font_dir))
            if cands:
                font = os.path.join(loop.font_dir, cands[0])
        grids = build_visual_grids(
            gt=local_rows(batch.gt), lq=local_rows(batch.lq),
            sr=vis["sr"], prior128=vis["prior128"],
            gt_chars=local_rows(batch.gt_chars), pred_cw=vis["pred_cw"],
            boxinfo_lr=local_rows(batch.boxinfo_lr),
            pred_ids=vis["pred_ids"], font_path=font)
        for label, img in grids.items():
            writer.add_image(f"val/{label}", img, step,
                             dataformats="HWC")

    profile_dir = os.environ.get("MARCONET_PROFILE")
    total = min(loop.total_iter, max_steps or loop.total_iter)
    t0 = time.time()
    try:
        for step, raw in enumerate(loader, start=start_step):
            if step >= total:
                break
            if profile_dir and step == start_step + 10:
                jax.profiler.start_trace(profile_dir)
            if n_proc > 1:
                # per-host rows -> one global jax.Array per leaf
                # (jax.make_array_from_process_local_data)
                batch = TrainBatch(**make_global_batch(mesh, raw))
            else:
                batch = TrainBatch(**{k: jnp.asarray(v)
                                      for k, v in raw.items()})
                batch = TrainBatch(*shard_batch(mesh, tuple(batch)))
            state, metrics = step_fn(state, batch)
            if profile_dir and step == start_step + 15:
                jax.profiler.stop_trace()

            if is_main and (step + 1) % loop.print_freq == 0:
                m = {k: float(v) for k, v in metrics.items()}
                rate = loop.print_freq * global_batch / (time.time() - t0)
                t0 = time.time()
                print(f"iter {step + 1} | {rate:.1f} samples/s | " +
                      " ".join(f"{k}={v:.4f}" for k, v in
                               sorted(m.items())))
                if writer:
                    for k, v in m.items():
                        writer.add_scalar(f"losses/{k}", v, step + 1)
                    writer.add_scalar("speed/samples_per_sec", rate,
                                      step + 1)
            if loop.use_tb_logger and loop.val_freq > 0 \
                    and (step + 1) % loop.val_freq == 0:
                # collective: every process runs the visual forward;
                # rank 0 (the only one with a writer) builds grids from
                # its addressable shard rows
                log_visuals(state, batch, step + 1)
            if (step + 1) % loop.save_freq == 0:
                # every process participates (Orbax coordinates the write)
                ckpt.save_state(ckpt_dir, step + 1, state)
                if is_main:
                    print(f"saved checkpoint at iter {step + 1}")
    finally:
        loader.close()
        if writer:
            writer.close()
    return state
