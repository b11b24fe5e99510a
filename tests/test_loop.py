"""Training-loop tests: batch workers + the actual train() driver
(reduced width): LPIPS gate, TB scalars + val-freq image grids,
checkpoint save + resume."""

import os

import numpy as np
import pytest

from marconet_tpu.train.config import FullConfig, LoopConfig
from marconet_tpu.train.loop import BatchLoader


def test_batch_loader_produces_batches():
    cfg = LoopConfig(num_workers=1)
    loader = BatchLoader(cfg, global_batch=2, num_workers=1, prefetch=2)
    try:
        it = iter(loader)
        batch = next(it)
        assert batch["lq"].shape == (2, 32, 512, 3)
        assert batch["gt"].shape == (2, 128, 2048, 3)
        assert batch["gt_chars"].shape == (2, 16, 128, 128, 3)
        assert batch["char_valid"].sum() >= 2
        assert np.isfinite(batch["lq"]).all()
    finally:
        loader.close()


def _smoke_config(tmp_path, **loop_kw) -> FullConfig:
    from marconet_tpu.train.train_step import TrainConfig

    # num_devices=1: the driver-mechanics coverage here (TB, checkpoint
    # save/resume, LPIPS gate) is device-count independent, and the
    # 8-virtual-device DP step is already exercised by
    # test_train.TestTrainStepReduced::test_step_on_8_device_mesh_reduced
    # — on this 1-core host a global batch of 8 made this test ~3x slower
    loop = LoopConfig(name="smoke", num_workers=1, batch_size=1,
                      print_freq=1, save_freq=2, val_freq=2,
                      use_tb_logger=True, allow_random_lpips=True,
                      num_devices=1,
                      experiments_root=str(tmp_path), **loop_kw)
    return FullConfig(train=TrainConfig(width=0.0625, max_chars=4),
                      loop=loop)


def test_train_driver_end_to_end(tmp_path):
    """Two real iterations of train() at reduced width: TB event file
    with scalars AND val image grids appears, a checkpoint is saved, and
    a third iteration resumes from it."""
    from marconet_tpu.train import checkpoint as ckpt
    from marconet_tpu.train.loop import train

    config = _smoke_config(tmp_path)
    state = train(config, max_steps=2)
    assert int(state.step) == 2

    run_dir = os.path.join(str(tmp_path), "smoke")
    tb_files = []
    for root, _, files in os.walk(os.path.join(run_dir, "tb")):
        tb_files += [os.path.join(root, f) for f in files
                     if "tfevents" in f]
    assert tb_files, "no TensorBoard event file written"
    # val image grids land in the event file (tags val/*)
    blob = b"".join(open(f, "rb").read() for f in tb_files)
    assert b"val/1_gt_sr_lq" in blob
    assert b"val/3_char_prior" in blob
    assert b"losses/l_g_total" in blob

    ckpt_dir = os.path.join(run_dir, "checkpoints")
    assert ckpt.latest_step(ckpt_dir) == 2

    # resume: one more step continues from step 2
    resume = _smoke_config(tmp_path)
    resume.loop.resume_state = ckpt_dir
    state2 = train(resume, max_steps=3)
    assert int(state2.step) == 3


def test_train_refuses_random_lpips(tmp_path):
    from marconet_tpu.train.loop import train

    config = _smoke_config(tmp_path)
    config.loop.allow_random_lpips = False
    with pytest.raises(SystemExit, match="LPIPS"):
        train(config, max_steps=1)
