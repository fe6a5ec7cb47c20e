"""End-to-end CLI test: the reference's flag surface drives a real (tiny)
train + validate run through main(), producing logbook.txt, args.txt and
checkpoints, then an --evaluation=True run restores the checkpoint."""

import os

import numpy as np
import pytest
from PIL import Image

import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

from irr_tpu.utils.flow_io import write_flo


def _make_chairs(root, n=4, h=64, w=96):
    rng = np.random.RandomState(0)
    for i in range(n):
        for j in (1, 2):
            img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
            Image.fromarray(img).save(os.path.join(root, f"{i:05d}_img{j}.ppm"))
        write_flo(os.path.join(root, f"{i:05d}_flow.flo"),
                  rng.randn(h, w, 2).astype(np.float32))


@pytest.fixture(scope="module")
def chairs_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("chairs")
    _make_chairs(str(root))
    return str(root)


def test_main_train_and_eval(chairs_root, tmp_path):
    import main as main_module
    save = str(tmp_path / "run")

    argv = [
        "--batch_size=2", "--batch_size_val=2",
        "--model=FlowNet1S",
        "--training_loss=MultiScaleEPE_FlowNet",
        "--validation_loss=MultiScaleEPE_FlowNet",
        "--optimizer=Adam", "--optimizer_lr=1e-4",
        "--lr_scheduler=MultiStepLR", "--lr_scheduler_milestones=[1]",
        "--lr_scheduler_gamma=0.5",
        "--total_epochs=1",
        "--training_dataset=FlyingChairsFull",
        f"--training_dataset_root={chairs_root}",
        "--training_dataset_photometric_augmentations=True",
        "--validation_dataset=FlyingChairsFull",
        f"--validation_dataset_root={chairs_root}",
        "--validation_dataset_photometric_augmentations=False",
        "--validation_key=epe",
        "--num_workers=1",
        "--data_parallel_devices=1",
        f"--save={save}",
        "--profile=True",
    ]
    best = main_module.main(argv)
    assert np.isfinite(best)
    assert os.path.isfile(os.path.join(save, "logbook.txt"))
    with open(os.path.join(save, "logbook.txt")) as f:
        logbook = f.read()
    assert "[profile]" in logbook  # --profile stage timers reach the logbook
    assert os.path.isfile(os.path.join(save, "args.txt"))
    assert os.path.isfile(os.path.join(save, "checkpoint_latest.ckpt"))
    assert os.path.isfile(os.path.join(save, "checkpoint_best.ckpt"))
    assert os.path.isfile(os.path.join(save, "checkpoint_best.json"))

    # evaluation-only run restoring the trained checkpoint
    eval_argv = [
        "--evaluation=True",
        "--batch_size_val=2",
        "--model=FlowNet1S",
        "--validation_loss=MultiScaleEPE_FlowNet",
        f"--checkpoint={os.path.join(save, 'checkpoint_best.ckpt')}",
        "--validation_dataset=FlyingChairsFull",
        f"--validation_dataset_root={chairs_root}",
        "--validation_dataset_photometric_augmentations=False",
        "--validation_key=epe",
        "--num_workers=1",
        "--data_parallel_devices=1",
        f"--save={save}_eval",
    ]
    avg = main_module.main(eval_argv)
    assert "epe" in avg and np.isfinite(avg["epe"])


def test_training_augmentation_flag(chairs_root, tmp_path):
    """RandomAffineFlow via the CLI reflection path."""
    import main as main_module
    save = str(tmp_path / "run_aug")
    argv = [
        "--batch_size=2", "--batch_size_val=2",
        "--model=FlowNet1S",
        "--training_loss=MultiScaleEPE_FlowNet",
        "--validation_loss=MultiScaleEPE_FlowNet",
        "--optimizer=Adam", "--optimizer_lr=1e-4",
        "--total_epochs=1",
        "--training_augmentation=RandomAffineFlow",
        "--training_dataset=FlyingChairsFull",
        f"--training_dataset_root={chairs_root}",
        "--validation_dataset=FlyingChairsFull",
        f"--validation_dataset_root={chairs_root}",
        "--validation_key=epe",
        "--num_workers=1",
        "--data_parallel_devices=1",
        f"--save={save}",
    ]
    best = main_module.main(argv)
    assert np.isfinite(best)
