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


def test_periodic_save_and_exact_resume(chairs_root, tmp_path):
    """Preemption insurance: --save_every_batches writes mid-epoch
    checkpoints (phase=mid_epoch), the epoch is banked before validation
    (phase=trained), and a resumed run restores optimizer state exactly
    (Adam moments saved under 'opt/')."""
    import json
    from unittest import mock

    import main as main_module
    from irr_tpu.runtime.checkpoint import CheckpointSaver

    save = str(tmp_path / "run_resume")
    base = [
        "--batch_size=2", "--batch_size_val=2",
        "--model=FlowNet1S",
        "--training_loss=MultiScaleEPE_FlowNet",
        "--validation_loss=MultiScaleEPE_FlowNet",
        "--optimizer=Adam", "--optimizer_lr=1e-4",
        "--training_dataset=FlyingChairsFull",
        f"--training_dataset_root={chairs_root}",
        "--validation_dataset=FlyingChairsFull",
        f"--validation_dataset_root={chairs_root}",
        "--validation_key=epe",
        "--num_workers=1", "--data_parallel_devices=1",
        f"--save={save}",
    ]

    phases = []
    orig_save = CheckpointSaver.save_latest

    def spy(self, *a, **kw):
        phases.append((kw.get("stats_dict") or {}).get("phase"))
        return orig_save(self, *a, **kw)

    with mock.patch.object(CheckpointSaver, "save_latest", spy):
        best = main_module.main(
            base + ["--total_epochs=1", "--save_every_batches=1"])
    assert np.isfinite(best)
    # 4 chairs / batch 2 = 2 train batches -> 2 mid-epoch saves, then the
    # pre-validation bank, then the post-validation save
    assert phases == ["mid_epoch", "mid_epoch", "trained", "validated"]
    with open(os.path.join(save, "checkpoint_latest.json")) as f:
        stats = json.load(f)
    assert stats["phase"] == "validated" and stats["resume_epoch"] == 2
    ckpt = np.load(os.path.join(save, "checkpoint_latest.ckpt"))
    assert any(k.startswith("opt/") for k in ckpt.files)

    # resume exactly where the sidecar says; opt-state leaves come back
    # only with the opt-in flag (the supervisor sets it) — a plain
    # --checkpoint warm start keeps reference params-only semantics
    best2 = main_module.main(
        base + ["--total_epochs=2", f"--checkpoint={save}",
                f"--start_epoch={stats['resume_epoch']}",
                "--checkpoint_resume_optimizer=True"])
    assert np.isfinite(best2)
    with open(os.path.join(save, "logbook.txt")) as f:
        logbook = f.read()
    assert "optimizer-state leaves" in logbook
    with open(os.path.join(save, "checkpoint_latest.json")) as f:
        stats2 = json.load(f)
    assert stats2["epoch"] == 2 and stats2["resume_epoch"] == 3

    # warm start WITHOUT the flag: params restored, optimizer fresh
    save3 = str(tmp_path / "run_warm")
    warm = [a if not a.startswith("--save=") else f"--save={save3}"
            for a in base]
    best3 = main_module.main(
        warm + ["--total_epochs=1", f"--checkpoint={save}"])
    assert np.isfinite(best3)
    with open(os.path.join(save3, "logbook.txt")) as f:
        logbook3 = f.read()
    assert "Restored" in logbook3  # params came from the checkpoint
    assert "optimizer-state leaves" not in logbook3


def test_supervisor_resume_epoch(tmp_path):
    """scripts/supervise_train.py reads the resume marker from the sidecar."""
    import json
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "supervise_train",
        os.path.join(os.path.dirname(__file__), os.pardir,
                     "scripts", "supervise_train.py"))
    sup = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sup)

    assert sup._resume_epoch(str(tmp_path)) is None
    p = tmp_path / "checkpoint_latest.json"
    p.write_text(json.dumps({"epoch": 3, "resume_epoch": 4, "phase": "trained"}))
    assert sup._resume_epoch(str(tmp_path)) == 4
    p.write_text(json.dumps({"epoch": 3}))  # pre-marker sidecar
    assert sup._resume_epoch(str(tmp_path)) == 4
    assert sup._arg_value(["--save", "x", "--total_epochs=7"], "--save") == "x"
    assert sup._arg_value(["--total_epochs=7"], "--total_epochs") == "7"


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


def test_bf16_train_and_eval(chairs_root, tmp_path):
    """--compute_dtype=bfloat16 (the production mode the accuracy run and
    bench use): a CLI train+validate epoch stays finite, and bf16 eval
    output is close to the f32 path at random init."""
    import jax
    import main as main_module
    from irr_tpu.nn.core import set_compute_dtype
    import jax.numpy as jnp

    argv = [
        "--batch_size=2", "--batch_size_val=2",
        "--model=FlowNet1S",
        "--training_loss=MultiScaleEPE_FlowNet",
        "--validation_loss=MultiScaleEPE_FlowNet",
        "--optimizer=Adam", "--optimizer_lr=1e-4",
        "--total_epochs=1",
        "--training_dataset=FlyingChairsFull",
        f"--training_dataset_root={chairs_root}",
        "--validation_dataset=FlyingChairsFull",
        f"--validation_dataset_root={chairs_root}",
        "--validation_key=epe",
        "--num_workers=1", "--data_parallel_devices=1",
        f"--save={tmp_path / 'run_bf16'}",
        "--compute_dtype=bfloat16",
    ]
    try:
        best = main_module.main(argv)
        assert np.isfinite(best)

        # output closeness vs f32 at random init (loose: bf16 feature convs)
        from irr_tpu import models
        rng = np.random.RandomState(0)
        batch = {"input1": rng.rand(1, 64, 96, 3).astype(np.float32),
                 "input2": rng.rand(1, 64, 96, 3).astype(np.float32)}
        model = models.FlowNet1S()
        params = jax.jit(model.init)(jax.random.PRNGKey(0))
        set_compute_dtype(jnp.bfloat16)
        out_bf = np.asarray(jax.jit(
            lambda p, b: model.apply(p, b, training=False)["flow1"])(params, batch))
        set_compute_dtype(jnp.float32)
        out_f32 = np.asarray(jax.jit(
            lambda p, b: model.apply(p, b, training=False)["flow1"])(params, batch))
        scale = max(np.abs(out_f32).max(), 1e-6)
        assert np.abs(out_bf - out_f32).max() / scale < 0.05
    finally:
        set_compute_dtype(jnp.float32)  # don't leak policy into other tests


def test_checkpoint_resolve(tmp_path):
    """CheckpointSaver.resolve: directories go through the mode, files pass
    through; config.resolve_checkpoint_file delegates to the saver (the
    names live in ONE place)."""
    import types
    from irr_tpu.runtime.checkpoint import CheckpointSaver
    from irr_tpu.config import resolve_checkpoint_file

    saver = CheckpointSaver()
    d = str(tmp_path)
    assert saver.resolve(d) == os.path.join(d, "checkpoint_latest.ckpt")
    assert saver.resolve(d, "resume_from_best") == os.path.join(
        d, "checkpoint_best.ckpt")
    f = str(tmp_path / "x.ckpt")
    assert saver.resolve(f) == f

    args = types.SimpleNamespace(checkpoint=None)
    assert resolve_checkpoint_file(args) is None
    args = types.SimpleNamespace(checkpoint=d, checkpoint_mode="resume_from_best")
    assert resolve_checkpoint_file(args, saver).endswith("checkpoint_best.ckpt")
