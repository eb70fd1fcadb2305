"""GanTrainer resume semantics (ref: --resume, codecTrain.py:242-244):
training continues from the saved step with identical state."""

import os

import numpy as np

import jax
import jax.numpy as jnp

from tests.test_training import (
    CONFIG,
    GEN_CFG,
    disc_apply,
    make_state,
)
from audiodec_tpu.train.criterion import build_criterion
from audiodec_tpu.train.steps import make_autoencoder_steps
from audiodec_tpu.train.trainer import GanTrainer


def make_trainer(outdir, steps_fns, state, batches):
    it = iter(lambda: batches[np.random.default_rng(0).integers(0, 1)], None)

    def batch_iter():
        i = 0
        while True:
            yield batches[i % len(batches)]
            i += 1

    cfg = dict(CONFIG)
    cfg["start_steps"] = {"generator": 0, "discriminator": 10 ** 9}
    cfg["train_max_steps"] = 6
    cfg["adv_train_max_steps"] = 6
    cfg["log_interval_steps"] = 2
    cfg["eval_interval_steps"] = 10 ** 9
    cfg["save_interval_steps"] = 10 ** 9
    return GanTrainer(steps_fns, state, cfg, outdir,
                      train_iter=batch_iter(),
                      eval_iter_fn=lambda: iter([]),
                      steps_per_epoch=2)


def test_resume_continues_training(tmp_path):
    state, gen_opt, disc_opt = make_state(51)
    crit = build_criterion(CONFIG)
    steps = make_autoencoder_steps(GEN_CFG, disc_apply, CONFIG, crit,
                                   gen_opt, disc_opt, jit=False)
    rng = np.random.default_rng(5)
    batches = [jnp.asarray(0.1 * rng.standard_normal((2, 600, 1))
                           .astype(np.float32)) for _ in range(2)]

    out1 = str(tmp_path / "run1")
    t1 = make_trainer(out1, steps, state, batches)
    t1.run(max_steps=3)
    assert t1.steps == 3
    ckpt = os.path.join(out1, "checkpoint-final.ckpt")
    assert os.path.exists(ckpt)

    # fresh trainer resumes at step 3 and finishes the schedule
    state2, _, _ = make_state(51)
    out2 = str(tmp_path / "run2")
    t2 = make_trainer(out2, steps, state2, batches)
    t2.resume(ckpt)
    assert t2.steps == 3
    # resumed params identical to saved ones
    a = jax.tree_util.tree_leaves(t1.state["gen"])
    b = jax.tree_util.tree_leaves(t2.state["gen"])
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    t2.run()
    assert t2.steps == 6


def test_epochs_persist_through_checkpoint(tmp_path):
    """`epochs` rides the checkpoint header alongside `steps`
    (ref: trainer/trainerGAN.py:95-121 persists both)."""
    from audiodec_tpu.train.checkpoint import load_checkpoint

    state, gen_opt, disc_opt = make_state(52)
    crit = build_criterion(CONFIG)
    steps = make_autoencoder_steps(GEN_CFG, disc_apply, CONFIG, crit,
                                   gen_opt, disc_opt, jit=False)
    rng = np.random.default_rng(6)
    batches = [jnp.asarray(0.1 * rng.standard_normal((2, 600, 1))
                           .astype(np.float32)) for _ in range(2)]

    out1 = str(tmp_path / "run1")
    t1 = make_trainer(out1, steps, state, batches)  # steps_per_epoch=2
    t1.run(max_steps=5)
    assert t1.epochs == 2  # 5 steps over 2-step epochs -> 2 completed
    ckpt = os.path.join(out1, "checkpoint-final.ckpt")
    _, header = load_checkpoint(ckpt)
    assert header["steps"] == 5 and header["epochs"] == 2

    state2, _, _ = make_state(52)
    t2 = make_trainer(str(tmp_path / "run2"), steps, state2, batches)
    t2.resume(ckpt)
    assert t2.epochs == 2 and t2.steps == 5
