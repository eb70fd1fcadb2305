"""Step-driven GAN trainer loop (capability twin of ref trainer/trainerGAN.py
TrainerGAN.run/_train_epoch and bin/train.py TrainGAN.run).

Differences from the reference are TPU-idiomatic, not behavioral:
- the hot step is a jitted function over an explicit TrainState pytree;
- phase switching (metric-only -> adversarial at `start_steps.discriminator`,
  and the dataloader swap to `adv_batch_length`) happens host-side at the
  exact same step boundaries (ref: bin/train.py:106-123);
- metrics go to JSONL (and tensorboardX if importable) instead of
  tensorboardX only;
- checkpoints are msgpack pytrees with a `finally:` save on crash/interrupt
  like the reference (ref: bin/train.py:119-123).
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Callable, Dict, Iterator, Optional

import jax
import numpy as np

from audiodec_tpu.train.checkpoint import load_checkpoint, save_checkpoint


class MetricsWriter:
    """JSONL scalar writer with optional tensorboardX mirroring."""

    def __init__(self, outdir: str):
        os.makedirs(outdir, exist_ok=True)
        self.path = os.path.join(outdir, "metrics.jsonl")
        self._f = open(self.path, "a")
        self._tb = None
        try:
            from tensorboardX import SummaryWriter  # type: ignore
            self._tb = SummaryWriter(outdir)
        except Exception:
            pass

    def write(self, step: int, scalars: Dict[str, float], prefix: str = ""):
        rec = {"step": step}
        for k, v in scalars.items():
            rec[prefix + k] = float(v)
            if self._tb is not None:
                self._tb.add_scalar(prefix + k, float(v), step)
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()


class NullWriter:
    """Metrics sink for non-primary hosts in multi-process training."""

    def write(self, step, scalars, prefix=""):
        pass

    def close(self):
        pass


class GanTrainer:
    """Drives jitted {metric, adv, eval} steps through the two-stage
    schedule."""

    def __init__(self, steps_fns: Dict[str, Callable], state: dict,
                 config: dict, outdir: str,
                 train_iter: Iterator, eval_iter_fn: Callable[[], Iterator],
                 adv_train_iter: Optional[Iterator] = None,
                 start_step: int = 0,
                 strict_start: bool = True,
                 primary: bool = True,
                 steps_per_epoch: Optional[int] = None,
                 adv_steps_per_epoch: Optional[int] = None):
        """strict_start: generator/discriminator start at step >= start
        (autoencoder semantics); False uses > (vocoder semantics,
        ref trainer/vocoder.py:65,79 vs autoencoder.py:56-65).

        primary: in multi-process training only the primary host writes
        checkpoints and metrics (state is replicated, so one copy is the
        truth); every process still executes every step.

        steps_per_epoch (= len(train_loader)): enables epoch bookkeeping —
        the reference checkpoints carry `epochs` alongside `steps`
        (ref: trainer/trainerGAN.py:95-121); ours count completed passes
        over the active loader (adv_steps_per_epoch for the adversarial
        stage, defaulting to steps_per_epoch)."""
        self.steps_fns = steps_fns
        self.state = state
        self.config = config
        self.outdir = outdir
        self.train_iter = train_iter
        self.adv_train_iter = adv_train_iter or train_iter
        self.eval_iter_fn = eval_iter_fn
        self.steps = start_step
        self.strict_start = strict_start
        self.primary = primary
        self.writer = MetricsWriter(outdir) if primary else NullWriter()
        # autoencoder configs use start_steps:{generator,discriminator};
        # vocoder configs use *_train_start_steps (ref: autoencoder.py:45-46,
        # vocoder.py:44-45)
        ss = config.get("start_steps", {})
        self.generator_start = config.get(
            "generator_train_start_steps", ss.get("generator", 0))
        self.discriminator_start = config.get(
            "discriminator_train_start_steps", ss.get("discriminator",
                                                      200000))
        self.train_max_steps = config.get("train_max_steps", 200000)
        self.adv_train_max_steps = config.get("adv_train_max_steps",
                                              self.train_max_steps)
        self.save_interval = config.get("save_interval_steps", 100000)
        self.eval_interval = config.get("eval_interval_steps", 1000)
        self.log_interval = config.get("log_interval_steps", 100)
        self._log_accum: Dict[str, float] = {}
        self._log_count = 0
        self.epochs = 0
        self._epoch_progress = 0
        self.steps_per_epoch = steps_per_epoch
        self.adv_steps_per_epoch = adv_steps_per_epoch or steps_per_epoch

    def _adversarial(self) -> bool:
        if self.strict_start:
            return self.steps >= self.discriminator_start
        return self.steps > self.discriminator_start

    def _ckpt_path(self, steps):
        return os.path.join(self.outdir, f"checkpoint-{steps}steps.ckpt")

    def save(self, path=None):
        if not self.primary:
            return
        save_checkpoint(path or self._ckpt_path(self.steps), self.state,
                        self.steps, extra={"epochs": self.epochs})
        logging.info("Saved checkpoint @ %d steps (%d epochs)", self.steps,
                     self.epochs)

    def resume(self, path: str):
        self.state, header = load_checkpoint(path, template=self.state)
        self.steps = header["steps"]
        self.epochs = int(header.get("epochs", 0))
        logging.info("Resumed from %s @ %d steps (%d epochs)", path,
                     self.steps, self.epochs)

    def _accumulate(self, metrics):
        # keep device scalars lazy: a float() here would block every step on
        # a device->host fetch (ruinous over a high-RTT transport); sums are
        # accumulated as jax values and fetched once per log interval
        for k, v in metrics.items():
            prev = self._log_accum.get(k)
            self._log_accum[k] = v if prev is None else prev + v
        self._log_count += 1

    def _flush_log(self):
        if self._log_count:
            avg = {k: float(v) / self._log_count
                   for k, v in self._log_accum.items()}
            self.writer.write(self.steps, avg, prefix="train/")
            top = {k: round(v, 4) for k, v in list(avg.items())[:6]}
            logging.info("step %d: %s", self.steps, top)
            self._log_accum, self._log_count = {}, 0

    def _eval(self):
        # lazy accumulation, same discipline as _accumulate: summing jax
        # scalars keeps every batch's metrics on-device; the single float()
        # per key at the end is the only host sync of the whole eval pass
        # (a per-batch float() would serialize on the ~30 ms-RTT tunnel)
        accum: Dict[str, object] = {}
        n = 0
        for batch in self.eval_iter_fn():
            m = self.steps_fns["eval"](self.state, *(
                batch if isinstance(batch, tuple) else (batch,)))
            for k, v in m.items():
                prev = accum.get(k)
                accum[k] = v if prev is None else prev + v
            n += 1
        if n:
            self.writer.write(self.steps, {k: float(v) / n for k, v in
                                           accum.items()}, prefix="eval/")

    def run(self, max_steps: Optional[int] = None):
        """Train to adv_train_max_steps (or max_steps), saving on exit.

        SIGTERM (preemption) triggers a checkpoint save and a clean stop —
        restart with --resume picks up at the same step."""
        import signal

        target = max_steps if max_steps is not None else \
            self.adv_train_max_steps
        stop = {"flag": False}

        def _on_term(signum, frame):
            logging.warning("SIGTERM received: checkpointing and stopping")
            stop["flag"] = True

        try:
            prev_handler = signal.signal(signal.SIGTERM, _on_term)
        except ValueError:  # not main thread
            prev_handler = None
        t0 = time.time()
        try:
            while self.steps < target and not stop["flag"]:
                adv = self._adversarial()
                it = self.adv_train_iter if adv else self.train_iter
                batch = next(it)
                args = batch if isinstance(batch, tuple) else (batch,)
                fn = self.steps_fns["adv" if adv else "metric"] \
                    if "metric" in self.steps_fns else self.steps_fns["train"]
                self.state, metrics = fn(self.state, *args)
                self.steps += 1
                spe = (self.adv_steps_per_epoch if adv
                       else self.steps_per_epoch)
                if spe:
                    self._epoch_progress += 1
                    if self._epoch_progress >= spe:
                        self.epochs += 1
                        self._epoch_progress = 0
                self._accumulate(metrics)
                if self.steps % self.log_interval == 0:
                    self._flush_log()
                if self.steps % self.eval_interval == 0:
                    self._eval()
                if self.steps % self.save_interval == 0:
                    self.save()
        finally:
            # always save a final checkpoint (ref: bin/train.py:119-123)
            self.save(os.path.join(self.outdir, "checkpoint-final.ckpt"))
            self.writer.close()
            if prev_handler is not None:
                import signal as _signal
                _signal.signal(_signal.SIGTERM, prev_handler)
        dt = time.time() - t0
        logging.info("Finished %d steps in %.1fs", self.steps, dt)
