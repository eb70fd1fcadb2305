"""Jitted GAN training steps for the three workloads: autoencoder, vocoder,
denoise (behavior per ref trainer/{autoencoder,vocoder,denoise}.py).

Functional design: one `TrainState` dict pytree; Python-side phase selection
(metric-only vs adversarial) picks between two jitted step functions instead
of tracing a data-dependent cond — the phase switch happens once at a known
step (ref: trainer/autoencoder.py:56-79), so each phase gets its own XLA
program.

Freezing semantics replicate the reference exactly:
- autoencoder adv phase (paradigm 'efficient'): encoder/projector/quantizer
  frozen, codebook EMA stopped (codebook.eval()),
- vocoder: analyzer fully frozen,
- denoise: quantizer + decoder frozen, codebook EMA stopped.
Frozen subtrees get both their gradients and their post-Adam updates zeroed,
so leftover momentum cannot move frozen weights.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from audiodec_tpu.models.autoencoder import (
    GeneratorConfig,
    decoder_apply,
    encoder_apply,
    generator_forward,
    merge_forward_buffers,
    projector_apply,
)
from audiodec_tpu.models.vocoder import VocoderConfig, vocoder_apply
from audiodec_tpu.ops.norms import resolve_params
from audiodec_tpu.ops.vq import rvq_forward
from audiodec_tpu.train import criterion as C


def shard_steps(steps: Dict[str, Callable], mesh,
                axis_name: str = "data") -> Dict[str, Callable]:
    """Wrap step functions (built with `axis_name`) in shard_map over a
    1-D data mesh: state replicated, batch sharded on `axis_name`, psum'd
    grads/EMA keep replicas identical.  Batch size must be divisible by the
    mesh size."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def wrap(fn, n_batch_args, has_state):
        batch_specs = tuple(P(axis_name) for _ in range(n_batch_args))
        if has_state:
            inner = shard_map(fn, mesh=mesh,
                              in_specs=(P(),) + batch_specs,
                              out_specs=(P(), P()), check_vma=False)
        else:
            inner = shard_map(fn, mesh=mesh,
                              in_specs=(P(),) + batch_specs,
                              out_specs=P(), check_vma=False)
        return jax.jit(inner)

    # denoise steps ({'train','eval'}) take (x_n, x_c); GAN steps take (x,)
    n_batch = 2 if "metric" not in steps else 1
    return {name: wrap(fn, n_batch, has_state=(name != "eval"))
            for name, fn in steps.items()}


def _zero_subtrees(tree, keys):
    out = dict(tree)
    for k in keys:
        out[k] = jax.tree_util.tree_map(jnp.zeros_like, tree[k])
    return out


def _psum_mean(metrics, axis_name):
    if axis_name is None:
        return metrics
    return {k: jax.lax.pmean(v, axis_name) for k, v in metrics.items()}


def _ppl_record(record, ppl):
    for i in range(ppl.shape[0]):
        record[f"ppl_{i}"] = ppl[i]


# ---------------------------------------------------------------------------
# autoencoder (ref: trainer/autoencoder.py:49-131)
# ---------------------------------------------------------------------------

def make_autoencoder_steps(gen_cfg: GeneratorConfig, disc_apply: Callable,
                           config: dict, crit: dict,
                           gen_opt: optax.GradientTransformation,
                           disc_opt: optax.GradientTransformation,
                           axis_name: Optional[str] = None,
                           jit: bool = True):
    """Returns {'metric': fn, 'adv': fn, 'eval': fn} over TrainState dicts:
    state = {gen, disc, gen_opt, disc_opt}."""

    def gen_loss_metric(gen_params, x):
        record = {}
        eff, _ = resolve_params(gen_params)
        y, zq, z, vql, ppl, new_buf = generator_forward(
            eff, x, gen_cfg, train=True, axis_name=axis_name)
        _ppl_record(record, ppl)
        loss = C.vq_loss(config, vql, record)
        loss = loss + C.metric_loss(crit, config, y, x, record)
        record["generator_loss"] = loss
        return loss, (record, new_buf)

    def metric_step(state, x):
        (loss, (record, new_buf)), grads = jax.value_and_grad(
            gen_loss_metric, has_aux=True)(state["gen"], x)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
        updates, gen_opt_state = gen_opt.update(grads, state["gen_opt"],
                                                state["gen"])
        gen = optax.apply_updates(state["gen"], updates)
        # EMA codebooks + BN running stats, not optimizer-driven
        gen = merge_forward_buffers(gen, new_buf)
        new_state = dict(state, gen=gen, gen_opt=gen_opt_state)
        return new_state, _psum_mean(record, axis_name)

    def gen_loss_adv(gen_params, disc_params, x):
        record = {}
        eff, _ = resolve_params(gen_params)
        # efficient paradigm: codebook eval (no EMA), encoder frozen; a BN
        # projector still runs in train mode (the reference freezes via
        # requires_grad only, ref autoencoder.py:66-79)
        y, zq, z, vql, ppl, new_buf = generator_forward(
            eff, x, gen_cfg, train=False, bn_train=True)
        _ppl_record(record, ppl)
        loss = C.vq_loss(config, vql, record)
        loss = loss + C.metric_loss(crit, config, y, x, record)
        disc_eff, _ = resolve_params(disc_params)
        p_hat = disc_apply(disc_eff, y)
        p = (jax.lax.stop_gradient(disc_apply(disc_eff, x))
             if "feat_match" in crit else None)
        loss = loss + C.adv_loss(crit, config, p_hat, p, record)
        record["generator_loss"] = loss
        return loss, (record, y, new_buf)

    frozen = ("encoder", "projector", "quantizer")

    def adv_step(state, x):
        (loss, (record, y, new_buf)), grads = jax.value_and_grad(
            gen_loss_adv, has_aux=True)(state["gen"], state["disc"], x)
        grads = _zero_subtrees(grads, frozen)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
        updates, gen_opt_state = gen_opt.update(grads, state["gen_opt"],
                                                state["gen"])
        updates = _zero_subtrees(updates, frozen)
        gen = optax.apply_updates(state["gen"], updates)
        gen = merge_forward_buffers(gen, new_buf)

        # discriminator update on re-computed y_ (ref autoencoder.py:117-126;
        # torch no_grad does not stop BN buffer updates, so a BN projector's
        # running stats advance a second time here)
        gen_eff, _ = resolve_params(gen)
        y_, _, _, _, _, buf2 = generator_forward(gen_eff, x, gen_cfg,
                                                 train=False, bn_train=True)
        gen = merge_forward_buffers(gen, buf2)
        y_ = jax.lax.stop_gradient(y_)

        def disc_loss_fn(disc_params):
            rec = {}
            eff, new_disc = resolve_params(disc_params)
            p = disc_apply(eff, x)
            p_hat = disc_apply(eff, y_)
            return C.dis_loss(crit, p_hat, p, rec), (rec, new_disc)

        (dloss, (drec, new_disc)), dgrads = jax.value_and_grad(
            disc_loss_fn, has_aux=True)(state["disc"])
        if axis_name is not None:
            dgrads = jax.lax.pmean(dgrads, axis_name)
        dupdates, disc_opt_state = disc_opt.update(dgrads, state["disc_opt"],
                                                   state["disc"])
        disc = optax.apply_updates(new_disc, dupdates)
        record.update(drec)
        new_state = dict(state, gen=gen, disc=disc, gen_opt=gen_opt_state,
                         disc_opt=disc_opt_state)
        return new_state, _psum_mean(record, axis_name)

    def eval_step(state, x):
        record = {}
        eff, _ = resolve_params(state["gen"])
        y, zq, z, vql, ppl, _ = generator_forward(eff, x, gen_cfg,
                                                  train=False)
        _ppl_record(record, ppl)
        loss = C.vq_loss(config, vql, record)
        loss = loss + C.metric_loss(crit, config, y, x, record)
        record["generator_loss"] = loss
        return _psum_mean(record, axis_name)

    if jit:
        metric_step = jax.jit(metric_step, donate_argnums=0)
        adv_step = jax.jit(adv_step, donate_argnums=0)
        eval_step = jax.jit(eval_step)
    return {"metric": metric_step, "adv": adv_step, "eval": eval_step}


# ---------------------------------------------------------------------------
# vocoder (ref: trainer/vocoder.py:49-146)
# ---------------------------------------------------------------------------

def analyzer_codes(analyzer_params, x, gen_cfg: GeneratorConfig):
    """Frozen analyzer encode path: encoder -> projector -> quantize-dequant
    (ref: trainer/vocoder.py:69-73)."""
    h = encoder_apply(analyzer_params["encoder"], x, gen_cfg)
    z = projector_apply(analyzer_params["projector"], h, gen_cfg)
    zq, _, _, _ = rvq_forward(z, analyzer_params["quantizer"], train=False)
    return jax.lax.stop_gradient(zq)


def make_vocoder_steps(voc_cfg: VocoderConfig, gen_cfg: GeneratorConfig,
                       disc_apply: Callable, config: dict, crit: dict,
                       gen_opt, disc_opt, axis_name: Optional[str] = None,
                       jit: bool = True):
    """TrainState: {gen (vocoder), disc, analyzer, gen_opt, disc_opt}."""

    def gen_loss(gen_params, disc_params, zq, x, adversarial: bool):
        record = {}
        eff, _ = resolve_params(gen_params)
        y = vocoder_apply(eff, zq, voc_cfg)
        loss = C.metric_loss(crit, config, y, x, record)
        if adversarial:
            disc_eff, _ = resolve_params(disc_params)
            p_hat = disc_apply(disc_eff, y)
            p = (jax.lax.stop_gradient(disc_apply(disc_eff, x))
                 if "feat_match" in crit else None)
            loss = loss + C.adv_loss(crit, config, p_hat, p, record)
        record["generator_loss"] = loss
        return loss, record

    # stats normalization mean/scale are torch BUFFERS (registered by
    # register_stats, ref models/vocoder/HiFiGAN.py:206-219), never
    # optimizer-driven — freeze them like the reference does implicitly
    stats_frozen = tuple(k for k in ("mean", "scale"))

    def _gen_update(state, zq, x, adversarial):
        (loss, record), grads = jax.value_and_grad(
            gen_loss, has_aux=True)(state["gen"], state["disc"], zq, x,
                                    adversarial)
        grads = _zero_subtrees(
            grads, [k for k in stats_frozen if k in grads])
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
        updates, gen_opt_state = gen_opt.update(grads, state["gen_opt"],
                                                state["gen"])
        updates = _zero_subtrees(
            updates, [k for k in stats_frozen if k in updates])
        gen = optax.apply_updates(state["gen"], updates)
        return dict(state, gen=gen, gen_opt=gen_opt_state), record

    def metric_step(state, x):
        zq = analyzer_codes(state["analyzer"], x, gen_cfg)
        state, record = _gen_update(state, zq, x, adversarial=False)
        return state, _psum_mean(record, axis_name)

    def adv_step(state, x):
        zq = analyzer_codes(state["analyzer"], x, gen_cfg)
        state, record = _gen_update(state, zq, x, adversarial=True)

        gen_eff, _ = resolve_params(state["gen"])
        y_ = jax.lax.stop_gradient(vocoder_apply(gen_eff, zq, voc_cfg))

        def disc_loss_fn(disc_params):
            rec = {}
            eff, new_disc = resolve_params(disc_params)
            p = disc_apply(eff, x)
            p_hat = disc_apply(eff, y_)
            return C.dis_loss(crit, p_hat, p, rec), (rec, new_disc)

        (dloss, (drec, new_disc)), dgrads = jax.value_and_grad(
            disc_loss_fn, has_aux=True)(state["disc"])
        if axis_name is not None:
            dgrads = jax.lax.pmean(dgrads, axis_name)
        dupdates, disc_opt_state = disc_opt.update(dgrads, state["disc_opt"],
                                                   state["disc"])
        disc = optax.apply_updates(new_disc, dupdates)
        record.update(drec)
        return (dict(state, disc=disc, disc_opt=disc_opt_state),
                _psum_mean(record, axis_name))

    def eval_step(state, x):
        record = {}
        zq = analyzer_codes(state["analyzer"], x, gen_cfg)
        eff, _ = resolve_params(state["gen"])
        y = vocoder_apply(eff, zq, voc_cfg)
        loss = C.metric_loss(crit, config, y, x, record)
        record["generator_loss"] = loss
        return _psum_mean(record, axis_name)

    if jit:
        metric_step = jax.jit(metric_step, donate_argnums=0)
        adv_step = jax.jit(adv_step, donate_argnums=0)
        eval_step = jax.jit(eval_step)
    return {"metric": metric_step, "adv": adv_step, "eval": eval_step}


# ---------------------------------------------------------------------------
# denoise (ref: trainer/denoise.py:52-111)
# ---------------------------------------------------------------------------

def make_denoise_steps(gen_cfg: GeneratorConfig, config: dict, crit: dict,
                       gen_opt, axis_name: Optional[str] = None,
                       jit: bool = True):
    """TrainState: {gen, gen_opt}.  Noisy input x_n, clean target x_c;
    quantizer + decoder frozen, codebook EMA stopped."""
    frozen = ("quantizer", "decoder")

    def loss_fn(gen_params, x_n, x_c, *, bn_train=True):
        record = {}
        eff, _ = resolve_params(gen_params)
        # codebook eval (ref denoise.py:60), but the model stays in train
        # mode so a BN projector uses batch stats (ref freezes via
        # requires_grad only)
        y, zq, z, vql, ppl, new_buf = generator_forward(
            eff, x_n, gen_cfg, train=False, bn_train=bn_train)
        _ppl_record(record, ppl)
        loss = C.vq_loss(config, vql, record)
        loss = loss + C.metric_loss(crit, config, y, x_c, record)
        record["generator_loss"] = loss
        return loss, (record, new_buf)

    def train_step(state, x_n, x_c):
        (loss, (record, new_buf)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state["gen"], x_n, x_c)
        grads = _zero_subtrees(grads, frozen)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
        updates, gen_opt_state = gen_opt.update(grads, state["gen_opt"],
                                                state["gen"])
        updates = _zero_subtrees(updates, frozen)
        gen = optax.apply_updates(state["gen"], updates)
        gen = merge_forward_buffers(gen, new_buf)
        return (dict(state, gen=gen, gen_opt=gen_opt_state),
                _psum_mean(record, axis_name))

    def eval_step(state, x_n, x_c):
        _, (record, _) = loss_fn(state["gen"], x_n, x_c, bn_train=False)
        return _psum_mean(record, axis_name)

    if jit:
        train_step = jax.jit(train_step, donate_argnums=0)
        eval_step = jax.jit(eval_step)
    return {"train": train_step, "eval": eval_step}
