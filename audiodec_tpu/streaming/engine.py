"""Streaming codec engine: stateful hop-by-hop encode/decode under jit.

TPU-native redesign of the reference streaming stack (ref:
models/autoencoder/AudioDec.py:166-256, bin/stream.py): per-layer causal
state lives in an explicit pytree that stays device-resident; each hop is one
jitted call with donated state (no host round-trip of state), and whole
signals can be processed by a `lax.scan` over hops for testing/throughput.

The wire format matches the reference: flattened RVQ indices per hop
(ref: utils/audiodec.py:100-106 — indices are what crosses tx -> rx).
"""

from __future__ import annotations

import contextlib
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from audiodec_tpu.models.autoencoder import (
    GeneratorConfig,
    codec_state_init,
    decoder_apply,
    decoder_state_init,
    encoder_apply,
    encoder_state_init,
    projector_apply,
    projector_state_init,
)
from audiodec_tpu.models.vocoder import (
    VocoderConfig,
    vocoder_apply,
    vocoder_state_init,
)
from audiodec_tpu.ops.vq import rvq_forward_index, rvq_lookup


def _enc_step(params, cfg, state, x, exact_k=None, enc_precision=None):
    """One streaming encode hop.

    exact_k / enc_precision: the hardware-bit-exact recipe from
    codec_test --precision exact (encoder+projector traced under a raised
    matmul precision, RVQ argmin via the two-pass shortlist re-score —
    ops/vq.py vq_nearest_2pass).  None/None is the default fast path."""
    scope = (jax.default_matmul_precision(enc_precision)
             if enc_precision else contextlib.nullcontext())
    with scope:
        h, se = encoder_apply(params["encoder"], x, cfg,
                              state=state["encoder"])
        z, sp = projector_apply(params["projector"], h, cfg,
                                state=state["projector"])
    _, idx = rvq_forward_index(z, params["quantizer"], flatten=True,
                               exact_k=exact_k)
    return idx, {"encoder": se, "projector": sp}


def _dec_step(params, cfg, voc_cfg, state, idx):
    zq = rvq_lookup(idx, params["quantizer"], flattened=True)
    if voc_cfg is None:
        y, sd = decoder_apply(params["decoder"], zq, cfg,
                              state=state["decoder"])
        return y, {"decoder": sd}
    y, sv = vocoder_apply(params["vocoder"], zq, voc_cfg,
                          state=state["vocoder"])
    return y, {"vocoder": sv}


class StreamingCodec:
    """Stateful streaming encoder/decoder pair.

    params: generator params (+ optional 'vocoder' entry when the rx side is
    a HiFiGAN vocoder, the AD v1/v2 configuration).

    precision: "default" (fast path) or "exact" — the hardware-bit-exact
    recipe from codec_test --precision exact (encoder at 'high' matmul
    precision + two-pass argmin re-score; empirically 0-flip on the
    measured checkpoints, tools/flip_probe.py).  Exact mode requires an
    f32 stream dtype (the encoder must see f32 inputs)."""

    def __init__(self, params, cfg: GeneratorConfig,
                 voc_cfg: Optional[VocoderConfig] = None, batch: int = 1,
                 dtype=jnp.float32, precision: str = "default",
                 exact_k: int = 16):
        if precision not in ("default", "exact"):
            raise ValueError(f"precision must be default|exact, "
                             f"got {precision!r}")
        if precision == "exact" and dtype != jnp.float32:
            raise ValueError("precision='exact' needs dtype=float32 "
                             "(the encoder must run in f32)")
        self.params = params
        self.cfg = cfg
        self.voc_cfg = voc_cfg
        self.batch = batch
        self.dtype = dtype
        ek, ep = (exact_k, "high") if precision == "exact" else (None, None)
        self.enc_state = {
            "encoder": encoder_state_init(batch, cfg, dtype),
            "projector": projector_state_init(batch, cfg, dtype),
        }
        if voc_cfg is None:
            self.dec_state = {"decoder": decoder_state_init(batch, cfg,
                                                            dtype)}
        else:
            self.dec_state = {"vocoder": vocoder_state_init(batch, voc_cfg,
                                                            dtype)}
        self._enc = jax.jit(partial(_enc_step, params, cfg,
                                    exact_k=ek, enc_precision=ep),
                            donate_argnums=0)
        self._dec = jax.jit(partial(_dec_step, params, cfg, voc_cfg),
                            donate_argnums=0)

    def reset(self):
        """Zero all causal state (ref reset_buffer, AudioDec.py:250-256)."""
        cfg, batch, dtype = self.cfg, self.batch, self.dtype
        self.enc_state = {
            "encoder": encoder_state_init(batch, cfg, dtype),
            "projector": projector_state_init(batch, cfg, dtype),
        }
        if self.voc_cfg is None:
            self.dec_state = {"decoder": decoder_state_init(batch, cfg,
                                                            dtype)}
        else:
            self.dec_state = {"vocoder": vocoder_state_init(batch,
                                                            self.voc_cfg,
                                                            dtype)}

    def warmup(self, receptive_length: int = 8192):
        """Prime states and trigger compilation by streaming zeros
        (ref initial_encoder/initial_decoder, AudioDec.py:216-226)."""
        hop = self.cfg.hop_length
        n = max(1, receptive_length // hop) * hop
        z = jnp.zeros((self.batch, n, self.cfg.input_channels), self.dtype)
        idx = self.encode(z)
        self.decode(idx)
        # also compile the single-hop shapes
        z1 = jnp.zeros((self.batch, hop, self.cfg.input_channels),
                       self.dtype)
        i1 = self.encode(z1)
        self.decode(i1)

    def encode(self, x) -> jnp.ndarray:
        """x: (B, k*hop, C) -> flattened indices (B, k, Q)."""
        idx, self.enc_state = self._enc(self.enc_state, x)
        return idx

    def decode(self, idx) -> jnp.ndarray:
        """idx: (B, k, Q) flattened -> (B, k*hop, C) waveform."""
        y, self.dec_state = self._dec(self.dec_state, idx)
        return y


def scan_streaming_encode(params, cfg: GeneratorConfig, x,
                          exact_k=None, enc_precision=None):
    """Whole-signal streaming encode as a `lax.scan` over hops.

    x: (B, n_hops*hop, C) -> idx (B, n_hops, Q).  Identical to the hop-by-hop
    path; used for equivalence tests and throughput measurement of the
    streaming kernel.  exact_k/enc_precision: the StreamingCodec
    precision='exact' recipe (see _enc_step)."""
    b, t, c = x.shape
    hop = cfg.hop_length
    n = t // hop
    xs = x[:, : n * hop].reshape(b, n, hop, c).transpose(1, 0, 2, 3)
    state = {
        "encoder": encoder_state_init(b, cfg, x.dtype),
        "projector": projector_state_init(b, cfg, x.dtype),
    }

    def step(state, xh):
        idx, state = _enc_step(params, cfg, state, xh, exact_k=exact_k,
                               enc_precision=enc_precision)
        return state, idx[:, 0]

    _, idxs = jax.lax.scan(step, state, xs)
    return idxs.transpose(1, 0, 2)  # (B, n, Q)


def scan_streaming_decode(params, cfg: GeneratorConfig, idx,
                          voc_cfg: Optional[VocoderConfig] = None):
    """idx: (B, n_hops, Q) flattened -> (B, n_hops*hop, C) via scan."""
    b, n, q = idx.shape
    if voc_cfg is None:
        state = {"decoder": decoder_state_init(b, cfg, jnp.float32)}
    else:
        state = {"vocoder": vocoder_state_init(b, voc_cfg, jnp.float32)}

    def step(state, ih):
        y, state = _dec_step(params, cfg, voc_cfg, state, ih[:, None, :])
        return state, y

    _, ys = jax.lax.scan(step, state, idx.transpose(1, 0, 2))
    # ys: (n, B, hop_out, C)
    ys = ys.transpose(1, 0, 2, 3)
    return ys.reshape(b, -1, ys.shape[-1])
