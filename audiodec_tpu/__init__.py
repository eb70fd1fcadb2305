"""AudioDec-TPU: a TPU-native (JAX/XLA/Pallas) streaming neural audio codec framework.

A from-scratch re-design of the capabilities of facebookresearch/AudioDec
(ICASSP 2023) for TPU hardware:

- Functional, stateless layers: streaming state is an explicit pytree threaded
  through `jax.lax.scan`, not mutable buffers.
- (B, T, C) channels-last layout so the channel axis rides the 128-wide lane
  dimension of the VPU/MXU.
- Residual vector quantization with a fixed-reduction-order distance kernel for
  reproducible nearest-code indices.
- Sharded batch transcode over `jax.sharding.Mesh` with receptive-field halo
  exchange for intra-utterance sequence parallelism.
"""

__version__ = "0.1.0"

import os as _os

# The axon TPU plugin ignores the JAX_PLATFORMS env var; honor it here so
# `JAX_PLATFORMS=cpu python -m audiodec_tpu.bin.<cli>` reliably runs on CPU
# (multi-host CPU rigs, CI) instead of silently opening the TPU.
if _os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
    import jax as _jax
    try:
        _jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
