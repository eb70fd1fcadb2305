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
