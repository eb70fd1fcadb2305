from audiodec_tpu.models.autoencoder import (
    GeneratorConfig,
    generator_init,
    generator_forward,
    generator_encode,
    generator_decode,
    encoder_state_init,
    decoder_state_init,
    codec_state_init,
)
from audiodec_tpu.models.vocoder import (
    VocoderConfig,
    vocoder_init,
    vocoder_apply,
    vocoder_state_init,
)
from audiodec_tpu.models.registry import assign_model
