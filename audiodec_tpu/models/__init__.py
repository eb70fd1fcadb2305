from audiodec_tpu.models.autoencoder import (
    GeneratorConfig,
    generator_init,
    generator_forward,
    generator_encode,
    generator_decode,
    encoder_state_init,
    decoder_state_init,
)
