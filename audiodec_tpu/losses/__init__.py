from audiodec_tpu.losses.mel import MultiMelSpectrogramLoss
from audiodec_tpu.losses.stft import MultiResolutionSTFTLoss
from audiodec_tpu.losses.adversarial import (
    generator_adversarial_loss,
    discriminator_adversarial_loss,
)
from audiodec_tpu.losses.feat_match import feature_match_loss
from audiodec_tpu.losses.waveform import MultiWindowShapeLoss
