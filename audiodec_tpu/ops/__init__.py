from audiodec_tpu.ops.conv import (
    causal_conv1d,
    causal_conv_transpose1d,
    noncausal_conv1d,
    noncausal_conv_transpose1d,
    noncausal_conv2d,
    conv1d_init,
    conv_transpose1d_init,
    conv2d_init,
    causal_state_init,
    causal_transpose_state_init,
)
from audiodec_tpu.ops.vq import (
    rvq_init,
    rvq_lookup,
    rvq_forward,
    rvq_forward_index,
    vq_nearest,
)
from audiodec_tpu.ops.activations import get_activation
from audiodec_tpu.ops.spectral import (
    stft_magnitude,
    mel_filterbank,
    mel_spectrogram,
)
from audiodec_tpu.ops.norms import (
    weight_norm_params,
    spectral_norm_params,
    resolve_params,
    apply_weight_norm_tree,
)
