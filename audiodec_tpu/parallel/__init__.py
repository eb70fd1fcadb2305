from audiodec_tpu.parallel.mesh import make_mesh
from audiodec_tpu.parallel.codec import (
    encoder_halo_samples,
    decoder_halo_frames,
    make_sharded_codec,
)
