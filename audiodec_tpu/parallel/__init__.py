from audiodec_tpu.parallel.mesh import make_mesh
from audiodec_tpu.parallel.codec import (
    encoder_halo_samples,
    decoder_halo_frames,
    make_sharded_codec,
)
from audiodec_tpu.parallel.tp import (
    generator_tp_specs,
    make_tp_codec,
    make_tp_mesh,
)
from audiodec_tpu.parallel.distributed import (
    global_mesh,
    global_to_host_local,
    host_local_rows,
    host_local_to_global,
    init_distributed,
    process_shard,
)
