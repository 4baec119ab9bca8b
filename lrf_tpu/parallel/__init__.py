"""Distributed layer: device meshes, sharded batch encode, multi-host gather."""

from lrf_tpu.parallel.mesh import make_mesh, batch_sharding, replicated
from lrf_tpu.parallel.encode import (
    build_sharded_encoder,
    sharded_qmf_encode_batch,
    sharded_qmf_encode_batches,
)
from lrf_tpu.parallel.decode import (
    sharded_qmf_decode_batch,
    sharded_qmf_decode_batches,
)
from lrf_tpu.parallel.distributed import (
    initialize,
    shard_range,
    allgather_bytes,
    distributed_encode,
)
