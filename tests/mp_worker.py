"""Worker process for the real multi-process distributed-encode test.

Launched by `tests/test_parallel.py::TestMultiProcess` as N separate
processes forming a genuine `jax.distributed` CPU cluster (Gloo collectives).
Each process encodes its contiguous dataset shard on its local device mesh,
the streams are all-gathered in dataset order, and process 0 writes them to
`out_path` as a length-prefixed file for the parent test to compare against
single-process encodes byte-for-byte.

Usage: python mp_worker.py <process_id> <num_processes> <port> <out_path>
"""

import os
import sys


def main() -> None:
    pid, n, port, out_path = (
        int(sys.argv[1]),
        int(sys.argv[2]),
        sys.argv[3],
        sys.argv[4],
    )
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}", num_processes=n, process_id=pid
    )

    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from lrf_tpu.models.container import combine_bytes
    from lrf_tpu.parallel.distributed import distributed_encode
    from lrf_tpu.parallel.encode import sharded_qmf_encode_batch
    from lrf_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(7)
    dataset = rng.integers(0, 256, (4, 3, 32, 48)).astype(np.uint8)

    mesh = make_mesh(data=len(jax.local_devices()), devices=jax.local_devices())
    streams = distributed_encode(
        dataset,
        lambda shard: sharded_qmf_encode_batch(shard, mesh, quality=20, num_iters=2),
    )
    assert len(streams) == len(dataset), (len(streams), len(dataset))

    # Exercise the bounded-round ragged gather on this real cluster: a tiny
    # chunk size forces multiple rounds with unequal per-process totals.
    from lrf_tpu.parallel.distributed import allgather_bytes

    local = [bytes([65 + pid]) * (3 + 5 * pid + i) for i in range(2 + pid)]
    expected = []
    for p in range(n):
        expected += [bytes([65 + p]) * (3 + 5 * p + i) for i in range(2 + p)]
    got = allgather_bytes(local, chunk_bytes=7)
    assert got == expected, (got, expected)

    if jax.process_index() == 0:
        with open(out_path, "wb") as f:
            f.write(combine_bytes(list(streams) + [b"end"]))


if __name__ == "__main__":
    main()
