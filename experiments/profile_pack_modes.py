"""A/B: pipelined encode throughput with flat vs entropy factor transport.

Same measurement shape as bench.py's steady-state window (24x 512x768 q=10,
pipelined batches), run for each pack mode. Decides the auto default.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/lrf_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from jax.sharding import NamedSharding, PartitionSpec as P
    from PIL import Image

    from lrf_tpu.models.container import set_fiber_coder
    from lrf_tpu.parallel.encode import (
        sharded_qmf_encode_batch,
        sharded_qmf_encode_batches,
    )
    from lrf_tpu.parallel.mesh import make_mesh

    set_fiber_coder("deflate")
    H, W, BATCH, QUALITY = 512, 768, 24, 10
    img = np.asarray(
        Image.open("/root/reference/figures/kodim01.png").convert("RGB")
    ).transpose(2, 0, 1)[:, :H, :W]
    batch = np.stack([np.roll(img, 7 * i, axis=2) for i in range(BATCH)])
    mpix = BATCH * H * W / 1e6

    log("devices...")
    mesh = make_mesh(data=1, patch=1, devices=jax.devices()[:1])
    log("upload...")
    device_batch = jax.device_put(
        jnp.asarray(batch), NamedSharding(mesh, P("data"))
    )
    jax.block_until_ready(device_batch)
    log("upload done")

    results = {}
    for mode in ("flat", "entropy"):
        t0 = time.perf_counter()
        streams = sharded_qmf_encode_batch(
            device_batch, mesh, quality=QUALITY, pack=mode
        )
        log(f"{mode}: compile+first {time.perf_counter()-t0:.1f}s, "
            f"stream bytes {sum(map(len, streams))}")
        iters, windows = 8, 5
        for _ in sharded_qmf_encode_batches(
            [device_batch] * iters, mesh, quality=QUALITY, pack=mode
        ):
            pass
        rates = []
        for _ in range(windows):
            t0 = time.perf_counter()
            for _ in sharded_qmf_encode_batches(
                [device_batch] * iters, mesh, quality=QUALITY, pack=mode
            ):
                pass
            rates.append(mpix * iters / (time.perf_counter() - t0))
        rates.sort()
        results[mode] = rates
        log(f"{mode}: {[round(r,1) for r in rates]} Mpixel/s "
            f"(median {rates[len(rates)//2]:.1f})")
    # cross-check byte identity
    a = sharded_qmf_encode_batch(device_batch, mesh, quality=QUALITY, pack="flat")
    b = sharded_qmf_encode_batch(device_batch, mesh, quality=QUALITY, pack="entropy")
    log(f"streams identical: {a == b}")


if __name__ == "__main__":
    main()
