"""Stage-level A/B of the factor transport: flat 5-bit pack vs device Huffman.

Per mode, on the real chip (bench config 24x 512x768 q=10):
  1. device time of the encode program (block_until_ready, no fetch)
  2. D2H fetch time + bytes
  3. host tail (unpack/huffman-decode + fiber deflate + framing)

Directs the entropy-v2 work: which stage loses the measured end-to-end gap.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


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
        _fetch_encoded,
        _serialize_batch,
        build_sharded_encoder,
    )
    from lrf_tpu.parallel.mesh import make_mesh

    set_fiber_coder("deflate")
    H, W, BATCH, QUALITY = 512, 768, 24, 10
    img = np.asarray(
        Image.open("/root/reference/figures/kodim01.png").convert("RGB")
    ).transpose(2, 0, 1)[:, :H, :W]
    batch = np.stack([np.roll(img, 7 * i, axis=2) for i in range(BATCH)])

    mesh = make_mesh(data=1, patch=1, devices=jax.devices()[:1])
    device_batch = jax.device_put(
        jnp.asarray(batch), NamedSharding(mesh, P("data"))
    )
    jax.block_until_ready(device_batch)

    from lrf_tpu.native import fibercodec as _native

    log(f"native fibercodec available: {_native.available()}")

    for mode in ("flat", "entropy"):
        fn, metadata, pack_spec = build_sharded_encoder(
            mesh, (H, W), quality=QUALITY, batch=BATCH, pack=mode
        )
        t0 = time.perf_counter()
        out = fn(device_batch)
        jax.block_until_ready(out)
        log(f"[{mode}] compile+first: {time.perf_counter()-t0:.1f}s")

        # 1. device-only time
        ts = []
        for _ in range(6):
            t0 = time.perf_counter()
            out = fn(device_batch)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        log(f"[{mode}] dispatch+device: {np.median(ts)*1000:7.1f} ms "
            f"{[round(t*1000) for t in ts]}")

        # 2. fetch
        ts, nbytes = [], 0
        for _ in range(6):
            out = fn(device_batch)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            host_out = _fetch_encoded(out, pack_spec)
            ts.append(time.perf_counter() - t0)
        if mode == "flat":
            nbytes = host_out.nbytes
        else:
            nbytes = sum(a.nbytes for a in host_out)
        log(f"[{mode}] D2H fetch: {np.median(ts)*1000:7.1f} ms for {nbytes} B "
            f"({nbytes/1e6/np.median(ts):.1f} MB/s) {[round(t*1000) for t in ts]}")

        # 3. host tail
        ts = []
        for _ in range(6):
            t0 = time.perf_counter()
            streams = _serialize_batch(host_out, pack_spec, metadata, BATCH)
            ts.append(time.perf_counter() - t0)
        log(f"[{mode}] host serialize: {np.median(ts)*1000:7.1f} ms, "
            f"stream {sum(map(len, streams))} B")


if __name__ == "__main__":
    main()
