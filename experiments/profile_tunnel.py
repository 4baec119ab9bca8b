"""Tunnel transport microbenchmarks: dispatch latency, D2H bandwidth,
async-copy pipelining, batch-size scaling of the encode/decode programs.

Directs the round-2 throughput work: the stage profiler showed the batched
encode pipeline is dispatch/fetch-bound (per-dispatch ~23 ms, 750 KB fetch
~56 ms), not host-deflate-bound.
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

    dev = jax.devices()[0]
    log(f"device: {dev}")

    # --- 1. dispatch+sync latency of a trivial program
    @jax.jit
    def bump(x):
        return x + 1

    x = jax.device_put(jnp.zeros((8, 128), jnp.float32), dev)
    jax.block_until_ready(bump(x))
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        jax.block_until_ready(bump(x))
        ts.append(time.perf_counter() - t0)
    log(f"trivial dispatch+block: median {np.median(ts)*1000:.1f} ms  {[round(t*1000,1) for t in ts]}")

    # --- 2. D2H bandwidth vs size (fresh arrays each time; chunked fetch)
    from lrf_tpu.utils.transfer import to_host

    from functools import partial

    @partial(jax.jit, static_argnums=1)
    def gen(seed, n):
        return jax.random.randint(jax.random.PRNGKey(seed), (n,), 0, 255, jnp.uint32)

    for kb in (128, 256, 512, 768, 1024, 2048, 4096):
        n = kb * 256  # uint32 elements
        gen(10_000, n).block_until_ready()  # compile
        # (a) does block_until_ready itself pay for the output size?
        t0 = time.perf_counter()
        arrs = [gen(i, n) for i in range(4)]
        jax.block_until_ready(arrs)
        t_block = (time.perf_counter() - t0) / 4
        # (b) explicit fetch afterwards
        t0 = time.perf_counter()
        for a in arrs:
            to_host(a)
        dt = (time.perf_counter() - t0) / 4
        log(
            f"gen {kb:5d} KB: block {t_block*1000:7.1f} ms, fetch "
            f"{dt*1000:7.1f} ms  ({kb/1024/max(dt,1e-9):6.1f} MB/s)"
        )

    # --- 3. async chunked fetch: issue copy_to_host_async on row-slices,
    # then materialize — does the tunnel pipeline them?
    big = gen(99, 3 * 1024 * 256)  # 3 MiB
    jax.block_until_ready(big)
    chunk = 256 * 1024 // 4  # 256 KiB of uint32
    n = big.shape[0]
    slices = [big[i : i + chunk] for i in range(0, n, chunk)]
    jax.block_until_ready(slices)
    t0 = time.perf_counter()
    for s in slices:
        s.copy_to_host_async()
    parts = [np.asarray(s) for s in slices]
    dt = time.perf_counter() - t0
    log(f"async-chunked 3 MiB in 256 KiB slices: {dt*1000:.1f} ms ({3/dt:.1f} MB/s)")

    # sequential comparison (fresh array to dodge npy caching)
    big2 = gen(100, 3 * 1024 * 256)
    slices2 = [big2[i : i + chunk] for i in range(0, n, chunk)]
    jax.block_until_ready(slices2)
    t0 = time.perf_counter()
    parts = [np.asarray(s) for s in slices2]
    dt = time.perf_counter() - t0
    log(f"sync-chunked  3 MiB in 256 KiB slices: {dt*1000:.1f} ms ({3/dt:.1f} MB/s)")

    # --- 4. encode program at batch 24/48/96: dispatch+device time
    from lrf_tpu.parallel.encode import build_sharded_encoder
    from lrf_tpu.parallel.mesh import make_mesh
    from PIL import Image

    H, W = 512, 768
    img = np.asarray(
        Image.open("/root/reference/figures/kodim01.png").convert("RGB")
    ).transpose(2, 0, 1)[:, :H, :W]
    mesh = make_mesh(data=1, patch=1, devices=[dev])
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P("data"))
    for batch_n in (24, 48, 96):
        batch = np.stack([np.roll(img, 7 * i, axis=2) for i in range(batch_n)])
        db = jax.device_put(jnp.asarray(batch), sharding)
        jax.block_until_ready(db)
        fn, metadata, pack_spec = build_sharded_encoder(
            mesh, (H, W), quality=10, batch=batch_n
        )
        out = fn(db)
        jax.block_until_ready(out)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = fn(db)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        med = np.median(ts)
        mpix = batch_n * H * W / 1e6
        pieces = out if isinstance(out, tuple) else (out,)
        packed = sum(int(p_.size) for p_ in pieces) * 4
        log(
            f"encode B={batch_n:3d}: dispatch+device {med*1000:6.1f} ms "
            f"({mpix/med:6.0f} Mpix/s), packed {packed} B"
        )
        # fetch of the fresh output
        t0 = time.perf_counter()
        hosts = [to_host(p_) for p_ in pieces]
        nbytes = sum(h.nbytes for h in hosts)
        log(f"  fetch {nbytes} B: {(time.perf_counter()-t0)*1000:.1f} ms")


if __name__ == "__main__":
    main()
