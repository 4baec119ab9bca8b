"""Stage-level profiling of the batched encode/decode pipelines on the real chip.

Measures, per batch (bench config: 24x 512x768 q=10):
  encode: dispatch+device compute | D2H fetch of packed factors | host serialize
  decode: host inflate+pack | H2D upload | device reconstruct | D2H images

Prints a table to stderr. Used to direct optimization (VERDICT r1 items 2/4).
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

    from lrf_tpu.models.container import set_fiber_coder
    from lrf_tpu.parallel.decode import _device_decode, _inflate_streams
    from lrf_tpu.parallel.encode import (
        _serialize_batch,
        build_sharded_encoder,
        sharded_qmf_encode_batch,
    )
    from lrf_tpu.parallel.mesh import make_mesh
    from lrf_tpu.utils.transfer import to_host

    set_fiber_coder("deflate")
    H, W, BATCH, QUALITY = 512, 768, 24, 10
    from PIL import Image

    img = np.asarray(
        Image.open("/root/reference/figures/kodim01.png").convert("RGB")
    ).transpose(2, 0, 1)[:, :H, :W]
    batch = np.stack([np.roll(img, 7 * i, axis=2) for i in range(BATCH)])
    mpix = BATCH * H * W / 1e6

    mesh = make_mesh(data=1, patch=1, devices=jax.devices()[:1])
    sharding = NamedSharding(mesh, P("data"))
    device_batch = jax.device_put(jnp.asarray(batch), sharding)
    jax.block_until_ready(device_batch)

    fn, metadata, pack_spec = build_sharded_encoder(
        mesh, (H, W), quality=QUALITY, batch=BATCH
    )
    # warm up
    streams = sharded_qmf_encode_batch(device_batch, mesh, quality=QUALITY)

    N = 10
    # 1. dispatch + device compute (block on result, no fetch)
    ts = []
    for _ in range(N):
        t0 = time.perf_counter()
        out = fn(device_batch)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    log(f"encode dispatch+device (block_until_ready): {np.median(ts)*1000:.1f} ms")

    # 2. D2H fetch of the packed buffers (the encoder returns a TUPLE of
    # piece buffers on every pack path so each can start its async copy at
    # dispatch)
    out = fn(device_batch)
    jax.block_until_ready(out)
    pieces = out if isinstance(out, tuple) else (out,)
    nbytes = sum(int(p_.size) * p_.dtype.itemsize for p_ in pieces)
    log(
        f"packed buffer: {nbytes} bytes in {len(pieces)} pieces, "
        f"chunk={os.environ.get('LRF_TPU_FETCH_CHUNK')}"
    )
    from lrf_tpu.parallel.encode import _fetch_encoded, _start_fetch

    ts = []
    for _ in range(N):
        out = fn(device_batch)
        _start_fetch(out, pack_spec)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        host_out = _fetch_encoded(out, pack_spec)
        ts.append(time.perf_counter() - t0)
    log(f"encode D2H fetch: {np.median(ts)*1000:.1f} ms  (all: {[round(t*1000,1) for t in ts]})")

    # 3. host serialize
    ts = []
    for _ in range(N):
        t0 = time.perf_counter()
        streams = _serialize_batch(host_out, pack_spec, metadata, BATCH)
        ts.append(time.perf_counter() - t0)
    log(f"encode host serialize: {np.median(ts)*1000:.1f} ms")

    # ---- decode stages ----
    ts = []
    for _ in range(N):
        t0 = time.perf_counter()
        inflated = _inflate_streams(streams, True)
        ts.append(time.perf_counter() - t0)
    log(f"decode host inflate+pack: {np.median(ts)*1000:.1f} ms")
    flat = inflated[0]
    log(f"decode upload buffer: {flat.size * flat.dtype.itemsize} bytes")

    # upload + device decode + block (out='device')
    ts = []
    for _ in range(N):
        t0 = time.perf_counter()
        imgs = _device_decode(*inflated, mesh, "device")
        jax.block_until_ready(imgs)
        ts.append(time.perf_counter() - t0)
    log(f"decode upload+device reconstruct: {np.median(ts)*1000:.1f} ms")

    # decode D2H of images (full uint8 images — 9.4 MB!)
    t0 = time.perf_counter()
    host_imgs = to_host(imgs)
    log(f"decode D2H images ({host_imgs.nbytes} B): {(time.perf_counter()-t0)*1000:.1f} ms")

    log(f"batch = {mpix:.2f} Mpixel")


if __name__ == "__main__":
    main()
