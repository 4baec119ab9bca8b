"""Benchmark: batched QMF encode throughput on one TPU chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "Mpixel/s", "vs_baseline": N}

Baseline: the reference (pashtari/lrf) encodes Kodak at ~0.25 bpp in
82.57 ms/image on a 2x Xeon Gold 6140 node (`paper/v2-arxiv/experiments.tex:201`,
BASELINE.md) = 4.76 Mpixel/s with images resident in RAM. We measure the
equivalent: images resident in HBM (BASELINE.json: "HBM-resident patch
stacks"), full codec work per batch — device factorization pipeline, factor
fetch to host, byte-exact zlib serialization. The one-time upload of the
batch is reported separately on stderr (this environment's TPU is behind a
network tunnel, so H2D bandwidth is an artifact of the harness, not the
codec; on local PCIe it is negligible).
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_MPIX_S = 4.76  # reference CPU encode throughput, Kodak @0.25bpp
BASELINE_DECODE_MPIX_S = 148.0  # reference CPU decode (2.66 ms/image Kodak)
H, W, BATCH = 512, 768, 24
QUALITY = 10


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def load_batch():
    from PIL import Image

    img = np.asarray(
        Image.open("/root/reference/figures/kodim01.png").convert("RGB")
    ).transpose(2, 0, 1)
    img = img[:, :H, :W]
    if img.shape[1] < H or img.shape[2] < W:  # pad by tiling if needed
        reps = (1, -(-H // img.shape[1]), -(-W // img.shape[2]))
        img = np.tile(img, reps)[:, :H, :W]
    # 24 distinct-ish images: roll each copy so zlib work is realistic
    batch = np.stack([np.roll(img, 7 * i, axis=2) for i in range(BATCH)])
    return batch


def main():
    import jax
    import jax.numpy as jnp

    # Persistent compile cache: tunnel-attached TPU compiles are slow (and
    # occasionally flaky); cache them across bench runs.
    jax.config.update("jax_compilation_cache_dir", "/tmp/lrf_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from jax.sharding import NamedSharding, PartitionSpec as P

    from lrf_tpu.models.container import set_fiber_coder
    from lrf_tpu.models.qmf import qmf_decode
    from lrf_tpu.parallel.encode import (
        sharded_qmf_encode_batch,
        sharded_qmf_encode_batches,
    )
    from lrf_tpu.parallel.mesh import make_mesh
    from lrf_tpu.utils.metrics import bits_per_pixel, psnr

    # libdeflate fiber coder: ~4-5x faster than zlib-9 on the 2-core host at
    # equal-or-smaller stream size; output is still a standard zlib stream
    # the reference decoder reads (tests/test_container.py pins this).
    set_fiber_coder("deflate")

    devices = jax.devices()
    log(f"devices: {devices}")
    mesh = make_mesh(data=1, patch=1, devices=devices[:1])
    batch = load_batch()
    mpix = batch.shape[0] * H * W / 1e6

    sharding = NamedSharding(mesh, P("data"))

    t0 = time.perf_counter()
    device_batch = jax.device_put(jnp.asarray(batch), sharding)
    jax.block_until_ready(device_batch)
    upload_s = time.perf_counter() - t0
    log(f"one-time H2D upload: {upload_s:.2f}s ({batch.nbytes/1e6:.0f} MB over tunnel)")

    t0 = time.perf_counter()
    streams = sharded_qmf_encode_batch(device_batch, mesh, quality=QUALITY)
    log(f"compile+first batch: {time.perf_counter()-t0:.1f}s")

    # Steady-state pipelined throughput: device compute of batch i+1, D2H
    # fetch of batch i, and host fiber-zlib of batch i-1 all overlap
    # (sharded_qmf_encode_batches). The TPU tunnel's latency fluctuates on a
    # seconds timescale, so measure several windows and report the median.
    iters, windows = 8, 7
    rates = []
    # discarded warm-up window: serializer thread pool + deflate state spin-up
    for streams in sharded_qmf_encode_batches(
        [device_batch] * iters, mesh, quality=QUALITY
    ):
        pass
    for w in range(windows):
        t0 = time.perf_counter()
        for streams in sharded_qmf_encode_batches(
            [device_batch] * iters, mesh, quality=QUALITY
        ):
            pass
        rates.append(mpix * iters / (time.perf_counter() - t0))
    rates.sort()
    log(f"window rates: {[round(r, 1) for r in rates]} Mpixel/s")
    mpix_s = rates[windows // 2]
    dt = mpix / mpix_s

    # Secondary visibility numbers (stderr only): device-only encode compute
    # and batched on-device decode, both synced via a scalar probe so the
    # tunnel's bulk-transfer weather stays out of the measurement.
    from lrf_tpu.parallel.decode import sharded_qmf_decode_batch
    from lrf_tpu.parallel.encode import build_sharded_encoder

    enc_fn, _, _ = build_sharded_encoder(
        mesh, (H, W), quality=QUALITY, batch=BATCH
    )
    reps = 20

    @jax.jit
    def probe(x):
        # Chain reps inside ONE program so per-dispatch tunnel round trips
        # stay out of the device-time measurement; roll the input by the
        # loop index so the encode isn't loop-invariant (XLA would hoist it).
        def body(i, acc):
            y = enc_fn(jnp.roll(x, i, axis=-1))
            chunks = y if isinstance(y, tuple) else (y,)
            for c in chunks:
                acc = acc + jnp.sum(c.astype(jnp.uint32) & jnp.uint32(1))
            return acc

        return jax.lax.fori_loop(0, reps, body, jnp.uint32(0))

    float(probe(device_batch))
    t0 = time.perf_counter()
    float(probe(device_batch))
    dev_ms = (time.perf_counter() - t0) / reps * 1000
    log(f"device-only encode: {dev_ms:.1f} ms/batch ({mpix / dev_ms * 1000:.0f} Mpixel/s)")

    from lrf_tpu.parallel.decode import sharded_qmf_decode_batches

    imgs = sharded_qmf_decode_batch(streams, mesh, out="device")  # compile
    t0 = time.perf_counter()
    n = 10
    # One device queue executes batches in order, so blocking on the last
    # batch's array bounds all of them; a per-batch scalar probe would add a
    # serial tunnel round trip (~25 ms) to every batch and understate
    # throughput by ~2x.
    for imgs in sharded_qmf_decode_batches([streams] * n, mesh, out="device"):
        pass
    jax.block_until_ready(imgs)
    dec_ms = (time.perf_counter() - t0) / n * 1000
    log(
        f"batched decode (streams->device images): {dec_ms:.1f} ms/batch "
        f"({mpix / dec_ms * 1000:.0f} Mpixel/s)"
    )

    bpp = bits_per_pixel((H, W), streams[0])
    set_fiber_coder("zlib")
    z9 = sharded_qmf_encode_batch(device_batch, mesh, quality=QUALITY)
    set_fiber_coder("deflate")
    log(
        f"stream size: deflate {sum(map(len, streams))} B vs zlib-9 "
        f"{sum(map(len, z9))} B per batch "
        f"({sum(map(len, streams)) / sum(map(len, z9)) * 100:.1f}%)"
    )
    dec = qmf_decode(streams[0])
    log(
        f"encode (HBM-resident): {dt*1000:.1f} ms/batch ({dt/BATCH*1000:.2f} ms/image), "
        f"{mpix_s:.1f} Mpixel/s, bpp={bpp:.3f}, psnr={float(psnr(batch[0], dec)):.2f} dB"
    )
    log(
        f"end-to-end incl. tunnel upload: {mpix/(dt+upload_s):.1f} Mpixel/s"
    )

    print(
        json.dumps(
            {
                "metric": f"qmf_encode_throughput_kodak_{H}x{W}_q{QUALITY}",
                "value": round(mpix_s, 2),
                "unit": "Mpixel/s",
                "vs_baseline": round(mpix_s / BASELINE_MPIX_S, 2),
                # decode is regression-tracked here too: streams -> device-
                # resident images, batched (reference CPU node: ~148 Mpix/s)
                "decode_mpix_s": round(mpix / dec_ms * 1000, 2),
                "decode_vs_baseline": round(
                    mpix / dec_ms * 1000 / BASELINE_DECODE_MPIX_S, 2
                ),
            }
        )
    )


def supervise(retries: int = 3, timeout_s: int = 900) -> int:
    """Run the measurement in a killable child, retrying on tunnel hangs.

    The tunnel-attached TPU in this environment occasionally deadlocks a
    single compile/execute/transfer; a fresh process (with the persistent
    compile cache already populated by the previous attempt's progress)
    almost always succeeds. The child's final JSON line is echoed as ours.
    """
    import subprocess

    env = dict(os.environ, LRF_BENCH_CHILD="1")
    # 256 KiB chunks + copy_to_host_async pipelining measure ~3x the D2H
    # throughput of one big synchronous fetch on the tunnel transport
    # (lrf_tpu/utils/transfer.py).
    env.setdefault("LRF_TPU_FETCH_CHUNK", str(256 * 1024))
    for attempt in range(retries):
        try:
            proc = subprocess.run(
                [sys.executable, "-u", os.path.abspath(__file__)],
                timeout=timeout_s,
                capture_output=True,
                text=True,
                env=env,
            )
        except subprocess.TimeoutExpired as e:
            log(f"bench attempt {attempt + 1} timed out; retrying")
            if e.stderr:
                log((e.stderr if isinstance(e.stderr, str) else e.stderr.decode())[-500:])
            continue
        sys.stderr.write(proc.stderr)
        lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
        if proc.returncode == 0 and lines:
            print(lines[-1])
            return 0
        log(f"bench attempt {attempt + 1} failed rc={proc.returncode}")
    log("all bench attempts failed")
    return 1


if __name__ == "__main__":
    if os.environ.get("LRF_BENCH_CHILD"):
        main()
    else:
        sys.exit(supervise())
