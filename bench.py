"""Benchmark: batched QMF encode throughput on one TPU chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "Mpixel/s", "vs_baseline": N}

Baseline: the reference (pashtari/lrf) encodes Kodak at 0.25 bpp in
82.57 ms/image on a 2x Xeon Gold 6140 node (`paper/v2-arxiv/experiments.tex:201`,
BASELINE.md) = 4.76 Mpixel/s. We measure the same full pipeline —
uint8 image in, framed byte stream out (device factorization + host
zlib serialization) — over a 24-image Kodak-sized batch.
"""

import json
import sys
import time

import numpy as np

BASELINE_MPIX_S = 4.76  # reference CPU encode throughput, Kodak @0.25bpp
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

    from lrf_tpu.parallel.encode import sharded_qmf_encode_batch
    from lrf_tpu.parallel.mesh import make_mesh
    from lrf_tpu.models.qmf import qmf_decode
    from lrf_tpu.utils.metrics import bits_per_pixel, psnr

    devices = jax.devices()
    log(f"devices: {devices}")
    mesh = make_mesh(data=1, patch=1, devices=devices[:1])
    batch = load_batch()
    mpix = batch.shape[0] * H * W / 1e6

    # warmup / compile
    t0 = time.perf_counter()
    streams = sharded_qmf_encode_batch(batch, mesh, quality=QUALITY)
    log(f"compile+first batch: {time.perf_counter()-t0:.1f}s")

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        streams = sharded_qmf_encode_batch(batch, mesh, quality=QUALITY)
    dt = (time.perf_counter() - t0) / iters
    mpix_s = mpix / dt

    bpp = bits_per_pixel((H, W), streams[0])
    dec = qmf_decode(streams[0])
    log(
        f"encode: {dt*1000:.1f} ms/batch ({dt/BATCH*1000:.2f} ms/image), "
        f"{mpix_s:.1f} Mpixel/s, bpp={bpp:.3f}, psnr={float(psnr(batch[0], dec)):.2f} dB"
    )

    print(
        json.dumps(
            {
                "metric": f"qmf_encode_throughput_kodak_{H}x{W}_q{QUALITY}",
                "value": round(mpix_s, 2),
                "unit": "Mpixel/s",
                "vs_baseline": round(mpix_s / BASELINE_MPIX_S, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
