"""Transport-amortization probe: steady-state pipelined encode throughput
as a function of batch size B, pipeline depth, and D2H piece size.

Round-2 finding (experiments/transport_ab.json): the delivered encode rate
is dominated by a ~28 ms *fixed* per-batch dispatch/fetch cost on the
tunnel-attached TPU, so the lever is amortization — more pixels per batch,
more batches in flight — not more compression. This driver measures one
configuration per process (piece size is baked into the traced program, and
a fresh process keeps tunnel state clean), using bench.py's plateau
protocol: collect windows until a cluster of consecutive windows agrees
within tolerance AND sits near the best observed window (so a stable
throttled period is not mistaken for the plateau).

Usage:
    python experiments/profile_amortize.py --batch 64 --depth 3 \
        --chunk-words 131072 --pack entropy
Prints one JSON line on stdout; stderr carries the window evidence.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# the bench's robust plateau protocol (cluster agreement + floor vs best:
# a stable THROTTLED period must not pass as the plateau)
from bench import measure_plateau  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--depth", type=int, default=2)
    ap.add_argument("--chunk-words", type=int, default=64 * 1024)
    ap.add_argument("--pack", default="entropy")
    ap.add_argument("--iters", type=int, default=8, help="batches per window")
    ap.add_argument("--quality", type=float, default=10)
    args = ap.parse_args()

    os.environ["LRF_TPU_FETCH_CHUNK_WORDS"] = str(args.chunk_words)

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/lrf_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from jax.sharding import NamedSharding, PartitionSpec as P
    from PIL import Image

    from lrf_tpu.models.container import set_fiber_coder
    from lrf_tpu.parallel.encode import sharded_qmf_encode_batches
    from lrf_tpu.parallel.mesh import make_mesh

    set_fiber_coder("deflate")

    H, W = 512, 768
    img = np.asarray(
        Image.open("/root/reference/figures/kodim01.png").convert("RGB")
    ).transpose(2, 0, 1)[:, :H, :W]
    batch = np.stack([np.roll(img, 7 * i, axis=2) for i in range(args.batch)])
    mpix = args.batch * H * W / 1e6

    mesh = make_mesh(data=1, patch=1, devices=jax.devices()[:1])
    device_batch = jax.device_put(
        jnp.asarray(batch), NamedSharding(mesh, P("data"))
    )
    jax.block_until_ready(device_batch)

    t0 = time.perf_counter()
    for _ in sharded_qmf_encode_batches(
        [device_batch], mesh, quality=args.quality, depth=args.depth,
        pack=args.pack,
    ):
        pass
    log(f"compile+first batch: {time.perf_counter() - t0:.1f}s")

    def run_window():
        t0 = time.perf_counter()
        for _ in sharded_qmf_encode_batches(
            [device_batch] * args.iters, mesh, quality=args.quality,
            depth=args.depth, pack=args.pack,
        ):
            pass
        return mpix * args.iters / (time.perf_counter() - t0)

    rate, windows, plateaued = measure_plateau(run_window, label="probe")
    print(
        json.dumps(
            {
                "batch": args.batch,
                "depth": args.depth,
                "chunk_words": args.chunk_words,
                "pack": args.pack,
                "mpix_s": round(rate, 1),
                "plateaued": plateaued,
                "windows": [round(r, 1) for r in windows],
            }
        )
    )


if __name__ == "__main__":
    main()
