"""Distributed data-parallel dataset encode (TPU-new capability).

Encodes a dataset with the sharded batch encoder over all local devices
(and, multi-host, over all processes with ordered stream gather) — the
BASELINE.json "Multi-host data-parallel CLIC encode, ordered stream gather"
configuration. The reference has no distributed capability (SURVEY.md §2.5).

Single-host: python distributed_encode.py --data_dir /path --quality 10
Multi-host:  launched once per host with jax.distributed coordinates in env.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_dir", type=str, required=True)
    parser.add_argument("--out_dir", type=str, default="encoded")
    parser.add_argument("--quality", type=float, default=10)
    parser.add_argument("--size", type=int, nargs=2, default=(512, 768),
                        help="common (H, W) to top-left-crop/tile images to")
    parser.add_argument("--multihost", action="store_true")
    args = parser.parse_args()

    import jax

    from lrf_tpu.parallel.distributed import distributed_encode, initialize, process_index
    from lrf_tpu.parallel.encode import sharded_qmf_encode_batch
    from lrf_tpu.parallel.mesh import make_mesh
    from lrf_tpu.utils.eval import read_image

    if args.multihost:
        initialize()

    from common import dataset_images

    h, w = args.size
    paths = dataset_images(args.data_dir)
    images = []
    for p in paths:
        img = read_image(p)
        ch, cw = img.shape[-2:]
        if ch < h or cw < w:
            # tile to size: np.pad(mode='reflect') raises when a pad
            # amount reaches the image dimension (tiny images vs the
            # common size), tiling never does
            reps = (1, -(-h // ch), -(-w // cw))
            img = np.tile(img, reps)
        images.append(img[:, :h, :w])
    images = np.stack(images)

    n_dev = len(jax.local_devices())
    mesh = make_mesh(data=n_dev, patch=1, devices=jax.local_devices())

    def encode_batch(batch):
        # pad ragged final batch up to a device multiple
        pad = (-len(batch)) % n_dev
        if pad:
            batch = np.concatenate([batch, batch[:1].repeat(pad, axis=0)])
        streams = sharded_qmf_encode_batch(batch, mesh, quality=args.quality)
        return streams[: len(streams) - pad] if pad else streams

    t0 = time.perf_counter()
    streams = distributed_encode(images, encode_batch)
    dt = time.perf_counter() - t0

    if process_index() == 0:
        os.makedirs(args.out_dir, exist_ok=True)
        for path, blob in zip(paths, streams):
            name = os.path.splitext(os.path.basename(path))[0] + ".qmf"
            with open(os.path.join(args.out_dir, name), "wb") as f:
                f.write(blob)
        mpix = images.shape[0] * h * w / 1e6
        print(
            f"{len(streams)} images, {mpix:.1f} Mpix in {dt:.2f}s = "
            f"{mpix/dt:.1f} Mpixel/s over {jax.device_count()} device(s)"
        )


if __name__ == "__main__":
    main()
