"""Qualitative method x bpp collage (the reference's paper-figure flow).

Mirrors `lrf/utils/misc.py:581-683` usage: encode one image with JPEG / SVD
/ QMF at qualities bracketing the requested bpp targets, keep the
reconstructions, and render the method x bpp grid with per-cell bpp/PSNR
annotations (plus the individual cell images).

Usage: LRF_TPU_PLATFORM=cpu python collage.py [--image ...] [--bpps 0.1 0.2 0.3]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import common  # noqa: E402  (jax config: cache + platform pinning)
import lrf_tpu  # noqa: E402
from lrf_tpu.utils.eval import eval_compression, read_image  # noqa: E402
from lrf_tpu.utils.viz import vis_collage  # noqa: E402


def sweep_with_reconstructions(image):
    rows = []
    for quality in range(0, 60, 3):
        log = eval_compression(
            image, lrf_tpu.pil_encode, lrf_tpu.pil_decode,
            reconstruct=True, format="JPEG", quality=int(quality),
        )
        rows.append({"method": "JPEG", **log})
    for quality in np.linspace(0.0, 4, 14):
        log = eval_compression(
            image, lrf_tpu.svd_encode, lrf_tpu.svd_decode,
            reconstruct=True, color_space="RGB", quality=float(quality),
            patch=True, patch_size=(8, 8),
        )
        rows.append({"method": "SVD", **log})
    for quality in np.linspace(0, 30, 16):
        log = eval_compression(
            image, lrf_tpu.qmf_encode, lrf_tpu.qmf_decode,
            reconstruct=True, color_space="YCbCr", scale_factor=(0.5, 0.5),
            quality=(float(quality), float(quality) / 2, float(quality) / 2),
            patch=True, patch_size=(8, 8), bounds=(-16, 15),
            dtype=np.int8, num_iters=10,
        )
        rows.append({"method": "QMF", **log})
    return rows


def main() -> None:
    here = os.path.dirname(os.path.abspath(__file__))
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--image",
        default=os.path.join(here, "..", "data", "local7", "parrots_recon_a.png"),
    )
    parser.add_argument("--bpps", type=float, nargs="+", default=[0.1, 0.2, 0.3])
    parser.add_argument("--out", default=os.path.join(here, "collage"))
    args = parser.parse_args()

    import matplotlib

    matplotlib.use("Agg")

    image = read_image(args.image)
    rows = sweep_with_reconstructions(image)
    prefix = os.path.splitext(os.path.basename(args.image))[0]
    vis_collage(rows, args.bpps, save_dir=args.out, prefix=prefix)
    print(
        f"wrote {os.path.join(args.out, prefix)}_collage.pdf "
        f"(+ per-cell images) from {len(rows)} sweep rows"
    )


if __name__ == "__main__":
    main()
