"""Step-by-step QMF pipeline walk-through (script form of the reference's
`experiments/examples/qmf_pipeline.ipynb` in pashtari/lrf).

Visualizes every stage of the codec on one image: color transform, chroma
downsampling, patch grid, the integer factor maps (via `depatchify_uv`), the
rank-1 terms, and the final reconstruction; saves figures to --save_dir.

Usage: python qmf_pipeline.py --image /root/reference/figures/kodim01.png
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

# This walkthrough runs many tiny eager ops for figures; on a tunnel-attached
# TPU each would pay a slow remote compile, so default to CPU (override with
# LRF_TPU_DEVICE=tpu).
import jax

if os.environ.get("LRF_TPU_DEVICE", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import matplotlib

matplotlib.use("Agg")

import lrf_tpu
from lrf_tpu.models.container import bytes_to_dict, decode_tensor, separate_bytes
from lrf_tpu.utils.viz import minmax_normalize, vis_image, vis_image_batch


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--image", type=str, default="/root/reference/figures/kodim01.png")
    parser.add_argument("--quality", type=float, default=7)
    parser.add_argument("--save_dir", type=str, default="qmf_pipeline_out")
    args = parser.parse_args()

    image = lrf_tpu.read_image(args.image)
    os.makedirs(args.save_dir, exist_ok=True)

    # 1. color transform + chroma downsampling
    ycbcr = np.asarray(lrf_tpu.rgb_to_ycbcr(image))
    y, cb, cr = lrf_tpu.chroma_downsample(ycbcr)
    vis_image(np.asarray(y) / 255.0, title="Y", save_dir=args.save_dir, prefix="y", format="png", cmap="gray")
    vis_image(np.asarray(cb) / 255.0, title="Cb (4:2:0)", save_dir=args.save_dir, prefix="cb", format="png", cmap="gray")

    # 2. encode and inspect the stream
    encoded = lrf_tpu.qmf_encode(image, quality=args.quality)
    meta = bytes_to_dict(separate_bytes(encoded, 2)[0])
    print("metadata:", meta)
    print("stream bytes:", len(encoded),
          "bpp: %.3f" % lrf_tpu.bits_per_pixel(image.shape[-2:], encoded))

    # 3. factor maps of the Y channel
    blobs = separate_bytes(separate_bytes(encoded, 2)[1], 6)
    u = decode_tensor(blobs[0]).astype(np.float32)
    v = decode_tensor(blobs[1]).astype(np.float32)
    u_map, v_map = lrf_tpu.depatchify_uv(
        u, v, tuple(meta["padded size"][0]), tuple(meta["patch size"])
    )
    vis_image_batch(
        minmax_normalize(np.asarray(u_map)[:, 0]), multi_channels=False,
        title="U factor maps (components)", save_dir=args.save_dir, prefix="u_maps",
        format="png", cmap="gray",
    )
    vis_image_batch(
        minmax_normalize(np.asarray(v_map)[:, 0]), multi_channels=False,
        title="V factor maps (coefficients)", save_dir=args.save_dir, prefix="v_maps",
        format="png", cmap="gray",
    )

    # 4. rank-1 terms of the Y reconstruction
    terms = np.stack(
        [np.outer(u[:, r], v[:, r]).reshape(-1) for r in range(min(4, u.shape[1]))]
    )
    print("first rank-1 term energy fractions:",
          np.round((terms**2).sum(axis=1) / (terms**2).sum(), 3))

    # 5. decode + metrics
    decoded = lrf_tpu.qmf_decode(encoded)
    vis_image(decoded, title="reconstruction", save_dir=args.save_dir, prefix="recon", format="png")
    print("PSNR: %.2f dB" % float(lrf_tpu.psnr(image, decoded)),
          " SSIM: %.3f" % float(lrf_tpu.ssim(image, decoded)))


if __name__ == "__main__":
    main()
