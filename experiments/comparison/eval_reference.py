"""Run the REFERENCE implementation (torch, CPU) over the comparison grids.

The published RD aggregates were computed over Kodak-24 / CLIC-2024, whose
original images are not obtainable in this offline environment (see
DATASET.md). What CAN be reproduced end-to-end is the methodology: this
driver executes the reference codecs themselves — imported from
/root/reference with the test suite's dependency stubs — over the exact
sweep grids of `experiments/comparison/eval.py:45-116` (JPEG 0..74, SVD
linspace(0,5,30), QMF linspace(0,40,80)) on any local dataset, emitting rows
in the stored-results schema. Diffing these against our implementation's
sweep of the same images (eval.py) validates, row by row and in aggregate,
that our framework reproduces the reference's rate-distortion behavior at
dataset scale.

Metrics are computed with OUR metric stack (one implementation applied to
both reconstructions) so metric differences cannot mask codec differences.
Timing columns are wall-clock (the reference used pyinstrument sessions).

Usage: python eval_reference.py --data local7 --data_dir ../data/local7
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import common  # noqa: E402  (jax config: cache + platform pinning)
from common import default_argparser, run_over_dataset


def _import_reference():
    tests_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "tests",
    )
    sys.path.insert(0, tests_dir)
    from conftest import REFERENCE_PATH, _install_reference_stubs

    _install_reference_stubs()
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import lrf

    return lrf


def _eval(image, timage, encoder, decoder, **params):
    """`eval_compression` semantics with the reference codec under test."""
    from lrf_tpu.utils.metrics import bits_per_pixel, compression_ratio, psnr, ssim

    t0 = time.perf_counter()
    encoded = encoder(timage, **params)
    enc_ms = (time.perf_counter() - t0) * 1000
    t0 = time.perf_counter()
    reconstructed = decoder(encoded)
    dec_ms = (time.perf_counter() - t0) * 1000
    rec = reconstructed.numpy()
    return {
        "compression ratio": float(compression_ratio(image, encoded)),
        "bit rate (bpp)": float(bits_per_pixel(image.shape[-2:], encoded)),
        "PSNR (dB)": float(psnr(image, rec)),
        "SSIM": float(ssim(image, rec)),
        "encoding time (ms)": enc_ms,
        "decoding time (ms)": dec_ms,
    }


def make_eval_image(lrf):
    import torch

    def eval_image(image, image_id):
        timage = torch.from_numpy(np.ascontiguousarray(image))
        rows = []
        for quality in range(0, 75):
            params = {"quality": int(quality)}
            log = _eval(
                image, timage, lrf.pil_encode, lrf.pil_decode,
                format="JPEG", **params,
            )
            rows.append({"data": image_id, "method": "JPEG", **params, **log})
        for quality in np.linspace(0.0, 5, 30):
            params = {
                "color_space": "RGB",
                "quality": float(quality),
                "patch": True,
                "patch_size": (8, 8),
            }
            log = _eval(image, timage, lrf.svd_encode, lrf.svd_decode, **params)
            rows.append({"data": image_id, "method": "SVD", **params, **log})
        import torch as _torch

        for quality in np.linspace(0, 40, 80):
            params = {
                "color_space": "YCbCr",
                "scale_factor": (0.5, 0.5),
                "quality": (float(quality), float(quality) / 2, float(quality) / 2),
                "patch": True,
                "patch_size": (8, 8),
                "bounds": (-16, 15),
                "num_iters": 10,
            }
            log = _eval(
                image, timage, lrf.qmf_encode, lrf.qmf_decode,
                dtype=_torch.int8, **params,
            )
            # row records the numpy dtype name (JSON-serializable via our
            # config hooks); the codec call above received torch.int8
            rows.append(
                {"data": image_id, "method": "QMF", **params,
                 "dtype": np.dtype(np.int8), **log}
            )
        return rows

    return eval_image


if __name__ == "__main__":
    args = default_argparser(
        "Reference-implementation comparison sweep over a dataset.", "comparison"
    )
    lrf = _import_reference()
    run_over_dataset(
        args.data_dir,
        make_eval_image(lrf),
        args.save_dir,
        f"{args.prefix}_reference",
    )
