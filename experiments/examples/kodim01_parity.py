"""Live cross-implementation RD parity sweep vs the reference code.

The reference's stored kodim01 rows were measured on the true Kodak image,
which is not shipped with the repo — so instead of diffing against stored
numbers, this driver runs the REFERENCE IMPLEMENTATION ITSELF (torch, CPU;
imported from /root/reference with the test suite's dependency stubs) and
lrf_tpu side by side on the same input, over the same 75-config grid as the
stored sweep (25 qualities each for JPEG / SVD / QMF;
`experiments/examples/kodim01/kodim01_results.json` in pashtari/lrf).

Per row it records, for both implementations: payload bytes, bpp, PSNR and
SSIM (one metric implementation applied to both reconstructions), plus the
cross-decode check — the reference decoder must reproduce OUR decode
bit-for-bit from OUR bytes.

Usage: LRF_TPU_PLATFORM=cpu python kodim01_parity.py [--out ...]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import common  # noqa: E402  (jax config: cache + platform pinning)
import lrf_tpu  # noqa: E402

REF_ROWS = "/root/reference/experiments/examples/kodim01/kodim01_results.json"
REF_IMAGE = "/root/reference/figures/kodim01.png"


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


def _run_ours(image, method, quality, row):
    if method == "JPEG":
        enc = lrf_tpu.pil_encode(image, format="JPEG", quality=int(quality))
        return enc, lrf_tpu.pil_decode(enc)
    if method == "SVD":
        enc = lrf_tpu.svd_encode(
            image, color_space="RGB", quality=float(quality), patch=True,
            patch_size=(8, 8),
        )
        return enc, lrf_tpu.svd_decode(enc)
    enc = lrf_tpu.qmf_encode(
        image,
        color_space="YCbCr",
        scale_factor=(0.5, 0.5),
        quality=(float(quality), float(quality) / 2, float(quality) / 2),
        patch=True,
        patch_size=(8, 8),
        bounds=tuple(row.get("bounds", (-16, 15))),
        dtype=np.int8,
        num_iters=row.get("num_iters", 10),
    )
    return enc, lrf_tpu.qmf_decode(enc)


def _run_reference(lrf, timage, method, quality, row):
    import torch

    if method == "JPEG":
        enc = lrf.pil_encode(timage, format="JPEG", quality=int(quality))
        return enc, lrf.pil_decode(enc).numpy()
    if method == "SVD":
        enc = lrf.svd_encode(
            timage, color_space="RGB", quality=float(quality), patch=True,
            patch_size=(8, 8),
        )
        return enc, lrf.svd_decode(enc).numpy()
    enc = lrf.qmf_encode(
        timage,
        color_space="YCbCr",
        scale_factor=(0.5, 0.5),
        quality=(float(quality), float(quality) / 2, float(quality) / 2),
        patch=True,
        patch_size=(8, 8),
        bounds=tuple(row.get("bounds", (-16, 15))),
        dtype=torch.int8,
        num_iters=row.get("num_iters", 10),
    )
    return enc, lrf.qmf_decode(enc).numpy()


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--out",
        default=os.path.join(os.path.dirname(__file__), "kodim01_parity.json"),
    )
    args = parser.parse_args()

    lrf = _import_reference()
    import torch

    from lrf_tpu.utils.eval import read_image
    from lrf_tpu.utils.metrics import bits_per_pixel, psnr, ssim

    image = read_image(REF_IMAGE)
    timage = torch.from_numpy(image.copy())
    size = image.shape[-2:]
    with open(REF_ROWS) as f:
        grid = [
            {"method": r["method"], "quality": r["quality"], **{
                k: r[k] for k in ("bounds", "num_iters") if k in r
            }}
            for r in json.load(f)
        ]

    joined, diffs = [], {}
    cross_ok = 0
    for i, row in enumerate(grid):
        method, quality = row["method"], row["quality"]
        our_bytes, our_rec = _run_ours(image, method, quality, row)
        ref_bytes, ref_rec = _run_reference(lrf, timage, method, quality, row)
        entry = {
            "method": method,
            "quality": quality,
            "ours bytes": len(our_bytes),
            "ref bytes": len(ref_bytes),
            "ours bpp": float(bits_per_pixel(size, our_bytes)),
            "ref bpp": float(bits_per_pixel(size, ref_bytes)),
            "ours PSNR (dB)": float(psnr(image, our_rec)),
            "ref PSNR (dB)": float(psnr(image, ref_rec)),
            "ours SSIM": float(ssim(image, our_rec)),
            "ref SSIM": float(ssim(image, ref_rec)),
        }
        if method != "JPEG":  # cross-decode: reference decoder on our bytes
            decoder = lrf.qmf_decode if method == "QMF" else lrf.svd_decode
            xdec = decoder(our_bytes).numpy()
            entry["ref decodes our bytes bit-exact"] = bool(
                np.array_equal(xdec, our_rec)
            )
            cross_ok += entry["ref decodes our bytes bit-exact"]
        else:
            entry["ref decodes our bytes bit-exact"] = bool(
                our_bytes == ref_bytes
            )
            cross_ok += entry["ref decodes our bytes bit-exact"]
        joined.append(entry)
        d = diffs.setdefault(method, {})
        d.setdefault("PSNR (dB)", []).append(
            abs(entry["ours PSNR (dB)"] - entry["ref PSNR (dB)"])
        )
        d.setdefault("SSIM", []).append(abs(entry["ours SSIM"] - entry["ref SSIM"]))
        d.setdefault("bytes ratio", []).append(
            entry["ours bytes"] / max(entry["ref bytes"], 1)
        )
        print(
            f"[{i + 1}/{len(grid)}] {method:4s} q={quality:>7.3f}  "
            f"bytes {entry['ours bytes']} vs {entry['ref bytes']}  "
            f"psnr {entry['ours PSNR (dB)']:.2f} vs {entry['ref PSNR (dB)']:.2f}  "
            f"xdec={entry['ref decodes our bytes bit-exact']}",
            flush=True,
        )

    summary = {
        m: {
            k: {"mean": float(np.mean(v)), "max": float(np.max(v)),
                "min": float(np.min(v))}
            for k, v in per.items()
        }
        for m, per in diffs.items()
    }
    summary["cross_decode_bit_exact"] = f"{cross_ok}/{len(grid)}"
    print(json.dumps(summary, indent=2))
    with open(args.out, "w") as f:
        json.dump({"summary": summary, "rows": joined}, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
