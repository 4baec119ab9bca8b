"""Assemble `local7`: every real photograph obtainable in this offline image.

The reference's published RD aggregates are computed over Kodak-24 and
CLIC-2024 (`/root/reference/experiments/comparison/eval.py`), but neither
dataset's original images exist in this environment and there is no network
egress (verified: DNS resolution fails; see ../comparison/DATASET.md). This
script gathers the photographic content that IS locally available, with full
provenance, so the comparison sweep can run at dataset scale and be
cross-validated row-by-row against the reference implementation running on
the same images.

Sources (all decoded to lossless PNG here):
  - parrots_recon_{a,b}.png: two 768x512 images extracted from losslessly
    embedded (FlateDecode + PNG predictor) XObjects in a public paper PDF in
    the reference's literature-review folder. Content closely matches Kodak
    kodim23 (parrots) but is NOT pixel-identical to the original (verified
    by JPEG-probe mismatch against the stored per-image Kodak rows), so they
    are treated as independent photographic test content at the exact Kodak
    resolution.
  - china.png, flower.png: scikit-learn's bundled sample photos (427x640).
  - grace_hopper.png: matplotlib's bundled sample portrait (600x512).
  - kodim01_fig.png, clic_flower_fig.png: the reference repo's figure
    renders (palette-quantized, 992x662) — the same images the in-repo demo
    sweeps use; NOT dataset originals.

Run: python experiments/data/make_local_dataset.py
"""

import os
import re
import zlib

import numpy as np
from PIL import Image

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "local7")

BALLE_PDF = (
    "/root/reference/paper/v1-neurips2024/literature review/1802.01436v2.pdf"
)


def _unpredict_png(raw: bytes, w: int, h: int, colors: int) -> np.ndarray:
    """Invert the PNG row predictor (PDF /Predictor 10-15) on raw scanlines."""
    stride = w * colors
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    pos = 0
    for y in range(h):
        ft = raw[pos]
        pos += 1
        row = np.frombuffer(raw[pos : pos + stride], dtype=np.uint8).copy()
        pos += stride
        if ft == 1:  # Sub
            for x in range(colors, stride):
                row[x] = (int(row[x]) + int(row[x - colors])) & 0xFF
        elif ft == 2:  # Up
            row = ((row.astype(np.int16) + prev) & 0xFF).astype(np.uint8)
        elif ft == 3:  # Average
            for x in range(stride):
                a = int(row[x - colors]) if x >= colors else 0
                row[x] = (int(row[x]) + (a + int(prev[x])) // 2) & 0xFF
        elif ft == 4:  # Paeth
            for x in range(stride):
                a = int(row[x - colors]) if x >= colors else 0
                b = int(prev[x])
                c = int(prev[x - colors]) if x >= colors else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[x] = (int(row[x]) + pr) & 0xFF
        out[y] = row
        prev = row
    return out.reshape(h, w, colors)


def extract_pdf_images() -> list[np.ndarray]:
    data = open(BALLE_PDF, "rb").read()
    images = []
    pat = rb"<<([^<>]*(?:<<[^<>]*>>)*[^<>]*)>>\s*stream\r?\n"
    for m in re.finditer(pat, data, re.S):
        hdr = m.group(1)
        if b"/Width 768" in hdr and b"/Height 512" in hdr:
            start = m.end()
            end = data.index(b"endstream", start)
            raw = zlib.decompress(data[start:end].rstrip(b"\r\n"))
            images.append(_unpredict_png(raw, 768, 512, 3))
    return images


def main() -> None:
    os.makedirs(OUT, exist_ok=True)

    for name, img in zip(("parrots_recon_a", "parrots_recon_b"), extract_pdf_images()):
        Image.fromarray(img).save(os.path.join(OUT, f"{name}.png"))

    import sklearn.datasets

    skl_dir = os.path.join(
        os.path.dirname(sklearn.datasets.__file__), "images"
    )
    for src, dst in (("china.jpg", "china.png"), ("flower.jpg", "flower.png")):
        Image.open(os.path.join(skl_dir, src)).convert("RGB").save(
            os.path.join(OUT, dst)
        )

    import matplotlib

    hopper = os.path.join(
        os.path.dirname(matplotlib.__file__),
        "mpl-data",
        "sample_data",
        "grace_hopper.jpg",
    )
    Image.open(hopper).convert("RGB").save(os.path.join(OUT, "grace_hopper.png"))

    for src, dst in (
        ("kodim01.png", "kodim01_fig.png"),
        ("clic_flower.png", "clic_flower_fig.png"),
    ):
        Image.open(os.path.join(HERE, "demo", src)).convert("RGB").save(
            os.path.join(OUT, dst)
        )

    for f in sorted(os.listdir(OUT)):
        img = Image.open(os.path.join(OUT, f))
        print(f, img.size, img.mode)


if __name__ == "__main__":
    main()
