"""Speed-of-light accounting for the batched QMF encode on one TPU v5e.

Writes `experiments/roofline.json`: the arithmetic behind "how far is the
measured rate from what the chip allows" (BASELINE.json north star asks for
Mpixels/s/chip *at speed of light*; the reference has no counterpart — it
is CPU-only, `paper/v2-arxiv/experiments.tex:183`).

Method: count the FLOPs and the minimum HBM traffic of the encode program
exactly from the codec shapes (per image at the bench config), divide by
chip peaks, and compare with (a) the measured device-only rate (chained
probe, no transport) and (b) the delivered pipeline rate (bench.py). The
gap attribution is printed with the numbers.

Chip peaks used (TPU v5e, public figures): 197 TFLOP/s bf16 MXU (fp32
lowers below this; we use the bf16 number as the generous upper bound) and
819 GB/s HBM bandwidth.

Run on the TPU host: python experiments/roofline.py [--delivered 255.2]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PEAK_FLOPS = 197e12  # bf16 MXU peak, TPU v5e
PEAK_HBM = 819e9  # bytes/s, TPU v5e

H, W, QUALITY, ITERS = 512, 768, 10, 10


def channel_cost(m, n, r, iters):
    """(flops, hbm_bytes) for one channel's SVD-init + BCD, per image.

    FLOPs: Gram init `X^T X` (2MN^2) + eigh (~9N^3) + `U0 = X V` (2MNR);
    per sweep: A=XV (2MNR), B=V^T V (2NR^2), R column updates (2MR each),
    then the mirrored V update (A=X^T U 2MNR, B=U^T U 2MR^2, R cols 2NR).
    HBM: X streams from HBM for the init (MN*4) and twice per sweep (U- and
    V-update contractions); U and V stream once per sweep each way; these
    are the *minimum* bytes assuming perfect fusion of elementwise work.
    """
    flops = 2 * m * n * n + 9 * n**3 + 2 * m * n * r
    flops += iters * (
        (2 * m * n * r + 2 * n * r * r + r * (2 * m * r))  # U update
        + (2 * m * n * r + 2 * m * r * r + r * (2 * n * r))  # V update
    )
    x_bytes = m * n * 4
    u_bytes = m * r * 4
    v_bytes = n * r * 4
    hbm = x_bytes  # init read
    hbm += iters * (2 * x_bytes + 2 * (u_bytes + v_bytes))
    return flops, hbm


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--delivered", type=float, default=None,
        help="delivered pipeline Mpixel/s from bench.py (optional)",
    )
    ap.add_argument("--skip-measure", action="store_true")
    args = ap.parse_args()

    # bench config shapes: YCbCr 4:2:0, 8x8 patches, quality 10
    ranks = (6, 3, 3)
    ms = (H * W // 64, H * W // 4 // 64, H * W // 4 // 64)
    n = 64
    flops = hbm = 0
    for m, r in zip(ms, ranks):
        f, b = channel_cost(m, n, r, ITERS)
        flops += f
        hbm += b
    mpix = H * W / 1e6

    compute_bound_s = flops / PEAK_FLOPS
    hbm_bound_s = hbm / PEAK_HBM
    out = {
        "config": {
            "image": [H, W],
            "quality": QUALITY,
            "num_iters": ITERS,
            "ranks": list(ranks),
            "patch": [8, 8],
        },
        "per_image": {
            "mpixels": round(mpix, 4),
            "flops": int(flops),
            "min_hbm_bytes": int(hbm),
        },
        "chip_peaks": {"flops_bf16": PEAK_FLOPS, "hbm_bytes_s": PEAK_HBM},
        "ceilings_mpix_s": {
            "mxu_bound": round(mpix / compute_bound_s, 0),
            "hbm_bound": round(mpix / hbm_bound_s, 0),
        },
    }

    measured = None
    if not args.skip_measure:
        import jax
        import jax.numpy as jnp

        jax.config.update("jax_compilation_cache_dir", "/tmp/lrf_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        from PIL import Image

        from lrf_tpu.parallel.encode import build_sharded_encoder
        from lrf_tpu.parallel.mesh import make_mesh

        B = 64
        img = np.asarray(
            Image.open("/root/reference/figures/kodim01.png").convert("RGB")
        ).transpose(2, 0, 1)[:, :H, :W]
        batch = jnp.asarray(
            np.stack([np.roll(img, 7 * i, axis=2) for i in range(B)])
        )
        mesh = make_mesh(data=1, patch=1, devices=jax.devices()[:1])
        enc_fn, _, _ = build_sharded_encoder(
            mesh, (H, W), quality=QUALITY, batch=B
        )
        reps = 10

        @jax.jit
        def probe(x):
            def body(i, acc):
                y = enc_fn(jnp.roll(x, i, axis=-1))
                for c in y if isinstance(y, tuple) else (y,):
                    acc = acc + jnp.sum(c.astype(jnp.uint32) & jnp.uint32(1))
                return acc

            return jax.lax.fori_loop(0, reps, body, jnp.uint32(0))

        float(probe(batch))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(probe(batch))
            best = min(best, (time.perf_counter() - t0) / reps)
        measured = B * mpix / best
        out["measured_device_only_mpix_s"] = round(measured, 0)
        out["measured_device_only_ms_batch64"] = round(best * 1000, 1)

    if args.delivered:
        out["delivered_pipeline_mpix_s"] = args.delivered

    mxu_c = out["ceilings_mpix_s"]["mxu_bound"]
    hbm_c = out["ceilings_mpix_s"]["hbm_bound"]
    attribution = (
        f"Per image the encode program is {flops/1e6:.0f} MFLOP and >= "
        f"{hbm/1e6:.0f} MB of HBM traffic, giving ceilings of "
        f"{mxu_c:.0f} Mpix/s (MXU) and {hbm_c:.0f} Mpix/s (HBM). "
    )
    if measured:
        attribution += (
            f"Measured device-only rate {measured:.0f} Mpix/s sits at "
            f"{measured / hbm_c * 100:.0f}% of the HBM-bound ceiling and "
            f"{measured / mxu_c * 100:.1f}% of the MXU bound: at rank "
            f"{ranks[0]} the workload is bound by neither — the Gauss-"
            f"Seidel rank loop serializes {ITERS}*2*R tiny dependent steps "
            f"per channel (plus the eigh init's iteration), so per-op "
            f"latency, not bandwidth, sets the device rate. Pixels/s is "
            f"therefore the honest metric (the MFU framing would read "
            f"~{measured / mxu_c * 100:.1f}%). "
        )
    if args.delivered and measured:
        attribution += (
            f"The delivered pipeline rate {args.delivered:.0f} Mpix/s is "
            f"{args.delivered / measured * 100:.0f}% of device-only: the "
            f"remainder is the tunnel transport (wire bytes + per-piece "
            f"round trips; see bench.py stderr accounting), which on a "
            f"locally-attached TPU would be PCIe-negligible."
        )
    out["attribution"] = attribution
    path = os.path.join(os.path.dirname(__file__), "roofline.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
