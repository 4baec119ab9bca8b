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


def _measure_decode():
    """Decode-side attribution: host inflate / packed H2D wire / device
    reconstruction, each in isolation, plus the pipelined-period floor
    model (inflate runs on a worker thread overlapped with the main
    thread's upload + dispatch + device reconstruction)."""
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from lrf_tpu.models.container import set_fiber_coder
    from lrf_tpu.parallel.decode import _cached_sharded_decoder, _inflate_streams
    from lrf_tpu.parallel.encode import sharded_qmf_encode_batch
    from lrf_tpu.parallel.mesh import make_mesh

    B = 64
    img = np.asarray(
        Image.open("/root/reference/figures/kodim01.png").convert("RGB")
    ).transpose(2, 0, 1)[:, :H, :W]
    batch = jnp.asarray(np.stack([np.roll(img, 7 * i, axis=2) for i in range(B)]))
    mesh = make_mesh(data=1, patch=1, devices=jax.devices()[:1])
    set_fiber_coder("deflate", 1)
    streams = sharded_qmf_encode_batch(batch, mesh, quality=QUALITY)

    t_inf = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        inflated = _inflate_streams(streams, True)
        t_inf = min(t_inf, time.perf_counter() - t0)
    wire = inflated[0].nbytes

    md = inflated[1]
    dec_fn = _cached_sharded_decoder(
        mesh,
        tuple(tuple(s) for s in md["original size"]),
        tuple(tuple(s) for s in md["padded size"]),
        tuple(md["patch size"]),
        inflated[2],
        inflated[3],
        md["dtype"],
        inflated[4],
    )
    dev_flat = jax.device_put(jnp.asarray(inflated[0]))
    jax.block_until_ready(dev_flat)
    reps = 10

    @jax.jit
    def probe(x):
        def body(i, acc):
            y = dec_fn(jnp.roll(x, i, axis=-1))
            return acc + jnp.sum(y.astype(jnp.uint32) & jnp.uint32(1))

        return jax.lax.fori_loop(0, reps, body, jnp.uint32(0))

    float(probe(dev_flat))
    dev_ms = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(probe(dev_flat))
        dev_ms = min(dev_ms, (time.perf_counter() - t0) / reps * 1000)

    # isolated H2D upload of the packed buffer (best of 3)
    host_flat = np.asarray(inflated[0])
    t_up = float("inf")
    for i in range(3):
        buf = np.roll(host_flat, i + 1, axis=0)  # dodge buffer caching
        t0 = time.perf_counter()
        jax.block_until_ready(jax.device_put(buf))
        t_up = min(t_up, time.perf_counter() - t0)

    mpix = B * H * W / 1e6
    floor_ms = max(t_inf * 1000, t_up * 1000 + dev_ms)
    return {
        "host_inflate_ms_batch64": round(t_inf * 1000, 1),
        "packed_h2d_wire_mb": round(wire / 1e6, 3),
        "h2d_upload_ms_isolated": round(t_up * 1000, 1),
        "device_reconstruct_ms": round(dev_ms, 1),
        "device_reconstruct_mpix_s": round(mpix / dev_ms * 1000, 0),
        "pipelined_floor_mpix_s": round(mpix / floor_ms * 1000, 0),
        "note": (
            "decode is wire+inflate bound, not compute bound: device "
            "reconstruction is a few ms/batch (thousands of Mpix/s) while "
            "the 5-bit-packed upload and the host inflate+pack set the "
            "period. The 'floor' combines THIS run's isolated single- "
            "transfer upload with the overlap model (inflate on a worker "
            "thread, upload+reconstruct on the main thread, as "
            "sharded_qmf_decode_batches implements); the steady "
            "pipeline's effective wire rate can exceed the isolated "
            "measurement (async transfer pipelining), so measured "
            "delivered decode may sit above this figure."
        ),
    }


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

    # Measured per-stage device times (round-4 chained-probe profile on the
    # v5e, 64-image batch; stages probed in isolation so they do not sum
    # exactly to the fused program's 32 ms):
    out["measured_stage_ms_batch64"] = {
        "transforms_color_down_patchify": 6.6,
        "svd_init_gram_eigh": "~20-26 (eigh is ~0.2 ms per 64x64 matrix, "
        "batch-linear: 14.7/26.5/38.4 ms at B=64/128/192 - the dominant "
        "device-time term)",
        "bcd_10_sweeps_y_r6": 3.4,
        "bcd_10_sweeps_chroma_merged_r3": 2.9,
    }

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
            f"{measured / mxu_c * 100:.1f}% of the MXU bound: the workload "
            f"is bound by neither — the stage profile attributes "
            f"the device time chiefly to the SVD init's batched 64x64 "
            f"eigh (~0.2 ms/matrix, batch-linear; XLA's Jacobi schedule), "
            f"with the BCD sweeps at ~6 ms and transforms ~7 ms per "
            f"64-batch. The eigh_floor section holds the full attempt "
            f"matrix for replacing it: every byte-preserving scheme "
            f"measured slower in-program or f32-accuracy-limited, so this "
            f"is the byte-exact path's structural floor; the opt-in "
            f"randomized init (init='fast') reaches 1124 Mpix/s "
            f"device-only with pinned low-rank RD bounds. Pixels/s is "
            f"therefore the honest metric "
            f"(the MFU framing would read ~{measured / mxu_c * 100:.1f}%). "
        )
    if args.delivered and measured:
        attribution += (
            f"The delivered pipeline rate {args.delivered:.0f} Mpix/s is "
            f"{args.delivered / measured * 100:.0f}% of device-only. The "
            f"binding constraint is the 2-core HOST plus tunnel wire: "
            f"fetch-only sustains 470-563 Mpix/s "
            f"(experiments/transport_tuning.json) and the round-5 fused "
            f"native serializer (see the serializer section: 36 -> 27 "
            f"ms/batch64, residual is raw libdeflate compute) closed most "
            f"of the host gap — the deflate workers and the tunnel I/O "
            f"still contend for the same two cores. A production host "
            f"(>=8 cores) would not pay this; a locally-attached TPU "
            f"would also drop the tunnel's per-piece round trips."
        )
    out["attribution"] = attribution

    # ---- decode section (round-3 verdict: decode had no speed-of-light
    # accounting): host inflate / packed H2D wire / device reconstruction.
    if not args.skip_measure:
        out["decode"] = _measure_decode()

    # CLIC-scale fields are measured by a separate pipelined run
    # (experiments/profile_stages.py); carry them over if present.
    path = os.path.join(os.path.dirname(__file__), "roofline.json")
    if os.path.exists(path):
        with open(path) as f:
            old = json.load(f)
        for k in (
            "tunnel_d2h_ceiling_mb_s",
            "clic_scale_pipeline_mpix_s",
            "clic_scale_note",
            # round-5 sections, maintained by their own scripts
            # (profile_clic.py, profile_serializer.py + hand-pinned
            # attempt matrices) — regeneration must not drop them
            "clic",
            "serializer",
            "eigh_floor",
        ):
            if k in old and k not in out:
                out[k] = old[k]
    path = os.path.join(os.path.dirname(__file__), "roofline.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
