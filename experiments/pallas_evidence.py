"""Compiled-Pallas evidence artifact: correctness + speedup on real TPU.

Produces `experiments/pallas_evidence.json` pinning, at bench shapes:
  (a) compiled Pallas BCD factors == XLA-path factors (exact integer
      equality after projection, or the tiny ulp-flip count when float
      accumulation order differs);
  (b) the measured fused-kernel vs unfused-XLA speedup that backs the
      README's claim.

Run on the TPU host: python experiments/pallas_evidence.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/lrf_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    assert jax.default_backend() == "tpu", "evidence must come from real TPU"

    from lrf_tpu.ops.bcd import qmf_decompose, svd_init
    from lrf_tpu.ops.bcd_pallas import bcd_pallas

    from PIL import Image

    H, W, B = 512, 768, 24
    img = np.asarray(
        Image.open("/root/reference/figures/kodim01.png").convert("RGB")
    ).transpose(2, 0, 1)[:, :H, :W]
    batch = np.stack([np.roll(img, 7 * i, axis=2) for i in range(B)])

    # bench shape: Y-channel patch stacks at quality=10 (rank 6)
    from lrf_tpu.ops.color import rgb_to_ycbcr
    from lrf_tpu.ops.pad import pad_image
    from lrf_tpu.ops.patch import patchify
    from lrf_tpu.ops.resample import chroma_downsample

    imgs = jnp.asarray(batch)
    ycbcr = rgb_to_ycbcr(imgs.astype(jnp.float32))
    y = chroma_downsample(ycbcr, (0.5, 0.5))[0]
    xm = patchify(pad_image(y, (8, 8)), (8, 8))  # (B, 6144, 64)
    xm = jax.device_put(xm, jax.devices()[0])
    jax.block_until_ready(xm)
    rank, iters, bounds = 6, 10, (-16, 15)

    @jax.jit
    def run_xla(x):
        u, v, _ = qmf_decompose(
            x, rank=rank, num_iters=iters, bounds=bounds, factor=(0, 1)
        )
        return u, v

    @jax.jit
    def run_pallas(x):
        u0, v0, _ = svd_init(x, rank, bounds=bounds)
        return bcd_pallas(x, u0, v0, num_iters=iters, bounds=bounds)

    ux, vx = jax.block_until_ready(run_xla(xm))
    up, vp = jax.block_until_ready(run_pallas(xm))
    u_mism = int(jnp.sum(ux != up))
    v_mism = int(jnp.sum(vx != vp))

    def med_time(fn, x, reps=5):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(x))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t_xla = med_time(run_xla, xm)
    t_pal = med_time(run_pallas, xm)

    # isolate the BCD loop itself (shared SVD init excluded) with a chained
    # probe so per-dispatch overhead stays out
    u0, v0, _ = jax.block_until_ready(jax.jit(lambda x: svd_init(x, rank, bounds=bounds))(xm))
    reps = 10

    @jax.jit
    def chain_pallas(x, u0, v0):
        def body(i, acc):
            u, v = bcd_pallas(
                jnp.roll(x, i, 1), u0, v0, num_iters=iters, bounds=bounds
            )
            return acc + u[0, 0, 0] + v[0, 0, 0]

        return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

    from lrf_tpu.ops.bcd import bcd_sweep, make_project

    project = make_project(bounds)
    w_id = jnp.concatenate(
        [jnp.zeros((B, 1, 1)), jnp.ones((B, 1, 1))], axis=-2
    )  # identity affine: w0 = 0, w1 = 1 (the factor=(0,1) codec path)

    @jax.jit
    def chain_xla(x, u0, v0):
        def body(i, acc):
            xr = jnp.roll(x, i, 1)

            def sweep(_, uv):
                u, v, _w = bcd_sweep(
                    xr, uv[0], uv[1], w_id, factor=(0, 1), project=project
                )
                return (u, v)

            u, v = jax.lax.fori_loop(0, iters, sweep, (u0, v0))
            return acc + u[0, 0, 0] + v[0, 0, 0]

        return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

    # interleaved min-of-3: the tunnel-attached device throttles on a
    # seconds timescale, so single measurements swing +/-50%; the min of
    # interleaved reps is the stable comparator
    jax.block_until_ready(chain_pallas(xm, u0, v0))
    jax.block_until_ready(chain_xla(xm, u0, v0))
    bcd_pal = bcd_xla = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(chain_pallas(xm, u0, v0))
        bcd_pal = min(bcd_pal, (time.perf_counter() - t0) / reps)
        t0 = time.perf_counter()
        jax.block_until_ready(chain_xla(xm, u0, v0))
        bcd_xla = min(bcd_xla, (time.perf_counter() - t0) / reps)

    out = {
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "shape": list(xm.shape),
        "rank": rank,
        "num_iters": iters,
        "factor_mismatches": {
            "u": u_mism,
            "v": v_mism,
            "u_total": int(np.prod(ux.shape)),
            "v_total": int(np.prod(vx.shape)),
        },
        "end_to_end_ms": {
            "xla": round(t_xla * 1000, 2),
            "pallas": round(t_pal * 1000, 2),
        },
        "bcd_loop_ms": {
            "xla": round(bcd_xla * 1000, 2),
            "pallas": round(bcd_pal * 1000, 2),
            "speedup": round(bcd_xla / bcd_pal, 2),
        },
    }

    # ---- shape/rank sweep with the same chained-probe methodology: the
    # auto backend policy (parallel/encode.py) is justified by this table.
    def make_chain(x, u0, v0, backend, reps=10):
        if backend == "pallas":

            @jax.jit
            def chain(x, u0, v0):
                def body(i, acc):
                    u, v = bcd_pallas(
                        jnp.roll(x, i, 1), u0, v0, num_iters=iters,
                        bounds=bounds,
                    )
                    return acc + u[0, 0, 0] + v[0, 0, 0]

                return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

        else:
            w_b = jnp.concatenate(
                [jnp.zeros((x.shape[0], 1, 1)), jnp.ones((x.shape[0], 1, 1))],
                axis=-2,
            )

            @jax.jit
            def chain(x, u0, v0):
                def body(i, acc):
                    xr = jnp.roll(x, i, 1)

                    def sweep(_, uv):
                        u, v, _w = bcd_sweep(
                            xr, uv[0], uv[1], w_b, factor=(0, 1),
                            project=project,
                        )
                        return (u, v)

                    u, v = jax.lax.fori_loop(0, iters, sweep, (u0, v0))
                    return acc + u[0, 0, 0] + v[0, 0, 0]

                return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

        return chain

    rng = np.random.default_rng(0)
    sweep_rows = []
    for cb, cm, cn, cr in [
        (24, 6144, 64, 6),    # bench shape, Kodak q=10
        (24, 6144, 64, 13),   # Kodak q~20 (rank-crossover probe)
        (24, 6144, 64, 26),   # Kodak q=40 (high rank)
        (24, 1536, 64, 3),    # chroma stacks (X-resident path)
        (4, 49152, 64, 13),   # CLIC-scale M, q~20 (legacy kernel)
        (4, 49152, 64, 32),   # CLIC-scale M, high rank (legacy kernel)
    ]:
        xs = jnp.asarray(rng.integers(0, 256, (cb, cm, cn)).astype(np.float32))
        u0s, v0s, _ = jax.block_until_ready(
            jax.jit(lambda x: svd_init(x, cr, bounds=bounds))(xs)
        )
        n_reps = 10
        chains = {
            bk: make_chain(xs, u0s, v0s, bk, reps=n_reps)
            for bk in ("xla", "pallas")
        }
        best = {}
        for bk, ch in chains.items():  # warm/compile
            jax.block_until_ready(ch(xs, u0s, v0s))
            best[bk] = float("inf")
        for _ in range(3):  # interleaved min-of-3 (throttling robustness)
            for bk, ch in chains.items():
                t0 = time.perf_counter()
                jax.block_until_ready(ch(xs, u0s, v0s))
                best[bk] = min(best[bk], (time.perf_counter() - t0) / n_reps)
        row = {
            "shape": [cb, cm, cn],
            "rank": cr,
            "xla_ms": round(best["xla"] * 1000, 2),
            "pallas_ms": round(best["pallas"] * 1000, 2),
        }
        row["speedup"] = round(row["xla_ms"] / row["pallas_ms"], 2)
        sweep_rows.append(row)
        print(json.dumps(row))
    out["loop_sweep"] = sweep_rows
    out["auto_policy"] = (
        "backend='auto' selects per channel by patch-stack height M "
        "(parallel/encode.py PALLAS_MIN_M=16384): XLA below the crossover, "
        "the fused Pallas kernels above it (M=49152: 1.04x at r=13, 1.60x "
        "at r=32). Below the crossover the round-4 group kernel closed "
        "0.88x -> 0.97x at Kodak r=6 and WINS at r=26 (1.12x), but auto "
        "still prefers XLA there: it preserves byte-identity with "
        "per-image qmf_encode (Pallas accumulation order flips ~4% of "
        "factor entries at round() ties), and the residual r<=13 gap is "
        "MXU-structural - matmuls under 128 rows cost K*M cycles "
        "regardless of row count, so the group layout's block-diagonal "
        "K=G*N products cannot be bought back at small ranks. "
        "backend='pallas'/'xla' force either path."
    )
    path = os.path.join(os.path.dirname(__file__), "pallas_evidence.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
