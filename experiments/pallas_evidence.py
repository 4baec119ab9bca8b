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

    jax.block_until_ready(chain_pallas(xm, u0, v0))
    t0 = time.perf_counter()
    jax.block_until_ready(chain_pallas(xm, u0, v0))
    bcd_pal = (time.perf_counter() - t0) / reps
    jax.block_until_ready(chain_xla(xm, u0, v0))
    t0 = time.perf_counter()
    jax.block_until_ready(chain_xla(xm, u0, v0))
    bcd_xla = (time.perf_counter() - t0) / reps

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
    path = os.path.join(os.path.dirname(__file__), "pallas_evidence.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
