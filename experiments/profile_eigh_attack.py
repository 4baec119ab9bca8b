"""Round-5 eigh-floor attack measurements (round-4 verdict task 3).

The QMF encode program's device time is dominated by the batched 64x64
Gram eigh (~0.2 ms/matrix, batch-linear). The init only needs the top-R
(R <= 26) eigenpairs, so the candidate attack is a randomized
range-finder: project the Gram onto a K = R + p dimensional subspace
(GEMMs), then eigh only K x K matrices. Whether that wins hinges on how
XLA's eigh cost scales with N — this script measures:

  1. eigh(B=192, N, N) for N in {8, 16, 24, 32, 48, 64}
  2. the full randomized init pipeline (G@Omega -> whiten via K-eigh ->
     Rayleigh-Ritz K-eigh) vs the direct 64-eigh, standalone
  3. subspace quality: principal angles + captured spectral mass vs the
     exact top-R eigenspace, on real image Grams (f32)

Results feed either an opt-in `init="fast"` or the roofline's
structural-floor verdict.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/lrf_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    from PIL import Image

    out = {"eigh_ms_per_matrix_vs_n": {}, "batch": 192}

    # real image Grams: the bench batch's Y patch stacks
    img = np.asarray(
        Image.open("/root/reference/figures/kodim01.png").convert("RGB")
    ).transpose(2, 0, 1)[:, :512, :768]
    from lrf_tpu.ops.color import rgb_to_ycbcr
    from lrf_tpu.ops.patch import patchify

    batch = np.stack([np.roll(img, 7 * i, axis=2) for i in range(192)])
    y = rgb_to_ycbcr(jnp.asarray(batch, jnp.float32))[:, 0]
    xm = patchify(y[:, None], (8, 8))  # (192, 6144, 64)
    g64 = jnp.einsum("bmn,bmk->bnk", xm, xm)
    g64 = jax.device_put(g64)
    jax.block_until_ready(g64)
    B = 192

    def timeit(fn, *args, reps=3, chain=5):
        jfn = jax.jit(lambda a: sum(
            jnp.sum(x[0] if isinstance(x := fn(jnp.roll(a, i, axis=0)), tuple) else x)
            for i in range(chain)
        ))
        float(jfn(*args))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(jfn(*args))
            best = min(best, (time.perf_counter() - t0) / chain)
        return best * 1000

    # 1. eigh cost vs N (random PSD of matched spectrum shape)
    for n in (8, 16, 24, 32, 48, 64):
        gn = g64[:, :n, :n] + 1e-3 * jnp.eye(n)
        t = timeit(jnp.linalg.eigh, gn)
        out["eigh_ms_per_matrix_vs_n"][n] = round(t / B, 4)
        log(f"eigh N={n}: {t:.2f} ms/B{B} = {t/B:.4f} ms/matrix")

    # 2. randomized range-finder init vs direct eigh, for R=13 (q~20 Y),
    # R=6 (q10 Y), R=3 (q10 chroma)
    out["randomized"] = {}
    for R, power in [(6, 0), (6, 1), (13, 0), (13, 1), (26, 1)]:
        K = min(64, R + 10)
        om = jnp.asarray(
            np.random.default_rng(0).standard_normal((64, K)), jnp.float32
        )

        def rand_init(g, R=R, K=K, om=om, power=power):
            y = g @ om
            for _ in range(power):
                y = g @ y
            s = jnp.einsum("bnk,bnl->bkl", y, y)
            ev, ew = jnp.linalg.eigh(s)  # ascending
            inv = ew / jnp.sqrt(jnp.maximum(ev, 1e-30))[..., None, :]
            q = y @ inv  # orthonormal-ish basis of range(Y)
            bsm = jnp.einsum("bnk,bnm,bml->bkl", q, g, q)
            lam, w = jnp.linalg.eigh(bsm)
            lam = jnp.flip(lam, -1)[..., :R]
            w = jnp.flip(w, -1)[..., :R]
            v = q @ w
            return v, lam

        t = timeit(rand_init, g64)
        # subspace quality on the real Grams
        v_fast, lam_fast = jax.jit(rand_init)(g64)
        ev, ew = jnp.linalg.eigh(g64)
        v_true = jnp.flip(ew, -1)[..., :R]
        lam_true = jnp.flip(ev, -1)[..., :R]
        # captured mass: trace(V' G V) / trace of true top-R
        cap = jnp.einsum("bnr,bnm,bmr->b", v_fast, g64, v_fast) / jnp.maximum(
            jnp.sum(lam_true, -1), 1e-30
        )
        out["randomized"][f"R{R}_p{power}"] = {
            "K": K,
            "ms_per_matrix": round(t / B, 4),
            "captured_mass_min": float(jnp.min(cap)),
            "captured_mass_mean": float(jnp.mean(cap)),
        }
        log(
            f"randomized R={R} power={power}: {t/B:.4f} ms/matrix, "
            f"captured {float(jnp.min(cap)):.6f} min / "
            f"{float(jnp.mean(cap)):.6f} mean"
        )

    t64 = timeit(jnp.linalg.eigh, g64)
    out["direct_eigh_ms_per_matrix"] = round(t64 / B, 4)
    log(f"direct 64-eigh: {t64/B:.4f} ms/matrix")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
