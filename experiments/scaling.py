"""Multi-host scaling model: measured gather cost -> projected N-host efficiency.

BASELINE.json's north star asks for "GB/s scaling efficiency at 1 chip /
1 host / N>=2 hosts". Real N-chip hardware is not available in this
environment (one tunnel-attached v5e chip), so this artifact closes the
wording as far as the environment permits:

1. MEASURE: real `jax.distributed` clusters (2 and 4 CPU processes, Gloo
   collectives — the same `allgather_bytes` code path that runs on ICI/DCN
   in production) gathering realistic encoded-stream volumes. Each
   (processes, payload) point times the full ordered ragged gather
   (length-table rounds + bounded payload rounds).
2. FIT: t_gather(P, V) = alpha(P) + V_total / beta, with alpha the
   per-gather fixed cost (length tables + round setup) and beta the
   effective gather bandwidth. alpha grows with P (measured 2 -> 4).
3. PROJECT: data-parallel dataset encode has NO cross-host dependency
   except the final ordered gather (`parallel/distributed.py`), so
   N-host efficiency = T_compute(P) / (T_compute(P) + t_gather(P, V)):
   T_compute from the measured single-chip pipelined CLIC rate
   (`experiments/roofline.json`), V from measured stream sizes (~0.25 bpp).

The Gloo/CPU-loopback beta is a CONSERVATIVE stand-in for ICI/DCN (v5e
ICI is ~1600x the measured loopback bandwidth; DCN ~100x), so projected
efficiencies are lower bounds: if the gather is negligible at Gloo rates,
it is more so on real interconnect. Output: experiments/scaling.json.

Usage: python experiments/scaling.py            (spawns its own clusters)
       python experiments/scaling.py --worker i n port out  (internal)
"""

import json
import os
import socket
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PAYLOADS = [64 * 1024, 1024 * 1024, 8 * 1024 * 1024]  # bytes per process
REPS = 5


def worker(pid: int, n: int, port: str, out_path: str) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}", num_processes=n, process_id=pid
    )
    from lrf_tpu.parallel.distributed import allgather_bytes

    rng = np.random.default_rng(pid)
    results = []
    for payload in PAYLOADS:
        # ~64 KiB blobs (a CLIC-quality stream size) summing to `payload`
        blob = rng.integers(0, 256, 64 * 1024, dtype=np.uint8).tobytes()
        blobs = [blob] * (payload // len(blob)) or [blob[:payload]]
        allgather_bytes(blobs)  # warm up (connections, allocators)
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            out = allgather_bytes(blobs)
            ts.append(time.perf_counter() - t0)
        assert len(out) == n * len(blobs)
        results.append(
            {"payload_bytes": payload, "t_s": sorted(ts), "t_min_s": min(ts)}
        )
    # fixed-cost point: near-empty gather isolates alpha
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        allgather_bytes([b"x"])
        ts.append(time.perf_counter() - t0)
    results.append({"payload_bytes": 1, "t_s": sorted(ts), "t_min_s": min(ts)})
    if pid == 0:
        with open(out_path, "w") as f:
            json.dump(results, f)


def run_cluster(n: int) -> list:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    out_path = f"/tmp/scaling_meas_{n}.json"
    env = {k: v for k, v in os.environ.items() if not k.startswith(("JAX_", "XLA_"))}
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker",
             str(i), str(n), str(port), out_path],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        for i in range(n)
    ]
    for p in procs:
        _, err = p.communicate(timeout=600)
        assert p.returncode == 0, err.decode()[-2000:]
    with open(out_path) as f:
        return json.load(f)


def fit(meas: list, n: int):
    """alpha (fixed seconds/gather) + V_total/beta (bytes/s) least squares."""
    v = np.asarray([m["payload_bytes"] * n for m in meas], np.float64)
    t = np.asarray([m["t_min_s"] for m in meas], np.float64)
    A = np.stack([np.ones_like(v), v], axis=1)
    (alpha, inv_beta), *_ = np.linalg.lstsq(A, t, rcond=None)
    return float(max(alpha, 1e-6)), float(1.0 / max(inv_beta, 1e-15))


def main() -> None:
    meas = {}
    for n in (2, 4):
        print(f"measuring {n}-process cluster...", file=sys.stderr, flush=True)
        meas[n] = run_cluster(n)
    fits = {n: fit(meas[n], n) for n in meas}
    a2, beta2 = fits[2]
    a4, beta4 = fits[4]
    # alpha grows with cluster size (more length-table rows, more round
    # participants); linear-in-P is the conservative fit through 2 and 4.
    alpha_slope = max((a4 - a2) / 2, 0.0)
    beta = min(beta2, beta4)  # conservative

    # single-chip CLIC pipelined encode rate (measured, roofline.json)
    with open(os.path.join(REPO, "experiments", "roofline.json")) as f:
        roofline = json.load(f)
    r1 = roofline["clic_scale_pipeline_mpix_s"] * 1e6  # pixels/s/chip
    img_px = 1536 * 2048
    bpp = 0.25
    stream_bytes = img_px * bpp / 8

    def project(n_hosts: int, n_images: int):
        t_comp = n_images * img_px / (r1 * n_hosts)
        v_total = n_images * stream_bytes
        if n_hosts == 1:
            # allgather_bytes is a no-op at process_count()==1
            # (parallel/distributed.py): single-host efficiency is 1.0
            return {
                "hosts": 1,
                "t_compute_s": round(t_comp, 4),
                "t_gather_s_dedicated": 0.0,
                "efficiency_dedicated": 1.0,
                "efficiency_oversubscribed_worst_case": 1.0,
                "agg_mpix_s_dedicated": round(r1 / 1e6, 1),
            }
        # two alpha models bracket the truth: the linear 2->4 fit counts
        # this 2-core host's CPU oversubscription (4 procs contending for 2
        # cores inflates alpha_4), so it is a hard worst case; constant
        # alpha_2 models dedicated-core hosts (the production case). The
        # contended term is clamped at zero so the worst case can never
        # read better than the dedicated case.
        t_gather_worst = (
            a2 + max(alpha_slope * (n_hosts - 2), 0.0) + v_total / beta
        )
        t_gather_dedic = a2 + v_total / beta
        eff_w = t_comp / (t_comp + t_gather_worst)
        eff_d = t_comp / (t_comp + t_gather_dedic)
        return {
            "hosts": n_hosts,
            "t_compute_s": round(t_comp, 4),
            "t_gather_s_dedicated": round(t_gather_dedic, 4),
            "efficiency_dedicated": round(eff_d, 4),
            "efficiency_oversubscribed_worst_case": round(eff_w, 4),
            "agg_mpix_s_dedicated": round(n_hosts * r1 / 1e6 * eff_d, 1),
        }

    out = {
        "description": (
            "Measured jax.distributed allgather_bytes cost (2/4-process "
            "Gloo CPU clusters, the production gather code path) fitted to "
            "t = alpha(P) + V_total/beta, combined with the measured "
            "single-chip CLIC pipelined encode rate to project N-host "
            "data-parallel encode efficiency (the 'linear scaling, ordered "
            "gather' north star). Gloo-loopback beta is a conservative "
            "stand-in for ICI/DCN, so efficiencies are lower bounds."
        ),
        "notes": (
            "alpha_4 >> alpha_2 because the 4-process cluster oversubscribes "
            "this 2-core measurement host; 'dedicated' columns hold alpha at "
            "the 2-process value (one core per process, the production "
            "shape), 'oversubscribed_worst_case' extrapolates the contended "
            "fit linearly. beta is Gloo loopback - v5e ICI is ~3 orders of "
            "magnitude faster, so even the dedicated column is a lower "
            "bound on real-pod efficiency."
        ),
        "measured": {
            str(n): {
                "points": meas[n],
                "alpha_s": round(fits[n][0], 5),
                "beta_mb_s": round(fits[n][1] / 1e6, 1),
            }
            for n in meas
        },
        "model": {
            "alpha_s_of_P": f"{a2:.4f} + {alpha_slope:.4f} * (P - 2)",
            "beta_mb_s": round(beta / 1e6, 1),
            "single_chip_clic_mpix_s": roofline["clic_scale_pipeline_mpix_s"],
            "stream_bytes_per_image": int(stream_bytes),
        },
        "projection_clic30": [project(p, 30) for p in (1, 2, 4, 8, 16, 32)],
        "projection_clic1000": [project(p, 1000) for p in (1, 2, 4, 8, 16, 32)],
    }
    path = os.path.join(REPO, "experiments", "scaling.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["projection_clic1000"], indent=1), file=sys.stderr)
    print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), int(sys.argv[3]), sys.argv[4], sys.argv[5])
    else:
        main()
