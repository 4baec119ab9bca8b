"""D2H tunnel bandwidth vs piece size / outstanding-copy window.

One config per process (env PIECE_KB, WINDOW) — the tunnel transport can
deadlock when too many async copies are outstanding, and a hung fetch can
only be cleared by killing the process, so each config runs under its own
supervised subprocess (run with no env to supervise all configs).

Decides _FETCH_CHUNK_WORDS / fetch windowing for the encode transport (the
pipeline's bottleneck stage).
"""

import os
import subprocess
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run_one(piece_kb: int, window: int):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/lrf_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    from functools import partial

    total_kb = 704

    @partial(jax.jit, static_argnums=(1, 2))
    def gen_pieces(seed, piece_words, n_pieces):
        x = jnp.arange(piece_words * n_pieces, dtype=jnp.uint32)
        x = x * jnp.uint32(1664525) + jnp.uint32(1013904223) + seed
        return tuple(
            x[i * piece_words : (i + 1) * piece_words] for i in range(n_pieces)
        )

    piece_words = piece_kb * 256
    n_pieces = max(1, total_kb // piece_kb)
    out = gen_pieces(jnp.uint32(0), piece_words, n_pieces)
    jax.block_until_ready(out)
    ts = []
    for r in range(5):
        out = gen_pieces(jnp.uint32(r + 1), piece_words, n_pieces)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        parts = []
        for i in range(0, n_pieces, max(window, 1)):
            grp = out[i : i + max(window, 1)]
            if window:
                for c in grp:
                    c.copy_to_host_async()
            parts += [np.asarray(c) for c in grp]
        ts.append(time.perf_counter() - t0)
    mb = piece_words * n_pieces * 4 / 1e6
    med = float(np.median(ts))
    print(
        f"pieces {piece_kb:4d} KiB x{n_pieces:3d} window {window:2d} "
        f"({mb:5.2f} MB): median {med*1000:7.1f} ms ({mb/med:6.1f} MB/s) "
        f"{[round(t*1000) for t in ts]}",
        flush=True,
    )


def main():
    if os.environ.get("PIECE_KB"):
        run_one(int(os.environ["PIECE_KB"]), int(os.environ.get("WINDOW", "0")))
        return
    configs = [
        (704, 1), (352, 2), (256, 3), (128, 6), (128, 3), (64, 4), (64, 11),
        (32, 4),
    ]
    for kb, win in configs:
        env = dict(os.environ, PIECE_KB=str(kb), WINDOW=str(win))
        try:
            p = subprocess.run(
                [sys.executable, "-u", os.path.abspath(__file__)],
                timeout=150, env=env, capture_output=True, text=True,
            )
            out = p.stdout.strip()
            if out:
                log(out)
            else:
                err_lines = p.stderr.strip().splitlines() if p.stderr else []
                tail = err_lines[-1][:200] if err_lines else "(no stderr)"
                log(f"config {kb}/{win}: rc={p.returncode} {tail}")
        except subprocess.TimeoutExpired:
            log(f"config piece={kb} KiB window={win}: HANG (>150s), killed")
            time.sleep(30)  # let the tunnel claim clear


if __name__ == "__main__":
    main()
