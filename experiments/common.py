"""Shared experiment machinery: sweep grids, dataset iteration, results IO.

Mirrors the reference experiment drivers' structure (`experiments/*/eval.py`
in pashtari/lrf) with the same sweep grids, result-row schema ("data",
"method", params, metric columns) and `{prefix}_results.json` output, so the
reference's stored results and ours are interchangeable for plotting.
"""

from __future__ import annotations

import glob
import os
import sys
from typing import Callable, Iterable, Optional

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Sweeps hit one jit compile per distinct (image size, rank schedule); the
# persistent cache makes re-runs and later images (nearly) compile-free.
# TPU-ONLY: XLA:CPU AOT cache entries embed the compile machine's CPU
# features and loading them on a host with different features SIGSEGVs
# (observed: a patch-size sweep segfaulted mid-run loading
# '+prefer-no-gather' entries; the loader itself warns 'could lead to
# execution errors such as SIGILL'). CPU compiles are fast; only the
# minutes-long tunnel TPU compiles are worth persisting.
import jax

if os.environ.get("LRF_TPU_PLATFORM", "").lower() != "cpu":
    jax.config.update("jax_compilation_cache_dir", "/tmp/lrf_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

# The axon TPU plugin force-prepends itself to jax_platforms and ignores
# JAX_PLATFORMS, so honor an explicit override here, before any device use.
# (LRF_TPU_PLATFORM=cpu runs a sweep on host cores — e.g. to keep the
# single-client TPU tunnel free for a concurrent bench.)
if os.environ.get("LRF_TPU_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["LRF_TPU_PLATFORM"])

import lrf_tpu
from lrf_tpu.utils.config import save_config
from lrf_tpu.utils.eval import eval_compression, read_image


def dataset_images(data_dir: str) -> list[str]:
    return sorted(glob.glob(os.path.join(data_dir, "*.png")))


def sweep_jpeg(image, image_id: str, qualities: Iterable[int] = range(0, 75)) -> list[dict]:
    """JPEG baseline sweep (`experiments/comparison/eval.py:52-65`)."""
    results = []
    for quality in qualities:
        params = {"quality": int(quality)}
        log = eval_compression(
            image, lrf_tpu.pil_encode, lrf_tpu.pil_decode, format="JPEG", **params
        )
        results.append({"data": image_id, "method": "JPEG", **params, **log})
    return results


def sweep_svd(
    image, image_id: str, qualities: Optional[Iterable[float]] = None
) -> list[dict]:
    """SVD sweep, RGB+patch path (`experiments/comparison/eval.py:68-80`)."""
    qualities = np.linspace(0.0, 5, 30) if qualities is None else qualities
    results = []
    for quality in qualities:
        params = {
            "color_space": "RGB",
            "quality": float(quality),
            "patch": True,
            "patch_size": (8, 8),
        }
        log = eval_compression(image, lrf_tpu.svd_encode, lrf_tpu.svd_decode, **params)
        results.append({"data": image_id, "method": "SVD", **params, **log})
    return results


def sweep_qmf(
    image,
    image_id: str,
    qualities: Optional[Iterable[float]] = None,
    **overrides,
) -> list[dict]:
    """QMF sweep with the canonical config (`experiments/comparison/eval.py:83-100`)."""
    qualities = np.linspace(0, 40, 80) if qualities is None else qualities
    results = []
    for quality in qualities:
        params = {
            "color_space": "YCbCr",
            "scale_factor": (0.5, 0.5),
            "quality": (float(quality), float(quality) / 2, float(quality) / 2),
            "patch": True,
            "patch_size": (8, 8),
            "bounds": (-16, 15),
            "dtype": np.int8,
            "num_iters": 10,
        }
        params.update(overrides)
        log = eval_compression(image, lrf_tpu.qmf_encode, lrf_tpu.qmf_decode, **params)
        results.append({"data": image_id, "method": "QMF", **params, **log})
    return results


def run_over_dataset(
    data_dir: str,
    per_image: Callable[[np.ndarray, str], list[dict]],
    save_dir: str,
    prefix: str,
    verbose: bool = True,
    resume: bool = True,
) -> list[dict]:
    """Sweep `per_image` over a dataset with checkpoint/resume.

    Unlike the reference drivers (which write results once at the very end —
    `experiments/comparison/eval.py:116`; a crash loses hours of sweeping),
    the results file is rewritten atomically after every image, and with
    ``resume=True`` a restart skips images whose rows are already present.
    """
    from lrf_tpu.utils.config import read_config

    results: list[dict] = []
    done: set[str] = set()
    results_path = os.path.join(save_dir, f"{prefix}_results.json")
    if resume and os.path.exists(results_path):
        results = read_config(results_path)
        done = {row["data"] for row in results}
        if verbose and done:
            print(f"resuming: {len(done)} images already swept", flush=True)

    for path in dataset_images(data_dir):
        image_id = os.path.basename(path)
        if image_id in done:
            continue
        image = read_image(path)
        rows = per_image(image, image_id)
        results.extend(rows)
        save_config(results, save_dir=save_dir, prefix=prefix)  # checkpoint
        if verbose:
            print(f"image {image_id}: {len(rows)} rows", flush=True)
    save_config(results, save_dir=save_dir, prefix=prefix)
    return results


def default_argparser(description: str, default_save_dir: str):
    import argparse

    parser = argparse.ArgumentParser(description=description)
    parser.add_argument("--data", type=str, default="kodak")
    parser.add_argument("--data_dir", type=str, nargs="?")
    parser.add_argument("--save_dir", type=str, default=default_save_dir)
    parser.add_argument("--prefix", type=str, nargs="?")
    args = parser.parse_args()
    if args.data_dir is None:
        args.data_dir = f"../data/{args.data}"
    if args.prefix is None:
        args.prefix = args.data
    return args
