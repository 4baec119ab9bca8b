"""Host-serializer attribution for the pipelined encode (round-5 task).

The round-4 roofline showed the delivered pipeline is bound by the 2-core
HOST serializer stage (~330-420 Mpix/s delivered vs 470-563 with the stage
removed), but the stage itself had no internal split. This script measures,
per 64-image bench batch, how `_serialize_batch`'s time divides between:

  1. entropy-transport decode  (native dpack -> int8 factor values)
  2. factor-block prep         (numpy transpose/reshape to fiber-major)
  3. fiber deflate             (native libdeflate/zlib thread-pooled call)
  4. blob slicing              (per-fiber bytes objects out of the C buffer)
  5. container framing         (per-image combine_bytes Python loop)

The serializer never touches the TPU, so CPU-host timing here IS the
pipeline-relevant number. Factor data comes from the real encode pipeline
run on the CPU backend (identical bytes to the TPU path below the Pallas
crossover), so deflate sees the true factor statistics.

Usage: python experiments/profile_serializer.py [--batch 64] [--repeat 5]
Prints a JSON attribution to stdout (stderr carries the human log).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _best_of(fn, repeat):
    best = float("inf")
    out = None
    for _ in range(repeat):
        t0 = time.perf_counter()
        out = fn()
        best = min(best, time.perf_counter() - t0)
    return best * 1000, out  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--repeat", type=int, default=5)
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--width", type=int, default=768)
    ap.add_argument("--quality", type=float, default=10)
    args = ap.parse_args()

    import jax

    from PIL import Image

    from lrf_tpu.models.container import (
        _compress_fibers,
        combine_bytes,
        dict_to_bytes,
        encode_tensor_batch,
        set_fiber_coder,
    )
    from lrf_tpu.native import fibercodec as _native
    from lrf_tpu.parallel import encode as enc
    from lrf_tpu.parallel.mesh import make_mesh

    assert _native.available(), "native fibercodec required for attribution"
    set_fiber_coder("deflate", 1)  # the bench throughput-path coder
    H, W, B, Q = args.height, args.width, args.batch, args.quality

    img = np.asarray(
        Image.open("/root/reference/figures/kodim01.png").convert("RGB")
    ).transpose(2, 0, 1)[:, :H, :W]
    if img.shape[1] < H or img.shape[2] < W:
        reps = (1, -(-H // img.shape[1]), -(-W // img.shape[2]))
        img = np.tile(img, reps)[:, :H, :W]
    batch = np.stack([np.roll(img, 7 * i, axis=2) for i in range(B)])
    mpix = B * H * W / 1e6

    mesh = make_mesh(data=1, patch=1, devices=jax.devices()[:1])
    log(f"encoding {B}x {H}x{W} q={Q} on the CPU backend (one-time)...")
    fn, metadata, spec = enc.build_sharded_encoder(
        mesh, (H, W), quality=Q, batch=B, pack="entropy"
    )
    out = fn(jax.numpy.asarray(batch))
    host_out = enc._fetch_encoded(out, spec)
    log(
        f"entropy host_out: seg {host_out[0].nbytes}, main "
        f"{host_out[1].nbytes}, exc {host_out[2].nbytes} bytes"
    )

    rep = args.repeat
    result = {
        "config": {"batch": B, "size": [H, W], "quality": Q, "coder": ["deflate", 1]},
        "mpix_per_batch": round(mpix, 3),
        "stages_ms": {},
    }

    # ---- total
    t_total, streams = _best_of(
        lambda: enc._serialize_batch(host_out, spec, metadata, B), rep
    )
    result["stages_ms"]["total_serialize_batch"] = round(t_total, 2)
    result["payload_mb_per_batch"] = round(sum(map(len, streams)) / 1e6, 3)

    # ---- stage 1: entropy decode (native dpack -> factor arrays)
    t_ent, factors = _best_of(lambda: enc._decode_entropy(host_out, spec), rep)
    result["stages_ms"]["entropy_decode"] = round(t_ent, 2)

    # ---- stage 2+3+4: per-factor encode_tensor_batch, split further
    t_blocks = 0.0
    t_compress = 0.0
    t_slice = 0.0
    blocks = []
    for f in factors:
        b_, m, n = f.shape
        t, block = _best_of(
            lambda f=f: np.ascontiguousarray(f.transpose(0, 2, 1)).reshape(
                f.shape[0] * f.shape[2], f.shape[1]
            ),
            rep,
        )
        t_blocks += t
        blocks.append(block)
        t, blobs = _best_of(
            lambda block=block: _compress_fibers(block, "row", 1, "deflate"), rep
        )
        t_compress += t
    # blob slicing: difference between the raw native call (rc + lens) and
    # the wrapper that also materializes per-fiber bytes objects. Measure
    # by re-running the wrapper (includes slicing) minus a lens-only call:
    # approximate with the tobytes loop cost on the returned blobs.
    all_blobs = [
        blob for block in blocks for blob in _compress_fibers(block, "row", 1, "deflate")
    ]
    t_slice, _ = _best_of(lambda: [b[:] for b in all_blobs], rep)  # lower bound
    result["stages_ms"]["factor_block_prep_numpy"] = round(t_blocks, 2)
    result["stages_ms"]["fiber_deflate_native"] = round(t_compress, 2)
    result["stages_ms"]["blob_copy_lower_bound"] = round(t_slice, 2)

    # ---- stage 5: container framing (per-image Python loop)
    per_factor_blobs = [encode_tensor_batch(f) for f in factors]
    encoded_metadata = dict_to_bytes(metadata)

    def frame():
        streams = []
        for i in range(B):
            encoded_factors = combine_bytes(
                [blobs[i] for blobs in per_factor_blobs]
            )
            streams.append(combine_bytes([encoded_metadata, encoded_factors]))
        return streams

    t_frame, _ = _best_of(frame, rep)
    result["stages_ms"]["container_framing_python"] = round(t_frame, 2)

    # encode_tensor_batch end-to-end (= prep + deflate + slice + inner
    # per-image frames), for cross-checking the split
    t_etb, _ = _best_of(
        lambda: [encode_tensor_batch(f) for f in factors], rep
    )
    result["stages_ms"]["encode_tensor_batch_total"] = round(t_etb, 2)

    # `total_serialize_batch` is the FUSED native path (round-5:
    # lrf_dpack_assemble_streams — decode + deflate + framing in one
    # cache-resident pass per segment); the stage rows above decompose the
    # LAYERED path it replaced, so layered-sum minus fused total is the
    # fusion saving.
    layered = t_ent + t_etb + t_frame
    result["stages_ms"]["layered_path_sum"] = round(layered, 2)
    result["stages_ms"]["fusion_saving"] = round(layered - t_total, 2)
    result["serializer_bound_mpix_s"] = round(mpix / (t_total / 1000), 1)

    log(json.dumps(result["stages_ms"], indent=1))
    print(json.dumps(result))


if __name__ == "__main__":
    main()
