"""Sharded batch decode: data-parallel QMF stream reconstruction.

Mirror of `lrf_tpu.parallel.encode` for the decode direction (the reference
decodes strictly one image per call — `lrf/compression/qmf.py:295`). A batch
of homogeneous QMF streams (same config and image size, e.g. produced by
`sharded_qmf_encode_batch`) is decoded by ONE jitted program over a mesh:

- host side, all B streams' fiber blobs inflate AND bit-pack for the
  upload in fused native thread-pooled passes (`_inflate_pack_native`;
  numpy fallback via `decode_matrix_batch`), with an opt-in
  delta+Huffman H2D transport (`LRF_TPU_DECODE_TRANSPORT=dpack`);
- device side, the reconstruction pipeline (U @ V^T per channel, depatchify,
  unpad, nearest chroma upsample, YCbCr->RGB, clamp-cast) runs batched and
  sharded over ``data``, so decode scales across chips like encode.

Per-image results are bit-identical to `lrf_tpu.models.qmf.qmf_decode`
(same jitted channel pipeline, same container parsing).
"""

from __future__ import annotations

import json
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lrf_tpu.models.container import (
    bytes_to_dict,
    decode_matrix_batch,
    separate_bytes,
)
from lrf_tpu.ops.color import ycbcr_to_rgb
from lrf_tpu.ops.pad import unpad_image
from lrf_tpu.ops.patch import depatchify
from lrf_tpu.ops.quantize import to_dtype
from lrf_tpu.ops.resample import chroma_upsample
from lrf_tpu.parallel.encode import _pack_params

__all__ = ["sharded_qmf_decode_batch", "sharded_qmf_decode_batches"]

# Per-config (metadata signature) bit-pack decisions — see _inflate_streams.
_PACK_DECISIONS: dict = {}
# Per-config sticky dpack upload bucket (max 4096-row bucket seen), so the
# device decoder's input shape — and thus its compiled program — is stable
# across batches; see _inflate_pack_native.
_DPACK_BUCKETS: dict = {}


def _decode_transport() -> str:
    """H2D factor transport: "flat" (5-bit pack, default) or "dpack"
    (delta+Huffman entropy upload — see _inflate_pack_native)."""
    import os

    return os.environ.get("LRF_TPU_DECODE_TRANSPORT", "flat")


@lru_cache(maxsize=None)
def _cached_sharded_decoder(
    mesh: Mesh, orig_sizes, padded_sizes, patch_size, uv_shapes, in_dtype,
    out_dtype, pack=None,
):
    # The six factor arrays travel host->device as ONE flat `(B, total)`
    # buffer (a single transfer — on tunnel/PCIe-attached devices per-array
    # uploads each pay a round trip) and are sliced/reshaped on device,
    # which XLA folds into the reconstruction fusion. When `pack` is set
    # (`(lo, bits, total)` from the stream's bounds metadata), the buffer
    # arrives bit-packed (~bits/8 bytes per value instead of 1) and is
    # unpacked on device with shift/mask ops that XLA fuses away.
    def decode(flat):
        if pack is not None and pack[0] == "dpack":
            # delta+Huffman upload (~3 bits/value): flat is ONE 1-D uint32
            # buffer [chunk-row counts (u8 word-packed) | main | rows];
            # the chunk-parallel device decoder undoes it
            # (`ops.entropy.unpack_chunks_device`)
            from lrf_tpu.ops import entropy as _entropy

            _, b_, budget = pack
            shapes3 = tuple((b_, m, r) for m, r in uv_shapes)
            c_total = sum(
                b_ * (-(-m * r // _entropy.CHUNK)) for m, r in uv_shapes
            )
            rows_words = -(-c_total // 4)
            rw = flat[:rows_words]
            rows_u8 = (
                (rw[:, None] >> (jnp.arange(4, dtype=jnp.uint32) * 8))
                & jnp.uint32(0xFF)
            ).reshape(-1)[:c_total]
            main = flat[rows_words : rows_words + c_total * _entropy.MAIN_WORDS]
            exc = flat[
                rows_words
                + c_total * _entropy.MAIN_WORDS : rows_words
                + c_total * _entropy.MAIN_WORDS
                + budget * _entropy.ROW_WORDS
            ]
            factors = _entropy.unpack_chunks_device(rows_u8, main, exc, shapes3)
        else:
            if pack is not None:
                lo, bits, total = pack
                vals_per_word = 30 // bits
                mask = jnp.uint32((1 << bits) - 1)
                shifts = jnp.arange(vals_per_word, dtype=jnp.uint32) * bits
                vals = (flat[:, :, None] >> shifts[None, None, :]) & mask
                flat = (
                    vals.reshape(flat.shape[0], -1)[:, :total].astype(jnp.int32)
                    + lo
                ).astype(jnp.dtype(in_dtype))
            factors = []
            offset = 0
            for shape in uv_shapes:  # (M, R) per factor, batch-major flat
                n = shape[0] * shape[1]
                factors.append(
                    flat[:, offset : offset + n].reshape((-1,) + shape)
                )
                offset += n
        ycbcr = []
        for i in range(3):
            u = factors[2 * i].astype(jnp.float32)
            v = factors[2 * i + 1].astype(jnp.float32)
            x = jnp.einsum("bmr,bnr->bmn", u, v)
            channel = depatchify(x, padded_sizes[i], patch_size)
            channel = unpad_image(channel, orig_sizes[i])
            ycbcr.append(channel)
        image = chroma_upsample(tuple(ycbcr), size=orig_sizes[0], mode="nearest")
        image = ycbcr_to_rgb(image)
        return to_dtype(image, jnp.dtype(out_dtype))

    sharding = NamedSharding(mesh, P("data"))
    return jax.jit(decode, in_shardings=(sharding,), out_shardings=sharding)


def sharded_qmf_decode_batch(
    streams,
    mesh: Mesh,
    out: str = "host",
):
    """Decode a list of homogeneous YCbCr-patch QMF streams on a mesh.

    Streams must share one codec config and image size (the batch produced
    by `sharded_qmf_encode_batch`, or any same-config `qmf_encode` outputs).
    Returns a `(B, 3, H, W)` array of the original dtype — numpy when
    ``out="host"`` (default), the sharded on-device `jax.Array` when
    ``out="device"`` (for device-resident metrics / further processing
    without a host round trip).
    """
    assert out in ("host", "device")
    return _device_decode(
        *_inflate_streams(streams, mesh.devices.size == 1), mesh, out
    )


def _inflate_streams(streams, single_device: bool = False):
    """Host stage: parse containers + inflate all fibers (native zlib).

    Touches no jax state, so it can run on a worker thread concurrently
    with device work on the calling thread. Returns the flat batch-major
    `(B, total)` factor buffer, the shared metadata, and per-factor shapes.

    ``single_device`` gates the dpack upload (its interleaved chunk stream
    has no batch axis to shard); it defaults to False so a caller that
    forgets to derive it from the mesh can never enable dpack on a
    multi-device mesh (round-4 advisor finding) — callers that know they
    are single-device pass True explicitly.
    """
    assert len(streams) > 0
    metadata = None
    per_factor: list[list[bytes]] = [[] for _ in range(6)]
    for stream in streams:
        encoded_metadata, encoded_factors = separate_bytes(stream, 2)
        md = bytes_to_dict(encoded_metadata)
        if metadata is None:
            metadata = md
            assert md["color space"] == "YCbCr" and md["patch"], (
                "sharded decode currently covers the flagship YCbCr+patch "
                "format; use qmf_decode for RGB/no-patch streams"
            )
        else:
            assert md == metadata, "streams must share one codec config"
        for k, blob in enumerate(separate_bytes(encoded_factors, 6)):
            per_factor[k].append(blob)

    b = len(streams)
    fast = _inflate_pack_native(per_factor, metadata, b, single_device)
    if fast is not None:
        return fast

    factors = [decode_matrix_batch(blobs) for blobs in per_factor]
    flat = np.concatenate([f.reshape(b, -1) for f in factors], axis=1)
    shapes = tuple(f.shape[1:] for f in factors)

    # Bit-pack the H2D upload when the factors fit their advertised bounds
    # (always true for >=1 BCD sweep; iters=0 streams hold unprojected SVD
    # factors and upload unpacked). The decision is CACHED per codec config
    # (metadata signature): the first batch of a config decides, so one
    # config maps to one compiled decoder across a pipeline run. The cheap
    # in-bounds scan is still performed per batch as a correctness guard —
    # a batch that violates a cached pack=True decision (possible only for
    # iters=0 streams) falls back to the unpacked decoder rather than
    # corrupting values.
    pack = None
    bounds = metadata.get("bounds")
    if bounds is not None and flat.dtype.kind == "i":
        lo, bits = _pack_params(bounds)
        hi = lo + (1 << bits) - 1
        config_key = json.dumps(metadata, sort_keys=True)
        in_bounds = bool(flat.min() >= lo and flat.max() <= hi)
        decision = _PACK_DECISIONS.setdefault(config_key, bits < 8 and in_bounds)
        if decision and in_bounds:
            total = flat.shape[1]
            vals_per_word = 30 // bits
            padded = -(-total // vals_per_word) * vals_per_word
            vals = (flat.astype(np.int64) - lo).astype(np.uint32)
            if padded != total:
                vals = np.concatenate(
                    [vals, np.zeros((b, padded - total), np.uint32)], axis=1
                )
            shifts = (np.arange(vals_per_word, dtype=np.uint32) * bits)[
                None, None, :
            ]
            packed = np.bitwise_or.reduce(
                vals.reshape(b, -1, vals_per_word) << shifts, axis=2
            )
            pack = (lo, bits, total)
            return packed, metadata, shapes, flat.dtype.name, pack
    return flat, metadata, shapes, flat.dtype.name, pack


def _inflate_pack_native(per_factor, metadata, b: int, single_device: bool):
    """Fused native inflate + bit-pack (the decode-prep fast path).

    The numpy route (restack-transpose per factor, concat, int64 widen,
    shift + or-reduce) measured ~37 ms of temporaries per 64-batch on the
    2-core host — more than the inflate itself (9.7 ms). The native path
    inflates fibers to their raw fiber-major buffers and bit-packs them
    straight into the `(B, words)` upload layout in one C++ pass
    (`fibercodec.cpp::lrf_pack_values`, ~2 ms). Returns the
    `_inflate_streams` result tuple, or None to use the numpy path (no
    native lib, non-int8/bounds config, cached pack=False decision, or an
    out-of-bounds value — the C++ pass doubles as the correctness guard).
    """
    from lrf_tpu.native import fibercodec as _native

    bounds = metadata.get("bounds")
    if bounds is None or not _native.available():
        return None
    lo, bits = _pack_params(bounds)
    if bits >= 8:
        return None
    config_key = json.dumps(metadata, sort_keys=True)
    if _PACK_DECISIONS.get(config_key) is False:
        return None
    raws = []
    shapes = []
    for blobs_per_stream in per_factor:
        inner_md, _ = separate_bytes(blobs_per_stream[0], 2)
        md = bytes_to_dict(inner_md)
        if md.get("mode") != "col" or np.dtype(md["dtype"]) != np.int8:
            return None
        r = md["num_fibers"]
        all_fibers = []
        for blob in blobs_per_stream:
            _, fib_b = separate_bytes(blob, 2)
            all_fibers.extend(separate_bytes(fib_b, r))
        raw = _native.decompress_fibers_raw(all_fibers, np.dtype(np.int8))
        if raw is None:
            return None
        raws.append(raw)  # (B * R, M) fiber-major
        shapes.append((raw.shape[1], r))  # (M, R)
    ms = [m for m, _ in shapes]
    rs = [r for _, r in shapes]
    if single_device and _decode_transport() == "dpack":
        # dpack transport: delta + static-Huffman, ~3 bits/value on the
        # wire vs the flat pack's 5 (the decode mirror of the encode-side
        # entropy transport). One flat upload buffer with static offsets:
        # [per-chunk row counts (u8, word-packed) | main | continuation
        # rows]; the device undoes it chunk-parallel
        # (`ops.entropy.unpack_chunks_device`). Falls through to the flat
        # pack on budget overflow or out-of-alphabet deltas (iters=0
        # streams). Single-device meshes only: the chunk stream interleaves
        # images, so it has no batch axis to shard. NOT the hard default:
        # the winner flips with tunnel weather, so bench.py runs a
        # flat-vs-dpack A/B every run and publishes both legs — on the
        # round-5 stack (single-pass host encoder ~12.7 ms, used-rows-only
        # bucketed upload ~0.94 MB vs flat's 2.0) dpack won four of five
        # healthy-H2D supervisor runs (596-693 vs 483-670 Mpix/s;
        # experiments/bench_repro.json runs K-P). Library callers opt in
        # via LRF_TPU_DECODE_TRANSPORT=dpack.
        from lrf_tpu.ops import entropy as _entropy

        c_total = sum(
            b * (-(-m * r // _entropy.CHUNK)) for m, r in zip(ms, rs)
        )
        budget = _entropy.default_exc_rows(c_total)
        out = _native.dpack_encode(
            raws, b, ms, rs, _entropy.LENS, _entropy.CODES,
            _entropy.CHUNK, _entropy.MAIN_WORDS, _entropy.ROW_WORDS, budget,
        )
        if out is not None:
            main, exc, chunk_rows, n_rows = out
            rows_words = -(-c_total // 4)
            rows_u8 = np.zeros(rows_words * 4, np.uint8)
            rows_u8[:c_total] = chunk_rows
            # The host encoder knows the exact used-row count BEFORE the
            # upload, so ship only the used rows rounded up to a 4096-row
            # bucket (round 5: the full static budget carried ~2x the
            # used rows as dead wire on the H2D upload). The bucket is
            # STICKY per config — the max bucket this config has needed —
            # so the decoder compiles once per config in steady state and
            # only re-traces on genuine growth (a per-batch bucket would
            # recompile, minutes on the tunnel, whenever consecutive
            # batches straddle a boundary; rows past n_rows are never
            # read by the device decoder, so padding to the sticky bucket
            # is free correctness-wise).
            bucket = 4096
            needed = -(-max(n_rows, 1) // bucket) * bucket
            sticky = max(needed, _DPACK_BUCKETS.get(config_key, 0))
            _DPACK_BUCKETS[config_key] = sticky
            upload_rows = min(budget, sticky)
            upload = np.concatenate(
                [
                    rows_u8.view(np.uint32),
                    main,
                    exc[: upload_rows * _entropy.ROW_WORDS],
                ]
            )
            _PACK_DECISIONS.setdefault(config_key, True)
            return (
                upload,
                metadata,
                tuple(shapes),
                "int8",
                ("dpack", b, upload_rows),
            )
    packed = _native.pack_values(raws, b, ms, rs, lo, bits)
    if packed is None:  # out-of-bounds value: unpacked fallback (slow path)
        _PACK_DECISIONS.setdefault(config_key, False)
        return None
    _PACK_DECISIONS.setdefault(config_key, True)
    total = sum(m * r for m, r in shapes)
    return packed, metadata, tuple(shapes), "int8", (lo, bits, total)


def _device_decode(flat, metadata, shapes, in_dtype, pack, mesh: Mesh, out: str):
    decoder = _cached_sharded_decoder(
        mesh,
        tuple(tuple(s) for s in metadata["original size"]),
        tuple(tuple(s) for s in metadata["padded size"]),
        tuple(metadata["patch size"]),
        shapes,
        in_dtype,
        metadata["dtype"],
        pack,
    )
    sharding = NamedSharding(mesh, P("data"))
    images = decoder(jax.device_put(jnp.asarray(flat), sharding))
    if out == "device":
        return images
    from lrf_tpu.utils.transfer import to_host

    return to_host(images)


def sharded_qmf_decode_batches(
    stream_batches,
    mesh: Mesh,
    out: str = "host",
):
    """Pipelined decode of a sequence of homogeneous stream batches.

    Generator yielding one decoded `(B, 3, H, W)` array per input batch, in
    order. Host fiber inflation of batch i+1 (worker thread, native zlib,
    no jax state) overlaps the device upload/reconstruction of batch i
    (calling thread — all jax work stays here, as the single-client tunnel
    transport requires). Mirror of `sharded_qmf_encode_batches`.
    """
    from concurrent.futures import ThreadPoolExecutor

    assert out in ("host", "device")
    with ThreadPoolExecutor(max_workers=1) as pool:
        pending = None
        single = mesh.devices.size == 1
        for streams in stream_batches:
            fut = pool.submit(_inflate_streams, streams, single)
            if pending is not None:
                yield _device_decode(*pending.result(), mesh, out)
            pending = fut
        if pending is not None:
            yield _device_decode(*pending.result(), mesh, out)
