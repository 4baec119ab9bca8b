"""Command-line interface: encode / decode / info / eval.

The reference (pashtari/lrf) ships no CLI — its only drivers are the
argparse experiment scripts (`experiments/comparison/eval.py:11-42`). For a
standalone framework a codec CLI is table stakes, so this module adds one:

    python -m lrf_tpu encode kodim01.png kodim01.lrf --quality 7
    python -m lrf_tpu decode kodim01.lrf roundtrip.png
    python -m lrf_tpu info   kodim01.lrf
    python -m lrf_tpu eval   kodim01.png --codec qmf --quality 7

`decode`/`info` auto-detect the codec from the stream's JSON metadata
(QMF streams carry a `"bounds"` key — `lrf/compression/qmf.py:253`; SVD
streams a `"quantization"` dict — `lrf/compression/svd.py:264`). Encoded
streams are byte-compatible with the reference implementation, so files
written here decode under `lrf.qmf_decode` and vice versa.
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

__all__ = ["main"]


def _detect_codec(stream: bytes) -> tuple[str, dict]:
    from lrf_tpu.models.container import bytes_to_dict, separate_bytes

    metadata = bytes_to_dict(separate_bytes(stream, 2)[0])
    if "bounds" in metadata:
        return "qmf", metadata
    if "quantization" in metadata:
        return "svd", metadata
    raise ValueError("unrecognized stream: metadata matches no known codec")


def _encoder_kwargs(args: argparse.Namespace) -> dict:
    kwargs: dict = {}
    if args.rank is not None:
        kwargs["rank"] = args.rank
    else:
        kwargs["quality"] = args.quality if args.quality is not None else 7.0
    if args.color_space is not None:
        kwargs["color_space"] = args.color_space
    kwargs["patch"] = not args.no_patch
    kwargs["patch_size"] = (args.patch_size, args.patch_size)
    if args.codec == "qmf":
        kwargs["num_iters"] = args.num_iters
        kwargs["bounds"] = tuple(args.bounds)
    return kwargs


def _load_image(path: str) -> np.ndarray:
    from lrf_tpu.utils.eval import read_image

    return read_image(path)


def _save_image(path: str, image: np.ndarray) -> None:
    from PIL import Image

    Image.fromarray(np.asarray(image).transpose(1, 2, 0)).save(path)


def _cmd_encode(args: argparse.Namespace) -> int:
    import lrf_tpu

    if args.coder:
        lrf_tpu.set_fiber_coder(args.coder)
    encode = {"qmf": lrf_tpu.qmf_encode, "svd": lrf_tpu.svd_encode}[args.codec]
    image = _load_image(args.input)
    stream = encode(image, **_encoder_kwargs(args))
    with open(args.output, "wb") as f:
        f.write(stream)
    bpp = 8 * len(stream) / (image.shape[-2] * image.shape[-1])
    print(
        f"{args.output}: {len(stream)} bytes, {bpp:.3f} bpp "
        f"(CR {image.nbytes / len(stream):.1f})"
    )
    return 0


def _cmd_decode(args: argparse.Namespace) -> int:
    import lrf_tpu

    with open(args.input, "rb") as f:
        stream = f.read()
    codec, _ = _detect_codec(stream)
    decode = {"qmf": lrf_tpu.qmf_decode, "svd": lrf_tpu.svd_decode}[codec]
    image = np.asarray(decode(stream))
    _save_image(args.output, image)
    print(f"{args.output}: {codec} stream -> {image.shape[-2]}x{image.shape[-1]}")
    return 0


def _cmd_info(args: argparse.Namespace) -> int:
    with open(args.input, "rb") as f:
        stream = f.read()
    codec, metadata = _detect_codec(stream)
    # "original size" is per-channel [[H,W], ...] under YCbCr (Y first), a
    # flat [H,W] in the no-color-transform patch path, and ABSENT in the
    # no-patch branches (`lrf/compression/qmf.py:205` writes no size there)
    # — bpp then needs a decode to know the pixel count.
    size = metadata.get("original size")
    info = {"codec": codec, "bytes": len(stream)}
    if size is not None:
        h, w = size[0] if isinstance(size[0], (list, tuple)) else size
        info["bit rate (bpp)"] = round(8 * len(stream) / (h * w), 4)
    print(
        json.dumps(
            {
                **info,
                **metadata,
            },
            indent=2,
        )
    )
    return 0


def _cmd_eval(args: argparse.Namespace) -> int:
    import lrf_tpu
    from lrf_tpu.utils.eval import eval_compression

    if args.coder:
        lrf_tpu.set_fiber_coder(args.coder)
    encode = {"qmf": lrf_tpu.qmf_encode, "svd": lrf_tpu.svd_encode}[args.codec]
    decode = {"qmf": lrf_tpu.qmf_decode, "svd": lrf_tpu.svd_decode}[args.codec]
    result = eval_compression(args.input, encode, decode, **_encoder_kwargs(args))
    print(json.dumps(result, indent=2))
    return 0


def _add_encoder_flags(p: argparse.ArgumentParser) -> None:
    p.add_argument("--codec", choices=("qmf", "svd"), default="qmf")
    g = p.add_mutually_exclusive_group()
    g.add_argument("--quality", type=float, help="quality in [0, 100] (default 7)")
    g.add_argument("--rank", type=int, help="explicit factorization rank")
    p.add_argument(
        "--color-space",
        choices=("YCbCr", "RGB"),
        help="default: YCbCr for qmf, RGB for svd (reference defaults)",
    )
    p.add_argument("--patch-size", type=int, default=8)
    p.add_argument("--no-patch", action="store_true", help="factorize whole channels")
    p.add_argument("--num-iters", type=int, default=10, help="BCD sweeps (qmf)")
    p.add_argument(
        "--bounds", type=int, nargs=2, default=(-16, 15), help="integer factor bounds (qmf)"
    )
    p.add_argument(
        "--coder",
        choices=("best", "zlib", "deflate"),
        help="fiber coder backend; 'best' (default) emits the smaller of "
        "zlib-9/libdeflate-12 per fiber, 'deflate' is the fast "
        "throughput choice, 'zlib' is byte-identical to the reference — "
        "all emit reference-decodable zlib streams",
    )


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(
        prog="lrf_tpu", description="TPU-native low-rank-factorization image codec"
    )
    parser.add_argument(
        "--platform",
        choices=("tpu", "cpu", "gpu"),
        default=None,
        help="force the JAX backend (some TPU plugins override JAX_PLATFORMS; "
        "this applies jax.config directly, so it wins)",
    )
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("encode", help="compress an image file to an .lrf stream")
    p.add_argument("input", help="image file (anything PIL reads)")
    p.add_argument("output", help="output stream path")
    _add_encoder_flags(p)
    p.set_defaults(func=_cmd_encode)

    p = sub.add_parser("decode", help="decompress an .lrf stream to an image file")
    p.add_argument("input", help=".lrf stream path")
    p.add_argument("output", help="output image path (format from extension)")
    p.set_defaults(func=_cmd_decode)

    p = sub.add_parser("info", help="print a stream's codec + metadata as JSON")
    p.add_argument("input", help=".lrf stream path")
    p.set_defaults(func=_cmd_info)

    p = sub.add_parser("eval", help="encode+decode an image, print quality metrics")
    p.add_argument("input", help="image file")
    _add_encoder_flags(p)
    p.set_defaults(func=_cmd_eval)

    args = parser.parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    return args.func(args)


if __name__ == "__main__":
    sys.exit(main())
