"""CLI round-trip tests (`python -m lrf_tpu encode/decode/info/eval`).

The reference ships no CLI (SURVEY.md §2 — experiments scripts only); this
pins the new user-facing entry point: encode -> decode round-trips through
files, streams are reference-format, info/eval emit valid JSON.
"""

import json
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

from lrf_tpu.cli import main


@pytest.fixture(scope="module")
def png(tmp_path_factory):
    path = tmp_path_factory.mktemp("cli") / "img.png"
    rng = np.random.RandomState(3)
    # Smooth-ish image so low-rank compression is meaningful.
    base = rng.rand(3, 8, 6)
    img = np.kron(base, np.ones((1, 8, 8)))  # (3, 64, 48)
    img = (img * 255).astype(np.uint8)
    Image.fromarray(img.transpose(1, 2, 0)).save(path)
    return path


def test_encode_decode_roundtrip(png, tmp_path, capsys):
    stream_path = tmp_path / "img.lrf"
    out_path = tmp_path / "round.png"
    assert main(["encode", str(png), str(stream_path), "--quality", "30"]) == 0
    assert main(["decode", str(stream_path), str(out_path)]) == 0
    original = np.asarray(Image.open(png))
    decoded = np.asarray(Image.open(out_path))
    assert decoded.shape == original.shape
    mse = np.mean((decoded.astype(float) - original.astype(float)) ** 2)
    assert mse < 2500  # lossy but sane (PSNR ~14+ dB on a random-ish mosaic)

    # The file is a reference-format stream: library decode agrees exactly.
    import lrf_tpu

    lib = np.asarray(lrf_tpu.qmf_decode(stream_path.read_bytes()))
    assert np.array_equal(lib.transpose(1, 2, 0), decoded)


def test_decode_autodetects_svd(png, tmp_path, capsys):
    stream_path = tmp_path / "img.svd.lrf"
    out_path = tmp_path / "round.png"
    assert main(["encode", str(png), str(stream_path), "--codec", "svd", "--quality", "3"]) == 0
    assert main(["decode", str(stream_path), str(out_path)]) == 0
    capsys.readouterr()
    assert main(["info", str(stream_path)]) == 0
    info = json.loads(capsys.readouterr().out)
    assert info["codec"] == "svd"
    assert info["bytes"] == stream_path.stat().st_size


def test_info_and_eval_json(png, tmp_path, capsys):
    stream_path = tmp_path / "img.lrf"
    main(["encode", str(png), str(stream_path), "--rank", "4"])
    capsys.readouterr()
    assert main(["info", str(stream_path)]) == 0
    info = json.loads(capsys.readouterr().out)
    assert info["codec"] == "qmf"
    assert info["rank"] == [4, 2, 2]
    assert info["original size"][0] == [64, 48]  # Y channel (YCbCr default)
    assert info["bit rate (bpp)"] == pytest.approx(8 * info["bytes"] / (64 * 48), abs=1e-3)

    assert main(["eval", str(png), "--quality", "30"]) == 0
    result = json.loads(capsys.readouterr().out)
    for key in ("compression ratio", "bit rate (bpp)", "PSNR (dB)", "SSIM"):
        assert key in result


def test_module_invocation(png, tmp_path):
    stream_path = tmp_path / "img.lrf"
    proc = subprocess.run(
        [
            sys.executable,
            "-m",
            "lrf_tpu",
            "--platform",
            "cpu",
            "encode",
            str(png),
            str(stream_path),
            "--quality",
            "20",
        ],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr
    assert stream_path.stat().st_size > 0
