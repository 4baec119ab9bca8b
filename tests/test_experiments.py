"""Smoke tests for the experiment drivers, plotting, and config IO."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "experiments"))

from lrf_tpu.utils.config import read_config, save_config
from lrf_tpu.utils.plotting import LOESS, Plot


class TestSweeps:
    def test_tiny_sweeps_produce_reference_schema(self, kodim01, tmp_path):
        from common import run_over_dataset, sweep_jpeg, sweep_qmf, sweep_svd

        img = kodim01[:, :64, :64]
        rows = []
        rows += sweep_jpeg(img, "x.png", qualities=[10, 50])
        rows += sweep_svd(img, "x.png", qualities=[2.0])
        rows += sweep_qmf(img, "x.png", qualities=[10.0])
        for row in rows:
            for key in (
                "data",
                "method",
                "compression ratio",
                "bit rate (bpp)",
                "PSNR (dB)",
                "SSIM",
                "encoding time (ms)",
                "decoding time (ms)",
            ):
                assert key in row, (key, row["method"])
        save_config(rows, save_dir=str(tmp_path), prefix="t")
        loaded = read_config(str(tmp_path / "t_results.json"))
        assert len(loaded) == len(rows)
        # QMF dtype round-trips as a numpy dtype
        qmf_row = [r for r in loaded if r["method"] == "QMF"][0]
        assert qmf_row["dtype"] == np.dtype(np.int8)

    def test_run_over_dataset_checkpoints_and_resumes(self, kodim01, tmp_path):
        from PIL import Image

        from common import run_over_dataset

        data_dir = tmp_path / "data"
        data_dir.mkdir()
        for name in ("a.png", "b.png", "c.png"):
            Image.fromarray(
                np.ascontiguousarray(kodim01[:, :16, :16].transpose(1, 2, 0))
            ).save(data_dir / name)

        calls = []

        def per_image(image, image_id):
            calls.append(image_id)
            if image_id == "c.png" and calls.count("c.png") == 1:
                raise RuntimeError("simulated crash")
            return [{"data": image_id, "method": "X", "PSNR (dB)": 1.0}]

        with pytest.raises(RuntimeError):
            run_over_dataset(
                str(data_dir), per_image, str(tmp_path), "ck", verbose=False
            )
        # a and b were checkpointed before the crash
        partial = read_config(str(tmp_path / "ck_results.json"))
        assert {r["data"] for r in partial} == {"a.png", "b.png"}
        # resume skips completed images and finishes c
        results = run_over_dataset(
            str(data_dir), per_image, str(tmp_path), "ck", verbose=False
        )
        assert {r["data"] for r in results} == {"a.png", "b.png", "c.png"}
        assert calls == ["a.png", "b.png", "c.png", "c.png"]

    def test_reads_reference_results_format(self):
        path = "/root/reference/experiments/examples/kodim01/kodim01_results.json"
        rows = read_config(path)
        assert len(rows) > 0
        assert "bit rate (bpp)" in rows[0]
        # reference torch dtype strings revive as numpy dtypes
        qmf_rows = [r for r in rows if r.get("method") == "QMF" and "dtype" in r]
        assert all(r["dtype"] == np.dtype(np.int8) for r in qmf_rows)


class TestLOESS:
    def test_fits_smooth_function(self):
        rng = np.random.default_rng(0)
        x = np.linspace(0, 1, 40)
        y = np.sin(2 * np.pi * x) + rng.normal(0, 0.05, 40)
        model = LOESS(frac=0.4, degree=2).fit(x, y)
        pred = model.predict(x)
        assert np.mean((pred - np.sin(2 * np.pi * x)) ** 2) < 0.01

    def test_grid_search_selects_params(self):
        rng = np.random.default_rng(1)
        x = np.linspace(0, 1, 25)
        y = x**2 + rng.normal(0, 0.02, 25)
        model = LOESS(frac=[0.3, 0.6], degree=[1, 2]).fit(x, y)
        assert model.best_frac in (0.3, 0.6)
        assert model.best_degree in (1, 2)

    def test_matches_reference_loess(self, ref_lrf):
        """Our vectorized LOESS reproduces the reference's per-point-loop
        LOESS (`lrf/utils/misc.py:276-412`): same predictions (incl.
        extrapolation), same LOOCV grid-search selections."""
        RefLOESS = ref_lrf.LOESS
        rng = np.random.default_rng(7)
        grid_frac = np.arange(0.15, 0.75, 0.1)
        for _ in range(3):
            n = int(rng.integers(12, 45))
            x = np.sort(rng.uniform(0, 1, n))
            y = np.sin(3 * x) + rng.normal(0, 0.05, n)
            xq = np.linspace(-0.05, 1.05, 13)
            for frac, degree in [(0.2, 1), (0.4, 2), (0.7, 1)]:
                ref = RefLOESS(frac=frac, degree=degree).fit(x, y).predict(xq)
                ours = LOESS(frac=frac, degree=degree).fit(x, y).predict(xq)
                np.testing.assert_allclose(ours, np.asarray(ref), atol=1e-7)
            ref = RefLOESS(frac=grid_frac, degree=[1, 2]).fit(x, y)
            ours = LOESS(frac=grid_frac, degree=[1, 2]).fit(x, y)
            assert (ours.best_frac, ours.best_degree) == (
                ref.best_frac,
                ref.best_degree,
            )


class TestPlot:
    def test_interpolate_and_render(self, tmp_path):
        rng = np.random.default_rng(2)
        rows = []
        for method, offset in [("QMF", 2.0), ("JPEG", 0.0)]:
            for img in ("a.png", "b.png"):
                for bpp in np.linspace(0.08, 0.45, 12):
                    rows.append(
                        {
                            "data": img,
                            "method": method,
                            "bit rate (bpp)": float(bpp + rng.normal(0, 0.003)),
                            "PSNR (dB)": float(20 + offset + 12 * bpp + rng.normal(0, 0.1)),
                        }
                    )
        import matplotlib

        matplotlib.use("Agg")
        plot = Plot(rows)
        out = plot.interpolate(
            x="bit rate (bpp)", y="PSNR (dB)", x_values=np.linspace(0.05, 0.5, 10)
        )
        assert "extrapolated" in out.columns
        plot.plot(x="bit rate (bpp)", y="PSNR (dB)", legend_labels=("QMF", "JPEG"))
        plot.save(save_dir=str(tmp_path), prefix="test")
        assert (tmp_path / "test_psnr.pdf").exists()
        # QMF curve should sit above JPEG on the interior grid
        interior = out[~out["extrapolated"]]
        qmf = interior[interior["method"] == "QMF"]["PSNR (dB)"].mean()
        jpeg = interior[interior["method"] == "JPEG"]["PSNR (dB)"].mean()
        assert qmf > jpeg

    def test_numeric_groupby_legend(self, tmp_path):
        # ablation plots group by numeric knobs (e.g. num_iters=0); the
        # legend match must survive matplotlib stringifying the labels
        rng = np.random.default_rng(3)
        rows = [
            {
                "data": "a.png",
                "num_iters": k,
                "bit rate (bpp)": float(bpp),
                "PSNR (dB)": float(20 + k + 10 * bpp + rng.normal(0, 0.05)),
            }
            for k in (0, 2, 10)
            for bpp in np.linspace(0.08, 0.45, 8)
        ]
        import matplotlib

        matplotlib.use("Agg")
        plot = Plot(rows)
        plot.interpolate(
            x="bit rate (bpp)",
            y="PSNR (dB)",
            groupby="num_iters",
            x_values=np.linspace(0.05, 0.5, 8),
        )
        plot.plot(x="bit rate (bpp)", y="PSNR (dB)", groupby="num_iters")
        plot.save(save_dir=str(tmp_path), prefix="ablation")
        assert (tmp_path / "ablation_psnr.pdf").exists()


class TestViz:
    def test_vis_helpers(self, kodim01, tmp_path):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        from lrf_tpu.utils.viz import minmax_normalize, vis_image, vis_image_batch

        img = kodim01[:, :32, :32]
        fig, _ = vis_image(img, save_dir=str(tmp_path), prefix="img", format="png")
        plt.close(fig)
        assert (tmp_path / "img.png").exists()
        maps = minmax_normalize(np.random.default_rng(0).normal(size=(4, 8, 8)))
        fig, _ = vis_image_batch(maps, multi_channels=False)
        plt.close(fig)

    def test_factor_map_inspection_flow(self, kodim01):
        # The notebook flow: encode, decode factors, reshape to maps.
        import lrf_tpu
        from lrf_tpu.models.container import decode_tensor, separate_bytes, bytes_to_dict

        img = kodim01[:, :64, :64]
        enc = lrf_tpu.qmf_encode(img, rank=(4, 2, 2))
        meta = bytes_to_dict(separate_bytes(enc, 2)[0])
        blobs = separate_bytes(separate_bytes(enc, 2)[1], 6)
        u_y = decode_tensor(blobs[0]).astype(np.float32)
        v_y = decode_tensor(blobs[1]).astype(np.float32)
        u_map, v_map = lrf_tpu.depatchify_uv(
            u_y, v_y, tuple(meta["padded size"][0]), tuple(meta["patch size"])
        )
        assert u_map.shape == (4, 1, 8, 8)
        assert v_map.shape == (4, 1, 8, 8)
