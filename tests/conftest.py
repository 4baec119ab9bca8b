"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The standard JAX fake-cluster technique: force the host platform and split it
into 8 virtual devices so sharding/collective code paths are exercised
without TPU hardware (SURVEY.md §4). Must run before jax is imported.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon TPU plugin in this image force-prepends itself to jax_platforms
# regardless of JAX_PLATFORMS; override the config directly so tests run on
# the virtual 8-device CPU mesh, never the (slow, single-chip) tunnel.
# `LRF_TPU_TESTS_TPU=1` keeps the real TPU instead, enabling the
# compiled-(non-interpret-)mode kernel tests (run those alone — the chip is
# single-client and every first compile pays the tunnel).
import jax

if not os.environ.get("LRF_TPU_TESTS_TPU"):
    jax.config.update("jax_platforms", "cpu")

import types

import numpy as np
import pytest


REFERENCE_PATH = "/root/reference"


def _install_reference_stubs():
    """Stub out the reference's unavailable deps (skimage, pyinstrument).

    The reference package star-imports everything from `lrf/__init__.py`,
    pulling in skimage/pyinstrument/seaborn-based modules we never call in
    parity tests. Provide minimal fakes so `import lrf` succeeds.
    """
    if "skimage" not in sys.modules:
        skimage = types.ModuleType("skimage")
        metrics = types.ModuleType("skimage.metrics")
        io_mod = types.ModuleType("skimage.io")

        def structural_similarity(*a, **k):  # pragma: no cover
            raise RuntimeError("skimage stub: not available in test env")

        def imread(path, *a, **k):
            from PIL import Image

            return np.asarray(Image.open(path))

        metrics.structural_similarity = structural_similarity
        io_mod.imread = imread
        skimage.metrics = metrics
        skimage.io = io_mod
        sys.modules["skimage"] = skimage
        sys.modules["skimage.metrics"] = metrics
        sys.modules["skimage.io"] = io_mod

    if "torchvision" not in sys.modules:
        import torch
        from PIL import Image as PILImage

        tv = types.ModuleType("torchvision")
        tvt = types.ModuleType("torchvision.transforms")
        tvf = types.ModuleType("torchvision.transforms.functional")
        tv2 = types.ModuleType("torchvision.transforms.v2")
        tv2f = types.ModuleType("torchvision.transforms.v2.functional")

        def to_pil_image(t):
            return PILImage.fromarray(t.numpy().transpose(1, 2, 0))

        def pil_to_tensor(p):
            return torch.tensor(np.asarray(p).transpose(2, 0, 1))

        def to_dtype(t, dtype=None, scale=False):
            if scale and dtype == torch.float32:
                return t.float() / 255.0
            if scale and dtype == torch.uint8:
                return (t * 255.0).round().clamp(0, 255).to(dtype)
            return t.to(dtype)

        tvf.to_pil_image = to_pil_image
        tvf.pil_to_tensor = pil_to_tensor
        tv2f.to_dtype = to_dtype
        tvt.functional = tvf
        tvt.v2 = tv2
        tv2.functional = tv2f
        tv.transforms = tvt
        sys.modules.update(
            {
                "torchvision": tv,
                "torchvision.transforms": tvt,
                "torchvision.transforms.functional": tvf,
                "torchvision.transforms.v2": tv2,
                "torchvision.transforms.v2.functional": tv2f,
            }
        )

    if "pyinstrument" not in sys.modules:
        pyinstrument = types.ModuleType("pyinstrument")

        class Profiler:  # pragma: no cover
            def start(self):
                import time

                self._t0 = time.perf_counter()

            def stop(self):
                import time

                dur = time.perf_counter() - self._t0
                self.last_session = types.SimpleNamespace(duration=dur)

        pyinstrument.Profiler = Profiler
        sys.modules["pyinstrument"] = pyinstrument


@pytest.fixture(scope="session")
def ref_lrf():
    """The reference pashtari/lrf package as a parity oracle (torch CPU)."""
    _install_reference_stubs()
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    lrf = pytest.importorskip("lrf")
    return lrf


@pytest.fixture(scope="session")
def kodim01():
    """kodim01 test image as (3, H, W) uint8 numpy (from the reference repo)."""
    from PIL import Image

    img = Image.open(os.path.join(REFERENCE_PATH, "figures", "kodim01.png"))
    return np.asarray(img.convert("RGB")).transpose(2, 0, 1)
