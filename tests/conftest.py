"""Test configuration.

Tests run on a virtual 8-device CPU mesh (multi-chip sharding is validated
without TPU hardware; the driver separately dry-runs the multichip path and
benches on a real chip).
"""

import os
import subprocess
import sys
from pathlib import Path

# Must be set before jax backend init. NOTE: this image force-registers the
# "axon" TPU platform via a config hook that overrides JAX_PLATFORMS, so we
# pin the platform through jax.config directly.
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

from x264dsp_tpu.utils.jaxcache import ensure_compile_cache  # noqa: E402

if os.environ.get("X264_TEST_ON_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
    # NO persistent compile cache on the CPU suite: XLA:CPU executable
    # serialization segfaults sporadically while writing cache entries
    # for the largest programs (jax compilation_cache.put_executable_and
    # _time -> LoadedExecutable.serialize), which kills the xdist worker
    # and fails whatever test was running (the r4 "slices flake" shape;
    # r5 reproduced it in test_row_vbv with a faulthandler trace). The
    # cpu_aot_loader feature-mismatch warnings on reads point the same
    # way. Determinism beats compile reuse here; the TPU bench/dryrun
    # paths keep the cache (remote compiles are the long pole there).
    jax.config.update("jax_compilation_cache_dir", None)
else:
    ensure_compile_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REPO = Path(__file__).resolve().parent.parent
ORACLE_DIR = Path(os.environ.get("X264_ORACLE_DIR", "/tmp/x264ref"))


@pytest.fixture(scope="session")
def oracle():
    """Path to the compiled reference encoder binary (built once;
    flock-guarded so parallel xdist workers don't race the build)."""
    import fcntl
    binary = ORACLE_DIR / "x264ref"
    ref = Path(os.environ.get("REFERENCE_DIR", "/root/reference"))
    if not ref.exists():
        pytest.skip("reference sources not available")
    if not binary.exists():
        ORACLE_DIR.mkdir(parents=True, exist_ok=True)
        with open(ORACLE_DIR / ".build.lock", "w") as lk:
            fcntl.flock(lk, fcntl.LOCK_EX)
            if not binary.exists():
                subprocess.run(
                    [str(REPO / "tools" / "build_reference_oracle.sh"),
                     str(ORACLE_DIR)],
                    check=True, capture_output=True)
    return binary


def make_clip(width, height, n_frames, seed=42, motion=True):
    """Synthetic test clip: smooth gradients + noise + translating pattern."""
    rng = np.random.default_rng(seed)
    frames = []
    yy, xx = np.mgrid[0:height, 0:width]
    cyy, cxx = np.mgrid[0:height // 2, 0:width // 2]
    for t in range(n_frames):
        dx = 2 * t if motion else 0
        y = (128 + 50 * np.sin((xx + dx) / 17.0 + t * 0.1) * np.cos(yy / 23.0)
             + rng.normal(0, 5, (height, width))).clip(0, 255).astype(np.uint8)
        u = (128 + 40 * np.sin((cxx + dx // 2) / 29.0)).clip(0, 255).astype(np.uint8)
        v = (128 + 40 * np.cos(cyy / 31.0 - t * 0.15)).clip(0, 255).astype(np.uint8)
        frames.append((y, u, v))
    return frames


@pytest.fixture(scope="session")
def qcif_clip():
    return make_clip(176, 144, 5)


@pytest.fixture(scope="session")
def qcif_yuv(tmp_path_factory, qcif_clip):
    """QCIF clip written to disk with the WxH filename convention."""
    from x264dsp_tpu.utils.yuv import write_yuv
    path = tmp_path_factory.mktemp("clips") / "176x144.yuv"
    write_yuv(str(path), qcif_clip)
    return path
