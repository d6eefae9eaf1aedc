"""Hardware-only checks that must run on a real TPU.

The suite's conftest forces every test process onto the virtual CPU mesh,
so these tests shell out to a subprocess with the *raw* environment (where
the axon sitecustomize registers the TPU backend) and skip when no TPU is
reachable. They exist because `cc_impl="auto"` makes the compiled Mosaic
kernel the default decode path on TPU at the full 32x1801 width — a code
path the CPU suite only ever exercises in interpret mode on small masks.
"""

import os
import subprocess
import sys

import pytest

_PROBE = (
    "import jax; "
    "print('TPU' if jax.default_backend() == 'tpu' else 'NO')"
)


def _raw_env():
    env = dict(os.environ)
    # undo the conftest's CPU forcing for the child
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    )
    env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")
    return env


def _tpu_available():
    try:
        out = subprocess.run(
            [sys.executable, "-c", _PROBE], env=_raw_env(),
            capture_output=True, text=True, timeout=120,
        )
        return out.stdout.strip().endswith("TPU")
    except (OSError, subprocess.TimeoutExpired):
        return False


_CHECK = """
import numpy as np
import jax, jax.numpy as jnp
from tpufusion.ops.components import connected_components_with_bbox
assert jax.default_backend() == "tpu"
rng = np.random.default_rng(7)
# full production width, mixed densities incl. a wide blob spanning the
# azimuth wrap (the Pallas kernel's pltpu.roll path)
for density in (0.0, 0.05, 0.4):
    mask = rng.random((32, 1801)) < density
    mask[10:20, 1700:] = True
    mask[10:20, :100] = True
    m = jnp.asarray(mask)
    a = connected_components_with_bbox(m, 2048, "xla")
    b = connected_components_with_bbox(m, 2048, "pallas")
    assert np.array_equal(np.asarray(a[0]), np.asarray(b[0])), density
    for x, y in zip(a[1:], b[1:]):
        assert np.array_equal(np.asarray(x)[mask], np.asarray(y)[mask]), density
print("PALLAS_CC_OK")
"""


@pytest.mark.tpu
@pytest.mark.slow
def test_pallas_cc_full_width_on_tpu():
    """Compiled Mosaic CC kernel vs XLA sweeps at the full 32x1801 range-view
    shape, on hardware (covers pltpu.roll wrap behavior and the 64 MB VMEM
    limit the kernel requests — ops/pallas_cc.py).

    ~10 min wall (remote TPU compiles), so it only runs when
    TPUFUSION_TPU_TESTS=1 — set it for hardware verification sessions.
    Last verified green on TPU v5e: 2026-08-17 (round 3)."""
    if not os.environ.get("TPUFUSION_TPU_TESTS"):
        pytest.skip("set TPUFUSION_TPU_TESTS=1 to run hardware tests")
    if not _tpu_available():
        pytest.skip("no TPU backend reachable")
    out = subprocess.run(
        [sys.executable, "-c", _CHECK], env=_raw_env(),
        capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "PALLAS_CC_OK" in out.stdout


_PROJ_CHECK = """
import numpy as np
import jax, jax.numpy as jnp
from tpufusion.config import RangeViewSpec
from tpufusion.geometry.range_view import range_view_project_batch
assert jax.default_backend() == "tpu"
spec = RangeViewSpec()
rng = np.random.default_rng(3)
pts = (rng.standard_normal((4, 8192, 4)) * 20).astype(np.float32)
pts[:, 4096:4608] = pts[:, :512]  # exact-key collision ties
pts[0, 5] = np.nan
valid = rng.random((4, 8192)) > 0.1
a = range_view_project_batch(jnp.asarray(pts), spec, jnp.asarray(valid), "exact")
b = range_view_project_batch(jnp.asarray(pts), spec, jnp.asarray(valid), "pallas")
assert np.array_equal(np.asarray(a), np.asarray(b))
print("PALLAS_PROJ_OK")
"""


@pytest.mark.tpu
@pytest.mark.slow
def test_pallas_projection_on_tpu():
    """Compiled Mosaic scatter-min projection (method="pallas",
    ops/pallas_projection.py) vs the exact 2-key sort on hardware —
    covers the SMEM point-stream blocks and dynamic scalar VMEM
    read-modify-writes the CPU suite only exercises in interpret mode.

    Runs only with TPUFUSION_TPU_TESTS=1 (remote compiles)."""
    if not os.environ.get("TPUFUSION_TPU_TESTS"):
        pytest.skip("set TPUFUSION_TPU_TESTS=1 to run hardware tests")
    if not _tpu_available():
        pytest.skip("no TPU backend reachable")
    out = subprocess.run(
        [sys.executable, "-c", _PROJ_CHECK], env=_raw_env(),
        capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "PALLAS_PROJ_OK" in out.stdout
