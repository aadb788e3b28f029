"""Test configuration: force JAX onto a virtual 8-device CPU mesh so the
multi-chip sharding paths are exercised without TPU hardware."""

import os

# Force CPU even when a TPU platform is configured in the environment:
# the multi-device sharding tests need the virtual 8-device CPU mesh.
# (sitecustomize may import jax before this file runs, so setting the env
# var alone is not enough — update the live config too.)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("BSMAP_TPU_DEV_BATCH", "2048")
os.environ.setdefault("BSMAP_TPU_CANDS_PER_READ", "16")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import sys as _sys

if "jax" in _sys.modules:
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")

import pathlib
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
REF_BUILD = pathlib.Path("/tmp/bsmap_ref/bsmap")


@pytest.fixture(scope="session")
def reference_binary():
    """The compiled reference BSMAP binary (built out-of-repo in /tmp) for
    golden-output comparisons.  Skips golden tests when unavailable."""
    if REF_BUILD.exists():
        return str(REF_BUILD)
    pytest.skip("reference bsmap binary not built at /tmp/bsmap_ref")


@pytest.fixture(scope="session")
def tmp_data(tmp_path_factory):
    return tmp_path_factory.mktemp("data")


def simulate(out_dir, **kw):
    """Run tools/simulate.py with kwargs."""
    args = [sys.executable, str(REPO / "tools" / "simulate.py")]
    for k, v in kw.items():
        flag = "--" + k.replace("_", "-")
        if isinstance(v, bool):
            if v:
                args.append(flag)
        else:
            args.extend([flag, str(v)])
    subprocess.run(args, check=True, cwd=out_dir)
