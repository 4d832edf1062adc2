"""Packaging smoke test: offline pip install + the console script.

The reference's documented UX is the installed ``torchsr`` entrypoint
(reference setup.py:39-41); this pins that ``pip install .`` of this
repo produces a working console script and a complete package tree.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_pip_install_and_console_script(tmp_path):
    target = str(tmp_path / "site")
    r = subprocess.run(
        [sys.executable, "-m", "pip", "install",
         "--no-build-isolation", "--no-deps", "--quiet",
         "--target", target, REPO],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr

    # full package tree installed
    for sub in ("models", "ops", "train", "data", "parallel", "utils",
                "infer"):
        assert os.path.isdir(
            os.path.join(target, "torchsr_tpu", sub)
        ), sub

    script = os.path.join(target, "bin", "torchsr")
    assert os.path.exists(script)
    env = {
        **os.environ,
        "PYTHONPATH": target + os.pathsep
        + os.environ.get("PYTHONPATH", ""),
        "JAX_PLATFORMS": "cpu",
    }
    out = subprocess.run(
        [sys.executable, script, "--help"],
        capture_output=True, text=True, env=env, cwd=str(tmp_path),
    )
    assert out.returncode == 0, out.stderr
    assert "train" in out.stdout and "test" in out.stdout
