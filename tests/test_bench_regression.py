"""The bench-regression gate's parsing/threshold logic (no TPU needed)."""

import pathlib
import subprocess
import sys

from tools.bench_regression import parse_metrics

REPO = str(pathlib.Path(__file__).resolve().parents[1])


def test_parse_metrics_picks_json_lines():
    text = (
        "noise line\n"
        '{"metric": "a", "value": 10.5, "unit": "u", "vs_baseline": 2}\n'
        "bench: stderr-ish chatter {not json}\n"
        '{"metric": "b", "value": 3, "unit": "u", "vs_baseline": 1}\n'
    )
    assert parse_metrics(text) == {"a": 10.5, "b": 3}


def test_gate_pass_and_fail(tmp_path):
    import json

    with open(f"{REPO}/tools/bench_expectations.json") as f:
        floors = json.load(f)
    out = tmp_path / "bench.txt"
    out.write_text("".join(
        json.dumps({"metric": name, "value": spec["min"] * 1.2}) + "\n"
        for name, spec in floors.items()
    ))
    r = subprocess.run(
        [sys.executable, "tools/bench_regression.py", "--check", str(out)],
        capture_output=True, text=True, cwd=REPO,
    )
    assert r.returncode == 0, r.stdout + r.stderr

    out.write_text(
        '{"metric": "srgan_train_crops_per_sec_per_chip", "value": 100}\n'
    )
    r = subprocess.run(
        [sys.executable, "tools/bench_regression.py", "--check", str(out)],
        capture_output=True, text=True, cwd=REPO,
    )
    assert r.returncode == 1
    assert "REGRESSION" in r.stdout and "MISSING" in r.stdout
