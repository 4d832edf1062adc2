"""torchsr doctor: environment diagnostics report."""

import json

from torchsr_tpu.cli import main
from torchsr_tpu.utils.doctor import collect_report


def test_collect_report_structure(image_dir):
    report = collect_report(train_dir=image_dir, device_check=True)
    assert report["versions"]["torchsr_tpu"]
    assert report["runtime"]["backend"] == "cpu"  # conftest forces CPU
    assert report["device_sanity"]["ok"] is True
    assert report["dataset"]["train_images"] > 0
    assert report["dataset"]["val_images"] > 0
    assert "compile_cache" in report and "env_knobs" in report


def test_collect_report_bad_dataset(tmp_path):
    report = collect_report(
        train_dir=str(tmp_path / "nope"), device_check=False
    )
    assert "error" in report["dataset"]
    assert "device_sanity" not in report


def test_checkpoint_inspection(tmp_path):
    import jax
    import jax.numpy as jnp
    import torch

    from torchsr_tpu.models import ESRGANGenerator
    from torchsr_tpu.models.torch_compat import export_esrgan_generator

    gen = ESRGANGenerator(num_rrdb_blocks=2, fused_rdb=False)
    v = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)),
                 train=False)
    path = tmp_path / "esrgan.pth"
    torch.save(
        {"epoch": 3, "phase": "esrgan-gan",
         "state": export_esrgan_generator(v)},
        path,
    )
    info = collect_report(
        checkpoint=str(path), device_check=False
    )["checkpoint"]
    assert info["detected_blocks"] == 2
    assert info["detected_scale"] == 4
    assert info["epoch"] == 3
    assert info["format"].startswith("torch")
    assert info["generator_params"] > 0


def test_checkpoint_inspection_missing_file(tmp_path):
    info = collect_report(
        checkpoint=str(tmp_path / "nope.ckpt"), device_check=False
    )["checkpoint"]
    assert info["error"] == "file not found"


def test_cli_doctor_json(capsys, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    main(["doctor", "--json", "--no-device-check"])
    out = capsys.readouterr().out
    report = json.loads(out)
    assert report["runtime"]["backend"] == "cpu"
    assert report["cwd_checkpoints"]  # the "none" placeholder line


def test_cli_doctor_text_verdict(capsys, monkeypatch, tmp_path):
    monkeypatch.chdir(tmp_path)
    main(["doctor"])
    out = capsys.readouterr().out
    assert "torchsr-tpu doctor" in out
    assert "verdict: OK" in out
