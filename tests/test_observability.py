"""WandB metric-key contract test (SURVEY.md section 5 key list).

Runs one tiny epoch of each phase with a stub wandb module and asserts
the exact keys the reference emits (srgan/trainer.py:311-319, :393-412,
:459-466, :520-526) plus the additive SSIM keys.
"""

from argparse import Namespace

import pytest

import torchsr_tpu.utils.logging as tlog
from torchsr_tpu.data.synthetic import (
    SyntheticEvalLoader,
    SyntheticTrainLoader,
)
from torchsr_tpu.parallel.mesh import DistributedContext, make_mesh
from torchsr_tpu.train.trainer import SRGANTrainer


class _WandbStub:
    def __init__(self):
        self.logged = []

    def init(self, **kwargs):
        return self

    def log(self, contents, step=None):
        self.logged.append((dict(contents), step))

    def finish(self):
        pass

    def Image(self, arr):  # noqa: N802 (wandb API name)
        return arr

    def __bool__(self):
        return True


@pytest.mark.slow
def test_metric_key_contract(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    stub = _WandbStub()
    monkeypatch.setattr(tlog, "wandb", stub)

    args = Namespace(
        batch_size=8, disable_amp=True, epochs=1, pretrain_epochs=1,
        gan_checkpoint=None, psnr_checkpoint=None, seed=0,
        skip_image_save=True, model="srgan", num_residual=1, vgg_convs=2,
    )
    tl = SyntheticTrainLoader(8, 32, n_batches=1)
    el = SyntheticEvalLoader(8, 32, n_batches=1)
    ctx = DistributedContext(1, -1, -1, 1, False)
    trainer = SRGANTrainer(
        args, tl, el, tl.dataset_len, el.dataset_len, make_mesh(), ctx
    )
    trainer.train()

    keys = set()
    for contents, _step in stub.logged:
        keys.update(contents.keys())

    # Reference contract (SURVEY.md section 5)
    expected = {
        "psnr/train-loss", "psnr/epoch", "psnr/throughput/train",
        "psnr/PSNR", "psnr/val-loss", "psnr/throughput/test",
        "gan/disc-lr", "gan/gen-lr", "gan/train-loss",
        "gan/throughput/train", "gan/epoch",
        "gan/PSNR", "gan/val-loss", "gan/throughput/test",
        # additive capability
        "psnr/SSIM", "gan/SSIM",
    }
    missing = expected - keys
    assert not missing, f"missing metric keys: {missing}"

    # per-step logging carried the reference's global step counter
    steps = [s for _c, s in stub.logged if s is not None]
    assert steps and all(isinstance(s, int) for s in steps)


def test_jsonl_logger_unit(tmp_path):
    """Logger --metrics-file sink: JSONL lines, config header, no wandb."""
    import json

    path = str(tmp_path / "metrics.jsonl")
    lg = tlog.Logger(True, config={"model": "srgan", "fn": len},
                     metrics_path=path)
    assert lg.wandb_active  # file sink alone must enable metric fetches
    lg.log_wandb({"psnr/train-loss": 0.5}, step=3)
    lg.log_wandb({"gan/PSNR": 21.0, "gan/epoch": 2}, step=7)
    lg.finish()

    lines = [json.loads(ln) for ln in open(path)]
    assert lines[0] == {"config": {"model": "srgan"}}  # non-JSON vals dropped
    assert lines[1] == {"step": 3, "psnr/train-loss": 0.5}
    assert lines[2] == {"step": 7, "gan/PSNR": 21.0, "gan/epoch": 2}

    # non-main process: no file writes at all
    lg2 = tlog.Logger(False, metrics_path=str(tmp_path / "other.jsonl"))
    assert not lg2.wandb_active
    lg2.log_wandb({"x": 1}, step=0)
    lg2.finish()
    assert not (tmp_path / "other.jsonl").exists()


@pytest.mark.slow
def test_metrics_file_contract(tmp_path, monkeypatch):
    """The JSONL sink carries the full WandB key contract through a real
    two-phase run (no wandb present), including per-step train losses."""
    import json

    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(tlog, "wandb", None)

    args = Namespace(
        batch_size=8, disable_amp=True, epochs=1, pretrain_epochs=1,
        gan_checkpoint=None, psnr_checkpoint=None, seed=0,
        skip_image_save=True, model="srgan", num_residual=1, vgg_convs=2,
        metrics_file="metrics.jsonl",
    )
    tl = SyntheticTrainLoader(8, 32, n_batches=1)
    el = SyntheticEvalLoader(8, 32, n_batches=1)
    ctx = DistributedContext(1, -1, -1, 1, False)
    trainer = SRGANTrainer(
        args, tl, el, tl.dataset_len, el.dataset_len, make_mesh(), ctx
    )
    trainer.train()

    lines = [json.loads(ln) for ln in open("metrics.jsonl")]
    assert lines[0]["config"]["model"] == "srgan"
    keys = set()
    for rec in lines[1:]:
        assert isinstance(rec.get("step"), int)
        keys.update(k for k in rec if k != "step")
    expected = {
        "psnr/train-loss", "psnr/epoch", "psnr/throughput/train",
        "psnr/PSNR", "psnr/val-loss", "psnr/throughput/test",
        "gan/disc-lr", "gan/gen-lr", "gan/train-loss",
        "gan/throughput/train", "gan/epoch",
        "gan/PSNR", "gan/val-loss", "gan/throughput/test",
        "psnr/SSIM", "gan/SSIM",
    }
    missing = expected - keys
    assert not missing, f"missing metric keys in JSONL: {missing}"


def test_metrics_summary_tool(tmp_path, capsys):
    """tools/metrics_summary.py parses, summarizes, and CSV-exports a
    --metrics-file JSONL."""
    import json
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    try:
        import metrics_summary
    finally:
        sys.path.pop(0)

    path = tmp_path / "m.jsonl"
    with open(path, "w") as fh:
        fh.write(json.dumps({"config": {"model": "esrgan", "seed": 1}}) + "\n")
        for step, loss, psnr in [(0, 0.9, None), (1, 0.5, None),
                                 (2, 0.3, 21.5), (3, 0.2, 23.0)]:
            rec = {"step": step, "psnr/train-loss": loss}
            if psnr is not None:
                rec["psnr/PSNR"] = psnr
            fh.write(json.dumps(rec) + "\n")

    config, records = metrics_summary.load_records(str(path))
    assert config == {"model": "esrgan", "seed": 1}
    assert len(records) == 4

    stats = metrics_summary.summarize(records)
    s = stats["psnr/train-loss"]
    assert (s["count"], s["first"], s["last"]) == (4, 0.9, 0.2)
    assert (s["min"], s["max"], s["argmax_step"]) == (0.2, 0.9, 0)
    assert stats["psnr/PSNR"]["argmax_step"] == 3

    csv_path = tmp_path / "m.csv"
    rc = metrics_summary.main([str(path), "--csv", str(csv_path)])
    assert rc == 0
    lines = csv_path.read_text().splitlines()
    assert lines[0] == "step,psnr/PSNR,psnr/train-loss"
    assert lines[1] == "0,,0.9"
    assert lines[-1] == "3,23.0,0.2"
    out = capsys.readouterr().out
    assert "psnr/PSNR" in out and '"model": "esrgan"' in out

    # empty file -> error exit
    empty = tmp_path / "e.jsonl"
    empty.write_text("")
    assert metrics_summary.main([str(empty)]) == 1
