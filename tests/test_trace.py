"""Chrome-trace recorder (utils/trace.py): format unit tests + the
--trace CLI wire-through.  The recorder is the tunnel-safe profiling
artifact (jax.profiler XPlane hangs over the axon tunnel — CLAUDE.md);
the reference's analog is its ad-hoc wall-clock prints
(train.py:98-135)."""

import json
import time

import pytest

from tests.util_fakedata import make_deeprock_dataset


def test_trace_recorder_format(tmp_path):
    from tpu_superresolution_tpu.utils.trace import TraceRecorder

    rec = TraceRecorder()
    with rec.span("epoch 1", track="train", loss=0.5, skipme=None):
        time.sleep(0.01)
    rec.complete("val 1", rec.elapsed_s, 0.25, track="val", psnr=30.0)
    rec.counter("train_loss", 0.5)
    rec.instant("ckpt", track="train", path="best_X2")
    p = tmp_path / "trace.json"
    rec.save(str(p))

    doc = json.loads(p.read_text())
    evs = doc["traceEvents"]
    # thread_name metadata for each named track
    names = {e["args"]["name"] for e in evs if e["ph"] == "M"}
    assert {"train", "val"} <= names
    spans = [e for e in evs if e["ph"] == "X"]
    assert {e["name"] for e in spans} == {"epoch 1", "val 1"}
    ep = next(e for e in spans if e["name"] == "epoch 1")
    assert ep["dur"] >= 10_000  # us
    assert ep["args"] == {"loss": 0.5}  # None args dropped
    val = next(e for e in spans if e["name"] == "val 1")
    assert val["dur"] == pytest.approx(250_000)
    # tids are stable ints shared with the metadata rows
    assert isinstance(ep["tid"], int) and isinstance(val["tid"], int)
    cnt = next(e for e in evs if e["ph"] == "C")
    assert cnt["args"] == {"train_loss": 0.5}
    inst = next(e for e in evs if e["ph"] == "i")
    assert inst["args"]["path"] == "best_X2"


@pytest.mark.slow
def test_train_cli_trace_flag(tmp_path, capsys):
    root = tmp_path / "data"
    make_deeprock_dataset(root, hr_size=48, scale="X2", n_per_split=4)
    from tpu_superresolution_tpu.cli.train import main as train_main

    trace = tmp_path / "timeline.json"
    train_main([
        "--data_root", str(root), "--scale", "X2",
        "--model", "unet2d", "--base_channels", "4", "--depth", "1",
        "--epochs", "2", "--batch_size", "4", "--patch_size", "32",
        "--lr", "1e-3", "--workdir", str(tmp_path),
        "--trace", str(trace),
    ])
    out = capsys.readouterr().out
    assert "[trace] saved chrome-trace timeline" in out
    doc = json.loads(trace.read_text())
    spans = [e for e in doc["traceEvents"] if e["ph"] == "X"]
    assert {e["name"] for e in spans} >= {"epoch 1", "epoch 2", "val 1", "val 2"}
    ep1 = next(e for e in spans if e["name"] == "epoch 1")
    assert {"loss", "data_s_per_batch", "step_s_per_batch"} <= set(ep1["args"])
    assert any(e["ph"] == "C" and "val_psnr" in e["args"] for e in doc["traceEvents"])
