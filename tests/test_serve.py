"""Inference server (cli/serve.py): POST an encoded image, get the
super-resolved PNG back; health endpoint reports the loaded model."""

import io
import json
import threading
import urllib.request

import numpy as np
import pytest
from PIL import Image

from tests.util_fakedata import make_deeprock_dataset


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("serve")
    root = tmp / "data"
    make_deeprock_dataset(root, hr_size=48, scale="X2", n_per_split=6)
    from tpu_superresolution_tpu.cli.train import main as train_main

    train_main([
        "--data_root", str(root), "--scale", "X2",
        "--model", "unet2d", "--base_channels", "4", "--depth", "1",
        "--epochs", "1", "--batch_size", "4", "--patch_size", "32",
        "--workdir", str(tmp),
    ])
    return str(tmp / "best_X2")


@pytest.fixture()
def server(ckpt):
    from tpu_superresolution_tpu.cli.serve import SRService, make_server

    service = SRService(ckpt, "unet2d", None, None, -1, 4, 2)
    srv = make_server(service, "127.0.0.1", 0)
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    try:
        yield f"http://127.0.0.1:{srv.server_address[1]}", service
    finally:
        srv.shutdown()
        srv.server_close()


def _png_bytes(arr):
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


def test_serve_upscale_and_health(server):
    base, service = server
    rng = np.random.default_rng(0)
    body = _png_bytes((rng.random((20, 24)) * 255).astype(np.uint8))

    req = urllib.request.Request(f"{base}/upscale", data=body, method="POST")
    with urllib.request.urlopen(req, timeout=120) as resp:
        assert resp.status == 200
        meta = json.loads(resp.headers["X-SR-Meta"])
        out = resp.read()
    assert meta["out_shape"] == [40, 48]
    with Image.open(io.BytesIO(out)) as sr:
        assert sr.size == (48, 40)

    # same shape again: served from the compiled cache
    with urllib.request.urlopen(req, timeout=120) as resp:
        assert resp.status == 200

    with urllib.request.urlopen(f"{base}/healthz", timeout=30) as resp:
        health = json.loads(resp.read())
    assert health["model"] == "unet2d"
    assert health["scale"] == 2
    assert health["served"] == 2


def test_serve_tile_override_and_errors(server):
    base, service = server
    rng = np.random.default_rng(1)
    body = _png_bytes((rng.random((24, 24)) * 255).astype(np.uint8))

    req = urllib.request.Request(
        f"{base}/upscale?tile=16&overlap=4", data=body, method="POST"
    )
    with urllib.request.urlopen(req, timeout=120) as resp:
        meta = json.loads(resp.headers["X-SR-Meta"])
    assert meta["tile"] == 16

    bad = urllib.request.Request(
        f"{base}/upscale", data=b"not an image", method="POST"
    )
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(bad, timeout=30)
    assert ei.value.code == 400

    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(f"{base}/nope", timeout=30)
    assert ei.value.code == 404


def test_serve_rejects_hostile_tiling(server):
    """Client tile/overlap outside the allowlisted bounds (or an
    overlap >= tile stride-1 grid) is a 400, not a chip-holding
    compile; the forward cache stays bounded."""
    base, service = server
    rng = np.random.default_rng(2)
    body = _png_bytes((rng.random((24, 24)) * 255).astype(np.uint8))

    for query in ("tile=7", "tile=4096", "overlap=999", "tile=16&overlap=16"):
        req = urllib.request.Request(
            f"{base}/upscale?{query}", data=body, method="POST"
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 400, query

    assert service._fwd_cache.max_entries <= 8


def test_forward_cache_fifo_eviction(server):
    """ForwardCache is FIFO-bounded: novel (tile, overlap) configs
    beyond max_entries evict the oldest compiled closure instead of
    growing without bound (serve's ?tile=N is client-controlled)."""
    _, service = server
    cache = service._fwd_cache
    cache._cache.clear()
    first = (16, 0)
    cache.get(*first)
    for t in range(17, 17 + cache.max_entries):
        cache.get(t, 0)
    assert len(cache._cache) == cache.max_entries
    assert first not in cache._cache  # oldest evicted
    assert (17 + cache.max_entries - 1, 0) in cache._cache
