"""HTTP caption server (openviic_tpu/server.py): endpoints, batching,
error paths."""

import io
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest
from PIL import Image

from tests.test_trainer import full_config


@pytest.fixture(scope="module")
def server(tmp_path_factory, tiny_dataset_dir):
    from openviic_tpu.builders import build_trainer
    from openviic_tpu.server import CaptionServer
    from openviic_tpu.serving import CaptioningPipeline

    tmp = tmp_path_factory.mktemp("server")
    cfg = full_config(
        tmp, tiny_dataset_dir, architecture="StandardTransformerUsingGrid",
        d_feature=11,
    )
    tr = build_trainer(cfg)
    tr.start(max_epochs=1)
    pipeline = CaptioningPipeline(cfg, batch_size=4, use_bf16=False)
    srv = CaptionServer(pipeline, port=0, max_batch=4, max_wait_ms=30.0,
                        backbone="patch", grid=3)
    srv.start()
    yield srv
    srv.stop()


def _post(port, path, body):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=body, method="POST"
    )
    with urllib.request.urlopen(req, timeout=120) as resp:
        return json.loads(resp.read())


def _image_bytes(seed=0):
    arr = np.random.default_rng(seed).integers(
        0, 255, size=(24, 24, 3), dtype=np.uint8
    )
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


def test_healthz(server):
    with urllib.request.urlopen(
        f"http://127.0.0.1:{server.port}/healthz", timeout=30
    ) as resp:
        data = json.loads(resp.read())
    assert data["status"] == "ok"


def test_caption_image(server):
    data = _post(server.port, "/caption", _image_bytes())
    assert isinstance(data["caption"], str)
    # deterministic across repeat requests
    again = _post(server.port, "/caption", _image_bytes())
    assert again["caption"] == data["caption"]


def test_caption_features(server):
    rng = np.random.default_rng(1)
    payload = {
        "grid_features": rng.normal(size=(9, 11)).astype(np.float32),
        "grid_boxes": np.tile(
            np.asarray([[0.1, 0.1, 0.4, 0.4]], np.float32), (9, 1)
        ),
    }
    buf = io.BytesIO()
    np.savez(buf, **payload)
    data = _post(server.port, "/caption_features", buf.getvalue())
    assert isinstance(data["caption"], str)


def test_pickled_payload_rejected(server):
    # the old np.save(dict) wire format required unpickling on the server
    # (remote code execution from a network peer); it must now be a 400
    payload = {"grid_features": np.zeros((4, 11), np.float32)}
    buf = io.BytesIO()
    np.save(buf, payload, allow_pickle=True)
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server.port, "/caption_features", buf.getvalue())
    assert e.value.code == 400


def test_concurrent_requests_batched(server):
    results = {}

    def worker(i):
        results[i] = _post(server.port, "/caption", _image_bytes(seed=i))

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=180)
    assert len(results) == 6
    assert all(isinstance(r["caption"], str) for r in results.values())
    # same image -> same caption regardless of batch composition
    solo = _post(server.port, "/caption", _image_bytes(seed=3))
    assert solo["caption"] == results[3]["caption"]


def test_bad_payload_is_400(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server.port, "/caption_features", b"not-an-npy")
    assert e.value.code == 400

    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server.port, "/nope", b"")
    assert e.value.code == 404
