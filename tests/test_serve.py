"""HTTP serving endpoint: request/response contract over a live socket."""

import base64
import http.client
import io
import json
import threading

import numpy as np
import pytest
from PIL import Image


@pytest.fixture(scope="module")
def server():
    import jax

    from incremental_multimodal_medical_learning_ii_tpu.cli.serve import make_server
    from incremental_multimodal_medical_learning_ii_tpu.inference import ChexpertClassifier
    from incremental_multimodal_medical_learning_ii_tpu.models.biovil_image import (
        init_biovil_image_model,
    )
    from incremental_multimodal_medical_learning_ii_tpu.text.bank import (
        build_prompt_bank,
        synthetic_encode_fn,
    )
    from incremental_multimodal_medical_learning_ii_tpu.text.prompts import create_prompts
    from incremental_multimodal_medical_learning_ii_tpu.utils.config import (
        CHEXPERT_COMPETITION_TASKS,
    )

    import jax.numpy as jnp

    clf = ChexpertClassifier(
        init_biovil_image_model(jax.random.PRNGKey(0)),
        build_prompt_bank(
            synthetic_encode_fn(), create_prompts(CHEXPERT_COMPETITION_TASKS),
            CHEXPERT_COMPETITION_TASKS,
        ),
        batch_size=2, size=64, pad_to=128, dtype=jnp.float32,
    )
    srv = make_server(clf, "127.0.0.1", 0)  # ephemeral port
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv, clf
    srv.shutdown()
    srv.server_close()


@pytest.fixture(scope="module")
def server_mb(server):
    """Micro-batching variant sharing the module's classifier (same jit)."""
    from incremental_multimodal_medical_learning_ii_tpu.cli.serve import make_server

    _, clf = server
    srv = make_server(clf, "127.0.0.1", 0, microbatch_s=0.02)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv, clf
    srv.shutdown()
    srv.server_close()


def _png_bytes(rng, h=70, w=60):
    buf = io.BytesIO()
    Image.fromarray((rng.random((h, w)) * 255).astype(np.uint8), "L").save(buf, "PNG")
    return buf.getvalue()


def _request(srv, method, path, body=None, ctype=None):
    conn = http.client.HTTPConnection("127.0.0.1", srv.server_address[1], timeout=60)
    headers = {"Content-Type": ctype} if ctype else {}
    conn.request(method, path, body=body, headers=headers)
    resp = conn.getresponse()
    payload = json.loads(resp.read())
    conn.close()
    return resp.status, payload


def test_healthz(server):
    srv, _ = server
    status, payload = _request(srv, "GET", "/healthz")
    assert status == 200
    assert payload["status"] == "ok"
    assert payload["classes"][0] == "Atelectasis"


def test_classify_single_image_bytes(server, rng):
    srv, clf = server
    png = _png_bytes(rng)
    status, payload = _request(srv, "POST", "/classify", body=png, ctype="image/png")
    assert status == 200
    assert len(payload["scores"]) == 1 and len(payload["scores"][0]) == 5
    # response matches the classifier called directly on the decoded image
    img = np.asarray(Image.open(io.BytesIO(png)))
    scores, preds = clf.predict_arrays([img])
    np.testing.assert_allclose(payload["scores"][0], scores[0], atol=1e-5)
    assert payload["preds"][0] == [int(v) for v in preds[0]]


def test_classify_json_batch(server, rng):
    srv, clf = server
    pngs = [_png_bytes(rng), _png_bytes(rng, h=80, w=50)]
    body = json.dumps({"images_b64": [base64.b64encode(p).decode() for p in pngs]})
    status, payload = _request(srv, "POST", "/classify", body=body,
                               ctype="application/json")
    assert status == 200
    assert len(payload["scores"]) == 2
    imgs = [np.asarray(Image.open(io.BytesIO(p))) for p in pngs]
    scores, _ = clf.predict_arrays(imgs)
    np.testing.assert_allclose(payload["scores"], scores, atol=1e-5)


def test_error_paths(server):
    srv, _ = server
    status, payload = _request(srv, "POST", "/classify", body=b"not an image",
                               ctype="image/png")
    assert status == 400 and "error" in payload
    status, payload = _request(srv, "POST", "/classify", body=b"")
    assert status == 400
    status, payload = _request(srv, "POST", "/classify",
                               body=json.dumps({"images_b64": []}),
                               ctype="application/json")
    assert status == 400 and "images_b64" in payload["error"]
    status, _ = _request(srv, "GET", "/nope")
    assert status == 404
    status, _ = _request(srv, "POST", "/nope")
    assert status == 404


class _CountingClassifier:
    """predict_arrays stub: scores = per-image checksum so slicing bugs show."""

    batch_size = 64
    class_names = ["a", "b", "c", "d", "e"]

    def __init__(self):
        self.calls = 0

    def predict_arrays(self, images):
        self.calls += 1
        scores = np.stack([np.full(5, float(im.sum() % 97)) for im in images])
        return scores, (scores > 48).astype(np.int32)


def test_microbatcher_coalesces_and_slices(rng):
    from incremental_multimodal_medical_learning_ii_tpu.cli.serve import MicroBatcher

    clf = _CountingClassifier()
    # generous window: the coalescing ASSERTION below needs every request to
    # enqueue within it even under 1-vCPU scheduler stalls between thread
    # start-ups (50 ms flaked when the host was loaded)
    mb = MicroBatcher(clf, max_delay_s=0.5)
    imgs = [(rng.random((8, 8)) * 255).astype(np.uint8) for _ in range(6)]

    results = {}

    def worker(i):
        scores, preds = mb.predict([imgs[i]])
        results[i] = scores[0]

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for i in range(6):
        assert results[i][0] == float(imgs[i].sum() % 97), f"wrong slice for req {i}"
    # 6 concurrent single-image requests coalesced into far fewer dispatches
    assert clf.calls < 6
    assert mb.dispatches == clf.calls


def test_microbatcher_propagates_errors():
    from incremental_multimodal_medical_learning_ii_tpu.cli.serve import MicroBatcher

    class Broken:
        batch_size = 8
        class_names = ["a"]

        def predict_arrays(self, images):
            raise RuntimeError("device gone")

    mb = MicroBatcher(Broken(), max_delay_s=0.01)
    with pytest.raises(RuntimeError, match="device gone"):
        mb.predict([np.zeros((4, 4), np.uint8)])


def test_server_with_microbatching(server_mb, rng):
    srv, clf = server_mb
    pngs = [_png_bytes(rng, h=60 + i, w=50) for i in range(4)]

    out = {}

    def worker(i):
        out[i] = _request(srv, "POST", "/classify", body=pngs[i], ctype="image/png")

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for i in range(4):
        status, payload = out[i]
        assert status == 200
        img = np.asarray(Image.open(io.BytesIO(pngs[i])))
        scores, _ = clf.predict_arrays([img])
        np.testing.assert_allclose(payload["scores"][0], scores[0], atol=1e-4)


def test_oversized_image_is_client_error(server, rng):
    """An image exceeding pad_to must be ITS request's 400 at decode time —
    never a 500, and never broadcast to a coalesced micro-batch."""
    srv, clf = server
    too_big = _png_bytes(rng, h=clf.plan.pad_to + 8, w=40)
    status, payload = _request(srv, "POST", "/classify", body=too_big, ctype="image/png")
    assert status == 400
    assert "exceeds pad_to" in payload["error"]


def test_extreme_aspect_ratio_is_client_error(server, rng):
    """A 1xW strip would demand a size*W-wide resize target (multi-GB
    matrix) — must be a 400 for its own request, not an OOM/stall."""
    srv, _ = server
    strip = _png_bytes(rng, h=4, w=100)  # within pad_to, ratio 25:1
    status, payload = _request(srv, "POST", "/classify", body=strip, ctype="image/png")
    assert status == 400
    assert "aspect ratio" in payload["error"]


def test_huge_content_length_rejected_before_buffering(server):
    srv, _ = server
    conn = http.client.HTTPConnection("127.0.0.1", srv.server_address[1], timeout=60)
    conn.putrequest("POST", "/classify")
    conn.putheader("Content-Type", "application/octet-stream")
    conn.putheader("Content-Length", str(10**10))  # claims 10 GB
    conn.endheaders()
    # send nothing further: the server must answer 413 without reading the body
    resp = conn.getresponse()
    payload = json.loads(resp.read())
    conn.close()
    assert resp.status == 413
    assert "exceeds" in payload["error"]


def test_stalled_header_client_is_disconnected(server):
    """A client that opens a connection and never finishes its HEADERS must
    be dropped by the class-level socket timeout — the handler blocks in
    rfile.readline before any do_* method runs, so a do_POST-level
    settimeout cannot bound this (the slowloris hole)."""
    import socket
    import time as _time

    from incremental_multimodal_medical_learning_ii_tpu.cli.serve import make_server

    _, clf = server
    srv = make_server(clf, "127.0.0.1", 0, client_timeout_s=0.5)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        s = socket.create_connection(("127.0.0.1", srv.server_address[1]), timeout=10)
        s.sendall(b"POST /classify HTTP/1.1\r\nContent-")  # stall mid-headers
        s.settimeout(10)
        t0 = _time.monotonic()
        data = s.recv(1024)  # server must close (b"") rather than wait forever
        assert data == b""
        assert _time.monotonic() - t0 < 8
        s.close()
    finally:
        srv.shutdown()
        srv.server_close()
