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
