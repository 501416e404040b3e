"""Serving: fixed-shape Predictor + HTTP model server end-to-end."""

import http.client
import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from simple3dformer_tpu.models.voxel_vit import VoxelViT
from simple3dformer_tpu.nn.voxel_embed import VoxelEmbed
from simple3dformer_tpu.serve.predictor import Predictor, topk_labels
from simple3dformer_tpu.serve.server import ModelServer

V = 12


@pytest.fixture(scope="module")
def predictor():
    emb = VoxelEmbed(voxel_size=V, cell_size=4, patch_size=3, embed_dim=192)
    model = VoxelViT(voxel_embed=emb, n_classes=7,
                     transformer_backbone="deit_tiny_patch16_224")
    variables = jax.jit(model.init)(jax.random.key(0), jnp.zeros((2, V, V, V)))
    return Predictor(model, variables, input_shape=(V, V, V), batch_size=4)


def test_predictor_pads_and_chunks(predictor, rng):
    x = (rng.rand(6, V, V, V) > 0.8).astype(np.float32)  # 6 = 4 + pad(2)
    out = predictor(x)
    assert out.shape == (6, 7)
    # padding must not leak into real outputs: same inputs, different chunking
    out2 = predictor(x[:3])
    np.testing.assert_allclose(out[:3], out2, rtol=1e-5, atol=1e-6)
    assert predictor.stats["requests"] == 2

    with pytest.raises(ValueError):
        predictor(np.zeros((2, V, V)))  # wrong trailing shape


def test_topk_labels():
    logits = np.array([[0.0, 2.0, 1.0]])
    out = topk_labels(logits, k=2, names={0: "a", 1: "b", 2: "c"})
    assert out[0][0][0] == "b" and out[0][1][0] == "c"
    assert abs(sum(p for _, p in out[0]) - 1.0) < 0.5


def test_http_server_roundtrip(predictor, rng):
    server = ModelServer(predictor, port=0, class_names=None)
    port = server.start_background()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        conn.request("GET", "/healthz")
        health = json.loads(conn.getresponse().read())
        assert health["status"] == "ok"

        x = (rng.rand(2, V, V, V) > 0.8).astype(np.float32)
        conn.request("POST", "/predict",
                     body=json.dumps({"inputs": x.tolist()}),
                     headers={"Content-Type": "application/json"})
        resp = json.loads(conn.getresponse().read())
        assert np.asarray(resp["logits"]).shape == (2, 7)
        assert len(resp["topk"][0]) == 5

        # malformed request -> clean 400
        conn.request("POST", "/predict", body="{bad json",
                     headers={"Content-Type": "application/json"})
        r = conn.getresponse()
        assert r.status == 400
        assert "error" in json.loads(r.read())
    finally:
        server.shutdown()


def test_export_and_load(predictor, rng, tmp_path):
    from simple3dformer_tpu.serve.predictor import load_exported

    path = predictor.export(str(tmp_path / "model.jaxexport"))
    fn = load_exported(path)
    x = (rng.rand(4, V, V, V) > 0.8).astype(np.float32)
    out = np.asarray(fn(jnp.asarray(x)))
    np.testing.assert_allclose(out, predictor(x), rtol=1e-5, atol=1e-6)
