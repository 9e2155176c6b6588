"""Serving layer: GenerationService + HTTP server against a stub sampler.

Fast tier — the stub replaces the device sampler so these tests exercise the
request validation, postprocessing, wire formats, and threading contract
without compiling anything. An end-to-end served-generation check with real
checkpoints rides in the slow pipeline test.
"""

import io
import json
import threading
from http.client import HTTPConnection

import numpy as np
import pytest

from tvqvae_tpu.serving import GenerationService, make_server
from tvqvae_tpu.utils.scaler import MinMaxScaler

FEATURES = ["latitude", "longitude", "altitude", "timedelta"]
C, L = 4, 16


class StubSampler:
    """Deterministic sampler with the TrainedModelSampler surface."""

    input_length = L
    in_channels = C
    n_classes = 3
    batch_size = 8
    use_fe = False
    use_ess = False

    def __init__(self):
        self.calls = []

    def sample(self, n, kind, class_index=None, seed=0, batch_size=None):
        self.calls.append((n, kind, class_index, seed))
        base = 0.0 if class_index is None else float(class_index)
        # scaled units in (-1, 1); altitude channel negative to test clip
        x = np.full((n, C, L), -0.5 + 0.1 * base, np.float32)
        x[:, 2] = -0.9  # altitude: inverse-transforms below 0 -> clipped
        return x.copy(), x.copy(), x


def make_service(with_scaler=True, **kw):
    scaler = None
    if with_scaler:
        scaler = MinMaxScaler()
        rng = np.random.default_rng(0)
        raw = rng.uniform(0.0, 1.0, size=(32, L * C)).astype(np.float32)
        raw[:, :] *= 100.0
        scaler.fit(raw - 60.0)  # min < 0 so altitude clip is observable
    return GenerationService(
        StubSampler(), scaler=scaler, features=FEATURES, **kw
    )


# ---------------------------------------------------------------------------
# service-level


def test_generate_shapes_and_labels():
    svc = make_service()
    X, y = svc.generate(5, class_index=1, seed=3)
    assert X.shape == (5, C, L)
    assert y.tolist() == [1] * 5
    Xu, yu = svc.generate(2)
    assert yu.tolist() == [-1, -1]  # unconditional: label unknown
    assert svc.info()["served"] == 7


def test_postprocess_applies_validity_fixes():
    svc = make_service()
    X, _ = svc.generate(2, class_index=0)
    alt = FEATURES.index("altitude")
    td = FEATURES.index("timedelta")
    assert (X[:, alt] >= 0.0).all()  # altitude clipped (generate.py:14-41)
    assert (X[:, td, 0] == 0.0).all()  # first timedelta zeroed
    # without postprocess: raw model units straight from the sampler
    Xr, _ = svc.generate(2, class_index=0, postprocess=False)
    assert np.allclose(Xr[:, 2], -0.9)


def test_no_scaler_means_raw_units():
    svc = make_service(with_scaler=False)
    X, _ = svc.generate(2, class_index=0)
    assert np.allclose(X[:, 2], -0.9)
    assert svc.info()["postprocess"] is False


def test_validation_errors():
    svc = make_service(max_request=10)
    with pytest.raises(ValueError):
        svc.generate(0)
    with pytest.raises(ValueError):
        svc.generate(11)
    with pytest.raises(ValueError):
        svc.generate(1, class_index=3)  # n_classes == 3
    with pytest.raises(ValueError):
        svc.generate(1, class_index=-1)


def test_generate_mix_counts_and_order():
    svc = make_service()
    X, y = svc.generate_mix({2: 1, 0: 2})
    assert X.shape == (3, C, L)
    assert y.tolist() == [0, 0, 2]  # sorted by class
    with pytest.raises(ValueError):
        svc.generate_mix({0: 0})


def test_warmup_compiles_each_path():
    svc = make_service()
    svc.warmup(classes=True)
    kinds = [(c[1], c[2]) for c in svc.sampler.calls]
    assert ("unconditional", None) in kinds
    assert {("conditional", c) for c in range(3)} <= set(kinds)


def test_coalescing_merges_concurrent_same_class_requests():
    svc = make_service(coalesce_ms=200.0)
    try:
        results = []

        def hit():
            results.append(svc.generate(2, class_index=1))

        threads = [threading.Thread(target=hit) for _ in range(5)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert len(results) == 5
        for X, y in results:
            assert X.shape == (2, C, L) and y.tolist() == [1, 1]
        # 5 concurrent n=2 requests within the window merge into at most
        # ceil(10/8)=2 device calls (3 allowed for scheduler slop on a
        # loaded 1-core host) instead of 5
        cond_calls = [c for c in svc.sampler.calls
                      if c[1] == "conditional"]
        assert 1 <= len(cond_calls) <= 3
        assert sum(c[0] for c in cond_calls) == 10
    finally:
        svc.close()


def test_coalescing_separates_classes_and_explicit_seeds():
    svc = make_service(coalesce_ms=40.0)
    try:
        # explicit seed bypasses the dispatcher (reproducibility contract)
        X1, _ = svc.generate(2, class_index=0, seed=7)
        X2, _ = svc.generate(2, class_index=0, seed=7)
        np.testing.assert_array_equal(X1, X2)

        results = {}

        def hit(cls):
            results[cls] = svc.generate(1, class_index=cls)

        threads = [threading.Thread(target=hit, args=(c,)) for c in (0, 1, 2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for cls in (0, 1, 2):
            X, y = results[cls]
            assert y.tolist() == [cls]
        # different classes never share a batch
        seedless = [c for c in svc.sampler.calls if c[0] == 1]
        assert len(seedless) == 3
    finally:
        svc.close()


def test_coalescing_propagates_errors():
    svc = make_service(coalesce_ms=20.0)

    def boom(n, kind, class_index=None, seed=0, batch_size=None):
        raise RuntimeError("device on fire")

    svc.sampler.sample = boom
    try:
        with pytest.raises(RuntimeError, match="device on fire"):
            svc.generate(2, class_index=1)
    finally:
        svc.close()


# ---------------------------------------------------------------------------
# HTTP server


@pytest.fixture()
def served():
    svc = make_service()
    srv = make_server(svc, "127.0.0.1", 0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield svc, srv.server_address[1]
    finally:
        srv.shutdown()
        srv.server_close()


def _post(port, body, path="/v1/generate"):
    conn = HTTPConnection("127.0.0.1", port, timeout=10)
    conn.request("POST", path, body=json.dumps(body).encode(),
                 headers={"Content-Type": "application/json"})
    resp = conn.getresponse()
    data = resp.read()
    conn.close()
    return resp, data


def test_http_health_and_info(served):
    _, port = served
    conn = HTTPConnection("127.0.0.1", port, timeout=10)
    conn.request("GET", "/healthz")
    assert json.loads(conn.getresponse().read()) == {"ok": True}
    conn.request("GET", "/v1/info")
    info = json.loads(conn.getresponse().read())
    assert info["n_classes"] == 3 and info["in_channels"] == C
    conn.request("GET", "/nope")
    assert conn.getresponse().status == 404
    conn.close()


def test_http_generate_json(served):
    _, port = served
    resp, data = _post(port, {"n": 3, "class_index": 1, "seed": 7})
    assert resp.status == 200
    out = json.loads(data)
    assert out["shape"] == [3, C, L]
    assert out["y"] == [1, 1, 1]
    assert np.asarray(out["X"]).shape == (3, C, L)
    assert out["postprocessed"] is True


def test_http_generate_npz(served):
    _, port = served
    resp, data = _post(port, {"n": 2, "format": "npz"})
    assert resp.status == 200
    assert resp.getheader("Content-Type") == "application/octet-stream"
    with np.load(io.BytesIO(data)) as z:
        assert z["X"].shape == (2, C, L)
        assert z["y"].tolist() == [-1, -1]


def test_http_generate_mix(served):
    _, port = served
    resp, data = _post(port, {"class_counts": {"0": 1, "2": 2}})
    assert resp.status == 200
    assert json.loads(data)["y"] == [0, 2, 2]


def test_http_errors(served):
    _, port = served
    resp, data = _post(port, {"n": 0})
    assert resp.status == 400 and "error" in json.loads(data)
    resp, _ = _post(port, {"class_index": 1})  # missing n
    assert resp.status == 400
    resp, _ = _post(port, {"n": 1, "format": "csv"})
    assert resp.status == 400
    resp, _ = _post(port, {"n": 1}, path="/v1/unknown")
    assert resp.status == 404


def test_http_concurrent_requests(served):
    svc, port = served
    results = []

    def hit(i):
        resp, data = _post(port, {"n": 2, "class_index": i % 3})
        results.append((resp.status, json.loads(data)["y"]))

    threads = [threading.Thread(target=hit, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(results) == 6
    assert all(code == 200 for code, _ in results)
    assert svc.info()["served"] == 12
