"""Serving subsystem: HTTP round-trip, health/stats, error handling,
concurrent requests (device access serialized, results correct)."""

import io
import json
import threading
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from contrast_gan_3d_tpu.eval.corrector import CCTAContrastCorrector
from contrast_gan_3d_tpu.models.generator import ResnetGenerator
from contrast_gan_3d_tpu.serving import CorrectionServer, correct_remote

PATCH = (16, 16, 16)


@pytest.fixture(scope="module")
def server():
    gen = ResnetGenerator(
        n_resnet_blocks=1, n_updownsample_blocks=1, init_channels_out=2,
        s2d_factor=None,
    )
    variables = gen.init(jax.random.key(0), jnp.zeros((1, *PATCH, 1)), train=False)
    corrector = CCTAContrastCorrector(
        gen, variables["params"], variables.get("batch_stats"),
        inference_patch_size=PATCH, batch_size=2,
    )
    srv = CorrectionServer(corrector, warmup_shape=(20, 20, 18))
    srv.start()
    yield srv, corrector
    srv.stop()


def _url(srv):
    host, port = srv.address
    return f"http://{host}:{port}"


def test_healthz_and_roundtrip(server, rng):
    srv, corrector = server
    with urllib.request.urlopen(_url(srv) + "/healthz") as r:
        health = json.loads(r.read())
    assert health["status"] == "ok" and "platform" in health

    vol = rng.integers(-1000, 1400, (20, 20, 18)).astype(np.int16)
    got = correct_remote(_url(srv), vol)
    want = np.asarray(corrector(vol))
    np.testing.assert_allclose(got, want, atol=1e-4)

    got16 = correct_remote(_url(srv), vol, int16=True)
    assert got16.dtype == np.int16
    np.testing.assert_allclose(got16, np.round(want), atol=1)

    with urllib.request.urlopen(_url(srv) + "/stats") as r:
        stats = json.loads(r.read())
    assert stats["requests"] >= 2 and stats["mean_latency_s"] > 0


def test_bad_payload_is_400_and_server_survives(server, rng):
    srv, corrector = server
    req = urllib.request.Request(
        _url(srv) + "/correct", data=b"not-an-npy", method="POST"
    )
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(req)
    assert exc.value.code == 400
    # still serving afterwards
    vol = rng.integers(-100, 100, (20, 20, 18)).astype(np.int16)
    got = correct_remote(_url(srv), vol)
    assert got.shape == vol.shape


def test_concurrent_requests(server, rng):
    srv, corrector = server
    vols = [rng.integers(-500, 500, (20, 20, 18)).astype(np.int16) for _ in range(4)]
    results = [None] * 4

    def worker(i):
        results[i] = correct_remote(_url(srv), vols[i])

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    for v, r in zip(vols, results):
        np.testing.assert_allclose(r, np.asarray(corrector(v)), atol=1e-4)


def test_requests_beyond_inflight_cap_queue_not_fail(rng):
    """The ingest slot is held through compute, bounding resident decoded
    volumes to ``max_inflight``; requests beyond the cap must still QUEUE
    (block pre-read) and succeed, not error — here 3 concurrent requests
    against a cap of 1."""
    gen = ResnetGenerator(
        n_resnet_blocks=1, n_updownsample_blocks=1, init_channels_out=2,
        s2d_factor=None,
    )
    variables = gen.init(jax.random.key(0), jnp.zeros((1, *PATCH, 1)), train=False)
    corrector = CCTAContrastCorrector(
        gen, variables["params"], variables.get("batch_stats"),
        inference_patch_size=PATCH, batch_size=2,
    )
    srv = CorrectionServer(corrector, warmup_shape=(20, 20, 18), max_inflight=1)
    srv.start()
    try:
        vols = [
            rng.integers(-500, 500, (20, 20, 18)).astype(np.int16) for _ in range(3)
        ]
        results = [None] * 3

        def worker(i):
            results[i] = correct_remote(_url(srv), vols[i])

        threads = [threading.Thread(target=worker, args=(i,)) for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        for v, r in zip(vols, results):
            assert r is not None
            np.testing.assert_allclose(r, np.asarray(corrector(v)), atol=1e-4)
    finally:
        srv.stop()


def test_unknown_path_404(server):
    srv, _ = server
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(_url(srv) + "/nope")
    assert exc.value.code == 404


def test_keepalive_survives_404_post(server, rng):
    """A keep-alive client POSTing a body to a wrong path must not desync
    the connection: the unread body would otherwise be parsed as the next
    request line (BadStatusLine on the follow-up request). The server now
    closes such connections; http.client transparently reconnects."""
    import http.client

    srv, corrector = server
    host, port = srv.address
    conn = http.client.HTTPConnection(host, port, timeout=30)
    buf = io.BytesIO()
    np.save(buf, rng.integers(-100, 100, (20, 20, 18)).astype(np.int16))
    body = buf.getvalue()
    conn.request("POST", "/corect", body=body)  # typo'd path, full npy body
    resp = conn.getresponse()
    assert resp.status == 404
    resp.read()
    assert resp.will_close  # server refused to keep the desynced link
    conn.close()
    # the server itself is still healthy
    vol = rng.integers(-100, 100, (20, 20, 18)).astype(np.int16)
    assert correct_remote(_url(srv), vol).shape == vol.shape


def test_stop_releases_port(rng):
    """stop() must server_close() the listening socket: the port is
    immediately rebindable (shutdown() alone left it bound -> EADDRINUSE
    on restart)."""
    gen = ResnetGenerator(
        n_resnet_blocks=1, n_updownsample_blocks=1, init_channels_out=2,
        s2d_factor=None,
    )
    variables = gen.init(jax.random.key(0), jnp.zeros((1, *PATCH, 1)), train=False)
    corrector = CCTAContrastCorrector(
        gen, variables["params"], variables.get("batch_stats"),
        inference_patch_size=PATCH, batch_size=2,
    )
    srv = CorrectionServer(corrector)
    srv.start()
    host, port = srv.address
    srv.stop()
    srv2 = CorrectionServer(corrector, host=host, port=port)  # rebind same port
    srv2.start()
    assert srv2.address[1] == port
    srv2.stop()


def test_artifact_input_saturates_not_wraps(tmp_path, rng):
    """ExportedCorrector coerces float volumes into an integer input
    contract by round + SATURATE: out-of-range values clip to the dtype
    bounds instead of wrapping (40000.0 -> 32767, not ~-25536)."""
    from contrast_gan_3d_tpu.eval.export import (
        load_exported_corrector, save_exported_corrector,
    )

    gen = ResnetGenerator(
        n_resnet_blocks=1, n_updownsample_blocks=1, init_channels_out=2,
        s2d_factor=None,
    )
    variables = gen.init(jax.random.key(0), jnp.zeros((1, *PATCH, 1)), train=False)
    corrector = CCTAContrastCorrector(
        gen, variables["params"], variables.get("batch_stats"),
        inference_patch_size=PATCH, batch_size=2,
    )
    shape = (16, 16, 16)
    path = save_exported_corrector(tmp_path / "a", corrector, shape)
    art = load_exported_corrector(path)
    hot = np.full(shape, 40000.0, np.float32)  # out of int16 range
    hot_sat = np.full(shape, 32767, np.int16)
    np.testing.assert_array_equal(np.asarray(art(hot)), np.asarray(art(hot_sat)))


def test_stop_drains_inflight_requests(rng):
    """stop() must finish responses already streaming (explicit in-flight
    request drain): a client whose request is mid-compute when the server
    stops still receives its full corrected volume."""
    import time

    class SlowCorrector:
        def __call__(self, volume):
            time.sleep(1.5)
            return np.asarray(volume, np.float32) - 1.0

    srv = CorrectionServer(SlowCorrector())
    srv.start()
    vol = rng.integers(-500, 500, (8, 8, 6)).astype(np.int16)
    result = {}

    def client():
        result["out"] = correct_remote(_url(srv), vol)

    t = threading.Thread(target=client)
    t.start()
    time.sleep(0.4)  # request is in flight (inside the sleep)
    srv.stop()  # must block until the handler finished writing
    t.join(timeout=30)
    assert not t.is_alive()
    np.testing.assert_allclose(result["out"], vol.astype(np.float32) - 1.0)


def test_serve_until_signaled_returns_on_sigterm(rng):
    """The foreground CLI path exits cleanly on SIGTERM (drain + return)
    and restores prior signal handlers."""
    import signal as sig

    gen = ResnetGenerator(
        n_resnet_blocks=1, n_updownsample_blocks=1, init_channels_out=2,
        s2d_factor=None,
    )
    variables = gen.init(jax.random.key(0), jnp.zeros((1, *PATCH, 1)), train=False)
    corrector = CCTAContrastCorrector(
        gen, variables["params"], variables.get("batch_stats"),
        inference_patch_size=PATCH, batch_size=2,
    )
    srv = CorrectionServer(corrector)
    before = sig.getsignal(sig.SIGTERM)
    timer = threading.Timer(1.2, lambda: sig.raise_signal(sig.SIGTERM))
    timer.start()
    try:
        srv.serve_until_signaled()  # blocks until the timer fires
    finally:
        timer.cancel()
    assert sig.getsignal(sig.SIGTERM) is before  # handlers restored
    # listening socket released: the port is immediately rebindable
    host, port = srv.address
    srv2 = CorrectionServer(corrector, host=host, port=port)
    srv2.start()
    srv2.stop()


def test_max_inflight_zero_is_rejected():
    """BoundedSemaphore(0) would block every /correct forever with no
    diagnostic; the cap IS the host-memory bound, so there is no
    'unlimited' setting to spell as 0."""

    class Dummy:
        def __call__(self, v):
            return np.asarray(v, np.float32)

    with pytest.raises(ValueError, match="max_inflight"):
        CorrectionServer(Dummy(), max_inflight=0)


def test_idle_keepalive_connection_does_not_block_stop():
    """Graceful drain waits on in-flight REQUESTS, not connection threads:
    an HTTP/1.1 client that finished its request and parks its keep-alive
    connection open must not hold stop() for the 300 s connection timeout
    (joining every non-daemon handler thread did exactly that)."""
    import socket
    import time

    class Dummy:
        def __call__(self, v):
            return np.asarray(v, np.float32)

    srv = CorrectionServer(Dummy())
    srv.start()
    host, port = srv.address
    sock = socket.create_connection((host, port), timeout=10)
    try:
        sock.sendall(b"GET /healthz HTTP/1.1\r\nHost: x\r\n\r\n")
        # read the full response; the connection then idles in readline()
        buf = b""
        while b"}" not in buf:
            buf += sock.recv(4096)
        assert b"200" in buf
        t0 = time.perf_counter()
        srv.stop()
        assert time.perf_counter() - t0 < 30, "stop() waited on an idle conn"
    finally:
        sock.close()


def test_requests_during_drain_get_503():
    """Once draining, keep-alive clients submitting NEW requests are turned
    away (503 + close) instead of racing the daemon-thread teardown."""

    class Dummy:
        def __call__(self, v):
            return np.asarray(v, np.float32)

    srv = CorrectionServer(Dummy())
    srv.start()
    try:
        assert srv.httpd.drain(0.1) == 0  # nothing in flight
        assert srv.httpd.request_began() is False  # draining: refused
        with pytest.raises(urllib.error.HTTPError) as exc_info:
            urllib.request.urlopen(_url(srv) + "/healthz", timeout=10)
        assert exc_info.value.code == 503
    finally:
        srv.stop()


def test_new_connections_refused_fast_mid_drain():
    """A BRAND-NEW TCP connection made while stop() is draining must fail
    fast: stop() closes the listening socket before the drain, so the
    connection is refused immediately instead of sitting unserviced in the
    accept backlog until the drain finishes (previously up to
    drain_timeout=600 s)."""
    import socket
    import time

    release = threading.Event()

    class Gated:
        def __call__(self, v):
            release.wait(timeout=30)
            return np.asarray(v, np.float32)

    srv = CorrectionServer(Gated())
    srv.start()
    host, port = srv.address
    vol = np.zeros((4, 4, 4), np.int16)
    client = threading.Thread(target=lambda: correct_remote(_url(srv), vol))
    client.start()
    # wait until the request is actually in flight (inside Gated.__call__)
    deadline = time.monotonic() + 10
    while srv.httpd._inflight == 0 and time.monotonic() < deadline:
        time.sleep(0.02)
    assert srv.httpd._inflight == 1
    stopper = threading.Thread(target=srv.stop)
    stopper.start()
    # wait for stop() to enter the drain (listener closed, _draining set)
    deadline = time.monotonic() + 10
    while not srv.httpd._draining and time.monotonic() < deadline:
        time.sleep(0.02)
    assert srv.httpd._draining
    t0 = time.monotonic()
    with pytest.raises(OSError):  # ECONNREFUSED / reset — NOT a hang
        socket.create_connection((host, port), timeout=5.0).close()
    assert time.monotonic() - t0 < 2.0  # refused fast, drain still running
    assert stopper.is_alive()  # the in-flight request is still draining
    release.set()  # let the gated request finish; drain completes
    stopper.join(timeout=30)
    assert not stopper.is_alive()
    client.join(timeout=30)
    assert not client.is_alive()


def test_mixed_z_cohort_bounded_compiles(rng):
    """Production recompile policy (VERDICT r3 #7): a warm daemon with a
    z-bucketed corrector serves a mixed-z cohort with a BOUNDED number of
    compiled programs (observable via /stats compiled_shapes), and bucketed
    outputs stay close to the bit-exact unbucketed ones."""
    gen = ResnetGenerator(
        n_resnet_blocks=1, n_updownsample_blocks=1, init_channels_out=2,
        s2d_factor=None,
    )
    variables = gen.init(jax.random.key(0), jnp.zeros((1, *PATCH, 1)), train=False)

    def make(z_bucket):
        return CCTAContrastCorrector(
            gen, variables["params"], variables.get("batch_stats"),
            inference_patch_size=PATCH, batch_size=2, z_bucket=z_bucket,
        )

    bucketed = make(16)
    exact = make(0)
    srv = CorrectionServer(bucketed)
    srv.start()
    try:
        # scaled-down analogue of z in {295..420} with bucket 64: extents
        # spanning two buckets (17..32 -> 32, 33..48 -> 48)
        cohort = [18, 25, 32, 37, 41, 48, 19, 44]
        for z in cohort:
            vol = rng.integers(-1000, 1400, (20, 20, z)).astype(np.int16)
            got = correct_remote(_url(srv), vol)
            assert got.shape == vol.shape
            assert np.isfinite(got).all()
            if z % 16 == 0:
                # extents already on a bucket boundary take the unpadded
                # path — bit-comparable to the exact corrector. (Padded
                # extents change the blend grid; with this RANDOM
                # generator the field isn't smooth, so only the trained
                # case supports a closeness claim — PERF.md overlap study.)
                want = np.asarray(exact(vol))
                np.testing.assert_allclose(got, want, atol=1e-3)
        with urllib.request.urlopen(_url(srv) + "/stats") as r:
            stats = json.loads(r.read())
        assert len(stats["compiled_shapes"]) <= 2, stats["compiled_shapes"]
        assert stats["requests"] == len(cohort)
    finally:
        srv.stop()
    # an exact (z_bucket=0) corrector compiles one program per distinct
    # extent — the behavior the bucket policy exists to bound
    before = len(exact.dispatched_shapes)
    for z in (18, 25):
        exact(rng.integers(-1000, 1400, (20, 20, z)).astype(np.int16))
    assert len(exact.dispatched_shapes) == before + 2


@pytest.mark.slow
def test_sharded_serving_matches_single_chip(rng):
    """Multi-chip serving (VERDICT r4 weak #4): the SAME daemon with the
    corrector re-targeted to the mesh (``corrector.shard_over`` — what
    ``scripts/serve.py --dp-devices`` constructs) serves a mixed-z cohort
    over HTTP with outputs equal to the single-chip path, and /stats
    observes the same per-shape compile policy."""
    if len(jax.devices()) < 2:
        pytest.skip("needs the multi-device CPU mesh")
    from contrast_gan_3d_tpu.parallel.mesh import data_mesh

    gen = ResnetGenerator(
        n_resnet_blocks=1, n_updownsample_blocks=1, init_channels_out=2,
    )
    variables = gen.init(
        jax.random.key(5), jnp.zeros((1, *PATCH, 1)), train=False
    )

    def make():
        return CCTAContrastCorrector(
            gen, variables["params"], variables.get("batch_stats"),
            inference_patch_size=PATCH, batch_size=2,
        )

    single = make()
    sharded = make().shard_over(data_mesh())
    srv = CorrectionServer(sharded)
    srv.start()
    try:
        # mixed extents -> distinct patch grids; block-aligned (div 4) so
        # the packed sharded path's identical-grid equality contract holds
        # (unaligned dims edge-pad to blocks, which legitimately shifts the
        # Gaussian blend — tests/test_parallel.py packed-corrector note)
        for z in (16, 24, 32):
            vol = rng.integers(-1000, 1400, (20, 20, z)).astype(np.int16)
            got = correct_remote(_url(srv), vol)
            want = np.asarray(single(vol))
            np.testing.assert_allclose(got, want, rtol=1e-4, atol=5e-2)
        with urllib.request.urlopen(_url(srv) + "/stats") as r:
            stats = json.loads(r.read())
        assert stats["requests"] == 3
        assert len(stats["compiled_shapes"]) == 3
    finally:
        srv.stop()
