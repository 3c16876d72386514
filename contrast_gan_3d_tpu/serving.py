"""Production serving for full-volume contrast correction.

The reference has no serving story (its closest analogue is the offline
``mp.Pool`` patient fan-out, reference ``eval/utils.py:27-39``). This module
keeps a warm :class:`eval.corrector.CCTAContrastCorrector` (compiled XLA
programs + device-resident weights) behind a small stdlib HTTP daemon:

- ``POST /correct``  body = a ``.npy`` serialization of an int16/float
  (W, H, D) HU volume -> response body = ``.npy`` float32 corrected volume.
  Optional header ``X-Response-Dtype: int16`` casts the reply (halves the
  bytes; HU are integral anyway).
- ``GET /healthz``   liveness + device/platform info, JSON.
- ``GET /stats``     request counters and latency aggregates, JSON.

Device access is serialized through a lock (one volume saturates the chip;
concurrent requests queue — ``ThreadingHTTPServer`` keeps I/O and
(de)serialization of other requests overlapped with device compute). No
external web framework: the payload protocol is one ``np.save`` blob each
way, so a client is three lines of numpy + urllib.
"""

import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional, Tuple

import numpy as np

from contrast_gan_3d_tpu.utils.logging_utils import create_logger

logger = create_logger(name=__name__)

# largest accepted request body: a (1024, 1024, 1024) int16 volume (2 GiB)
# plus npy header slack — protects the warm daemon from memory exhaustion
# via huge/forged Content-Length (matters when bound beyond the loopback
# default, e.g. serve.py --host 0.0.0.0)
MAX_BODY_BYTES = 2 * 1024**3 + 4096


class CorrectionService:
    """Wraps a corrector with warmup, device serialization and stats."""

    def __init__(self, corrector, warmup_shape: Optional[Tuple[int, ...]] = None):
        self.corrector = corrector
        self._device_lock = threading.Lock()
        self._stats_lock = threading.Lock()
        self._n = 0
        self._total_s = 0.0
        self._max_s = 0.0
        # compile policy, stated once at startup (the jitted window
        # compiles per distinct volume shape; scripts/serve.py defaults
        # --z-bucket 64 so a mixed-z cohort is bounded to a few programs)
        zb = getattr(corrector, "z_bucket", 0)
        if zb:
            logger.info(
                "z_bucket=%d: z extents pad up (edge values) to the next "
                "multiple before correcting — bounds compiles on mixed-z "
                "cohorts; 3D outputs are not bit-identical to the unpadded "
                "blend grid (the padded extent changes the Gaussian patch "
                "grid — negligible for trained attenuation fields, see "
                "PERF.md overlap study)", zb,
            )
        else:
            logger.warning(
                "z_bucket=0: EVERY distinct z extent compiles its own XLA "
                "program on first sight (bit-exact, but a mixed-z cohort "
                "pays a multi-second compile each) — production daemons "
                "should set z_bucket (scripts/serve.py defaults to 64)"
            )
        if warmup_shape is not None:
            self.warmup(warmup_shape)

    def warmup(self, shape: Tuple[int, ...]):
        """Pre-compile the sliding-window program for ``shape`` so the first
        request doesn't pay the XLA compile. Bypasses the request stats —
        the compile latency is not a served request and would permanently
        skew mean/max."""
        t0 = time.perf_counter()
        dummy = np.zeros(shape, np.int16)
        with self._device_lock:
            np.asarray(self.corrector(dummy))
        logger.info("Warmed up %s in %.1f s", shape, time.perf_counter() - t0)

    def correct(self, volume: np.ndarray, int16: bool = False) -> np.ndarray:
        """``int16=True`` rounds/clips ON DEVICE before the fetch — the
        identical conversion the host would apply (eval.utils.device_int16,
        parity-tested), at half the D2H bytes."""
        from contrast_gan_3d_tpu.eval.utils import device_int16

        t0 = time.perf_counter()
        with self._device_lock:
            out = self.corrector(volume)
            if int16:
                out = device_int16(out)
            out = np.asarray(out)
        dt = time.perf_counter() - t0
        with self._stats_lock:
            self._n += 1
            self._total_s += dt
            self._max_s = max(self._max_s, dt)
        return out

    def stats(self) -> dict:
        with self._stats_lock:
            n = self._n
            return {
                "requests": n,
                "mean_latency_s": round(self._total_s / n, 4) if n else None,
                "max_latency_s": round(self._max_s, 4) if n else None,
                # one compiled XLA program per distinct dispatched shape —
                # growth here on a warm daemon means the z-bucket policy
                # isn't bounding the cohort
                "compiled_shapes": sorted(
                    list(s) for s in self._dispatched_shapes_snapshot()
                ),
            }

    def _dispatched_shapes_snapshot(self) -> set:
        """Copy the corrector's shape record under ITS lock — /correct
        threads mutate the set mid-request and iterating a live set raises."""
        shapes = getattr(self.corrector, "dispatched_shapes", None)
        if shapes is None:
            return set()
        lock = getattr(self.corrector, "_shapes_lock", None)
        if lock is None:
            return set(shapes)
        with lock:
            return set(shapes)


def _make_handler(service: CorrectionService, max_inflight: int = 4):
    # bound HOST memory, not just per-request size: ThreadingHTTPServer
    # accepts unbounded concurrent connections and only device compute is
    # serialized — without this, N parallel sub-cap uploads each buffer
    # body bytes + the np.load copy before ever reaching the device lock.
    # The slot is held through compute + response, NOT just the parse:
    # releasing after np.load let every queued request park a decoded
    # volume (up to 2 GiB each) on the device-lock wait — the cap bounded
    # concurrent *parsing*, not resident volumes. Requests beyond the cap
    # now block before reading their body, so the excess bytes sit in
    # kernel socket buffers instead of user memory. Consequence: a client
    # that trickle-reads its response holds its slot for the whole download
    # (the response blob IS resident host memory, so it must count) — size
    # max_inflight for the slowest reader you tolerate; each pinned slot
    # holds only the response bytes (inputs/intermediates are dropped
    # before the write starts).
    if max_inflight < 1:
        # BoundedSemaphore(0) would block every /correct forever with no
        # diagnostic; there is deliberately no "unlimited" setting (the cap
        # IS the host-memory bound)
        raise ValueError(f"max_inflight must be >= 1, got {max_inflight}")
    ingest_slots = threading.BoundedSemaphore(max_inflight)

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"
        # half-open uploads (slowloris) must not pin handler threads (and
        # their buffers) forever
        timeout = 300

        def log_message(self, fmt, *args):  # route to our logger
            logger.debug("%s " + fmt, self.client_address[0], *args)

        def _json(self, code: int, payload: dict, close: bool = False):
            if close:
                # the request body was not (fully) read: a keep-alive client
                # would otherwise have its unread bytes parsed as the next
                # request line (confirmed desync) — close instead
                self.close_connection = True
            blob = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(blob)))
            if close:
                self.send_header("Connection", "close")
            self.end_headers()
            self.wfile.write(blob)

        def do_GET(self):
            if not self.server.request_began():
                return self._json(
                    503, {"error": "server shutting down"}, close=True
                )
            try:
                self._do_GET()
            finally:
                self.server.request_finished()

        def _do_GET(self):
            if self.path == "/healthz":
                import jax

                dev = jax.devices()[0]
                self._json(200, {
                    "status": "ok",
                    "platform": dev.platform,
                    "device": str(dev),
                })
            elif self.path == "/stats":
                self._json(200, service.stats())
            else:
                self._json(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            # in-flight accounting brackets the WHOLE request (parse,
            # compute, response write): stop() drains on this count
            if not self.server.request_began():
                return self._json(
                    503, {"error": "server shutting down"}, close=True
                )
            try:
                self._do_POST()
            finally:
                self.server.request_finished()

        def _do_POST(self):
            if self.path != "/correct":
                return self._json(
                    404, {"error": f"unknown path {self.path}"}, close=True
                )
            # -- parse (client errors -> 4xx JSON) --------------------------
            try:
                length = int(self.headers.get("Content-Length", "0"))
            except ValueError:
                length = 0
            if length <= 0:
                # a negative length would make rfile.read(-1) block until
                # client EOF, pinning the handler thread
                return self._json(
                    400, {"error": "missing/invalid Content-Length"}, close=True
                )
            if length > MAX_BODY_BYTES:
                return self._json(
                    413,
                    {"error": f"body {length} B > {MAX_BODY_BYTES} B cap"},
                    close=True,
                )
            with ingest_slots:
                try:
                    volume = np.load(io.BytesIO(self.rfile.read(length)))
                except Exception as e:  # malformed payloads must not kill the server
                    logger.exception("bad /correct payload")
                    return self._json(400, {"error": str(e)}, close=True)
                # -- compute (server errors -> 500) --------------------------
                responded = False
                try:
                    corrected = service.correct(
                        volume,
                        int16=self.headers.get("X-Response-Dtype") == "int16",
                    )
                    del volume  # the slot is held through the response
                    buf = io.BytesIO()
                    np.save(buf, corrected)
                    blob = buf.getvalue()
                    # a slow-reading client pins its slot for the download;
                    # make sure it pins only the response bytes
                    del corrected, buf
                    self.send_response(200)
                    self.send_header("Content-Type", "application/octet-stream")
                    self.send_header("Content-Length", str(len(blob)))
                    self.end_headers()
                    responded = True
                    self.wfile.write(blob)
                except Exception as e:
                    logger.exception("correct failed")
                    if responded:
                        # the 200 status line already went out: a second
                        # status line would corrupt the stream — drop the link
                        self.close_connection = True
                        return
                    self._json(500, {"error": str(e)}, close=True)

    return Handler


class _DrainingHTTPServer(ThreadingHTTPServer):
    """Graceful drain by explicit in-flight REQUEST accounting.

    Joining every connection thread (non-daemon threads + ``block_on_close``)
    also joins idle keep-alive clients parked in ``readline()`` — a graceful
    stop then blocks up to the 300 s connection timeout per idle socket.
    Handler threads therefore stay daemons, and ``stop()`` instead waits for
    the count of requests actually being PROCESSED (parse→compute→response
    write, bracketed by :meth:`request_began`/:meth:`request_finished`) to
    reach zero — in-flight responses finish, idle connections don't hold the
    drain, and requests arriving during the drain get 503 + close.
    """

    daemon_threads = True
    block_on_close = False

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._inflight = 0
        self._draining = False
        self._inflight_cv = threading.Condition()

    def request_began(self) -> bool:
        """Count a request in; False once draining (handler answers 503)."""
        with self._inflight_cv:
            if self._draining:
                return False
            self._inflight += 1
            return True

    def request_finished(self):
        with self._inflight_cv:
            self._inflight -= 1
            self._inflight_cv.notify_all()

    def drain(self, timeout: float) -> int:
        """Refuse new requests, wait for in-flight ones; returns the number
        still running at the deadline (0 = clean drain)."""
        deadline = time.monotonic() + timeout
        with self._inflight_cv:
            self._draining = True
            while self._inflight > 0:
                left = deadline - time.monotonic()
                if left <= 0:
                    return self._inflight
                self._inflight_cv.wait(left)
        return 0


class CorrectionServer:
    """Threaded HTTP server around a :class:`CorrectionService`."""

    def __init__(self, corrector, host: str = "127.0.0.1", port: int = 0,
                 warmup_shape: Optional[Tuple[int, ...]] = None,
                 max_inflight: int = 4):
        if max_inflight < 1:  # fail before the (expensive) warmup compile
            raise ValueError(f"max_inflight must be >= 1, got {max_inflight}")
        self.service = CorrectionService(corrector, warmup_shape)
        self.httpd = _DrainingHTTPServer(
            (host, port), _make_handler(self.service, max_inflight=max_inflight)
        )
        self._thread: Optional[threading.Thread] = None

    @property
    def address(self) -> Tuple[str, int]:
        return self.httpd.server_address[:2]

    def start(self, background: bool = True):
        if background:
            self._thread = threading.Thread(
                target=self.httpd.serve_forever, name="correction-server", daemon=True
            )
            self._thread.start()
            logger.info("Serving on http://%s:%d", *self.address)
        else:
            logger.info("Serving on http://%s:%d", *self.address)
            self.httpd.serve_forever()

    def serve_until_signaled(self, signums=None, drain_timeout: float = 600.0):
        """Foreground serving with graceful shutdown: blocks until SIGTERM/
        SIGINT, then drains in-flight requests (:class:`_DrainingHTTPServer`)
        and returns — so an orchestrator's stop never truncates a response
        mid-write. A SECOND signal escalates (KeyboardInterrupt) for drains
        wedged on a client, matching train.py / correct_scans.py. Calling
        ``shutdown()`` from a signal handler would deadlock (the handler
        suspends the very thread running ``serve_forever``), so the loop runs
        on the background thread and the main thread waits on an Event the
        handler sets. Main-thread only (CPython ``signal.signal``
        restriction)."""
        import signal as _signal

        from contrast_gan_3d_tpu.utils.signals import install_graceful_stop

        signums = signums or (_signal.SIGTERM, _signal.SIGINT)
        stop_evt = threading.Event()

        def _on_stop(name):
            logger.warning(
                "%s received — draining in-flight requests and shutting "
                "down (send again to abort the drain)", name,
            )
            stop_evt.set()

        previous = install_graceful_stop(_on_stop, stop_evt.is_set, signums)
        if previous is None:
            raise RuntimeError(
                "serve_until_signaled needs the main thread (signal.signal); "
                "use start(background=True) + stop() when embedding"
            )
        try:
            self.start(background=True)
            # timed wait loop: an untimed Event.wait can park the main
            # thread in a C lock where pending signal handlers don't run
            while not stop_evt.wait(timeout=1.0):
                pass
            try:
                self.stop(drain_timeout=drain_timeout)
            except KeyboardInterrupt:
                # second signal escalated out of a wedged drain: the process
                # may not exit (an embedder can catch this), so still release
                # the port and reap the serve thread before propagating
                self.httpd.server_close()
                if self._thread is not None:
                    self._thread.join(timeout=10)
                    self._thread = None
                raise
        finally:
            for signum, handler in previous.items():
                _signal.signal(signum, handler)

    def stop(self, drain_timeout: float = 600.0):
        self.httpd.shutdown()  # stop the serve_forever accept loop
        # Close the LISTENING socket before the drain, not after: shutdown()
        # only stops the accept loop, so a brand-new TCP connection made
        # mid-drain would otherwise sit in the accept backlog unserviced for
        # up to drain_timeout before being reset. Closing the listener makes
        # new connections fail fast (refused/reset); in-flight requests keep
        # their own per-connection sockets and are unaffected.
        self.httpd.server_close()
        # finish requests already processing (responses mid-write included);
        # keep-alive clients submitting NEW requests now get 503 + close
        left = self.httpd.drain(drain_timeout)
        if left:
            logger.warning(
                "drain timed out after %.0f s with %d request(s) still in "
                "flight — their connections will be cut", drain_timeout, left,
            )
        if self._thread is not None:
            self._thread.join(timeout=10)
            self._thread = None


def correct_remote(
    url: str, volume: np.ndarray, int16: bool = False, timeout: float = 600.0
) -> np.ndarray:
    """Minimal client: POST a volume to a running server. ``timeout`` bounds
    the whole request — a wedged daemon must not block the caller forever."""
    import urllib.request

    buf = io.BytesIO()
    np.save(buf, volume)
    req = urllib.request.Request(
        url.rstrip("/") + "/correct",
        data=buf.getvalue(),
        headers={"X-Response-Dtype": "int16"} if int16 else {},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return np.load(io.BytesIO(resp.read()))
