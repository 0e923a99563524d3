"""HTTP inpainting microservice — the production-serving surface.

Beyond-reference capability: the reference only ships a per-image demo
loop (reference: scripts/demo.py:122-141); this serves the same model
behind HTTP with device micro-batching, so concurrent clients share
batched MXU dispatches instead of paying bs=1 latency each.

    python -m migan_tpu.cli.serve --model-name migan-256 \
        --model-path migan_256.npz --port 8080

Protocol (stdlib-only on both ends):
  GET  /healthz  -> {"status": "ok", "model": ..., "resolution": ...}
  POST /inpaint  -> image/png composite
      body: JSON {"image": <base64 PNG/JPEG>, "mask": <base64 PNG>,
                  "invert_mask": false}
      Mask convention is the reference's: 255 = known, anything < 255 =
      hole (binarized exactly like the demo; data/preprocess.py).

Batching: requests queue up; a single model thread drains up to
--max-batch of them per dispatch (waiting at most --batch-window-ms for
followers after the first), zero-pads to the next power-of-two bucket
(bounded set of compiled programs), and fans results back out. Host
decode/encode happens on the HTTP handler threads, so it overlaps device
compute.

Pipeline mode (--pipeline): instead of resizing the whole image down to
model resolution, requests run through the full app pipeline (mask-bbox
crop -> resize -> G -> feathered composite back at original pixel scale;
export/pipeline.py — the reference ships this as its deployable ONNX
artifact, scripts/create_onnx_pipeline.py:119-264, but never serves it).
Arbitrary image sizes are handled by padding to static size buckets
(--buckets; mask pad = known, so the bbox never grows into the padding),
one compiled pre/post program per bucket; oversize images round up to
the next multiple of the largest bucket and compile on first use. The
crop/composite stages are per-request (one crop box per image), but the
GENERATOR forward — whose [N, res, res, 4] shape is bucket-independent —
runs through the same micro-batcher as resize mode, so concurrent
pipeline requests (even of different sizes) share batched MXU
dispatches.
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import queue
import threading
import time

import numpy as np

from ..data.preprocess import preprocess, read_mask_image, resize_max


def get_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model-name", required=True,
                   help="One of [migan-256, migan-512, comodgan-256, "
                   "comodgan-512]")
    p.add_argument("--model-path", required=True)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--dtype", choices=["float32", "bfloat16"],
                   default="float32")
    p.add_argument("--max-batch", type=int, default=16,
                   help="Largest device batch; requests beyond it wait for "
                   "the next dispatch.")
    p.add_argument("--batch-window-ms", type=float, default=2.0,
                   help="How long the batcher waits for follower requests "
                   "after the first one in a batch.")
    p.add_argument("--warmup", action="store_true",
                   help="Compile every batch bucket before accepting "
                   "traffic (first requests otherwise pay the compile).")
    p.add_argument("--pipeline", action="store_true",
                   help="Serve the full app pipeline (bbox crop + feathered "
                   "composite at original size) instead of whole-image "
                   "resize; accepts arbitrary image sizes.")
    p.add_argument("--buckets", default="512,1024",
                   help="Pipeline mode: comma-separated square size buckets "
                   "images are padded to (one compiled program each).")
    return p.parse_args(argv)


class _Request:
    __slots__ = ("x", "event", "result", "error")

    def __init__(self, x):
        self.x = x            # [1, res, res, 4] float32
        self.event = threading.Event()
        self.result = None    # [res, res, 3] float32 in [-1, 1]
        self.error = None


class MicroBatcher:
    """Single model thread draining a request queue into bucketed batches.

    Buckets are powers of two up to max_batch, so at most log2(max_batch)+1
    programs ever compile; tail slots are zero-padded (the generator is
    fully convolutional — rows are independent)."""

    def __init__(self, forward, resolution: int, max_batch: int = 16,
                 window_ms: float = 2.0):
        self.forward = forward
        self.resolution = resolution
        self.max_batch = max(1, max_batch)
        self.window_s = max(0.0, window_ms) / 1e3
        self.queue: "queue.Queue[_Request]" = queue.Queue()
        self.batch_sizes_served: list = []  # observability
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="migan-batcher")
        self._thread.start()

    def submit(self, x: np.ndarray) -> _Request:
        req = _Request(x)
        self.queue.put(req)
        return req

    def close(self):
        self._stop.set()
        self._thread.join(timeout=5)

    def _bucket(self, n: int) -> int:
        b = 1
        while b < n:
            b *= 2
        return min(b, self.max_batch)

    def warmup(self):
        """Compile every bucket with zero inputs."""
        b = 1
        while True:
            x = np.zeros((b, self.resolution, self.resolution, 4),
                         np.float32)
            np.asarray(self.forward(x))
            if b >= self.max_batch:
                break
            b = min(b * 2, self.max_batch)

    def _drain(self):
        reqs = [self.queue.get(timeout=0.1)]
        deadline = time.perf_counter() + self.window_s
        while len(reqs) < self.max_batch:
            remaining = deadline - time.perf_counter()
            if remaining <= 0:
                break
            try:
                reqs.append(self.queue.get(timeout=remaining))
            except queue.Empty:
                break
        return reqs

    def _run(self):
        while not self._stop.is_set():
            try:
                reqs = self._drain()
            except queue.Empty:
                continue
            try:
                bucket = self._bucket(len(reqs))
                xs = [r.x for r in reqs]
                pad = bucket - len(xs)
                if pad:
                    xs += [np.zeros_like(xs[0])] * pad
                y = np.asarray(self.forward(np.concatenate(xs, axis=0)))
                self.batch_sizes_served.append(len(reqs))
                for i, r in enumerate(reqs):
                    r.result = y[i]
                    r.event.set()
            except Exception as e:  # surface device errors to the client
                for r in reqs:
                    r.error = f"{type(e).__name__}: {e}"
                    r.event.set()


class PipelineRunner:
    """Full-app pipeline executor over size buckets with a BATCHED
    generator stage.

    Each request runs per-request pre (mask-bbox crop + resize to model
    res) and post (paste + feathered composite) programs — one compiled
    pair per size bucket — while the generator forward is submitted to
    the shared MicroBatcher: its [N, res, res, 4] shape is
    bucket-independent, so concurrent requests of ANY sizes batch into
    one MXU dispatch. The crop box is ONE per image (reference contract,
    scripts/create_onnx_pipeline.py:132-231); images pad to the smallest
    bucket that fits (mask pad = 255 = known, so the bbox and therefore
    the generator input are identical to running at the exact image size
    whenever the clamped crop box stays inside the real image); oversize
    images round up to the next multiple of the largest bucket and
    jit-compile on first use. pre/post dispatch concurrently from the
    HTTP handler threads (JAX dispatch is thread-safe; the device stream
    serializes), overlapping their host work with device G batches."""

    def __init__(self, stages, batcher: "MicroBatcher", buckets):
        self.pre, self.post = stages
        self.batcher = batcher
        self.buckets = sorted(int(b) for b in buckets)
        if not self.buckets:
            raise ValueError("pipeline mode needs at least one size bucket")
        self._lock = threading.Lock()    # stats only
        self.bucket_counts: dict = {}    # bucket -> requests served

    def close(self):
        self.batcher.close()

    def bucket_for(self, h: int, w: int) -> int:
        m = max(h, w)
        for b in self.buckets:
            if b >= m:
                return b
        step = self.buckets[-1]
        return ((m + step - 1) // step) * step

    def warmup(self):
        """Compile every configured pre/post bucket and every generator
        batch bucket (no-hole masks: fast + valid)."""
        for b in self.buckets:
            img = np.zeros((1, b, b, 3), np.uint8)
            mask = np.full((1, b, b, 1), 255, np.uint8)
            x, box4 = self.pre(img, mask)
            np.asarray(self.post(img, mask, jnp_zeros_like_out(x), box4))
        self.batcher.warmup()

    def run(self, img_np: np.ndarray, mask_np: np.ndarray) -> np.ndarray:
        """img_np [H,W,3] uint8, mask_np [H,W] uint8 binarized (255=known)
        -> composited [H,W,3] uint8."""
        h, w = img_np.shape[:2]
        b = self.bucket_for(h, w)
        pi = np.zeros((1, b, b, 3), np.uint8)
        pm = np.full((1, b, b, 1), 255, np.uint8)
        pi[0, :h, :w] = img_np
        pm[0, :h, :w, 0] = mask_np
        x, box4 = self.pre(pi, pm)
        req = self.batcher.submit(np.asarray(x))
        req.event.wait()
        if req.error is not None:
            raise RuntimeError(req.error)
        out = np.asarray(self.post(pi, pm, req.result[None], box4))
        with self._lock:
            self.bucket_counts[b] = self.bucket_counts.get(b, 0) + 1
        return out[0, :h, :w]


def jnp_zeros_like_out(x) -> np.ndarray:
    """Zero generator output matching input batch/res (warmup only)."""
    n, res = x.shape[0], x.shape[1]
    return np.zeros((n, res, res, 3), np.float32)


def _decode_pipeline_request(body: bytes):
    """JSON body -> (img [H,W,3] uint8, mask [H,W] uint8 binarized).

    No resizing: pipeline mode keeps original pixels. A mask whose size
    differs from the image is NEAREST-resized to match (the reference
    pipeline requires equal sizes; this is the serving-side convenience)."""
    from PIL import Image

    payload = json.loads(body)
    img = Image.open(io.BytesIO(base64.b64decode(payload["image"])))
    img = img.convert("RGB")
    mask = Image.open(io.BytesIO(base64.b64decode(payload["mask"])))
    mask = read_mask_image(mask, invert=bool(payload.get("invert_mask")))
    if mask.size != img.size:
        mask = mask.resize(img.size, Image.NEAREST)
    return np.asarray(img, np.uint8), np.asarray(mask, np.uint8)


def _decode_request(body: bytes, resolution: int):
    """JSON body -> (x [1,res,res,4], img_resized PIL, mask_resized PIL)."""
    from PIL import Image

    payload = json.loads(body)
    img = Image.open(io.BytesIO(base64.b64decode(payload["image"])))
    img = img.convert("RGB")
    mask = Image.open(io.BytesIO(base64.b64decode(payload["mask"])))
    img_resized = resize_max(img, max_size=resolution)
    mask = read_mask_image(mask, invert=bool(payload.get("invert_mask")))
    mask_resized = resize_max(mask, max_size=resolution,
                              interpolation=Image.NEAREST)
    x = preprocess(img_resized, mask_resized, resolution)
    return x, img_resized, mask_resized


def make_server(forward, resolution: int, host: str, port: int,
                model_name: str, *, max_batch: int = 16,
                window_ms: float = 2.0, pipeline_runner=None):
    """Build (ThreadingHTTPServer, MicroBatcher | PipelineRunner); caller
    runs serve_forever() and owns shutdown. With a `pipeline_runner`,
    /inpaint routes through the full-app pipeline (arbitrary sizes) and
    no micro-batcher is started."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from ..data.preprocess import postprocess

    batcher = (pipeline_runner.batcher if pipeline_runner is not None
               else MicroBatcher(forward, resolution, max_batch=max_batch,
                                 window_ms=window_ms))

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet; stats via /healthz
            pass

        def _send(self, code: int, content_type: str, body: bytes):
            self.send_response(code)
            self.send_header("Content-Type", content_type)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                info = {
                    "status": "ok",
                    "model": model_name,
                    "resolution": resolution,
                }
                served = batcher.batch_sizes_served
                if pipeline_runner is not None:
                    info["mode"] = "pipeline"
                    info["buckets"] = pipeline_runner.buckets
                    info["requests_served"] = sum(
                        pipeline_runner.bucket_counts.values())
                    info["bucket_counts"] = {
                        str(k): v for k, v in
                        sorted(pipeline_runner.bucket_counts.items())}
                else:
                    info["mode"] = "resize"
                    info["requests_served"] = sum(served)
                info["dispatches"] = len(served)
                info["mean_batch"] = (round(sum(served) / len(served), 2)
                                      if served else 0.0)
                self._send(200, "application/json",
                           json.dumps(info).encode())
            else:
                self._send(404, "text/plain", b"not found")

        def _post_pipeline(self, body: bytes):
            try:
                img_np, mask_np = _decode_pipeline_request(body)
            except Exception as e:
                self._send(400, "text/plain",
                           f"bad request: {type(e).__name__}: {e}".encode())
                return
            try:
                out = pipeline_runner.run(img_np, mask_np)
            except Exception as e:  # surface device errors to the client
                self._send(500, "text/plain",
                           f"{type(e).__name__}: {e}".encode())
                return
            from PIL import Image
            buf = io.BytesIO()
            Image.fromarray(out).save(buf, format="PNG")
            self._send(200, "image/png", buf.getvalue())

        def do_POST(self):
            if self.path != "/inpaint":
                self._send(404, "text/plain", b"not found")
                return
            length = int(self.headers.get("Content-Length", "0"))
            body = self.rfile.read(length)
            if pipeline_runner is not None:
                self._post_pipeline(body)
                return
            try:
                x, img_resized, mask_resized = _decode_request(body,
                                                               resolution)
            except Exception as e:
                self._send(400, "text/plain",
                           f"bad request: {type(e).__name__}: {e}".encode())
                return
            req = batcher.submit(x)
            req.event.wait()
            if req.error is not None:
                self._send(500, "text/plain", req.error.encode())
                return
            composed = postprocess(req.result, img_resized, mask_resized)
            buf = io.BytesIO()
            composed.save(buf, format="PNG")
            self._send(200, "image/png", buf.getvalue())

    server = ThreadingHTTPServer((host, port), Handler)
    return server, (pipeline_runner if pipeline_runner is not None
                    else batcher)


def main(argv=None):
    args = get_args(argv)
    from ..utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()

    from .demo import load_model

    forward, resolution = load_model(args.model_name, args.model_path,
                                     args.dtype)
    runner = None
    if args.pipeline:
        from ..export.pipeline import make_pipeline_stages
        stages = make_pipeline_stages(resolution)
        runner = PipelineRunner(
            stages,
            MicroBatcher(forward, resolution, max_batch=args.max_batch,
                         window_ms=args.batch_window_ms),
            args.buckets.split(","))
    server, batcher = make_server(
        forward, resolution, args.host, args.port, args.model_name,
        max_batch=args.max_batch, window_ms=args.batch_window_ms,
        pipeline_runner=runner)
    if args.warmup:
        print("warming up "
              + ("pipeline size buckets..." if args.pipeline
                 else "batch buckets..."), flush=True)
        batcher.warmup()
    mode = (f"pipeline buckets {args.buckets}" if args.pipeline else
            f"max batch {args.max_batch}, window {args.batch_window_ms} ms")
    print(f"serving {args.model_name} on http://{args.host}:{args.port} "
          f"({mode})", flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        batcher.close()
        server.server_close()


if __name__ == "__main__":
    main()
