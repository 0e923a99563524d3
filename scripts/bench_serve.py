"""Load-test the HTTP serving surface (cli/serve.py).

Starts the server in-process (no network beyond loopback), fires
--clients concurrent closed-loop clients each sending --requests-each
inpaint requests (pre-encoded base64 payloads, real PNG decode/encode on
both ends), and reports end-to-end throughput + latency percentiles +
the micro-batcher's batch-size histogram.

    python scripts/bench_serve.py --model-name migan-256 \
        --model-path /tmp/w.npz --clients 32 --requests-each 8

This measures the full serving stack (HTTP + base64 + PNG codec + host
pre/post + device micro-batched forward) — the app-level counterpart of
bench.py's device-only numbers. With --pipeline, clients send
arbitrary-size (non-bucket, non-square) payloads through the full-app
pipeline path instead and the report carries per-bucket dispatch counts.
"""

import argparse
import base64
import io
import json
import os
import sys
import threading
import time
import urllib.request

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def get_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model-name", default="migan-256")
    p.add_argument("--model-path", required=True)
    p.add_argument("--dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--clients", type=int, default=32)
    p.add_argument("--requests-each", type=int, default=8)
    p.add_argument("--max-batch", type=int, default=32)
    p.add_argument("--batch-window-ms", type=float, default=5.0)
    p.add_argument("--pipeline", action="store_true",
                   help="Load-test pipeline mode: arbitrary-size payloads "
                   "through the bbox-crop/feathered-composite app pipeline "
                   "(per-request pre/post programs; the generator forwards "
                   "micro-batch across concurrent requests).")
    p.add_argument("--buckets", default="512,1024",
                   help="Pipeline mode size buckets.")
    p.add_argument("--image-size", type=int, default=0,
                   help="Pipeline mode payload height (width = 7/8 of it); "
                   "default 0 = 3/4 of the largest bucket.")
    return p.parse_args()


def main():
    args = get_args()
    from migan_tpu.cli.demo import load_model
    from migan_tpu.cli.serve import make_server
    from migan_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    forward, resolution = load_model(args.model_name, args.model_path,
                                     args.dtype)
    runner = None
    if args.pipeline:
        from migan_tpu.cli.serve import MicroBatcher, PipelineRunner
        from migan_tpu.export.pipeline import make_pipeline_stages

        runner = PipelineRunner(
            make_pipeline_stages(resolution),
            MicroBatcher(forward, resolution, max_batch=args.max_batch,
                         window_ms=args.batch_window_ms),
            args.buckets.split(","))
    server, batcher = make_server(forward, resolution, "127.0.0.1", 0,
                                  args.model_name, max_batch=args.max_batch,
                                  window_ms=args.batch_window_ms,
                                  pipeline_runner=runner)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    port = server.server_address[1]

    print("warming up "
          + ("pipeline size buckets..." if args.pipeline
             else "batch buckets..."), file=sys.stderr)
    batcher.warmup()

    # One payload per client (distinct images; encode cost paid up front —
    # clients still pay decode of the response PNG per request).
    rng = np.random.RandomState(0)
    payloads = []
    from PIL import Image

    if args.pipeline:
        ph = args.image_size or (runner.buckets[-1] * 3 // 4)
        pw = ph * 7 // 8  # non-square: exercises the padding path
    else:
        ph = pw = resolution
    for _ in range(args.clients):
        img = (rng.rand(ph, pw, 3) * 255).astype(np.uint8)
        mask = np.full((ph, pw), 255, np.uint8)
        mask[ph // 4: 3 * ph // 4, pw // 4: 3 * pw // 4] = 0
        b = io.BytesIO()
        Image.fromarray(img).save(b, format="PNG")
        mb = io.BytesIO()
        Image.fromarray(mask).convert("L").save(mb, format="PNG")
        payloads.append(json.dumps({
            "image": base64.b64encode(b.getvalue()).decode(),
            "mask": base64.b64encode(mb.getvalue()).decode(),
        }).encode())

    lat = []
    lat_lock = threading.Lock()
    errors = []

    def client(i):
        for _ in range(args.requests_each):
            t0 = time.perf_counter()
            try:
                req = urllib.request.Request(
                    f"http://127.0.0.1:{port}/inpaint", data=payloads[i])
                with urllib.request.urlopen(req, timeout=600) as resp:
                    png = resp.read()
                Image.open(io.BytesIO(png)).load()  # client-side decode
            except Exception as e:  # pragma: no cover
                errors.append(repr(e))
                return
            with lat_lock:
                lat.append(time.perf_counter() - t0)

    g_batcher = runner.batcher if args.pipeline else batcher
    n0 = len(g_batcher.batch_sizes_served)
    threads = [threading.Thread(target=client, args=(i,))
               for i in range(args.clients)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0

    if errors:
        print(json.dumps({"error": errors[:3], "n_errors": len(errors)}))
        sys.exit(1)
    lat_ms = np.sort(np.asarray(lat)) * 1e3
    out = {
        "serve_imgs_per_sec": round(len(lat) / wall, 2),
        "clients": args.clients,
        "requests": len(lat),
        "p50_ms": round(float(lat_ms[len(lat_ms) // 2]), 1),
        "p95_ms": round(float(lat_ms[int(len(lat_ms) * 0.95)]), 1),
    }
    served = g_batcher.batch_sizes_served[n0:]
    hist = {}
    for b in served:
        hist[str(b)] = hist.get(str(b), 0) + 1
    out["mean_batch"] = round(sum(served) / max(1, len(served)), 2)
    out["batch_hist"] = hist
    if args.pipeline:
        out["mode"] = "pipeline"
        out["payload_hw"] = [ph, pw]
        out["bucket_counts"] = {str(k): v for k, v in
                                sorted(batcher.bucket_counts.items())}
    print(json.dumps(out))
    server.shutdown()
    batcher.close()
    server.server_close()


if __name__ == "__main__":
    main()
