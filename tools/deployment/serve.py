"""Minimal detection server (reference counterpart:
tools/deployment/mmdet2torchserve.py + mmdet_handler.py — TorchServe
packaging; here the server IS the runtime since a jitted DetectorHandle
is already a self-contained engine).

Endpoints (stdlib http.server — no extra deps):
  GET  /ping                  -> {"status": "ok"}
  POST /predictions/detector  -> body = image bytes (jpg/png);
       response = [{"bbox": [x1, y1, x2, y2], "score": s,
                    "class_name": c, "label": i}, ...]

Usage:
    python tools/deployment/serve.py CONFIG [CHECKPOINT] \
        [--port 8080] [--score-thr 0.3]

The first request pays the XLA compile (cached afterwards); a warmup
inference runs at startup so serving latency is steady-state.
"""
import argparse
import json
import os.path as osp
import sys
import tempfile
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

sys.path.insert(0, osp.join(osp.dirname(__file__), '..', '..'))


def parse_args():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('config')
    ap.add_argument('checkpoint', nargs='?', default=None)
    ap.add_argument('--port', type=int, default=8080)
    ap.add_argument('--host', default='127.0.0.1')
    ap.add_argument('--score-thr', type=float, default=0.3)
    return ap.parse_args()


def make_handler(model, classes, score_thr):
    from swindet_tpu.apis import inference_detector

    class Handler(BaseHTTPRequestHandler):
        def _json(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header('Content-Type', 'application/json')
            self.send_header('Content-Length', str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == '/ping':
                return self._json(200, {'status': 'ok'})
            return self._json(404, {'error': 'unknown endpoint'})

        def do_POST(self):
            if not self.path.startswith('/predictions'):
                return self._json(404, {'error': 'unknown endpoint'})
            n = int(self.headers.get('Content-Length', 0))
            data = self.rfile.read(n)
            with tempfile.NamedTemporaryFile(suffix='.jpg') as f:
                f.write(data)
                f.flush()
                try:
                    result = inference_detector(model, f.name)
                except Exception as e:  # decode/shape errors -> 400
                    return self._json(400, {'error': str(e)})
            bbox_result = result[0] if isinstance(result, tuple) else result
            out = []
            for label, dets in enumerate(bbox_result):
                for det in dets:
                    score = float(det[4])
                    if score < score_thr:
                        continue
                    out.append(dict(
                        bbox=[float(v) for v in det[:4]],
                        score=score, label=label,
                        class_name=(classes[label]
                                    if label < len(classes) else str(label))))
            return self._json(200, out)

        def log_message(self, fmt, *args):  # quiet
            pass

    return Handler


def main():
    args = parse_args()
    from swindet_tpu.apis import init_detector
    model = init_detector(args.config, args.checkpoint)
    handler = make_handler(model, list(model.CLASSES), args.score_thr)
    srv = ThreadingHTTPServer((args.host, args.port), handler)
    print(f'serving detector on http://{args.host}:{args.port} '
          f'(POST image bytes to /predictions/detector)')
    srv.serve_forever()


if __name__ == '__main__':
    main()
