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

Dynamic request micro-batching: batch-1 request latency through the
device relay is dominated by the round trip (~30-40 ms measured —
BASELINE.md), so per-request dispatch caps server throughput at
1/latency regardless of the chip's batch throughput. Concurrent
requests are therefore coalesced: a request enqueues and a single
worker drains the queue, waiting up to ``batch_window_ms`` after the
first pending request for stragglers, merges all compatible payloads
(same series-name set) into ONE dataset, runs the model once, and
splits the outputs back per request. Inference iterates datasets in
order and batch padding is semantically inert (masks), so merged
results match per-request runs — byte-identically on CPU (tested);
on TPU, logit reassociation noise (~6e-4, BASELINE.md) can in rare
cases flip a near-tie beam decision when the batch composition
changes. ``batch_window_ms=0`` still coalesces whatever is already
queued — it only skips the wait.

Usage: python -m neuralmonkey_tpu.server --configuration exp.ini
           [--port 5000] [--batch-window-ms 10] [--max-batch 256]
"""

from __future__ import annotations

import argparse
import json
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, List, Optional

from .dataset import from_dict
from .experiment import Experiment
from .logging import log, warn


class _PendingRequest:
    """One enqueued payload awaiting the batching worker."""

    __slots__ = ("series", "rows", "event", "outputs", "error")

    def __init__(self, series: Dict[str, List], rows: int) -> None:
        self.series = series
        self.rows = rows
        self.event = threading.Event()
        self.outputs: Optional[Dict[str, List]] = None
        self.error: Optional[Exception] = None


class ModelService:
    """Holds the experiment; coalesces concurrent requests into one
    model call (dynamic micro-batching, see module docstring)."""

    def __init__(self, experiment: Experiment,
                 batch_window_ms: float = 10.0,
                 max_batch: int = 256) -> None:
        self.experiment = experiment
        self.batch_window_ms = batch_window_ms
        self.max_batch = max_batch
        # instrumentation (read by tests and bench.py --serve);
        # merged_requests_total / merged_rows_total accumulate per
        # model call so mean merged batch size = *_total / model_calls
        # is a wall-clock-free efficiency measure of the batching
        self.stats = {"requests": 0, "model_calls": 0,
                      "max_merged_requests": 0, "max_merged_rows": 0,
                      "merged_requests_total": 0,
                      "merged_rows_total": 0}
        self._cond = threading.Condition()
        self._queue: List[_PendingRequest] = []
        self._closed = False
        self._worker = threading.Thread(
            target=self._serve_loop, name="nm-microbatcher", daemon=True)
        self._worker.start()

    # -------------------------------------------------------------- #
    def run(self, payload: Dict[str, List]) -> Dict[str, List]:
        """Validate + tokenize, enqueue, block until the batch worker
        fulfills the request. Called from handler threads."""
        series: Dict[str, List] = {}
        rows = None
        for name, sentences in payload.items():
            if not isinstance(sentences, list):
                raise ValueError(f"Series '{name}' must be a list")
            tokenized = [
                s.split() if isinstance(s, str) else list(s)
                for s in sentences]
            if rows is None:
                rows = len(tokenized)
            elif len(tokenized) != rows:
                raise ValueError(
                    "All series in one request must have the same "
                    f"number of sentences ('{name}' has "
                    f"{len(tokenized)}, expected {rows})")
            series[name] = tokenized
        if not series or not rows:
            return {}

        pending = _PendingRequest(series, rows)
        with self._cond:
            if self._closed:
                raise RuntimeError("server is shutting down")
            self.stats["requests"] += 1
            self._queue.append(pending)
            self._cond.notify_all()
        pending.event.wait()
        if pending.error is not None:
            raise pending.error
        return pending.outputs

    def close(self) -> None:
        """Stop accepting requests, drain the queue, and JOIN the
        worker — a leaked daemon thread mid-model-call races backend
        teardown (same crash class as the prefetch worker)."""
        with self._cond:
            self._closed = True
            self._cond.notify_all()
        if self._worker.is_alive():
            self._worker.join(timeout=60.0)
            if self._worker.is_alive():
                warn("micro-batch worker did not stop within 60s; "
                     "a model call may still be in flight")

    # -------------------------------------------------------------- #
    def _take_group(self) -> List[_PendingRequest]:
        """Pop the longest key-compatible prefix run of the queue
        (first-come order; requests with a different series set stay
        queued for the next cycle)."""
        keys = frozenset(self._queue[0].series.keys())
        group: List[_PendingRequest] = []
        rows = 0
        while self._queue:
            nxt = self._queue[0]
            if frozenset(nxt.series.keys()) != keys:
                break
            if group and rows + nxt.rows > self.max_batch:
                break
            group.append(self._queue.pop(0))
            rows += nxt.rows
        return group

    def _serve_loop(self) -> None:
        try:
            while True:
                with self._cond:
                    while not self._queue and not self._closed:
                        self._cond.wait()
                    if self._closed and not self._queue:
                        return
                    # batching window: linger for stragglers after the
                    # first request lands (skipped when window is 0 or
                    # the batch is already full)
                    deadline = (time.monotonic()
                                + self.batch_window_ms / 1e3)
                    while (not self._closed
                           and sum(p.rows for p in self._queue)
                           < self.max_batch):
                        remaining = deadline - time.monotonic()
                        if remaining <= 0:
                            break
                        self._cond.wait(timeout=remaining)
                    group = self._take_group()
                self._execute(group)
        except BaseException as exc:  # worker must never die silently:
            # handlers block on pending.event with no timeout, so an
            # unfulfilled request would hang its client forever
            with self._cond:
                self._closed = True
                orphans = list(self._queue)
                self._queue.clear()
                self._cond.notify_all()
            for pending in orphans:
                pending.error = RuntimeError(
                    f"batching worker crashed: {exc!r}")
                pending.event.set()
            raise

    def _execute(self, group: List[_PendingRequest]) -> None:
        merged: Dict[str, List] = {
            name: [] for name in group[0].series}
        for pending in group:
            for name, sentences in pending.series.items():
                merged[name].extend(sentences)
        self.stats["model_calls"] += 1
        self.stats["merged_requests_total"] += len(group)
        self.stats["merged_rows_total"] += sum(p.rows for p in group)
        self.stats["max_merged_requests"] = max(
            self.stats["max_merged_requests"], len(group))
        self.stats["max_merged_rows"] = max(
            self.stats["max_merged_rows"],
            sum(p.rows for p in group))
        try:
            self._run_split(merged, group)
        except Exception as exc:  # pylint: disable=broad-except
            if len(group) == 1:
                group[0].error = exc
            else:
                # one bad request must not fail the whole merged
                # group — rerun each request individually so only the
                # offender sees the error
                for pending in group:
                    try:
                        self._run_split(pending.series, [pending])
                    except Exception as solo:  # pylint: disable=broad-except
                        pending.error = solo
        except BaseException as exc:
            # SystemExit/KeyboardInterrupt escaping run_model: the
            # finally below completes the in-flight events, and
            # without an error mark those clients would receive a
            # bogus HTTP 200 "null" — fail them explicitly, then let
            # the worker's crash handler fail the still-queued rest
            for pending in group:
                pending.error = RuntimeError(
                    f"batching worker crashed: {exc!r}")
            raise
        finally:
            for pending in group:
                pending.event.set()

    def _run_split(self, merged: Dict[str, List],
                   group: List[_PendingRequest]) -> None:
        """One model call over ``merged``; split each output series
        back per request by row count."""
        total_rows = sum(p.rows for p in group)
        dataset = from_dict(merged, name="request")
        _, outputs = self.experiment.run_model(dataset)
        clean = {}
        for name, data in outputs.items():
            if len(data) != total_rows:
                # a runner output that is not one-item-per-sentence
                # cannot be split across coalesced requests
                raise RuntimeError(
                    f"output series '{name}' has {len(data)} items "
                    f"for {total_rows} input sentences; cannot split "
                    "a merged batch")
            clean[name] = [
                item if isinstance(item, (list, str, float, int))
                else getattr(item, "tolist", lambda: str(item))()
                for item in data]
        offset = 0
        for pending in group:
            pending.outputs = {
                name: data[offset:offset + pending.rows]
                for name, data in clean.items()}
            offset += pending.rows


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
    parser.add_argument("--batch-window-ms", type=float, default=10.0,
                        help="how long to linger for request "
                             "coalescing after the first pending "
                             "request (0 = no wait, still merges "
                             "whatever is already queued)")
    parser.add_argument("--max-batch", type=int, default=256,
                        help="maximum merged sentences per model call")
    args = parser.parse_args(argv)

    exp = Experiment(args.configuration, train_mode=False)
    exp.build_model()
    exp.restore_variables(args.checkpoints or None,
                          average=args.average)
    service = ModelService(exp, batch_window_ms=args.batch_window_ms,
                           max_batch=args.max_batch)

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
