"""Experiment logbook (reference nm/logbook/): a small web UI for
browsing experiment output directories — configs, logs, metrics —
served from the standard library.

Usage: python -m neuralmonkey_tpu.logbook --logdir <experiments_root>
           [--port 5001]
"""

from __future__ import annotations

from typing import List, Optional

import argparse
import html
import json
import os
import sys
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import unquote

from .logging import log

_STYLE = """
body { font-family: sans-serif; margin: 2em; color: #222; }
h1 { font-size: 1.3em; } h2 { font-size: 1.1em; margin-top: 1.5em; }
table { border-collapse: collapse; }
td, th { border: 1px solid #ccc; padding: 4px 10px; text-align: left; }
pre { background: #f6f6f6; padding: 1em; overflow-x: auto; }
a { color: #06c; }
"""


def _page(title: str, body: str) -> bytes:
    return (f"<!doctype html><html><head><title>{html.escape(title)}"
            f"</title><style>{_STYLE}</style></head>"
            f"<body><h1>{html.escape(title)}</h1>{body}"
            "</body></html>").encode("utf-8")


def _is_experiment(path: str) -> bool:
    return os.path.isdir(path) and any(
        name.startswith(("experiment.ini", "experiment.log",
                         "metrics.jsonl"))
        for name in os.listdir(path))


def _experiment_summary(path: str) -> dict:
    summary = {"best": None, "steps": 0}
    metrics_path = os.path.join(path, "metrics.jsonl")
    if os.path.exists(metrics_path):
        with open(metrics_path, encoding="utf-8") as f:
            for line in f:
                try:
                    record = json.loads(line)
                except json.JSONDecodeError:
                    continue
                summary["steps"] = max(summary["steps"],
                                       record.get("step", 0))
    return summary


def make_handler(logdir: str):

    class Handler(BaseHTTPRequestHandler):

        def _send(self, body: bytes,
                  content_type: str = "text/html") -> None:
            self.send_response(200)
            self.send_header("Content-Type", content_type)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _not_found(self) -> None:
            self.send_response(404)
            self.end_headers()

        def do_GET(self):  # noqa: N802
            parts = [unquote(p) for p in self.path.split("/") if p]
            if not parts:
                return self._index()
            if parts[0] == "experiment" and len(parts) >= 2:
                name = parts[1]
                exp_dir = os.path.realpath(os.path.join(logdir, name))
                if not exp_dir.startswith(os.path.realpath(logdir)) \
                        or not os.path.isdir(exp_dir):
                    return self._not_found()
                if len(parts) == 2:
                    return self._experiment(name, exp_dir)
                return self._file(exp_dir, parts[2])
            return self._not_found()

        def _index(self) -> None:
            rows = []
            for name in sorted(os.listdir(logdir)):
                path = os.path.join(logdir, name)
                if _is_experiment(path):
                    info = _experiment_summary(path)
                    rows.append(
                        f"<tr><td><a href='/experiment/{name}'>"
                        f"{html.escape(name)}</a></td>"
                        f"<td>{info['steps']}</td></tr>")
            body = ("<table><tr><th>experiment</th><th>steps</th></tr>"
                    + "".join(rows) + "</table>") if rows else \
                "<p>No experiments found.</p>"
            self._send(_page(f"Logbook — {logdir}", body))

        def _experiment(self, name: str, exp_dir: str) -> None:
            files = sorted(os.listdir(exp_dir))
            links = "".join(
                f"<li><a href='/experiment/{name}/{f}'>"
                f"{html.escape(f)}</a></li>"
                for f in files if os.path.isfile(
                    os.path.join(exp_dir, f)))
            metrics_html = ""
            metrics_path = os.path.join(exp_dir, "metrics.jsonl")
            if os.path.exists(metrics_path):
                records = []
                with open(metrics_path, encoding="utf-8") as f:
                    for line in f:
                        try:
                            records.append(json.loads(line))
                        except json.JSONDecodeError:
                            pass
                val = [r for r in records if r.get("kind") == "val"]
                if val:
                    keys = [k for k in val[-1]
                            if k not in ("kind", "step", "time")]
                    head = "".join(f"<th>{html.escape(k)}</th>"
                                   for k in ["step"] + keys)
                    rows = "".join(
                        "<tr><td>{}</td>{}</tr>".format(
                            r.get("step"),
                            "".join(
                                f"<td>{r.get(k, ''):.4g}</td>"
                                if isinstance(r.get(k), float)
                                else f"<td>{r.get(k, '')}</td>"
                                for k in keys))
                        for r in val)
                    metrics_html = (f"<h2>Validation</h2><table>"
                                    f"<tr>{head}</tr>{rows}</table>")
            body = f"<ul>{links}</ul>{metrics_html}"
            self._send(_page(f"Experiment {name}", body))

        def _file(self, exp_dir: str, filename: str) -> None:
            path = os.path.realpath(os.path.join(exp_dir, filename))
            if not path.startswith(exp_dir) or not os.path.isfile(path):
                return self._not_found()
            if path.endswith((".ini", ".log", ".jsonl", ".txt")) or \
                    os.path.getsize(path) < 1024 * 1024:
                try:
                    with open(path, encoding="utf-8",
                              errors="replace") as f:
                        content = f.read()
                    self._send(_page(
                        filename,
                        f"<pre>{html.escape(content)}</pre>"))
                    return
                except OSError:
                    pass
            self._not_found()

        def log_message(self, fmt, *args):
            pass

    return Handler


def main(argv: Optional[List[str]] = None) -> int:
    parser = argparse.ArgumentParser(prog="neuralmonkey-logbook")
    parser.add_argument("--logdir", required=True,
                        help="directory containing experiment outputs")
    parser.add_argument("--port", type=int, default=5001)
    parser.add_argument("--host", default="127.0.0.1")
    args = parser.parse_args(argv)

    server = ThreadingHTTPServer(
        (args.host, args.port), make_handler(args.logdir))
    log(f"Logbook on http://{args.host}:{args.port} "
        f"(root: {args.logdir})")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    return 0


if __name__ == "__main__":
    sys.exit(main())
