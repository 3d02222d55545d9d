"""Logbook web UI smoke test."""

import json
import threading
import urllib.error
import urllib.request
from http.server import ThreadingHTTPServer

import pytest

from neuralmonkey_tpu.logbook import make_handler


def test_logbook_lists_and_serves(tmp_path):
    exp = tmp_path / "my_exp"
    exp.mkdir()
    (exp / "experiment.ini").write_text("[main]\nname=\"x\"\n")
    (exp / "experiment.log").write_text("hello log\n")
    (exp / "metrics.jsonl").write_text(
        json.dumps({"kind": "val", "step": 10,
                    "target/BLEU-4": 12.5}) + "\n")
    (tmp_path / "not_an_experiment").mkdir()

    server = ThreadingHTTPServer(("127.0.0.1", 0),
                                 make_handler(str(tmp_path)))
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        base = f"http://127.0.0.1:{port}"
        index = urllib.request.urlopen(base + "/", timeout=10
                                       ).read().decode()
        assert "my_exp" in index
        assert "not_an_experiment" not in index

        page = urllib.request.urlopen(
            base + "/experiment/my_exp", timeout=10).read().decode()
        assert "experiment.log" in page
        assert "BLEU" in page

        content = urllib.request.urlopen(
            base + "/experiment/my_exp/experiment.log",
            timeout=10).read().decode()
        assert "hello log" in content

        # path traversal is blocked
        with pytest.raises(urllib.error.HTTPError):
            urllib.request.urlopen(
                base + "/experiment/my_exp/..%2F..%2Fetc%2Fpasswd",
                timeout=10)
    finally:
        server.shutdown()
