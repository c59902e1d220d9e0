"""Downloader tests against a local HTTP server (no egress needed):
full download, resume-from-partial via Range, retry-on-failure, untar,
unsafe-tar rejection."""

import http.server
import io
import os
import tarfile
import threading

import pytest

from grandtpu.data.download import download, untar

PAYLOAD = os.urandom(3 * (1 << 16))


class RangeHandler(http.server.BaseHTTPRequestHandler):
    fail_first = {"count": 0}
    files: dict = {}   # path -> bytes overrides (default: PAYLOAD)

    def do_GET(self):
        if self.path == "/flaky" and RangeHandler.fail_first["count"] > 0:
            RangeHandler.fail_first["count"] -= 1
            self.send_response(500)
            self.end_headers()
            return
        data = RangeHandler.files.get(self.path, PAYLOAD)
        rng = self.headers.get("Range")
        if rng:
            start = int(rng.split("=")[1].rstrip("-").split("-")[0])
            body = data[start:]
            self.send_response(206)
            self.send_header("Content-Range",
                             f"bytes {start}-{len(data)-1}/{len(data)}")
        else:
            body = data
            self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):
        pass


@pytest.fixture(scope="module")
def server():
    httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), RangeHandler)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def test_full_download(server, tmp_path):
    out = download(f"{server}/file.bin", str(tmp_path), log=lambda *a: None)
    assert open(out, "rb").read() == PAYLOAD


def test_resume_from_partial(server, tmp_path):
    part = tmp_path / "file.bin.part"
    part.write_bytes(PAYLOAD[:1000])
    out = download(f"{server}/file.bin", str(tmp_path),
                   log=lambda *a: None)
    assert open(out, "rb").read() == PAYLOAD


def test_retry_then_succeed(server, tmp_path):
    RangeHandler.fail_first["count"] = 2
    out = download(f"{server}/flaky", str(tmp_path), fname="flaky.bin",
                   backoff=1.0, log=lambda *a: None)
    assert open(out, "rb").read() == PAYLOAD


def test_gives_up_after_retries(server, tmp_path):
    RangeHandler.fail_first["count"] = 99
    with pytest.raises(IOError):
        download(f"{server}/flaky", str(tmp_path), fname="dead.bin",
                 max_retries=2, backoff=1.0, log=lambda *a: None)
    RangeHandler.fail_first["count"] = 0


def test_existing_file_skipped(server, tmp_path):
    (tmp_path / "file.bin").write_bytes(b"old")
    out = download(f"{server}/file.bin", str(tmp_path),
                   log=lambda *a: None)
    assert open(out, "rb").read() == b"old"  # untouched


def test_untar_roundtrip(tmp_path):
    src = tmp_path / "payload.txt"
    src.write_text("hello grand")
    tar_p = tmp_path / "a.tar.gz"
    with tarfile.open(tar_p, "w:gz") as tf:
        tf.add(src, arcname="inner/payload.txt")
    untar(str(tar_p), log=lambda *a: None)
    assert (tmp_path / "inner" / "payload.txt").read_text() == "hello grand"


def test_untar_rejects_escape(tmp_path):
    tar_p = tmp_path / "evil.tar"
    data = b"pwn"
    with tarfile.open(tar_p, "w") as tf:
        info = tarfile.TarInfo("../../escape.txt")
        info.size = len(data)
        tf.addfile(info, io.BytesIO(data))
    with pytest.raises(ValueError, match="unsafe"):
        untar(str(tar_p), log=lambda *a: None)


def test_unzip_roundtrip_and_escape(tmp_path):
    import zipfile
    from grandtpu.data.download import unzip
    zp = tmp_path / "a.zip"
    with zipfile.ZipFile(zp, "w") as zf:
        zf.writestr("inner/payload.txt", "hello zip")
    unzip(str(zp), log=lambda *a: None)
    assert (tmp_path / "inner" / "payload.txt").read_text() == "hello zip"
    evil = tmp_path / "evil.zip"
    with zipfile.ZipFile(evil, "w") as zf:
        zf.writestr("../../escape.txt", "pwn")
    with pytest.raises(ValueError, match="unsafe"):
        unzip(str(evil), log=lambda *a: None)


def test_fetch_dataset_registry(server, tmp_path, monkeypatch):
    """fetch_dataset: registered URL -> resumable download -> extract."""
    import zipfile
    from grandtpu.data import download as dl

    # serve a zip through the range-serving test server
    payload = io.BytesIO()
    with zipfile.ZipFile(payload, "w") as zf:
        zf.writestr("aminer/adj.pkl", b"\x00fake")
    RangeHandler.files["/aminer.zip"] = payload.getvalue()
    monkeypatch.setitem(dl.DATASET_URLS, "aminer",
                        (f"{server}/aminer.zip", "aminer.zip"))
    out_dir = dl.fetch_dataset("aminer", str(tmp_path),
                               log=lambda *a: None)
    assert (tmp_path / "aminer" / "adj.pkl").read_bytes() == b"\x00fake"
    assert out_dir == str(tmp_path)
    with pytest.raises(KeyError, match="no registered URL"):
        dl.fetch_dataset("nope", str(tmp_path))
