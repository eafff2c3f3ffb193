"""Minimal in-process GCS JSON-API emulator (stdlib http.server) — enough
of the public protocol (cloud.google.com/storage/docs/json_api) to drive
pyarrow's real GcsFileSystem (google-cloud-cpp REST client) end-to-end
over live HTTP, the same role moto's ThreadedMotoServer plays for S3 in
TestRemoteScheme:

  * object metadata   GET    /storage/v1/b/{b}/o/{url-encoded name}
  * media download    ...same with ?alt=media (honors Range)
  * object listing    GET    /storage/v1/b/{b}/o?prefix=&delimiter=&pageToken=
  * bucket metadata   GET    /storage/v1/b/{b}
  * resumable upload  POST   /upload/storage/v1/b/{b}/o?uploadType=resumable
                      PUT    session URI with Content-Range (308 → 200)
  * single-shot/multipart upload (uploadType=media|multipart)
  * delete            DELETE /storage/v1/b/{b}/o/{name}

In-memory store; crc32c (Castagnoli, table-driven) is served in metadata
because google-cloud-cpp validates download checksums when present.

RUN IT AS A SUBPROCESS (spawn_emulator / `python gcs_emulator.py`):
pyarrow's GcsFileSystem blocks the GIL inside google-cloud-cpp during
media reads, so an in-thread server deadlocks the moment the SAME python
process reads object data (metadata/list calls are fine). A subprocess
server — the same shape as running fake-gcs-server — serves the driver
process, every Spark python worker, and the test itself without that
hazard. Seeding then goes through the real wire protocol too (resumable
uploads via open_output_stream), not store pokes.
"""

from __future__ import annotations

import json
import re
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def _crc32c_table():
    poly = 0x82F63B78
    tbl = []
    for n in range(256):
        c = n
        for _ in range(8):
            c = (c >> 1) ^ poly if c & 1 else c >> 1
        tbl.append(c)
    return tbl


_TBL = _crc32c_table()


def crc32c(data: bytes) -> int:
    c = 0xFFFFFFFF
    for b in data:
        c = _TBL[(c ^ b) & 0xFF] ^ (c >> 8)
    return c ^ 0xFFFFFFFF


def _crc32c_b64(data: bytes) -> str:
    import base64

    return base64.b64encode(crc32c(data).to_bytes(4, "big")).decode()


class GcsEmulator:
    """store: {bucket: {object_name: bytes}}; uploads: upload_id → state."""

    def __init__(self):
        self.store: dict[str, dict[str, bytes]] = {}
        self.uploads: dict[str, dict] = {}
        self.generation = 0
        self._lock = threading.Lock()
        emu = self

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def log_message(self, *a):
                pass

            def _send(self, code: int, body: bytes = b"",
                      ctype: str = "application/json", extra=None):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                for k, v in (extra or {}).items():
                    self.send_header(k, v)
                self.end_headers()
                if body:
                    self.wfile.write(body)

            def _json(self, code: int, obj, extra=None):
                self._send(code, json.dumps(obj).encode(), extra=extra)

            def _error(self, code: int, msg: str):
                self._json(code, {"error": {"code": code, "message": msg,
                                            "errors": []}})

            def _read_body(self) -> bytes:
                n = int(self.headers.get("Content-Length") or 0)
                return self.rfile.read(n) if n else b""

            # -- protocol -----------------------------------------------
            def do_GET(self):
                parsed = urllib.parse.urlsplit(self.path)
                q = urllib.parse.parse_qs(parsed.query)
                path = parsed.path
                m = re.fullmatch(r"/(?:download/)?storage/v1/b/([^/]+)/o/(.+)",
                                 path)
                if m:
                    bucket = urllib.parse.unquote(m.group(1))
                    name = urllib.parse.unquote(m.group(2))
                    data = emu.store.get(bucket, {}).get(name)
                    if data is None:
                        return self._error(404, f"object {name} not found")
                    if q.get("alt", [""])[0] == "media":
                        rng = self.headers.get("Range")
                        lo, hi = 0, len(data) - 1
                        if rng:
                            mm = re.fullmatch(r"bytes=(\d*)-(\d*)", rng.strip())
                            if mm:
                                if mm.group(1):
                                    lo = int(mm.group(1))
                                    hi = (int(mm.group(2)) if mm.group(2)
                                          else len(data) - 1)
                                elif mm.group(2):     # suffix range
                                    lo = max(0, len(data) - int(mm.group(2)))
                        hi = min(hi, len(data) - 1)
                        chunk = data[lo:hi + 1]
                        extra = {"x-goog-generation": "1"}
                        if rng:
                            extra["Content-Range"] = \
                                f"bytes {lo}-{hi}/{len(data)}"
                            return self._send(206, chunk,
                                              "application/octet-stream",
                                              extra)
                        return self._send(200, chunk,
                                          "application/octet-stream", extra)
                    return self._json(200, emu.meta(bucket, name))
                m = re.fullmatch(r"/storage/v1/b/([^/]+)/o", path)
                if m:
                    bucket = urllib.parse.unquote(m.group(1))
                    if bucket not in emu.store:
                        return self._error(404, f"bucket {bucket} not found")
                    prefix = q.get("prefix", [""])[0]
                    delim = q.get("delimiter", [""])[0]
                    items, prefixes = [], set()
                    for name in sorted(emu.store[bucket]):
                        if not name.startswith(prefix):
                            continue
                        if delim:
                            rest = name[len(prefix):]
                            if delim in rest:
                                prefixes.add(
                                    prefix + rest.split(delim)[0] + delim)
                                continue
                        items.append(emu.meta(bucket, name))
                    out = {"kind": "storage#objects", "items": items}
                    if prefixes:
                        out["prefixes"] = sorted(prefixes)
                    return self._json(200, out)
                m = re.fullmatch(r"/storage/v1/b/([^/]+)", path)
                if m:
                    bucket = urllib.parse.unquote(m.group(1))
                    if bucket not in emu.store:
                        return self._error(404, f"bucket {bucket} not found")
                    return self._json(200, {
                        "kind": "storage#bucket", "id": bucket,
                        "name": bucket, "location": "US",
                        "storageClass": "STANDARD", "etag": "e",
                        "timeCreated": "2026-01-01T00:00:00Z",
                        "updated": "2026-01-01T00:00:00Z",
                        "metageneration": "1", "projectNumber": "1"})
                return self._error(404, f"no route: {path}")

            def do_POST(self):
                parsed = urllib.parse.urlsplit(self.path)
                q = urllib.parse.parse_qs(parsed.query)
                m = re.fullmatch(r"/upload/storage/v1/b/([^/]+)/o",
                                 parsed.path)
                if not m:
                    return self._error(404, f"no route: {parsed.path}")
                bucket = urllib.parse.unquote(m.group(1))
                if bucket not in emu.store:
                    return self._error(404, f"bucket {bucket} not found")
                utype = q.get("uploadType", [""])[0]
                name = q.get("name", [""])[0]
                body = self._read_body()
                if utype == "resumable":
                    if not name:  # may ride in the JSON body
                        try:
                            name = json.loads(body.decode() or "{}") \
                                .get("name", "")
                        except ValueError:
                            name = ""
                    with emu._lock:
                        uid = f"up{len(emu.uploads)}"
                        emu.uploads[uid] = {"bucket": bucket, "name": name,
                                            "data": bytearray()}
                    host = self.headers.get("Host", "127.0.0.1")
                    loc = (f"http://{host}/upload/storage/v1/b/{bucket}/o"
                           f"?uploadType=resumable&upload_id={uid}")
                    return self._json(200, {}, extra={"Location": loc})
                if utype == "multipart":
                    ctype = self.headers.get("Content-Type", "")
                    mm = re.search(r'boundary="?([^";]+)"?', ctype)
                    if not mm:
                        return self._error(400, "missing multipart boundary")
                    sep = b"--" + mm.group(1).encode()
                    parts = [p for p in body.split(sep) if p.strip(b"-\r\n")]
                    meta_part, data_part = parts[0], parts[1]
                    mjson = meta_part.split(b"\r\n\r\n", 1)[1]
                    name = json.loads(mjson.decode()).get("name", name)
                    data = data_part.split(b"\r\n\r\n", 1)[1]
                    if data.endswith(b"\r\n"):
                        data = data[:-2]
                    emu.put(bucket, name, bytes(data))
                    return self._json(200, emu.meta(bucket, name))
                # uploadType=media
                emu.put(bucket, name, body)
                return self._json(200, emu.meta(bucket, name))

            def do_PUT(self):
                parsed = urllib.parse.urlsplit(self.path)
                q = urllib.parse.parse_qs(parsed.query)
                uid = q.get("upload_id", [""])[0]
                up = emu.uploads.get(uid)
                if up is None:
                    return self._error(404, f"upload {uid} not found")
                body = self._read_body()
                crange = self.headers.get("Content-Range", "")
                # "bytes 0-99/100", "bytes 0-99/*", or "bytes */N" (query)
                mm = re.fullmatch(r"bytes (\d+)-(\d+)/(\d+|\*)",
                                  crange.strip())
                qq = re.fullmatch(r"bytes \*/(\d+|\*)", crange.strip())
                if mm:
                    lo = int(mm.group(1))
                    buf = up["data"]
                    if len(buf) < lo:
                        return self._error(400, "upload gap")
                    buf[lo:lo + len(body)] = body
                    total = mm.group(3)
                    if total != "*" and len(buf) >= int(total):
                        emu.put(up["bucket"], up["name"], bytes(buf))
                        return self._json(200, emu.meta(up["bucket"],
                                                        up["name"]))
                    hi = lo + len(body) - 1
                    return self._send(308, extra={
                        "Range": f"bytes=0-{hi}" if len(buf) else "bytes=0--1"})
                if qq or not crange:
                    total = qq.group(1) if qq else "*"
                    if total != "*" and len(up["data"]) >= int(total):
                        emu.put(up["bucket"], up["name"], bytes(up["data"]))
                        return self._json(200, emu.meta(up["bucket"],
                                                        up["name"]))
                    if total == "0" or (total == "*" and not body):
                        # finalize an empty upload
                        emu.put(up["bucket"], up["name"], bytes(up["data"]))
                        return self._json(200, emu.meta(up["bucket"],
                                                        up["name"]))
                    n = len(up["data"])
                    return self._send(308, extra={
                        "Range": f"bytes=0-{n - 1}" if n else "bytes=0--1"})
                return self._error(400, f"bad Content-Range: {crange}")

            def do_DELETE(self):
                parsed = urllib.parse.urlsplit(self.path)
                m = re.fullmatch(r"/storage/v1/b/([^/]+)/o/(.+)", parsed.path)
                if m:
                    bucket = urllib.parse.unquote(m.group(1))
                    name = urllib.parse.unquote(m.group(2))
                    if emu.store.get(bucket, {}).pop(name, None) is None:
                        return self._error(404, f"object {name} not found")
                    return self._send(204)
                return self._error(404, f"no route: {parsed.path}")

        self._handler = Handler
        self._server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self._thread = threading.Thread(target=self._server.serve_forever,
                                        daemon=True)

    # -- api ---------------------------------------------------------------
    def start(self) -> str:
        self._thread.start()
        host, port = self._server.server_address
        return f"{host}:{port}"

    def stop(self):
        self._server.shutdown()

    def create_bucket(self, bucket: str):
        self.store.setdefault(bucket, {})

    def put(self, bucket: str, name: str, data: bytes):
        with self._lock:
            self.generation += 1
            self.store.setdefault(bucket, {})[name] = data

    def meta(self, bucket: str, name: str) -> dict:
        data = self.store[bucket][name]
        return {
            "kind": "storage#object",
            "id": f"{bucket}/{name}/1",
            "name": name,
            "bucket": bucket,
            "generation": "1",
            "metageneration": "1",
            "contentType": "application/octet-stream",
            "storageClass": "STANDARD",
            "size": str(len(data)),
            "crc32c": _crc32c_b64(data),
            "etag": "e1",
            "timeCreated": "2026-01-01T00:00:00Z",
            "updated": "2026-01-01T00:00:00Z",
        }


def spawn_emulator(buckets: list[str]):
    """Start the emulator in a SUBPROCESS (see module docstring for why)
    → (Popen, 'host:port'). Caller terminates the proc."""
    import subprocess
    import sys

    proc = subprocess.Popen(
        [sys.executable, __file__, *buckets],
        stdout=subprocess.PIPE, text=True)
    line = proc.stdout.readline().strip()
    assert line.startswith("ENDPOINT="), line
    return proc, line.split("=", 1)[1]


if __name__ == "__main__":
    import sys as _sys

    _emu = GcsEmulator()
    for _b in _sys.argv[1:]:
        _emu.create_bucket(_b)
    _ep = _emu.start()
    print(f"ENDPOINT={_ep}", flush=True)
    _emu._thread.join()
