"""Minimal in-process WebHDFS REST emulator (stdlib http.server) — enough
of the public Hadoop HDFS HTTP protocol
(hadoop.apache.org/docs/stable/hadoop-project-dist/hadoop-hdfs/WebHDFS.html)
to drive tokenc's WebHdfsHandler end-to-end over live HTTP, the same role
moto plays for s3:// and gcs_emulator for gs:// in tests/test_files.py:

  * GETFILESTATUS  GET    /webhdfs/v1/<p>?op=GETFILESTATUS
  * LISTSTATUS     GET    /webhdfs/v1/<p>?op=LISTSTATUS
  * OPEN           GET    /webhdfs/v1/<p>?op=OPEN&offset=&length=
                   → 307 to the "datanode" URL (same server, datanode=1),
                     which serves the byte range — the NameNode/DataNode
                     two-step every real WebHDFS client performs
  * CREATE         PUT    ?op=CREATE&overwrite= → 307 → PUT body → 201
  * APPEND         POST   ?op=APPEND → 307 → POST body → 200
  * MKDIRS         PUT    ?op=MKDIRS
  * RENAME         PUT    ?op=RENAME&destination=
  * DELETE         DELETE ?op=DELETE&recursive=

Errors come back as the spec's RemoteException JSON envelope. In-memory
store; `user.name` accepted and ignored (no auth, like an unsecured dev
cluster). Run via spawn_emulator() as a subprocess for symmetry with the
GCS emulator (a pure-python client could live with an in-thread server,
but the subprocess shape serves driver + every Spark worker identically).
"""

from __future__ import annotations

import json
import threading
import time
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


class WebHdfsEmulator:
    """files: path → bytes; dirs: set of paths. All paths normalized to
    '/a/b' form (leading slash, no trailing slash; root is '/').

    `direct=True` emulates an HttpFS-style gateway that answers data ops
    on the first leg instead of 307-redirecting to a DataNode — the other
    server shape the client's `_op` must handle (resend-with-body path)."""

    def __init__(self, direct: bool = False):
        self.files: dict[str, bytes] = {}
        self.dirs: set[str] = {"/"}
        self.direct = direct
        self._lock = threading.Lock()
        emu = self

        def norm(p: str) -> str:
            p = "/" + p.strip("/")
            return p

        def parent(p: str) -> str:
            return p.rsplit("/", 1)[0] or "/"

        def mkdirs(p: str):
            p = norm(p)
            while p not in emu.dirs:
                emu.dirs.add(p)
                p = parent(p)

        def status_of(p: str):
            now = int(time.time() * 1000)
            if p in emu.files:
                return {"accessTime": now, "modificationTime": now,
                        "blockSize": 134217728, "group": "supergroup",
                        "length": len(emu.files[p]), "owner": "tokenc",
                        "pathSuffix": "", "permission": "644",
                        "replication": 1, "type": "FILE"}
            if p in emu.dirs:
                return {"accessTime": 0, "modificationTime": now,
                        "blockSize": 0, "group": "supergroup", "length": 0,
                        "owner": "tokenc", "pathSuffix": "",
                        "permission": "755", "replication": 0,
                        "type": "DIRECTORY"}
            return None

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def log_message(self, *a):
                pass

            # -- plumbing ------------------------------------------------
            def _send(self, code, body=b"", ctype="application/json",
                      extra=None):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                for k, v in (extra or {}).items():
                    self.send_header(k, v)
                self.end_headers()
                if body:
                    self.wfile.write(body)

            def _json(self, code, obj):
                self._send(code, json.dumps(obj).encode())

            def _error(self, code, exc, msg):
                self._json(code, {"RemoteException": {
                    "exception": exc,
                    "javaClassName": f"org.apache.hadoop.{exc}",
                    "message": msg}})

            def _parse(self):
                parsed = urllib.parse.urlsplit(self.path)
                if not parsed.path.startswith("/webhdfs/v1"):
                    return None, None
                p = norm(urllib.parse.unquote(parsed.path[len("/webhdfs/v1"):]))
                q = dict(urllib.parse.parse_qsl(parsed.query))
                return p, q

            def _redirect(self):
                """307 to this server's 'datanode' URL — same path/query
                plus datanode=1, exactly the two-step the spec mandates."""
                host, port = self.server.server_address[:2]
                sep = "&" if "?" in self.path else "?"
                loc = f"http://{host}:{port}{self.path}{sep}datanode=1"
                self._send(307, extra={"Location": loc})

            def _body(self) -> bytes:
                n = int(self.headers.get("Content-Length") or 0)
                return self.rfile.read(n) if n else b""

            # -- verbs ---------------------------------------------------
            def do_GET(self):
                p, q = self._parse()
                if p is None:
                    return self._error(404, "IOException", "bad prefix")
                op = q.get("op", "").upper()
                with emu._lock:
                    if op == "GETFILESTATUS":
                        st = status_of(p)
                        if st is None:
                            return self._error(
                                404, "FileNotFoundException",
                                f"File does not exist: {p}")
                        return self._json(200, {"FileStatus": st})
                    if op == "LISTSTATUS":
                        if p in emu.files:
                            st = status_of(p)
                            return self._json(200, {"FileStatuses": {
                                "FileStatus": [st]}})
                        if p not in emu.dirs:
                            return self._error(
                                404, "FileNotFoundException",
                                f"File does not exist: {p}")
                        pref = "" if p == "/" else p
                        kids = []
                        for fp in sorted(emu.files):
                            if parent(fp) == p:
                                st = status_of(fp)
                                st["pathSuffix"] = fp[len(pref) + 1:]
                                kids.append(st)
                        for dp in sorted(emu.dirs):
                            if dp != "/" and parent(dp) == p:
                                st = status_of(dp)
                                st["pathSuffix"] = dp[len(pref) + 1:]
                                kids.append(st)
                        kids.sort(key=lambda s: s["pathSuffix"])
                        return self._json(200, {"FileStatuses": {
                            "FileStatus": kids}})
                    if op == "OPEN":
                        if p not in emu.files:
                            return self._error(
                                404, "FileNotFoundException",
                                f"File does not exist: {p}")
                        if "datanode" not in q and not emu.direct:
                            return self._redirect()
                        data = emu.files[p]
                        off = int(q.get("offset") or 0)
                        if off > len(data):
                            return self._error(
                                403, "IOException",
                                f"offset {off} beyond EOF {len(data)}")
                        end = len(data)
                        if q.get("length") not in (None, "", "null"):
                            end = min(end, off + int(q["length"]))
                        return self._send(200, data[off:end],
                                          ctype="application/octet-stream")
                    return self._error(400, "IllegalArgumentException",
                                       f"Invalid GET op: {op}")

            def do_PUT(self):
                p, q = self._parse()
                if p is None:
                    return self._error(404, "IOException", "bad prefix")
                op = q.get("op", "").upper()
                with emu._lock:
                    if op == "CREATE":
                        if "datanode" not in q and not emu.direct:
                            return self._redirect()
                        if p in emu.dirs:
                            return self._error(
                                403, "FileAlreadyExistsException",
                                f"{p} is a directory")
                        overwrite = q.get("overwrite", "false") == "true"
                        if p in emu.files and not overwrite:
                            return self._error(
                                403, "FileAlreadyExistsException",
                                f"{p} already exists")
                        body = self._body()
                        mkdirs(parent(p))
                        emu.files[p] = body
                        host, port = self.server.server_address[:2]
                        return self._send(201, extra={
                            "Location":
                                f"webhdfs://{host}:{port}{p}"})
                    if op == "MKDIRS":
                        if p in emu.files:
                            return self._error(
                                403, "ParentNotDirectoryException",
                                f"{p} is a file")
                        mkdirs(p)
                        return self._json(200, {"boolean": True})
                    if op == "RENAME":
                        dst = norm(q.get("destination", ""))
                        # spec: FileSystem.rename returns false when dst
                        # exists (no overwriting rename over REST)
                        if dst in emu.files or dst in emu.dirs:
                            return self._json(200, {"boolean": False})
                        if p in emu.files:
                            if parent(dst) not in emu.dirs:
                                return self._json(200, {"boolean": False})
                            emu.files[dst] = emu.files.pop(p)
                            return self._json(200, {"boolean": True})
                        if p in emu.dirs:
                            moved = [(fp, fp.replace(p, dst, 1))
                                     for fp in list(emu.files)
                                     if fp == p or fp.startswith(p + "/")]
                            for old, new in moved:
                                emu.files[new] = emu.files.pop(old)
                            for dp in [d for d in list(emu.dirs)
                                       if d == p or d.startswith(p + "/")]:
                                emu.dirs.discard(dp)
                                emu.dirs.add(dp.replace(p, dst, 1))
                            mkdirs(dst)
                            return self._json(200, {"boolean": True})
                        return self._json(200, {"boolean": False})
                    return self._error(400, "IllegalArgumentException",
                                       f"Invalid PUT op: {op}")

            def do_POST(self):
                p, q = self._parse()
                if p is None:
                    return self._error(404, "IOException", "bad prefix")
                op = q.get("op", "").upper()
                with emu._lock:
                    if op == "APPEND":
                        if p not in emu.files:
                            return self._error(
                                404, "FileNotFoundException",
                                f"File does not exist: {p}")
                        if "datanode" not in q and not emu.direct:
                            return self._redirect()
                        emu.files[p] = emu.files[p] + self._body()
                        return self._send(200)
                    return self._error(400, "IllegalArgumentException",
                                       f"Invalid POST op: {op}")

            def do_DELETE(self):
                p, q = self._parse()
                if p is None:
                    return self._error(404, "IOException", "bad prefix")
                op = q.get("op", "").upper()
                with emu._lock:
                    if op == "DELETE":
                        recursive = q.get("recursive", "false") == "true"
                        if p in emu.files:
                            del emu.files[p]
                            return self._json(200, {"boolean": True})
                        if p in emu.dirs:
                            kids = [f for f in emu.files
                                    if f.startswith(p + "/")]
                            subdirs = [d for d in emu.dirs
                                       if d.startswith(p + "/")]
                            if (kids or subdirs) and not recursive:
                                return self._error(
                                    403, "PathIsNotEmptyDirectoryException",
                                    f"{p} is non-empty")
                            for f in kids:
                                del emu.files[f]
                            for d in subdirs:
                                emu.dirs.discard(d)
                            if p != "/":
                                emu.dirs.discard(p)
                            return self._json(200, {"boolean": True})
                        return self._json(200, {"boolean": False})
                    return self._error(400, "IllegalArgumentException",
                                       f"Invalid DELETE op: {op}")

        self._server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self._thread = threading.Thread(target=self._server.serve_forever,
                                        daemon=True)

    def start(self) -> str:
        self._thread.start()
        host, port = self._server.server_address[:2]
        return f"{host}:{port}"

    def stop(self):
        self._server.shutdown()


def spawn_emulator(direct: bool = False):
    """Start the emulator in a SUBPROCESS → (Popen, 'host:port')."""
    import subprocess
    import sys

    args = [sys.executable, __file__] + (["--direct"] if direct else [])
    proc = subprocess.Popen(args, stdout=subprocess.PIPE, text=True)
    line = proc.stdout.readline().strip()
    assert line.startswith("ENDPOINT="), line
    return proc, line.split("=", 1)[1]


if __name__ == "__main__":
    import sys as _sys

    _emu = WebHdfsEmulator(direct="--direct" in _sys.argv)
    _ep = _emu.start()
    print(f"ENDPOINT={_ep}", flush=True)
    _emu._thread.join()
