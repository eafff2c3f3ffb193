"""WebHDFS client filesystem — hdfs:// access over the public Hadoop HTTP
protocol (hadoop.apache.org WebHDFS REST API), wrapped as a pyarrow
`PyFileSystem` so every tokenc path API (`encode_files`, `decode_files`,
`list_parquet_files`, Iceberg publish) can target an HDFS cluster through
its WebHDFS/HttpFS gateway with zero native dependencies.

Why this exists: pyarrow's native `HadoopFileSystem` needs libhdfs (JNI +
a full Hadoop client install), which most Spark-on-k8s images don't carry;
WebHDFS is the protocol Hadoop itself exposes for exactly this situation
and needs nothing but HTTP. This is the reference's HDFS ParquetFile
source re-expressed (source/source.go:9-26 + hdfs source README.md:177-192
— there it's colinmarc/hdfs native RPC; here the public REST gateway).

Protocol notes (the parts a client must get right):
  * Reads and writes are a TWO-STEP dance: the NameNode answers
    `op=OPEN` / `op=CREATE` / `op=APPEND` with `307 Temporary Redirect`
    to a DataNode URL and only the second request carries data. We never
    auto-follow: the redirect is re-issued manually so the body is sent
    exactly once, to the DataNode (urllib would refuse to replay a PUT
    body through a 307 anyway).
  * Ranged reads are first-class: `op=OPEN&offset=O&length=L` — the
    random-access input file maps pyarrow's reads straight onto them, so
    a parquet footer probe fetches footer bytes only, never the file.
  * Errors arrive as a `RemoteException` JSON envelope; we surface
    `FileNotFoundException` as pyarrow's NotFound FileInfo and raise
    OSError for the rest.

The handler holds only (endpoint, user) strings, so the PyFileSystem
pickles into Spark task closures like the S3/GCS filesystems do
(tests/test_files.py drives it through real executors against a live
protocol server, tests/webhdfs_emulator.py).
"""

from __future__ import annotations

import io
import json
import urllib.parse
import urllib.request

import pyarrow as pa
from pyarrow import fs as pafs

_PREFIX = "/webhdfs/v1"


class WebHdfsError(OSError):
    pass


def _http(method: str, url: str, body: bytes | None = None,
          timeout: float = 30.0):
    """ONE HTTP request, redirects NOT followed → (status, headers, body).

    urllib's opener auto-follows GET redirects and refuses data-carrying
    307s; WebHDFS needs the Location surfaced for both, so redirects are
    disabled wholesale with a no-op HTTPRedirectHandler subclass and
    3xx/4xx/5xx responses are returned (HTTPError IS a response)."""
    req = urllib.request.Request(url, data=body, method=method)
    if body is not None:
        req.add_header("Content-Type", "application/octet-stream")

    class _NoRedirect(urllib.request.HTTPRedirectHandler):
        def redirect_request(self, *a, **k):
            return None

    opener = urllib.request.build_opener(_NoRedirect)
    try:
        resp = opener.open(req, timeout=timeout)
    except urllib.error.HTTPError as e:
        resp = e
    with resp:
        return resp.status, dict(resp.headers), resp.read()


def _raise_remote(status: int, payload: bytes, url: str):
    try:
        exc = json.loads(payload.decode())["RemoteException"]
        msg = f"{exc.get('exception')}: {exc.get('message')}"
        name = exc.get("exception", "")
    except Exception:
        msg, name = payload[:200].decode(errors="replace"), ""
    if name == "FileNotFoundException" or status == 404:
        raise FileNotFoundError(msg or f"HTTP {status} at {url}")
    raise WebHdfsError(f"HTTP {status} at {url}: {msg}")


class _Client:
    """Thin op-level WebHDFS client (NameNode endpoint 'host:port')."""

    def __init__(self, endpoint: str, user: str | None = None,
                 timeout: float = 30.0):
        self.endpoint = endpoint
        self.user = user
        self.timeout = timeout

    def _url(self, path: str, op: str, **params) -> str:
        q = {"op": op, **{k: v for k, v in params.items() if v is not None}}
        if self.user:
            q["user.name"] = self.user
        return (f"http://{self.endpoint}{_PREFIX}"
                f"{urllib.parse.quote('/' + path.strip('/'))}"
                f"?{urllib.parse.urlencode(q)}")

    def _op(self, method: str, path: str, op: str, body: bytes | None = None,
            ok=(200,), resend_params: dict | None = None, **params):
        url = self._url(path, op, **params)
        status, headers, payload = _http(method, url, None,
                                         timeout=self.timeout)
        if status in (301, 302, 307):
            loc = headers.get("Location")
            if not loc:
                raise WebHdfsError(f"redirect without Location at {url}")
            status, headers, payload = _http(method, loc, body,
                                             timeout=self.timeout)
        elif body and status in ok:
            # server answered the first leg directly (no redirect —
            # HttpFS gateways do this); body was never sent, resend to
            # the same URL. Empty-body ops skip the resend: the first leg
            # already did the work. `resend_params` override the query for
            # the resend only — CREATE with overwrite=false needs the
            # resend to carry overwrite=true, because the no-body first
            # leg already created the (empty) file and an exact resend
            # would spuriously hit FileAlreadyExists on it.
            if resend_params:
                url = self._url(path, op, **{**params, **resend_params})
            status, headers, payload = _http(method, url, body,
                                             timeout=self.timeout)
        if status not in ok:
            _raise_remote(status, payload, url)
        return payload

    # ---- ops --------------------------------------------------------
    def status(self, path: str) -> dict:
        out = self._op("GET", path, "GETFILESTATUS")
        return json.loads(out.decode())["FileStatus"]

    def list(self, path: str) -> list[dict]:
        out = self._op("GET", path, "LISTSTATUS")
        return json.loads(out.decode())["FileStatuses"]["FileStatus"]

    def read(self, path: str, offset: int = 0,
             length: int | None = None) -> bytes:
        if length == 0:
            return b""
        return self._op("GET", path, "OPEN", offset=offset, length=length)

    def create(self, path: str, data: bytes, overwrite: bool = True):
        self._op("PUT", path, "CREATE", body=data, ok=(200, 201),
                 overwrite="true" if overwrite else "false",
                 resend_params=None if overwrite else {"overwrite": "true"})

    def append(self, path: str, data: bytes):
        self._op("POST", path, "APPEND", body=data)

    def mkdirs(self, path: str):
        self._op("PUT", path, "MKDIRS")

    def rename(self, src: str, dst: str) -> bool:
        out = self._op("PUT", src, "RENAME",
                       destination="/" + dst.strip("/"))
        return json.loads(out.decode())["boolean"]

    def delete(self, path: str, recursive: bool = False) -> bool:
        out = self._op("DELETE", path, "DELETE",
                       recursive="true" if recursive else "false")
        return json.loads(out.decode())["boolean"]


class _RangedInput(io.RawIOBase):
    """Random-access file-like over op=OPEN&offset&length — each pyarrow
    read maps to ONE ranged request (plus the NameNode redirect leg), so
    a parquet footer probe transfers footer bytes, not the file."""

    def __init__(self, client: _Client, path: str, size: int):
        self._c = client
        self._path = path
        self._size = size
        self._pos = 0

    def readable(self):
        return True

    def seekable(self):
        return True

    def seek(self, offset: int, whence: int = 0) -> int:
        if whence == 0:
            self._pos = offset
        elif whence == 1:
            self._pos += offset
        elif whence == 2:
            self._pos = self._size + offset
        else:
            raise ValueError(f"bad whence {whence}")
        return self._pos

    def tell(self) -> int:
        return self._pos

    def readall(self) -> bytes:
        return self.read(-1)

    def read(self, n: int = -1) -> bytes:
        if self._pos >= self._size:
            return b""
        if n is None or n < 0:
            n = self._size - self._pos
        n = min(n, self._size - self._pos)
        if n == 0:
            return b""
        out = self._c.read(self._path, offset=self._pos, length=n)
        self._pos += len(out)
        return out


class _CreateOutput(io.RawIOBase):
    """Buffering writer: bytes accumulate locally and ONE two-step CREATE
    commits them at close — an object-store-style atomic PUT (readers
    never observe a half-written file; sizes here are row-group-scale
    parquet parts, the same unit the S3/GCS paths upload)."""

    def __init__(self, client: _Client, path: str):
        self._c = client
        self._path = path
        self._buf = io.BytesIO()

    def writable(self):
        return True

    def write(self, b) -> int:
        return self._buf.write(b)

    def close(self):
        if not self.closed:
            self._c.create(self._path, self._buf.getvalue(), overwrite=True)
        super().close()


class WebHdfsHandler(pafs.FileSystemHandler):
    """pyarrow FileSystemHandler over the WebHDFS REST protocol. Paths
    are fs-relative ('warehouse/db/file.parquet' ↔ HDFS
    '/warehouse/db/file.parquet')."""

    def __init__(self, endpoint: str, user: str | None = None,
                 timeout: float = 30.0):
        self.endpoint = endpoint
        self.user = user
        self.timeout = timeout
        self._client = _Client(endpoint, user, timeout)

    # handler equality/pickling — PyFileSystem delegates both here
    def __eq__(self, other):
        return (isinstance(other, WebHdfsHandler)
                and other.endpoint == self.endpoint
                and other.user == self.user)

    def __ne__(self, other):
        return not self.__eq__(other)

    def __hash__(self):
        return hash((self.endpoint, self.user))

    def __reduce__(self):
        return (WebHdfsHandler, (self.endpoint, self.user, self.timeout))

    def get_type_name(self):
        return "webhdfs"

    def normalize_path(self, path: str) -> str:
        return path.strip("/")

    # ---- info --------------------------------------------------------
    def _info_from_status(self, path: str, st: dict) -> pafs.FileInfo:
        if st["type"] == "DIRECTORY":
            return pafs.FileInfo(path, pafs.FileType.Directory)
        return pafs.FileInfo(path, pafs.FileType.File, size=st["length"])

    def get_file_info(self, paths):
        out = []
        for p in paths:
            p = p.strip("/")
            try:
                out.append(self._info_from_status(p, self._client.status(p)))
            except FileNotFoundError:
                out.append(pafs.FileInfo(p, pafs.FileType.NotFound))
        return out

    def get_file_info_selector(self, selector):
        base = selector.base_dir.strip("/")
        try:
            self._client.status(base)
        except FileNotFoundError:
            if selector.allow_not_found:
                return []
            raise
        out = []
        stack = [base]
        while stack:
            d = stack.pop()
            for st in self._client.list(d):
                child = f"{d}/{st['pathSuffix']}" if st["pathSuffix"] else d
                info = self._info_from_status(child, st)
                out.append(info)
                if (selector.recursive
                        and info.type == pafs.FileType.Directory):
                    stack.append(child)
        return out

    # ---- mutation ------------------------------------------------------
    def create_dir(self, path, recursive):
        # WebHDFS MKDIRS is always recursive (mkdir -p); enforcing the
        # non-recursive contract needs a parent probe
        path = path.strip("/")
        if not recursive and "/" in path:
            parent = path.rsplit("/", 1)[0]
            st = self._client.status(parent)  # raises NotFound
            if st["type"] != "DIRECTORY":
                raise NotADirectoryError(parent)
        self._client.mkdirs(path)

    def delete_dir(self, path):
        if not self._client.delete(path.strip("/"), recursive=True):
            raise FileNotFoundError(path)

    def delete_dir_contents(self, path, missing_dir_ok=False):
        path = path.strip("/")
        try:
            kids = self._client.list(path)
        except FileNotFoundError:
            if missing_dir_ok:
                return
            raise
        for st in kids:
            child = f"{path}/{st['pathSuffix']}"
            self._client.delete(child, recursive=True)

    def delete_root_dir_contents(self):
        raise WebHdfsError("refusing to clear the HDFS root")

    def delete_file(self, path):
        path = path.strip("/")
        st = self._client.status(path)
        if st["type"] == "DIRECTORY":
            raise IsADirectoryError(path)
        self._client.delete(path, recursive=False)

    def move(self, src, dest):
        src, dest = src.strip("/"), dest.strip("/")
        # HDFS RENAME returns false (no exception) when dest exists, and
        # the REST API exposes no overwriting rename — pyarrow's move
        # contract is replace. Try the plain rename first (the common
        # no-dest case never touches dest), and only on failure verify
        # src exists BEFORE clearing dest, so a bad src can't destroy a
        # valid dest. The residual window (crash between delete and the
        # second rename) is protocol-inherent to WebHDFS.
        if self._client.rename(src, dest):
            return
        self._client.status(src)  # raises FileNotFoundError: dest untouched
        try:
            self._client.delete(dest, recursive=False)
        except FileNotFoundError:
            pass
        if not self._client.rename(src, dest):
            raise WebHdfsError(f"RENAME {src} -> {dest} returned false")

    def copy_file(self, src, dest):
        self._client.create(dest.strip("/"),
                            self._client.read(src.strip("/")),
                            overwrite=True)

    # ---- io --------------------------------------------------------
    def open_input_stream(self, path):
        return self.open_input_file(path)

    def open_input_file(self, path):
        path = path.strip("/")
        st = self._client.status(path)
        if st["type"] == "DIRECTORY":
            raise IsADirectoryError(path)
        return pa.PythonFile(_RangedInput(self._client, path, st["length"]),
                             mode="r")

    def open_output_stream(self, path, metadata):
        return pa.PythonFile(_CreateOutput(self._client, path.strip("/")),
                             mode="w")

    def open_append_stream(self, path, metadata):
        client, p = self._client, path.strip("/")
        try:
            client.status(p)
        except FileNotFoundError:
            client.create(p, b"", overwrite=False)

        class _Append(io.RawIOBase):
            def writable(self):
                return True

            def write(self, b) -> int:
                b = bytes(b)
                client.append(p, b)
                return len(b)

        return pa.PythonFile(_Append(), mode="w")


def webhdfs_fs(endpoint: str, user: str | None = None,
               timeout: float = 30.0) -> pafs.PyFileSystem:
    """→ pyarrow FileSystem speaking WebHDFS to `endpoint` ('host:port',
    the NameNode HTTP address or an HttpFS gateway)."""
    return pafs.PyFileSystem(WebHdfsHandler(endpoint, user, timeout))
