"""Remote http(s) input tests against a localhost Range-capable server.

Covers the reference's remote-BAM/FASTA support
(/root/reference/src/utils.c:447-521 + htslib hfile_libcurl): redirect
resolution, range-request BAM/.bai access, faidx-over-http, and a full
`call` run on http:// inputs matching the local-file run byte for byte.
"""

import http.server
import io
import os
import re
import threading

import pytest

from longcalld_tpu.io.remote import RemoteBytes, is_url, resolve_url

DATA_DIR = "/root/reference/test_data"
BAM = "HG002_chr11_hifi_test.bam"
FA = "chr11_2M.fa"


class _RangeHandler(http.server.SimpleHTTPRequestHandler):
    """SimpleHTTPRequestHandler + single-range GET + a /r/ redirect path."""

    def log_message(self, *a):
        pass

    def send_head(self):
        if self.path.startswith("/r/"):  # redirect: /r/x -> /x
            self.send_response(302)
            self.send_header("Location", self.path[2:])
            self.end_headers()
            return None
        m = re.match(r"bytes=(\d+)-(\d*)$",
                     self.headers.get("Range") or "")
        if not m:
            return super().send_head()
        path = self.translate_path(self.path)
        try:
            f = open(path, "rb")
        except OSError:
            self.send_error(404)
            return None
        size = os.fstat(f.fileno()).st_size
        beg = int(m.group(1))
        end = int(m.group(2)) if m.group(2) else size - 1
        end = min(end, size - 1)
        if beg > end:
            f.close()
            self.send_error(416)
            return None
        self.send_response(206)
        self.send_header("Content-Type", "application/octet-stream")
        self.send_header("Content-Range", f"bytes {beg}-{end}/{size}")
        self.send_header("Content-Length", str(end - beg + 1))
        self.end_headers()
        f.seek(beg)
        self._range_len = end - beg + 1
        return f

    def copyfile(self, source, outputfile):
        n = getattr(self, "_range_len", None)
        if n is None:
            return super().copyfile(source, outputfile)
        outputfile.write(source.read(n))
        del self._range_len


@pytest.fixture(scope="module")
def server_url():
    handler = lambda *a, **kw: _RangeHandler(*a, directory=DATA_DIR, **kw)
    httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def test_is_url():
    assert is_url("http://x/y.bam") and is_url("HTTPS://x/y.fa")
    assert not is_url("/data/y.bam") and not is_url("httpd.conf")


def test_resolve_url_follows_redirect(server_url):
    assert resolve_url(f"{server_url}/r/{BAM}") == f"{server_url}/{BAM}"
    assert resolve_url("/local/path") == "/local/path"


def test_remote_bytes_partial_fetch(server_url):
    with open(os.path.join(DATA_DIR, BAM), "rb") as f:
        local = f.read()
    rb = RemoteBytes(f"{server_url}/{BAM}", chunk_bytes=64 * 1024)
    assert len(rb) == len(local)
    assert rb[:100] == local[:100]
    assert rb[-50:] == local[-50:]
    assert rb[1234] == local[1234]
    # only the touched chunks came over the wire
    assert rb.bytes_fetched < len(local)


def test_remote_fasta_matches_local(server_url):
    from longcalld_tpu.io.fasta import FastaFile
    loc = FastaFile(os.path.join(DATA_DIR, FA))
    rem = FastaFile(f"{server_url}/{FA}")
    assert rem.references == loc.references
    assert rem.fetch("chr11", 1_240_000, 1_241_000) == \
        loc.fetch("chr11", 1_240_000, 1_241_000)


def test_remote_bam_region_matches_local(server_url):
    from longcalld_tpu.io.bam import BamReader
    loc = BamReader(os.path.join(DATA_DIR, BAM))
    rem = BamReader(f"{server_url}/{BAM}")
    assert rem.index is not None          # picked up the remote .bai
    tid = loc.name2tid("chr11")
    a = [(r.qname, r.pos) for r in loc.fetch(tid, 1_240_000, 1_260_000)]
    b = [(r.qname, r.pos) for r in rem.fetch(tid, 1_240_000, 1_260_000)]
    assert a == b and len(a) > 0
    # range-request access: far less than the whole BAM transferred
    assert rem._bgzf._data.bytes_fetched < os.path.getsize(
        os.path.join(DATA_DIR, BAM))


def test_call_on_remote_inputs_matches_local(server_url):
    from longcalld_tpu.config import CallOpts
    from longcalld_tpu.core.pipeline import run_call

    def call(fa, bam):
        out = io.StringIO()
        opt = CallOpts.hifi(ref_fa_fn=fa, in_bam_fns=[bam],
                            regions=["chr11:1240000-1260000"])
        run_call(opt, out, "t")
        return [l for l in out.getvalue().splitlines()
                if not l.startswith("#")]

    local = call(os.path.join(DATA_DIR, FA), os.path.join(DATA_DIR, BAM))
    remote = call(f"{server_url}/r/{FA}", f"{server_url}/r/{BAM}")
    assert local == remote and len(local) > 0
