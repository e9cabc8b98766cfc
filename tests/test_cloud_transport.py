"""Cloud IO behind an injectable transport (reference parity:
hts/uri_utils.{h,cpp} + htslib hfile URI dispatch, extractor cloud streaming
cli/pipeline_runner.cpp:244-257 zero-byte-PUT preflight).

Zero-egress build: the network client is injectable; these tests register
an in-memory transport and drive the REAL pipeline paths through it —
ranged BAM reads, bgzip VCF writes, and the startup preflight."""

from __future__ import annotations

import gzip
import os

import numpy as np
import pytest

from lancet2_tpu.hts import uri


@pytest.fixture
def mem_s3():
    t = uri.MemTransport()
    uri.register_transport("s3", t)
    yield t
    uri.unregister_transport("s3")


def _tiny_fixture(tmp_path):
    from lancet2_tpu.utils.simulate import Variant, make_tumor_normal_fixture, random_reference

    ref = random_reference(4000, seed=5)
    alt = "C" if ref[2000] != "C" else "G"
    return make_tumor_normal_fixture(
        str(tmp_path), ref_len=4000,
        somatic=[Variant(pos0=2000, ref=ref[2000], alt=alt, vaf=0.4)],
        germline=[], normal_cov=25, tumor_cov=35, seed=5,
    )


def test_preflight_read_and_write(mem_s3):
    mem_s3.blobs["s3://bkt/in.bam"] = b"x" * 10
    uri.validate_cloud_access(["s3://bkt/in.bam"], mode="read")
    with pytest.raises(SystemExit, match="preflight failed"):
        uri.validate_cloud_access(["s3://bkt/missing.bam"], mode="read")
    uri.validate_cloud_access(["s3://bkt/out.vcf.gz"], mode="write")
    assert "s3://bkt/out.vcf.gz.preflight" in mem_s3.blobs  # zero-byte PUT
    # no transport registered for gs:// -> fail fast with guidance
    with pytest.raises(SystemExit, match="no transport is registered"):
        uri.validate_cloud_access(["gs://bkt/in.bam"], mode="read")


def test_ranged_reader_and_writer_roundtrip(mem_s3):
    payload = os.urandom(9_000_000)  # spans multiple 4MB ranged reads
    mem_s3.blobs["s3://bkt/blob"] = payload
    with uri.hts_open("s3://bkt/blob", "rb") as fh:
        assert fh.read(100) == payload[:100]
        fh.seek(8_000_000)
        assert fh.read() == payload[8_000_000:]
    assert len(mem_s3.range_requests) >= 2  # ranged, not whole-object

    with uri.hts_open("s3://bkt/out", "wb") as fh:
        fh.write(b"hello ")
        fh.write(b"world")
    assert mem_s3.blobs["s3://bkt/out"] == b"hello world"


def test_bam_read_through_transport(tmp_path, mem_s3):
    fx = _tiny_fixture(tmp_path)
    local = open(fx["tumor"], "rb").read()
    mem_s3.blobs["s3://bkt/tumor.bam"] = local

    from lancet2_tpu.hts.bam import open_bam, read_bam_header

    hdr_cloud = read_bam_header("s3://bkt/tumor.bam")
    hdr_local = read_bam_header(fx["tumor"])
    assert hdr_cloud == hdr_local

    reads_cloud = list(open_bam("s3://bkt/tumor.bam").fetch("chrS", 1900, 2100))
    reads_local = list(open_bam(fx["tumor"]).fetch("chrS", 1900, 2100))
    assert len(reads_cloud) == len(reads_local) > 0
    assert all(a.qname == b.qname and a.pos0 == b.pos0
               for a, b in zip(reads_cloud, reads_local))


def test_vcf_write_through_transport(mem_s3):
    from lancet2_tpu.hts.bgzf import BgzfWriter

    w = BgzfWriter("s3://bkt/out.vcf.gz")
    w.write(b"##fileformat=VCFv4.5\n")
    w.write(b"chrS\t100\t.\tA\tT\t10\t.\t.\n")
    w.close()
    blob = mem_s3.blobs["s3://bkt/out.vcf.gz"]
    text = gzip.decompress(blob)
    assert text.startswith(b"##fileformat")
    assert blob.endswith(
        bytes.fromhex("1f8b08040000000000ff0600424302001b0003000000000000000000")
    )  # BGZF EOF marker


def test_cli_pipeline_cloud_inputs_and_output(tmp_path, mem_s3):
    """Full pipeline: BAMs read from s3://, VCF written to s3://."""
    fx = _tiny_fixture(tmp_path)
    mem_s3.blobs["s3://bkt/normal.bam"] = open(fx["normal"], "rb").read()
    mem_s3.blobs["s3://bkt/tumor.bam"] = open(fx["tumor"], "rb").read()

    from lancet2_tpu.cli.main import build_parser, run_pipeline

    argv = [
        "pipeline", "-n", "s3://bkt/normal.bam", "-t", "s3://bkt/tumor.bam",
        "-r", fx["fasta"], "-o", "s3://bkt/out.vcf.gz",
        "-R", "chrS:1500-2500", "-T", "1",
    ]
    args = build_parser().parse_args(argv)
    stats = run_pipeline(args, "test")
    assert stats["windows"] > 0
    assert "s3://bkt/out.vcf.gz.preflight" in mem_s3.blobs
    records = [
        l for l in gzip.decompress(mem_s3.blobs["s3://bkt/out.vcf.gz"])
        .decode().splitlines() if not l.startswith("#")
    ]
    assert any(l.split("\t")[1] == "2001" for l in records), records


# ---------------------------------------------------------------------------
# REAL network boundary: stdlib HTTP(S) ranged transport against an
# in-process Range-serving httpd (loopback only — zero egress). This
# exercises the same socket-level streaming path a production http(s)://
# input would use (reference: htslib hfile_libcurl behind extractor URIs).
# ---------------------------------------------------------------------------

class _RangeHandler:
    """http.server handler factory serving a blob dict with Range support."""

    def __new__(cls, blobs):
        from http.server import BaseHTTPRequestHandler

        class H(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _blob(self):
                return blobs.get(self.path.lstrip("/"))

            def do_HEAD(self):
                data = self._blob()
                if data is None:
                    self.send_error(404)
                    return
                self.send_response(200)
                self.send_header("Content-Length", str(len(data)))
                self.send_header("Accept-Ranges", "bytes")
                self.end_headers()

            def do_GET(self):
                data = self._blob()
                if data is None:
                    self.send_error(404)
                    return
                rng = self.headers.get("Range")
                if rng and rng.startswith("bytes="):
                    lo, _, hi = rng[6:].partition("-")
                    lo = int(lo)
                    hi = int(hi) if hi else len(data) - 1
                    chunk = data[lo : hi + 1]
                    self.send_response(206)
                    self.send_header(
                        "Content-Range",
                        f"bytes {lo}-{lo + len(chunk) - 1}/{len(data)}",
                    )
                else:
                    chunk = data
                    self.send_response(200)
                self.send_header("Content-Length", str(len(chunk)))
                self.end_headers()
                self.wfile.write(chunk)

        return H


@pytest.fixture
def http_server():
    import threading
    from http.server import ThreadingHTTPServer

    blobs: dict[str, bytes] = {}
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), _RangeHandler(blobs))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield blobs, f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def test_http_transport_ranged_reads(http_server):
    blobs, base = http_server
    payload = os.urandom(6_000_000)
    blobs["blob.bin"] = payload
    url = f"{base}/blob.bin"
    uri.validate_cloud_access([url], mode="read")
    with uri.hts_open(url, "rb") as fh:
        assert fh.read(100) == payload[:100]
        fh.seek(5_000_000)
        assert fh.read() == payload[5_000_000:]


def test_cli_pipeline_http_inputs(tmp_path, http_server):
    """Full pipeline with BAMs streamed over a real (loopback) socket."""
    blobs, base = http_server
    fx = _tiny_fixture(tmp_path)
    blobs["normal.bam"] = open(fx["normal"], "rb").read()
    blobs["tumor.bam"] = open(fx["tumor"], "rb").read()

    import io as _io

    from lancet2_tpu.cli.main import build_parser, run_pipeline

    out_vcf = str(tmp_path / "http_out.vcf.gz")
    argv = [
        "pipeline", "-n", f"{base}/normal.bam", "-t", f"{base}/tumor.bam",
        "-r", fx["fasta"], "-o", out_vcf,
        "-R", "chrS:1500-2500", "-T", "1",
    ]
    args = build_parser().parse_args(argv)
    stats = run_pipeline(args, "test")
    assert stats["windows"] > 0
    with gzip.open(out_vcf, "rt") as fh:
        records = [l for l in fh.read().splitlines()
                   if l and not l.startswith("#")]
    assert any(l.split("\t")[1] == "2001" for l in records), records

    # identity vs local-path run
    out2 = str(tmp_path / "local_out.vcf.gz")
    argv2 = [
        "pipeline", "-n", fx["normal"], "-t", fx["tumor"],
        "-r", fx["fasta"], "-o", out2,
        "-R", "chrS:1500-2500", "-T", "1",
    ]
    run_pipeline(build_parser().parse_args(argv2), "test")
    with gzip.open(out2, "rt") as fh:
        records2 = [l for l in fh.read().splitlines()
                    if l and not l.startswith("#")]
    assert records == records2
