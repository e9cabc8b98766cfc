"""Cloud URI detection + upfront access validation.

Reference parity surface: hts/uri_utils.{h,cpp} detects s3/gs/http/ftp URIs
and validates cloud credentials upfront (a zero-byte PUT) so a 40-hour run
cannot fail at the final VCF flush (reference: cli/pipeline_runner.cpp:
244-257). This build runs in a zero-egress environment, so remote IO
backends are gated: URIs are recognized and validated for *shape*, and any
attempt to actually open one fails fast at startup with a clear error
instead of deep inside the pipeline.

Wiring a real backend means implementing `open_remote` (range reads for
BAM/CRAM inputs, streaming writes for the VCF) — the rest of the pipeline
is already path-agnostic.
"""

from __future__ import annotations

CLOUD_SCHEMES = ("s3://", "gs://", "http://", "https://", "ftp://")


def is_cloud_uri(path: str) -> bool:
    return path.startswith(CLOUD_SCHEMES)


def validate_uri_shape(path: str) -> None:
    """Raise ValueError for malformed cloud URIs (scheme but no bucket/key)."""
    if not is_cloud_uri(path):
        return
    scheme, _, rest = path.partition("://")
    if scheme in ("s3", "gs"):
        bucket, _, key = rest.partition("/")
        if not bucket or not key:
            raise ValueError(
                f"malformed {scheme}:// URI {path!r}: expected "
                f"{scheme}://bucket/key"
            )
    elif not rest:
        raise ValueError(f"malformed URI {path!r}")


def validate_cloud_access(paths: list[str], mode: str = "read") -> None:
    """Upfront fail-fast gate for any cloud URI among `paths`.

    Mirrors the reference's startup credential preflight; with no remote
    backend available here it reports the gap immediately (same fail-fast
    contract, different reason).
    """
    remote = [p for p in paths if is_cloud_uri(p)]
    for p in remote:
        validate_uri_shape(p)
    if remote:
        raise SystemExit(
            "cloud URIs detected but no remote IO backend is available in "
            f"this build ({mode}: {', '.join(remote)}). Download inputs "
            "locally (or mount the bucket) and pass local paths."
        )


def open_remote(path: str, mode: str = "rb"):
    """Placeholder for a remote IO backend (s3/gs range reads)."""
    raise NotImplementedError(
        f"remote IO backend not available for {path!r} (zero-egress build)"
    )
