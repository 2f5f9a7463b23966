"""Source-URI security policy (reference: ingestion/security.py, wired
into cli/pipeline.py).

YAML pipeline configs name arbitrary URIs; before Spark touches one we
validate scheme, host and local-path containment. The default policy is
permissive about storage schemes (file/hdfs/s3/gs/abfs/http/jdbc) but
rejects inline credentials — secrets belong in options/env, not in a
config file that gets committed.
"""

from __future__ import annotations

from dataclasses import dataclass
from urllib.parse import urlparse


class SourceSecurityError(ValueError):
    """A source URI violates the active security policy."""


@dataclass(frozen=True)
class SourceSecurityPolicy:
    allowed_schemes: tuple[str, ...] = (
        "", "file", "hdfs", "s3", "s3a", "s3n", "gs", "abfs", "abfss",
        "wasb", "wasbs", "http", "https", "jdbc", "postgresql", "mysql",
    )
    # None = any host; else exact-match or *.suffix entries
    allowed_hosts: tuple[str, ...] | None = None
    # None = any local path; else file URIs must resolve under one root
    allowed_local_roots: tuple[str, ...] | None = None
    forbid_credentials_in_uri: bool = True


DEFAULT_POLICY = SourceSecurityPolicy()


def _host_allowed(host: str, allowed: tuple[str, ...]) -> bool:
    for pat in allowed:
        if pat.startswith("*."):
            if host == pat[2:] or host.endswith(pat[1:]):
                return True
        elif host == pat:
            return True
    return False


def validate_source_uri(
    uri: str, policy: SourceSecurityPolicy = DEFAULT_POLICY
) -> None:
    """Raise SourceSecurityError if the URI violates the policy."""
    raw = uri[5:] if uri.lower().startswith("jdbc:") else uri
    parsed = urlparse(raw)
    scheme = parsed.scheme.lower()
    # a bare windows-drive or extension-less path parses with odd schemes;
    # treat single-letter schemes as local paths
    if len(scheme) == 1:
        scheme = ""
    if scheme not in tuple(s.lower() for s in policy.allowed_schemes):
        raise SourceSecurityError(
            f"source scheme {scheme or '(local path)'!r} not allowed: {uri!r} "
            f"(allowed: {sorted(s or '(local)' for s in policy.allowed_schemes)})"
        )
    if policy.forbid_credentials_in_uri and (parsed.username or parsed.password):
        raise SourceSecurityError(
            f"credentials embedded in source URI {uri!r}; pass them via "
            "options/environment instead"
        )
    if policy.allowed_hosts is not None and parsed.hostname:
        if not _host_allowed(parsed.hostname, policy.allowed_hosts):
            raise SourceSecurityError(
                f"source host {parsed.hostname!r} not in the allow-list "
                f"{policy.allowed_hosts}"
            )
    if policy.allowed_local_roots is not None and scheme in ("", "file"):
        import os

        path = os.path.realpath(parsed.path or raw)
        ok = any(
            path == os.path.realpath(root)
            or path.startswith(os.path.realpath(root).rstrip("/") + "/")
            for root in policy.allowed_local_roots
        )
        if not ok:
            raise SourceSecurityError(
                f"local source {path!r} escapes the allowed roots "
                f"{policy.allowed_local_roots}"
            )
