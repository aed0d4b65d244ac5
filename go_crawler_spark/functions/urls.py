"""URL canonicalization, host extraction, and save-path resolution.

Pure functions first (unit-testable, deterministic), then vectorized
pandas-UDF wrappers operating on Arrow batches. No per-row Python UDFs
anywhere in the hot path — the batch wrappers are the only entry Spark uses.

Reference semantics reproduced here:
- fragment strip:   internal/pageparser.go:39
- absolutize:       internal/pageparser.go:42 (RFC 3986 ResolveReference)
- same-host check:  internal/pageparser.go:45-47
- save paths:       internal/models.go:208-231 (md5 fallback models.go:208-211)
- relative rewrite: internal/models.go:233-249
"""

from __future__ import annotations

import hashlib
import posixpath
from typing import Iterator, Optional
from urllib.parse import urljoin, urlsplit, urlunsplit

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

# ---------------------------------------------------------------------------
# pure functions
# ---------------------------------------------------------------------------


def canonicalize(page_url: str, src: str) -> Optional[str]:
    """Fragment-strip then absolutize ``src`` against ``page_url``.

    ref: internal/pageparser.go:33-42 — unparseable URLs are dropped
    (return None), the fragment is cleared *before* resolution, and
    resolution follows RFC 3986 (Go's ResolveReference ≡ urljoin).
    """
    try:
        parts = urlsplit(src)
    except ValueError:
        return None
    # drop anchor (pageparser.go:39): clearing Fragment before resolve means
    # a bare "#frag" href resolves to the page URL itself.
    src_nofrag = urlunsplit((parts.scheme, parts.netloc, parts.path, parts.query, ""))
    try:
        return urljoin(page_url, src_nofrag)
    except ValueError:
        return None


def host_of(url: str) -> str:
    """Host component (netloc) — the reference compares url.Host which
    includes the port (internal/pageparser.go:45)."""
    try:
        return urlsplit(url).netloc
    except ValueError:
        return ""


def registrable_host(url: str) -> str:
    """Lower-cased host without port/userinfo — the politeness grouping key
    [EXTENSION]. The reference groups nothing by host; the north rule's
    politeness buckets need a canonical host."""
    try:
        h = urlsplit(url).hostname
    except ValueError:
        return ""
    return (h or "").lower()


# --- Go path package semantics (path.Dir / path.Base / path.Clean) ---------
# Python's posixpath differs at the edges the reference relies on:
# Go path.Base("")="." , path.Base("/a/")="a" ; posixpath.basename gives ""
# for both. These helpers reproduce Go exactly (ref: models.go:213-231 uses
# pathlib.Dir / pathlib.Base on URL paths).


def go_path_base(p: str) -> str:
    if p == "":
        return "."
    p = p.rstrip("/")
    if p == "":
        return "/"
    i = p.rfind("/")
    if i >= 0:
        p = p[i + 1:]
    return p if p else "/"


def go_path_clean(p: str) -> str:
    if p == "":
        return "."
    rooted = p.startswith("/")
    out: list[str] = []
    for seg in p.split("/"):
        if seg in ("", "."):
            continue
        if seg == "..":
            if out and out[-1] != "..":
                out.pop()
            elif not rooted:
                out.append("..")
        else:
            out.append(seg)
    res = "/".join(out)
    if rooted:
        res = "/" + res
    return res if res else ("/" if rooted else ".")


def go_path_dir(p: str) -> str:
    i = p.rfind("/")
    return go_path_clean(p[: i + 1])


def md5_hex(s: str) -> str:
    """ref: internal/models.go:208-211."""
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def resolve_local_save_path(url: str, fallback_name: str, ext: str) -> str:
    """ref: internal/models.go:213-231.

    dir(path)+base(path); base of "." or "/" → fallback name; empty base →
    md5(full url); pages add ".html" (models.go:61-63), assets add nothing
    (models.go:187-189).
    """
    parts = urlsplit(url)
    path = parts.path
    d = go_path_dir(path)
    name = go_path_base(path)
    if name in (".", "/"):
        name = fallback_name
    if name == "":
        name = md5_hex(url)
    joined = go_path_clean(posixpath.join(d, name))
    if ext:
        joined += "." + ext
    return joined


def page_save_path(url: str) -> str:
    """ref: internal/models.go:61-63 — fallback "index", ext "html"."""
    return resolve_local_save_path(url, "index", "html")


def asset_save_path(url: str) -> str:
    """ref: internal/models.go:187-189 — no fallback, no ext."""
    return resolve_local_save_path(url, "", "")


def link_target_save_path(url: str) -> str:
    """ref: internal/models.go:96 — links rewritten to
    resolveLocalSavePath(link.URL, "", "html")."""
    return resolve_local_save_path(url, "", "html")


def make_relative_url(root_path: str, local_path: str) -> str:
    """ref: internal/models.go:233-249 — filepath.Rel from the page's dir,
    "/"-normalized, "./"-prefixed; fallback "./base" when Rel would error
    (mixed absolute/relative operands)."""
    from_dir = go_path_dir(root_path)
    if from_dir.startswith("/") != local_path.startswith("/"):
        return "./" + go_path_base(local_path)
    rel = posixpath.relpath(local_path, from_dir)
    if not rel.startswith("."):
        rel = "./" + rel
    return rel


# ---------------------------------------------------------------------------
# vectorized pandas UDFs (Arrow batches; the only Spark-facing entry points)
# ---------------------------------------------------------------------------


@pandas_udf(StringType())
def canonicalize_udf(page_url: pd.Series, src: pd.Series) -> pd.Series:
    """Batch canonicalize; None rows are dropped by a downstream
    ``filter(col.isNotNull())`` (ref drop: pageparser.go:34-36)."""
    return pd.Series(
        [canonicalize(p, s) if s is not None else None
         for p, s in zip(page_url, src)],
        dtype=object,
    )


@pandas_udf(StringType())
def host_udf(url: pd.Series) -> pd.Series:
    return url.map(lambda u: host_of(u) if u is not None else "")


@pandas_udf(StringType())
def registrable_host_udf(url: pd.Series) -> pd.Series:
    return url.map(lambda u: registrable_host(u) if u is not None else "")


@pandas_udf(StringType())
def page_save_path_udf(url: pd.Series) -> pd.Series:
    return url.map(page_save_path)


@pandas_udf(StringType())
def asset_save_path_udf(url: pd.Series) -> pd.Series:
    return url.map(asset_save_path)


def with_url_hash(df, url_col: str = "url", out_col: str = "url_hash"):
    """64-bit identity hash for frontier/seen partitioning [EXTENSION —
    north rule mandates xxhash64]. JVM-side built-in, no Python."""
    return df.withColumn(out_col, F.xxhash64(F.col(url_col)))
