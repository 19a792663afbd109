"""Dataset materialization: direct-URL + proxy download (S3/S4).

Reference: ``_direct_download`` streams a URL to the writer with a
running size cap (lib_materialize/__init__.py:48-59, ``_write_file``
:31-45 — ``DatasetTooBig`` when the stream exceeds the limit);
``_proxy_download`` fetches ``<proxy>/download/<dataset_id>`` and
additionally rejects early on ``Content-Length`` (:62-84); the default
cap is 10 GB (lib_core/datamart_core/materialize.py:108).

Spark-first mapping: a materialized dataset lands as a LOCAL file, then
enters the engine via ``sources.read_auto`` (format detection +
conversion + distributed scan) — on a real cluster the destination is
shared storage and the URL is usually an object-store path that
``spark.read`` consumes directly without this hop.  ``file://`` (and
bare paths) materialize for real in this sandbox; ``http(s)://`` uses
stdlib urllib and surfaces network failures as ``MaterializeError``
with the cause — the code path is real, the sandbox just has no
network.
"""

from __future__ import annotations

import os
import shutil
import urllib.error
import urllib.parse
import urllib.request

#: reference size cap: lib_core/datamart_core/materialize.py:108
DEFAULT_SIZE_LIMIT = 10_000_000_000

_CHUNK = 4096  # reference chunk size (lib_materialize/__init__.py:40)


class MaterializeError(RuntimeError):
    pass


class DatasetTooBig(MaterializeError):
    def __init__(self, limit: int, actual: int | None = None):
        self.limit = limit
        self.actual = actual
        super().__init__(
            f"dataset exceeds the size limit ({limit} bytes"
            + (f", got {actual}" if actual is not None else "")
            + ")"
        )


def _stream_to(fp_in, dest: str, size_limit: int | None) -> int:
    size = 0
    with open(dest, "wb") as out:
        while True:
            chunk = fp_in.read(_CHUNK)
            if not chunk:
                break
            out.write(chunk)
            size += len(chunk)
            if size_limit is not None and size > size_limit:
                out.close()
                os.remove(dest)
                raise DatasetTooBig(limit=size_limit)
    return size


def direct_download(
    url: str, dest: str, size_limit: int | None = DEFAULT_SIZE_LIMIT
) -> int:
    """S3: stream ``url`` to ``dest`` with a running size cap.  Returns
    the byte count.  ``file://`` URLs and bare paths read locally."""
    parsed = urllib.parse.urlparse(url)
    if parsed.scheme in ("", "file"):
        src = parsed.path if parsed.scheme == "file" else url
        if size_limit is not None and os.path.getsize(src) > size_limit:
            raise DatasetTooBig(limit=size_limit, actual=os.path.getsize(src))
        shutil.copyfile(src, dest)
        return os.path.getsize(dest)
    if parsed.scheme not in ("http", "https"):
        raise MaterializeError(f"unsupported URL scheme {parsed.scheme!r}")
    try:
        with urllib.request.urlopen(url) as resp:
            cl = resp.headers.get("Content-Length")
            if size_limit is not None and cl and int(cl) > size_limit:
                raise DatasetTooBig(limit=size_limit, actual=int(cl))
            return _stream_to(resp, dest, size_limit)
    except urllib.error.URLError as e:
        raise MaterializeError(f"download failed for {url}: {e}") from e


def proxy_download(
    dataset_id: str,
    dest: str,
    proxy: str,
    size_limit: int | None = DEFAULT_SIZE_LIMIT,
) -> int:
    """S4: materialize through another Datamart instance —
    ``<proxy>/download/<dataset_id>`` (reference
    lib_materialize/__init__.py:62-84)."""
    return direct_download(
        proxy.rstrip("/") + "/download/" + urllib.parse.quote(dataset_id),
        dest,
        size_limit,
    )


def materialize_to_dataframe(
    spark,
    url: str,
    work_dir: str,
    size_limit: int | None = DEFAULT_SIZE_LIMIT,
    all_string: bool = True,
):
    """S3 + S5..S11 composed: download, then format-detect/convert/scan
    via ``read_auto`` — the reference's full ``download()`` →
    ``handle_data_format`` path as one call."""
    from .formats import read_auto

    os.makedirs(work_dir, exist_ok=True)
    dest = os.path.join(work_dir, "materialized.bin")
    direct_download(url, dest, size_limit)
    return read_auto(spark, dest, all_string=all_string)
