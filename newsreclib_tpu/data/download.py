"""Download + extraction utilities.

Reference analog: ``newsreclib/data/components/download_utils.py:21-95``
(retrying ``maybe_download``) and ``data_utils.py:144-154`` (extraction).
"""

from __future__ import annotations

import os
import random
import tarfile
import time
import zipfile


def maybe_download(url: str, dst: str, attempts: int = 5) -> str:
    """Download ``url`` to ``dst`` with retries + backoff; no-op if present."""
    if os.path.exists(dst):
        return dst
    import requests

    os.makedirs(os.path.dirname(dst) or ".", exist_ok=True)
    last_err = None
    for attempt in range(attempts):
        try:
            with requests.get(url, stream=True, timeout=60) as r:
                r.raise_for_status()
                tmp = dst + ".part"
                with open(tmp, "wb") as f:
                    for chunk in r.iter_content(chunk_size=1 << 20):
                        f.write(chunk)
                os.replace(tmp, dst)
            return dst
        except Exception as e:  # noqa: BLE001 — retry any transport error
            last_err = e
            time.sleep(min(2**attempt + random.random(), 30))
    raise RuntimeError(f"download failed after {attempts} attempts: {url}") from last_err


def extract(archive: str, dst_dir: str) -> None:
    os.makedirs(dst_dir, exist_ok=True)
    if archive.endswith(".zip"):
        with zipfile.ZipFile(archive) as z:
            z.extractall(dst_dir)
    elif archive.endswith((".tar.gz", ".tgz", ".tar")):
        with tarfile.open(archive) as t:
            t.extractall(dst_dir)
    else:
        raise ValueError(f"unknown archive format: {archive}")
