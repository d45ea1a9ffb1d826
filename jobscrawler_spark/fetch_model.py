"""Deterministic synthetic fetch model.

There is no network in this sandbox (and the driver forbids external data),
so "fetching" a URL is a pure function of the canonical URL: status, image
payload, caption and outlinks all derive from a stable 64-bit digest of the
URL string. The SAME function backs

- the Spark fetch stage (mapInPandas batches, jobscrawler_spark.operators.fetch)
- the single-threaded oracle simulator (jobscrawler_spark.oracle.simulator)

so the equivalence tests compare two executions of identical semantics —
exactly how the reference's live HTTP fetch would be mocked.

Reference analogues: per-URL GET with rotating User-Agent (reference:
src/crawler.py:306-319), non-200 pages logged and skipped
(src/crawler.py:313-317), follow-link discovery (src/utils/FollowLink.py:8-39).
"""

from __future__ import annotations

import hashlib
from urllib.parse import urlsplit

import numpy as np

from .functions import codecs

# 15-slot deterministic "User-Agent pool" mirroring the reference's
# random.choice over 15 UAs (reference: src/constants.py:2-18,
# src/crawler.py:309) — made reproducible: ua = digest % 15.
N_USER_AGENTS = 15

FMTS = ("raw", "png", "dct")


def url_digest(url: str) -> int:
    """Stable unsigned 64-bit digest of a URL (process-independent)."""
    return int.from_bytes(hashlib.blake2b(url.encode(), digest_size=8).digest(), "big")


def fetch_status(url: str) -> int:
    """~4% deterministic non-200s to exercise the status filter (P6)."""
    d = url_digest(url)
    r = d % 50
    if r == 0:
        return 403
    if r == 1:
        return 500
    return 200


def image_params(url: str) -> tuple[int, int, str]:
    """(w, h, fmt) for the synthetic image behind a URL."""
    d = url_digest(url)
    w = 8 + (d >> 8) % 57  # 8..64
    h = 8 + (d >> 16) % 57
    fmt = FMTS[(d >> 24) % len(FMTS)]
    return int(w), int(h), fmt


def caption_for(url: str) -> str:
    d = url_digest(url)
    return f"caption {d:016x} for {url}"


def outlinks_for(url: str, depth: int, max_depth: int, n_hosts: int = 64) -> list[str]:
    """Deterministic children of a fetched URL (depth-limited frontier growth).

    Mostly same-host (politeness-relevant), with an occasional cross-host
    link so frontier merges shuffle across host buckets.
    """
    if depth >= max_depth:
        return []
    d = url_digest(url)
    k = d % 4  # 0..3 children
    parts = urlsplit(url)
    out = []
    for j in range(k):
        if (d >> (32 + j)) % 8 == 0:  # ~12% cross-host
            host = f"h{(d + j) % n_hosts:02d}.example.com"
        else:
            host = parts.hostname or "example.com"
        out.append(f"http://{host}/d{depth + 1}/{d:016x}/{j}")
    return out


def fetch_payload(url: str) -> tuple[bytes, int, int, str, str, int]:
    """(bytes, w, h, fmt, caption, phash) for a 200-status URL."""
    w, h, fmt = image_params(url)
    img = codecs.synth_pixels(url_digest(url), w, h)
    data = codecs.encode(img, fmt)
    return data, w, h, fmt, caption_for(url), codecs.phash(img)


def expected_pixels(url: str) -> np.ndarray:
    """Ground-truth pixels for the extract-stage PSNR invariant."""
    w, h, _ = image_params(url)
    return codecs.synth_pixels(url_digest(url), w, h)


def link_priority(url: str) -> float:
    """Deterministic frontier priority for a discovered link (lower = sooner)."""
    return (url_digest(url) % 1_000_000) / 1_000_000.0


def user_agent_idx(url: str, round_no: int) -> int:
    """Deterministic UA rotation: hash(url, round) % pool size."""
    return (url_digest(url) + round_no) % N_USER_AGENTS
