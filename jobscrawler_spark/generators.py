"""Deterministic fixture generators (seed=42 unless stated).

Everything the engine consumes in tests and benchmarks is synthesized here:
seed URLs (Zipf-skewed hosts, dirty spellings), politeness budgets, robots
rules, site configs, canned fetch payloads, the world-locations dim, and
the images table. No external data.

Generators return plain pandas DataFrames / lists; callers lift them into
Spark with ``spark.createDataFrame``.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd

from .fetch_model import fetch_payload, url_digest
from .functions import codecs
from .functions.urls import canonicalize_py


def _rng(seed: int) -> np.random.Generator:
    return np.random.default_rng(seed)


def gen_hosts(n_hosts: int = 64) -> list[str]:
    return [f"h{i:02d}.example.com" for i in range(n_hosts)]


def gen_seeds(n: int = 10_000, n_hosts: int = 64, seed: int = 42, dirty: bool = True) -> pd.DataFrame:
    """Seed-URL list with Zipf-skewed host distribution (FIXTURES.md §2).

    Host 0 is deliberately hot (Zipf a=1.3) to exercise salting. ``dirty``
    mixes in mixed-case hosts, fragments, unsorted query params and default
    ports so canonicalization actually collapses variants.
    """
    rng = _rng(seed)
    hosts = gen_hosts(n_hosts)
    host_idx = np.minimum(rng.zipf(1.3, size=n) - 1, n_hosts - 1)
    rows = []
    for i in range(n):
        host = hosts[int(host_idx[i])]
        path_id = int(rng.integers(0, max(n // 2, 4)))
        url = f"http://{host}/p/{path_id}"
        if dirty:
            style = int(rng.integers(0, 6))
            if style == 1:
                url = f"http://{host.upper()}/p/{path_id}"
            elif style == 2:
                url = f"http://{host}/p/{path_id}#frag{i}"
            elif style == 3:
                url = f"http://{host}/p/{path_id}?b=2&a=1"
            elif style == 4:
                url = f"http://{host}:80/p/{path_id}"
            elif style == 5:
                url = f"http://{host}/p/{path_id}?a=1&b=2"
        rows.append(
            {
                "url": url,
                "host": host,
                "priority": float(rng.uniform(0, 1)),
                "depth": 0,
            }
        )
    return pd.DataFrame(rows)


def gen_seeds_fast(
    n: int = 1_000_000, n_hosts: int = 4096, seed: int = 42
) -> pd.DataFrame:
    """Vectorized seed generator for bench-scale inputs (same schema as
    gen_seeds, clean URLs only — canonicalization cost is covered by the
    dirty-variant path in gen_seeds at unit scale)."""
    rng = _rng(seed)
    # half uniform (keeps rounds large under per-host budgets), half
    # Zipf-skewed (keeps the hot-host salting path exercised)
    zipf_idx = np.minimum(rng.zipf(1.3, size=n) - 1, n_hosts - 1)
    unif_idx = rng.integers(0, n_hosts, size=n)
    host_idx = np.where(rng.random(n) < 0.5, unif_idx, zipf_idx).astype(np.int64)
    path_id = rng.integers(0, max(n // 2, 4), size=n)
    hosts = pd.Series(host_idx).map(lambda i: f"h{i:02d}.example.com")
    urls = "http://" + hosts + "/p/" + pd.Series(path_id).astype(str)
    return pd.DataFrame(
        {
            "url": urls,
            "host": hosts,
            "priority": rng.uniform(0, 1, size=n),
            "depth": np.zeros(n, dtype=np.int32),
        }
    )


def gen_politeness(n_hosts: int = 64, seed: int = 42) -> pd.DataFrame:
    """Per-host budgets; host 1 gets budget 0 (must never be fetched)."""
    rng = _rng(seed + 1)
    hosts = gen_hosts(n_hosts)
    rows = []
    for i, host in enumerate(hosts):
        budget = 0 if i == 1 else int(2 ** rng.integers(1, 6))  # 2..32
        rows.append(
            {
                "host": host,
                "max_fetches_per_round": budget,
                "crawl_delay_rounds": int(rng.integers(0, 3)),
            }
        )
    return pd.DataFrame(rows)


def gen_robots(n_hosts: int = 64, seed: int = 42, wildcards: bool = False) -> pd.DataFrame:
    """Robots rules with conflicting prefixes (longest match wins).

    ``wildcards=True`` (r6) mixes in RFC 9309 wildcard rules that BITE on
    the crawl's real URL shapes (seeds /p/<id>, outlinks
    /d<depth>/<hex16>/<j>): an anchored mid-star disallow, an unanchored
    mid-star disallow over the seed space, and a wildcard allow that
    out-lengths a plain disallow (precedence across rule kinds)."""
    rng = _rng(seed + 2)
    hosts = gen_hosts(n_hosts)
    rows = []
    for hi, host in enumerate(hosts):
        rows.append({"host": host, "path_prefix": "/", "allow": True})
        if rng.random() < 0.5:
            rows.append({"host": host, "path_prefix": "/private", "allow": False})
            rows.append({"host": host, "path_prefix": "/private/ok", "allow": True})
        if rng.random() < 0.3:
            # disallow a slice of the /p/ space
            rows.append({"host": host, "path_prefix": "/p/1", "allow": False})
        if wildcards:
            if hi % 3 == 0:
                # depth-1 outlinks with child index 2, anchored
                rows.append({"host": host, "path_prefix": "/d1/*/2$", "allow": False})
            if hi % 4 == 1:
                # any seed path containing a 7 after /p/
                rows.append({"host": host, "path_prefix": "/p/*7", "allow": False})
            if hi % 5 == 2:
                # wildcard ALLOW must out-rank the shorter plain disallow
                rows.append({"host": host, "path_prefix": "/d2", "allow": False})
                rows.append({"host": host, "path_prefix": "/d2/*", "allow": True})
    return pd.DataFrame(rows)


def gen_robots_bodies(
    n_hosts: int = 64,
    seed: int = 42,
    politeness: pd.DataFrame | None = None,
    wildcards: bool = False,
) -> pd.DataFrame:
    """robots.txt TEXT bodies whose parse equals gen_robots(n_hosts, seed):
    the fetch-stage form of the robots dim (one /robots.txt body per host),
    with decoy agent groups, comments, blank lines and an empty Disallow
    that a correct parser must ignore. Passing ``politeness`` adds the
    hosts' crawl_delay_rounds as Crawl-delay directives in the '*' group
    (plus a decoy delay in the badbot group)."""
    rules = gen_robots(n_hosts, seed, wildcards=wildcards)
    delays = (
        dict(zip(politeness["host"], politeness["crawl_delay_rounds"]))
        if politeness is not None
        else {}
    )
    rows = []
    for hi, (host, grp) in enumerate(rules.groupby("host", sort=False)):
        lines = [
            f"# robots.txt for {host}",
            "User-Agent: badbot",
            "User-Agent: ignoredbot",  # stacked decoy group (spec: one group)
            "Disallow: /",
            "Crawl-delay: 99",  # decoy delay: wrong group, must be ignored
            "",
        ]
        # a Crawl-delay BETWEEN User-agent lines ends the stack (it is a
        # rule line per the robots spec): prebot's group is {prebot} with
        # delay 3 and no rules; the '*' group below starts fresh, so
        # neither the delay nor prebot's membership may leak into it
        lines.append("User-Agent: prebot")
        lines.append("Crawl-delay: 3")
        # every other host STACKS '*' with another agent — the rules below
        # must still parse for '*' (consecutive UA lines form one group)
        lines.append("user-agent: *  # the group under test")
        if hi % 2 == 0:
            lines.append("User-agent: goodbot")
        for i, r in enumerate(grp.itertuples()):
            d = "Allow" if r.allow else "Disallow"
            suffix = "  # inline comment" if i % 2 == 0 else ""
            lines.append(f"{d}: {r.path_prefix}{suffix}")
        if int(delays.get(host, 0)) > 0:
            lines.append(f"Crawl-Delay: {int(delays[host])}")
        lines.append("Disallow:")  # empty value = allow-all = no rule
        rows.append({"host": host, "body": "\n".join(lines)})
    return pd.DataFrame(rows)


def gen_images(n: int = 512, seed: int = 42) -> pd.DataFrame:
    """Images table in the driver-mandated shape (FIXTURES.md §1)."""
    rows = []
    for i in range(n):
        url = f"http://img{seed}.example.com/i/{i}"
        data, w, h, fmt, caption, ph = fetch_payload(url)
        rows.append(
            {
                "image_id": canonicalize_py(url),
                "bytes": data,
                "w": w,
                "h": h,
                "fmt": fmt,
                "caption": caption,
                "phash": ph,
            }
        )
    return pd.DataFrame(rows)


def gen_sitemap_bodies(
    n_hosts: int = 8, seed: int = 42
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """(robots_bodies, sitemap_bodies) for the sitemap-discovery parsers.

    robots bodies are gen_robots_bodies(n_hosts, seed) with ``Sitemap:``
    directives injected the messy ways real files have them: top-of-file
    before any group, MID-FILE between groups (a standalone record that
    must not break group stacking), mixed-case directive, multiple per
    host, and none at all for every fourth host. sitemap bodies are the
    referenced XMLs: <urlset> docs with optional <lastmod> and sloppy
    whitespace, plus a <sitemapindex> for every third host."""
    robots = gen_robots_bodies(n_hosts, seed)
    r_rows, s_rows = [], []
    for hi, r in enumerate(robots.itertuples()):
        host = r.host
        lines = r.body.split("\n")
        if hi % 4 != 3:
            lines.insert(0, f"Sitemap: https://{host}/sitemap.xml")
            # mid-file, right before the '*' group: per the robots spec a
            # Sitemap record is independent of groups and must be ignored
            # by the rule parser without terminating a User-agent stack
            star = next(i for i, ln in enumerate(lines) if ln.startswith("user-agent: *"))
            lines.insert(star, f"sitemap: https://{host}/sitemap-extra.xml")
            urls = [f"https://{host}/p/{j}" for j in range(2 + hi % 3)]
            entries = []
            for j, u in enumerate(urls):
                lm = (
                    f"\n    <lastmod>2026-0{1 + j % 9}-1{j % 10}</lastmod>"
                    if j % 2 == 0
                    else ""
                )
                entries.append(f"  <url>\n    <loc> {u} </loc>{lm}\n  </url>")
            s_rows.append(
                {
                    "host": host,
                    "url": f"https://{host}/sitemap.xml",
                    "body": '<?xml version="1.0"?>\n<urlset>\n'
                    + "\n".join(entries)
                    + "\n</urlset>",
                }
            )
            if hi % 3 == 0:
                s_rows.append(
                    {
                        "host": host,
                        "url": f"https://{host}/sitemap-extra.xml",
                        "body": "<sitemapindex>"
                        f"<sitemap><loc>https://{host}/sm/a.xml</loc>"
                        "<lastmod>2026-02-01</lastmod></sitemap>"
                        f"<sitemap>\n  <loc>https://{host}/sm/b.xml</loc>\n</sitemap>"
                        "</sitemapindex>",
                    }
                )
        r_rows.append({"host": host, "body": "\n".join(lines)})
    return pd.DataFrame(r_rows), pd.DataFrame(s_rows)


def gen_curation_images(n: int = 160, seed: int = 42) -> pd.DataFrame:
    """Images table variant for the curation operators: same columns as
    gen_images but with every curation defect class present — tiny,
    extreme-aspect, flat (zero entropy/contrast), and near-flat
    low-contrast images interleaved with normal fetch-model payloads, so
    each verdict column of curate_images exercises both branches."""
    rows = []
    for i in range(n):
        kind = i % 10
        if kind < 5:  # normal crawl payload (varied size/fmt/caption)
            url = f"http://cur{seed}.example.com/i/{i}"
            data, w, h, fmt, caption, ph = fetch_payload(url)
            image_id = canonicalize_py(url)
            # r6 caption-defect classes (planted on kind-3 rows; pixels
            # untouched so only the caption verdicts differ):
            if i % 20 == 3:  # SEO keyword-stuffed: high repeated-token frac
                caption = " ".join(["buy", "cheap", "now"] * 8)
            elif i % 20 == 13:  # degenerate one-token alt text
                caption = "img"
        else:
            d = url_digest(f"curation:{seed}:{i}")
            if kind < 6:  # skin-dominant (NSFW stand-in must fire): every
                # pixel satisfies the Peer-rule with R=G+40, B=G-20 while
                # G sweeps 60..160, so entropy/contrast stay healthy and
                # ONLY flagged_nsfw trips
                w, h = 48 + d % 33, 48 + (d >> 8) % 33
                gch = (
                    110.0
                    + 50.0
                    * np.sin(
                        np.linspace(0, 6.0, int(w))[None, :]
                        + np.linspace(0, 3.0, int(h))[:, None]
                    )
                )
                img = np.stack(
                    [gch + 40.0, gch, gch - 20.0], axis=2
                )
                img = np.clip(np.rint(img), 0, 255).astype(np.uint8)
            elif kind < 7:  # tiny
                w, h = 16 + d % 33, 16 + (d >> 8) % 33
                img = codecs.synth_pixels(d, int(w), int(h))
            elif kind < 8:  # extreme aspect (banner / skyscraper)
                if d % 2 == 0:
                    w, h = 192 + d % 64, 24 + (d >> 8) % 16
                else:
                    w, h = 24 + d % 16, 192 + (d >> 8) % 64
                img = codecs.synth_pixels(d, int(w), int(h))
            elif kind < 9:  # flat: one constant value, entropy 0
                w, h = 64 + d % 64, 64 + (d >> 8) % 64
                img = np.full((int(h), int(w), 3), 40 + d % 176, dtype=np.uint8)
            else:  # near-flat: faint gradient, low contrast
                w, h = 64 + d % 64, 64 + (d >> 8) % 64
                base = np.full((int(h), int(w), 3), 40 + d % 176, dtype=np.float64)
                base += np.linspace(0, 4, int(w))[None, :, None]
                img = np.clip(np.rint(base), 0, 255).astype(np.uint8)
            w, h = img.shape[1], img.shape[0]
            fmt = "png" if d % 2 == 0 else "raw"
            data = codecs.encode(img, fmt)
            ph = codecs.phash(img)
            caption = f"synthetic curation fixture {i} class {kind}"
            image_id = f"http://cur{seed}.example.com/s/{i}"
        rows.append(
            {
                "image_id": image_id,
                "bytes": data,
                "w": int(w),
                "h": int(h),
                "fmt": fmt,
                "caption": caption,
                "phash": int(ph),
            }
        )
    return pd.DataFrame(rows)


def gen_videos(n: int = 12, seed: int = 42) -> pd.DataFrame:
    """Deterministic vraw clips (engine's own container) for the
    frame-sampling op: (video_id, bytes, fmt)."""
    rows = []
    for i in range(n):
        d = url_digest(f"video:{seed}:{i}")
        w, h = 8 + (d >> 8) % 25, 8 + (d >> 16) % 25
        nf = 5 + d % 20
        frames = codecs.synth_video(d, int(w), int(h), int(nf))
        rows.append({"video_id": f"v{i:04d}", "bytes": codecs.encode_vraw(frames), "fmt": "vraw"})
    return pd.DataFrame(rows)


SHARED_SCENE_SEED = 0xB0CE_77E5_0DDB_A11


def scene_video_frames(i: int, seed: int = 42, shared_scene: bool = False) -> "np.ndarray":
    """Frames of scene-structured clip ``i``: 2-5 scenes, each a distinct
    synth base image held for 3-7 frames with a tiny per-frame brightness
    wobble (+0/+1/+2 per channel — far under any cut threshold), so the
    ONLY large luma jumps are at the scene boundaries. Shared by
    gen_scene_videos (container side) and oracle/expected.py (fresh
    recompute side): frame construction is INPUT, not computation.

    ``shared_scene`` plants cross-video BOILERPLATE (the scene-dup
    fixture): every third clip is 24x24 and its scene 0 is the one fixed
    shared base — identical keyframes across those clips, so only they
    may pair in the duplicate-scene join. Default False preserves the
    scene-cut fixture bit-for-bit."""
    import numpy as np

    d = url_digest(f"scenevid:{seed}:{i}")
    w, h = 12 + (d >> 8) % 21, 12 + (d >> 16) % 21
    plant = shared_scene and i % 3 == 0
    if plant:
        w, h = 24, 24
    n_scenes = 2 + d % 4
    frames = []
    for s in range(n_scenes):
        base_seed = (d ^ (0x9E3779B97F4A7C15 * (s + 1))) & 0xFFFFFFFFFFFFFFFF
        if plant and s == 0:
            base_seed = SHARED_SCENE_SEED
        base = codecs.synth_pixels(base_seed, int(w), int(h))
        scene_len = 3 + (d >> (4 * s + 20)) % 5
        for t in range(scene_len):
            frames.append(
                np.clip(base.astype(np.int16) + (t % 3), 0, 255).astype(np.uint8)
            )
    return np.stack(frames)


def gen_scene_videos(
    n: int = 10, seed: int = 42, shared_scene: bool = False
) -> pd.DataFrame:
    """Deterministic scene-structured vraw clips for the scene-cut /
    keyframe operator: (video_id, bytes, fmt)."""
    rows = []
    for i in range(n):
        rows.append(
            {
                "video_id": f"sv{i:04d}",
                "bytes": codecs.encode_vraw(scene_video_frames(i, seed, shared_scene)),
                "fmt": "vraw",
            }
        )
    return pd.DataFrame(rows)


def wm_image_pixels(i: int, seed: int = 42) -> tuple["np.ndarray", int]:
    """(pixels, planted_key) for watermark-fixture image ``i`` — every
    fourth image clean (key 0 = none), the rest carry one of the three
    candidate keys via codecs.embed_watermark. 48-64 px per side so the
    clean-image correlation noise (~255*scale/sqrt(n)) sits well under
    the detection threshold. Shared by gen_wm_images (container side)
    and oracle/expected.py:watermark_rows (fresh detection recompute):
    fixture construction is INPUT, not computation."""
    d = url_digest(f"wmimg:{seed}:{i}")
    w, h = 48 + (d >> 8) % 17, 48 + (d >> 16) % 17
    img = codecs.synth_pixels(d, int(w), int(h))
    key = i % 4  # 0 = clean; 1..3 = candidate keys
    if key:
        img = codecs.embed_watermark(img, key)
    return img, key


def gen_wm_images(n: int = 48, seed: int = 42) -> pd.DataFrame:
    """Deterministic watermark-detection fixture: (image_id, bytes, w, h,
    fmt) raw-coded images, 3/4 of them spread-spectrum-marked."""
    rows = []
    for i in range(n):
        img, _key = wm_image_pixels(i, seed)
        rows.append(
            {
                "image_id": f"wm{i:04d}",
                "bytes": codecs.encode_raw(img),
                "w": int(img.shape[1]),
                "h": int(img.shape[0]),
                "fmt": "raw",
            }
        )
    return pd.DataFrame(rows)


def gen_filter_urls(n: int = 128, seed: int = 42) -> pd.DataFrame:
    """Deterministic URL-quality-filter fixture: one column (url), eight
    planted classes by i % 8 — 0/1 clean, 2 spam word, 3 over-length,
    4 deep path + param spray, 5 IP-literal host, 6 blocklisted host,
    7 hyphen+digit host. Drives the 'urlfilter' kind of s_robots_parse;
    the oracle repeats the scoring SQL over the same VALUES rows."""
    rows = []
    for i in range(n):
        d = url_digest(f"uf:{seed}:{i}")
        cls = i % 8
        if cls in (0, 1):
            u = f"http://site{d % 64}.example.com/cat{d % 7}/item{d % 97}?page={d % 5}"
        elif cls == 2:
            u = f"http://site{d % 64}.example.com/best-casino-bonus/{d % 97}"
        elif cls == 3:
            u = (
                f"http://site{d % 64}.example.com/"
                + "/".join(f"segment{(d >> j) % 1000}" for j in range(0, 24, 2))
                + "?" + "&".join(f"k{j}=v{(d >> j) % 100}" for j in range(8))
            )
        elif cls == 4:
            u = (
                f"http://site{d % 64}.example.com/"
                + "/".join(f"s{(d >> j) % 10}" for j in range(0, 20, 2))
            )
        elif cls == 5:
            u = f"http://10.{d % 256}.{(d >> 8) % 256}.{(d >> 16) % 256}/p/{d % 97}"
        elif cls == 6:
            u = f"http://malware.example.com/x/{d % 97}"
        else:
            u = f"http://w1-w2-w3-w4-{d % 100}{(d >> 8) % 100}.example.org/p"
        rows.append({"url": u})
    return pd.DataFrame(rows)


def gen_audio(n: int = 48, seed: int = 42) -> pd.DataFrame:
    """Deterministic pcm16 waveforms: (audio_id, bytes, fmt)."""
    rows = []
    for i in range(n):
        d = url_digest(f"audio:{seed}:{i}")
        samples = codecs.synth_audio(d, int(1000 + d % 8000))
        rows.append({"audio_id": f"a{i:04d}", "bytes": codecs.encode_pcm16(samples), "fmt": "pcm16"})
    return pd.DataFrame(rows)


def vad_audio_samples(i: int, seed: int = 42) -> "np.ndarray":
    """Deterministic speech-shaped waveform for clip ``i``: 4-6 alternating
    LOUD (synth_audio, sinusoid amps 1000-8000) and NEAR-SILENT (same
    waveform >> 8) spans of 500-1999 samples — planted segment boundaries
    for the VAD operator. Shared INPUT construction for the Spark operator
    and the oracle recompute (like scene_video_frames); the energy
    computation itself stays independent on each side."""
    d = url_digest(f"vad:{seed}:{i}")
    segs = []
    n_seg = 4 + d % 3
    for s in range(n_seg):
        length = 500 + ((d >> (4 * s)) % 1500)
        seg = codecs.synth_audio(d ^ (s + 1), int(length))
        if (s + i) % 2 == 1:  # near-silence: amplitude cut ~256x
            seg = (seg.astype(np.int32) // 256).astype(np.int16)
        segs.append(seg)
    return np.concatenate(segs)


def gen_vad_audio(n: int = 12, seed: int = 42) -> pd.DataFrame:
    """(audio_id, bytes, fmt) clips with planted active/silence spans."""
    return pd.DataFrame(
        [
            {
                "audio_id": f"va{i:04d}",
                "bytes": codecs.encode_pcm16(vad_audio_samples(i, seed)),
                "fmt": "pcm16",
            }
            for i in range(n)
        ]
    )


# ---------------------------------------------------------------------------
# Reference-shaped fixtures: site configs, canned payloads, world locations
# ---------------------------------------------------------------------------


# the custom-selector fixture site (reference: per-site Bs4ElementPath,
# src/models.py:40-54 — adding a site is a DATA change, no code)
CUSTOM_BS4_SELECTORS = {
    "sel_job": r'<article class="posting">(.*?)</article>',
    "sel_title": r'<h3 class="role">(.*?)</h3>',
    "sel_link": r'<a href="(.*?)" class="go">',
    "sel_loc": r'<em class="where">(.*?)</em>',
    "sel_desc": r'<section class="about">(.*?)</section>',
}
CUSTOM_API_TAGS = {
    "tag_title": "position",
    "tag_link": "url",
    "tag_desc": "summary",
    "tag_loc": "city",
}
_NO_SELECTORS = {k: None for k in list(CUSTOM_BS4_SELECTORS) + list(CUSTOM_API_TAGS)}


def gen_site_configs() -> pd.DataFrame:
    """11 sites: 3 bs4 (main/container), 3 api (dict/list), 3 rss —
    mirroring the reference's test config files (bs4_test.json etc.) —
    plus one bs4 site with CUSTOM selector paths and one api site with
    CUSTOM JSON-tag paths, proving new sites are pure config data."""
    rows = []
    idx = 0
    for strategy in ("main", "container", "main"):
        rows.append(
            {
                "name": f"https://bs4-{idx}.example.com",
                "source_kind": "bs4",
                "strategy": strategy,
                "url": f"https://bs4-{idx}.example.com/jobs?page=",
                "pages_to_crawl": 2,
                "start_point": 1,
                "follow_link": "no",
                "inner_link_tag": "div.desc",
                "config_idx": idx,
                **_NO_SELECTORS,
            }
        )
        idx += 1
    for strategy in ("dict", "list", "dict"):
        rows.append(
            {
                "name": f"https://api-{idx}.example.com",
                "source_kind": "api",
                "strategy": strategy,
                "url": f"https://api-{idx}.example.com/v1/jobs",
                "pages_to_crawl": 1,
                "start_point": 1,
                "follow_link": "no",
                "inner_link_tag": "",
                "config_idx": idx,
                **_NO_SELECTORS,
            }
        )
        idx += 1
    for _ in range(3):
        rows.append(
            {
                "name": f"https://rss-{idx}.example.com",
                "source_kind": "rss",
                "strategy": "rss",
                "url": f"https://rss-{idx}.example.com/feed.xml",
                "pages_to_crawl": 1,
                "start_point": 1,
                "follow_link": "no",
                "inner_link_tag": "",
                "config_idx": idx,
                **_NO_SELECTORS,
            }
        )
        idx += 1
    rows.append(
        {
            "name": f"https://custom-{idx}.example.com",
            "source_kind": "bs4",
            "strategy": "main",
            "url": f"https://custom-{idx}.example.com/roles?p=",
            "pages_to_crawl": 2,
            "start_point": 1,
            "follow_link": "no",
            "inner_link_tag": "",
            "config_idx": idx,
            **_NO_SELECTORS,
            **CUSTOM_BS4_SELECTORS,
        }
    )
    idx += 1
    rows.append(
        {
            "name": f"https://capi-{idx}.example.com",
            "source_kind": "api",
            "strategy": "list",
            "url": f"https://capi-{idx}.example.com/v2/roles",
            "pages_to_crawl": 1,
            "start_point": 1,
            "follow_link": "no",
            "inner_link_tag": "",
            "config_idx": idx,
            **_NO_SELECTORS,
            **CUSTOM_API_TAGS,
        }
    )
    idx += 1
    return pd.DataFrame(rows)


def _html_job_custom(i: int, with_loc: bool = True) -> str:
    """Job element in the CUSTOM_BS4_SELECTORS shape (different tag/class
    structure AND attribute order than the default fixture site)."""
    loc = f'<em class="where">City{i % 7} Country{i % 5}</em>' if with_loc else ""
    return (
        f'<article class="posting"><h3 class="role">Custom Engineer {i}</h3>'
        f'<a href="/cj/{i}" class="go">go</a>{loc}'
        f'<section class="about">Custom about {i} text</section></article>'
    )


def _html_job(i: int, site: str, with_loc: bool = True, rel: bool = True) -> str:
    href = f"/job/{i}" if rel else f"{site}/job/{i}"
    loc = f'<span class="loc">City{i % 7} Country{i % 5}</span>' if with_loc else ""
    return (
        f'<div class="job"><h2 class="title">Engineer {i} at Site</h2>'
        f'<a class="lnk" href="{href}">apply</a>{loc}'
        f'<p class="desc">Description {i} <b>bold</b> text, [brackets] \'quotes\'</p></div>'
    )


def gen_payload_bodies(configs: pd.DataFrame, jobs_per_page: int = 5) -> pd.DataFrame:
    """Canned fetch bodies keyed by URL (FIXTURES.md §4).

    Edge cases baked in: container unequal list lengths (zip truncation,
    reference src/crawlers/async_bs4.py:240), missing optional fields ->
    "NaN", API falsy location -> default, relative hrefs.
    """
    rows = []
    for _, cfg in configs.iterrows():
        custom = pd.notna(cfg.get("sel_job")) or pd.notna(cfg.get("tag_title"))
        if cfg.source_kind == "bs4":
            for page in range(int(cfg.start_point), int(cfg.pages_to_crawl) + 1):
                url = f"{cfg.url}{page}"
                if custom:
                    n = jobs_per_page - 1
                    body = "<html><main>" + "".join(
                        _html_job_custom(page * 100 + i, with_loc=(i % 3 != 2))
                        for i in range(n)
                    ) + "</main></html>"
                    rows.append(
                        {"url": url, "status": 200, "body": body, "content_kind": "html"}
                    )
                    continue
                n = jobs_per_page if cfg.strategy == "main" else jobs_per_page + 1
                jobs = [
                    _html_job(page * 100 + i, cfg["name"], with_loc=(i % 3 != 2))
                    for i in range(n)
                ]
                if cfg.strategy == "container":
                    # container page: parallel element lists, locations list
                    # SHORTER than titles/links -> zip truncation
                    titles = "".join(
                        f'<h2 class="title">CJob {page * 100 + i}</h2>' for i in range(n)
                    )
                    links = "".join(
                        f'<a class="lnk" href="/c/{page * 100 + i}">x</a>' for i in range(n)
                    )
                    locs = "".join(f'<span class="loc">Loc{i}</span>' for i in range(n - 2))
                    descs = "".join(f'<p class="desc">CDesc {i}</p>' for i in range(n))
                    body = f'<div class="wrap">{titles}{links}{locs}{descs}</div>'
                else:
                    body = "<html><body>" + "".join(jobs) + "</body></html>"
                rows.append({"url": url, "status": 200, "body": body, "content_kind": "html"})
        elif cfg.source_kind == "api":
            # JSON tags are config data (reference async_api.py:19-27):
            # the custom api site serves a payload under its OWN tag names
            t = (cfg.get("tag_title"), cfg.get("tag_link"), cfg.get("tag_desc"),
                 cfg.get("tag_loc")) if custom else (None,) * 4
            k_title, k_link, k_desc, k_loc = (
                t[0] or "titleF", t[1] or "linkF", t[2] or "descF", t[3] or "locF"
            )
            jobs = []
            for i in range(jobs_per_page):
                job = {
                    k_title: f"API Role {i}",
                    k_link: f"{cfg['name']}/api-job/{i}",
                    k_desc: f"api description {i}",
                    k_loc: "" if i % 3 == 1 else f"Place{i}",  # falsy -> default
                }
                if i % 4 == 3:
                    job.pop(k_desc)  # missing -> "NaN"
                jobs.append(job)
            payload = {"data": jobs} if cfg.strategy == "dict" else jobs
            rows.append(
                {"url": cfg.url, "status": 200, "body": json.dumps(payload), "content_kind": "json"}
            )
        else:  # rss
            items = "".join(
                f"<item><title>RSS Job {i}</title><link>{cfg['name']}/rss/{i}</link>"
                f"<description>rss desc {i}</description>"
                + (f"<location>RCity{i}</location>" if i % 2 == 0 else "")
                + "</item>"
                for i in range(jobs_per_page)
            )
            body = f'<?xml version="1.0"?><rss><channel>{items}</channel></rss>'
            rows.append({"url": cfg.url, "status": 200, "body": body, "content_kind": "rss"})
    # a couple of non-200s to exercise the status filter
    rows.append({"url": "https://bs4-0.example.com/jobs?page=99", "status": 403, "body": "", "content_kind": "html"})
    rows.append({"url": "https://api-3.example.com/v1/down", "status": 500, "body": "", "content_kind": "json"})
    return pd.DataFrame(rows)


def gen_world_locations() -> pd.DataFrame:
    """Flattened location dim (FIXTURES.md §6): continent/zone/country/alias
    precedence, including bigram cases (reference: src/crawler.py:45-107)."""
    rows = []
    continents = {
        "EUROPE": {
            "Zones": ["EMEA", "NORDICS"],
            "Countries": {
                "GERMANY": ["BERLIN", "MUNICH"],
                "UNITED KINGDOM": ["LONDON", "UK"],
                "SPAIN": ["MADRID", "BARCELONA"],
            },
        },
        "AMERICA": {
            "Zones": ["LATAM", "NORTH AMERICA"],
            "Countries": {
                "UNITED STATES": ["NEW YORK", "SAN FRANCISCO", "USA", "AUSTIN"],
                "CANADA": ["TORONTO", "SAINT JOHN'S"],
                "MEXICO": ["MEXICO CITY", "GUADALAJARA"],
            },
        },
        "ASIA": {
            "Zones": ["APAC"],
            "Countries": {"JAPAN": ["TOKYO"], "INDIA": ["BANGALORE", "NEW DELHI"], "SINGAPORE": []},
        },
    }
    for continent, spec in continents.items():
        rows.append({"alias": continent, "tag": continent, "kind": "continent"})
        for zone in spec["Zones"]:
            rows.append({"alias": zone, "tag": zone, "kind": "zone"})
        for country, aliases in spec["Countries"].items():
            rows.append({"alias": country, "tag": country, "kind": "country"})
            for a in aliases:
                rows.append({"alias": a, "tag": country, "kind": "alias"})
    rows.append({"alias": "WORLDWIDE", "tag": "WORLDWIDE", "kind": "zone"})
    return pd.DataFrame(rows)


def world_locations_nested() -> dict:
    """The same dim in the reference's nested-JSON shape, for the oracle
    (continent -> {Zones: [...], Countries: [{NAME: [aliases]}]})."""
    flat = gen_world_locations()
    nested: dict = {}
    cur_continent = None
    for _, r in flat.iterrows():
        if r["kind"] == "continent":
            cur_continent = r["alias"]
            nested[cur_continent] = {"Zones": [], "Countries": []}
        elif r["kind"] == "zone":
            if cur_continent is None:
                nested.setdefault("WORLD", {"Zones": [], "Countries": []})["Zones"].append(r["alias"])
            else:
                nested[cur_continent]["Zones"].append(r["alias"])
        elif r["kind"] == "country":
            nested[cur_continent]["Countries"].append({r["alias"]: []})
        else:  # alias
            for c in nested[cur_continent]["Countries"]:
                if r["tag"] in c:
                    c[r["tag"]].append(r["alias"])
    return nested


def gen_verify_images(n: int = 48, seed: int = 42) -> pd.DataFrame:
    """Fixture for the pixel-verification stage of image dedup
    (q_image_phash_neardup kind='verified'): gen_images(n) base rows
    plus two planted near-dup classes —

    - every 4th image re-encoded with the lossy 'dct' codec (id + '~r'):
      a TRUE near-dup (small Hamming distance, tiny pixel SAD) that
      verification must CONFIRM;
    - every 16th image with +24 global brightness (id + '~b', 'raw'):
      a phash FALSE POSITIVE — a uniform shift preserves every AC-DCT
      sign so the hashes collide, but the pooled-luma grids differ by
      ~72/cell — that verification must REJECT.

    phashes are recomputed from the planted pixels with the engine's own
    codec (fixture construction is INPUT, per the single-construction
    rule; oracle/expected.py re-derives the verification STATISTIC
    freshly)."""
    rows = []
    for i, r in enumerate(gen_images(n, seed).itertuples()):
        rows.append(
            {
                "image_id": r.image_id,
                "bytes": r.bytes,
                "w": r.w,
                "h": r.h,
                "fmt": r.fmt,
                "phash": int(r.phash),
            }
        )
        px = codecs.decode(bytes(r.bytes), r.fmt)
        if i % 4 == 0:
            data = codecs.encode(px, "dct")
            dec = codecs.decode(data, "dct")
            rows.append(
                {
                    "image_id": r.image_id + "~r",
                    "bytes": data,
                    "w": r.w,
                    "h": r.h,
                    "fmt": "dct",
                    "phash": codecs.phash(dec),
                }
            )
        if i % 16 == 0:
            shifted = np.minimum(px.astype(np.int64) + 24, 255).astype(np.uint8)
            rows.append(
                {
                    "image_id": r.image_id + "~b",
                    "bytes": codecs.encode(shifted, "raw"),
                    "w": r.w,
                    "h": r.h,
                    "fmt": "raw",
                    "phash": codecs.phash(shifted),
                }
            )
    return pd.DataFrame(rows)


def gen_trap_urls(seed: int = 42) -> pd.DataFrame:
    """Planted URL-template classes for crawl-trap detection
    (functions/urls.detect_crawl_traps, cap 32):

    - trap0: a 64-URL calendar trap — every date collapses to
      /cal/N/N/N (OVER the cap -> trap)
    - trap1: a 48-URL pagination trap — /list/page/N (over -> trap)
    - ok0: 24 organic slugs, each its OWN template (letters don't
      collapse; singleton populations -> benign)
    - ok1: a 16-URL template /p/N (UNDER the cap -> benign)
    """
    urls = []
    for y in (2023, 2024):
        for m in range(1, 9):
            for d in (1, 9, 17, 25):
                urls.append(f"http://trap0.example.com/cal/{y}/{m:02d}/{d:02d}")
    for p in range(1, 49):
        urls.append(f"http://trap1.example.com/list/page/{p}")
    for i in range(24):
        slug = chr(97 + i % 26) + chr(97 + (i * 7) % 26) + chr(97 + (i * 11) % 26)
        urls.append(f"http://ok0.example.com/article/item-{slug}")
    for i in range(16):
        urls.append(f"http://ok1.example.com/p/{i}")
    return pd.DataFrame({"url": urls})
