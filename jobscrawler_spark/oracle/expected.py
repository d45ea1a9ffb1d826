"""Independent single-threaded recomputes for the end-to-end gate oracles.

Round 5 converts the former rows-only gates (crawl_round, jobs_pipeline,
embed_pipeline, extract_verify, multimodal_pipeline) to hash-green: each
function here re-derives the gate's expected OUTPUT rows with plain
Python/pandas/numpy — no Spark, no engine dataflow code — and
``__spark_entry__.oracle_sql`` inlines the rows as a VALUES table (the
accepted ann_ivf_kmeans pattern: independent recompute -> VALUES ->
pure-SQL compare).

What is shared vs independent: the recomputes share only the LEAVES the
oracle simulator already shares — the synthetic fetch model
(fetch_model.py), the codecs, the xxhash64/canonicalize ports, and the
regex CONSTANTS (the reference's literal patterns, cited in
functions/cleaning.py). With no network in this sandbox those leaves ARE
the ground truth, so a mismatch is a dataflow/scheduling bug, not a data
bug (same stance as oracle/simulator.py:18-21). Every pipeline STEP —
parsing, cleaning, enrichment, windowing, upsert, packing — is
re-implemented here sequentially with ``re``/``json``/dict loops.

Reference analogues: the main() DAG (reference: src/main.py:44-51 ->
src/crawler.py:320-361), the embedding entry point
(src/embeddings/embed_latest_crawled_data.py), the crawl loop
(src/crawlers/async_bs4.py:154-166).
"""

from __future__ import annotations

import datetime
import hashlib
import json
import re
from decimal import ROUND_HALF_UP, Decimal

from ..functions.xxhash import spark_xxhash64_str

CLOCK = datetime.datetime(2024, 3, 4, 5, 6, 7)


def spark_round_py(x: float, scale: int) -> float:
    """Bit-faithful port of Spark's round(double, scale): HALF_UP on the
    shortest-roundtrip decimal representation (Java BigDecimal.valueOf ==
    Decimal(repr(x)) — both parse the unique shortest decimal)."""
    return float(
        Decimal(repr(float(x))).quantize(Decimal(1).scaleb(-scale), ROUND_HALF_UP)
    )


def _search1(pat: str, s: str) -> str:
    """First match's group 1, '' on no match — regexp_extract semantics."""
    m = re.search(pat, s)
    return m.group(1) if m else ""


def _nan_if_empty(s: str | None) -> str:
    return "NaN" if s is None or s == "" else s


# ---------------------------------------------------------------------------
# crawl_recrawl: the engine round loop + re-crawl policy, re-derived by
# the oracle simulator
# ---------------------------------------------------------------------------


def crawl_recrawl_rows() -> list[tuple]:
    """(round, url) fetch log for q_crawl_recrawl's fixture: gen_seeds(200,
    8 hosts, seed 7), budget 4, depth 0, FOUR rounds with recrawl_after=1
    — URLs fetched in round f are forgotten and re-enqueued at round
    f + 2, so the log pins selection order, politeness, the seen-set
    block AND the r5 expiry/re-enqueue policy in one observable. The
    single-threaded simulator computes it sequentially."""
    from ..generators import gen_politeness, gen_robots, gen_seeds
    from .simulator import OracleCrawler

    orc = OracleCrawler(
        gen_politeness(8, seed=7), gen_robots(8, seed=7), default_budget=4,
        max_depth=0, n_shards=4, recrawl_after=1,
    )
    orc.bootstrap(gen_seeds(n=200, n_hosts=8, seed=7))
    orc.run(4)
    # landed (status-200) rows — the engine's fetch_log() is the landed
    # log (images table ordered by the determinism contract); non-200
    # attempts are P6-filtered in both engines
    return [(d["round"], d["url"]) for d in orc.landed]


# ---------------------------------------------------------------------------
# quality model: independent re-derivation of the logistic weights
# ---------------------------------------------------------------------------


def train_quality_logit_independent(
    texts: list[str], dim: int = 2048, epochs: int = 20, lr: float = 0.5,
    label_min_tokens: int = 40,
) -> tuple[list[float], float]:
    """Re-derive functions/quality_model.py's weights from the published
    CONTRACT alone (module docstring there): md5[:4]%dim buckets, plain
    SGD in ascending-doc order, token-order accumulation, 6dp rounding.
    Hand-written separately (the train_bpe independent-pass pattern) —
    if either implementation drifts from the contract the corpus_filter
    gate hash-mismatches."""
    import hashlib as _hl
    import math as _m

    bucketed = []
    for t in texts:
        toks = t.split()
        n = len(toks)
        y = 1 if n >= label_min_tokens else 0
        bucketed.append(
            (y, [int(_hl.md5(x.encode()).hexdigest()[:4], 16) % dim for x in toks])
        )
    w = [0.0] * dim
    b = 0.0
    for _ in range(epochs):
        for y, buckets in bucketed:
            if not buckets:
                continue
            z = b
            for j in buckets:
                z = z + w[j]
            zc = 60.0 if z > 60.0 else (-60.0 if z < -60.0 else z)
            g = 1.0 / (1.0 + _m.exp(-zc)) - y
            b = b - lr * g
            for j in buckets:
                w[j] = w[j] - lr * g
    return [round(x, 6) for x in w], round(b, 6)


# ---------------------------------------------------------------------------
# image_curation: quality stats + alignment verdicts, sequential recompute
# ---------------------------------------------------------------------------


def curate_images_py(rows, **thresholds) -> list[dict]:
    """Sequential fresh-arithmetic recompute of image_curation.curate_images
    — NOT the operator's numpy path: math.fsum accumulation for luma
    mean/std and pooling (vs numpy pairwise/add.at), math.log2 per bin for
    entropy (vs vectorized np.log2), explicit left-to-right loops for the
    cosine (mirroring the JVM aggregate order), and the Python xxhash port
    for the caption embedding. Rounding points (4dp stats, 6dp embedding
    components, integer-scaled score) are the operator's published
    contract, so last-ulp summation differences cannot cross engines."""
    import math

    import numpy as np

    from ..functions import codecs
    from ..embeddings_pipeline import synth_embedding_py
    from ..operators.image_curation import DEFAULTS, POOL_GRID

    t = {**DEFAULTS, **thresholds}
    thr_e6 = int(t["align_threshold"] * 1_000_000)
    dim = POOL_GRID * POOL_GRID
    out = []
    for r in rows:
        img = codecs.decode(bytes(r["bytes"]), r["fmt"])
        h, w = img.shape[0], img.shape[1]
        luma = (
            img[:, :, 0].astype(np.float64)
            + img[:, :, 1].astype(np.float64)
            + img[:, :, 2].astype(np.float64)
        ) / 3.0
        flat = luma.ravel()
        mean = math.fsum(flat) / flat.size
        std = math.sqrt(math.fsum((x - mean) ** 2 for x in flat) / flat.size)
        counts = np.bincount(
            np.clip(np.rint(luma), 0, 255).astype(np.int64).ravel(), minlength=256
        )
        entropy = -math.fsum(
            (c / flat.size) * math.log2(c / flat.size) for c in counts if c > 0
        ) + 0.0  # canonicalize -0.0 (flat image), mirroring _luma_stats
        # grid pooling: yi = y*grid//h is monotone, so each cell is a
        # contiguous block — fsum per block, independent of np.add.at
        ys = [0] + [min(y for y in range(h) if y * POOL_GRID // h == g) for g in range(1, POOL_GRID)] + [h]
        xs = [0] + [min(x for x in range(w) if x * POOL_GRID // w == g) for g in range(1, POOL_GRID)] + [w]
        vec = []
        for gy in range(POOL_GRID):
            for gx in range(POOL_GRID):
                cell = luma[ys[gy] : ys[gy + 1], xs[gx] : xs[gx + 1]].ravel()
                vec.append(math.fsum(cell) / cell.size)
        center = math.fsum(vec) / len(vec)
        vec = [float(np.round(v - center, 6)) for v in vec]
        cap = synth_embedding_py(r["caption"], dim=dim)
        dot = na = nb = 0.0
        for x, y in zip(vec, cap):
            dot = dot + x * y
            na = na + x * x
            nb = nb + y * y
        na, nb = math.sqrt(na), math.sqrt(nb)
        cos = dot / (na * nb) if na > 0 and nb > 0 else 0.0
        # skin rule (NSFW stand-in): per-pixel PURE-PYTHON loop — integer
        # compares only, independent of the operator's vectorized mask
        skin = 0
        px = img.reshape(-1, 3).tolist()
        for rr, gg, bb in px:
            mx, mn = max(rr, gg, bb), min(rr, gg, bb)
            if (
                rr > 95 and gg > 40 and bb > 20 and (mx - mn) > 15
                and abs(rr - gg) > 15 and rr > gg and rr > bb
            ):
                skin += 1
        # r6 caption-quality gates: whitespace tokens + repeated-token
        # fraction as an exact scaled integer (pure-Python arithmetic)
        cap_toks = [tk for tk in r["caption"].split() if tk]
        n_cap = len(cap_toks)
        rep_e4 = 0 if n_cap <= 0 else ((n_cap - len(set(cap_toks))) * 10000) // n_cap
        # r6 blur gate: per-pixel PURE-PYTHON 4-neighbor Laplacian of the
        # integer channel-sum luma (independent of the operator's
        # vectorized slicing — integers are exact so order must agree)
        lsum = [
            [int(px3[0]) + int(px3[1]) + int(px3[2]) for px3 in row]
            for row in img
        ]
        if h < 3 or w < 3:
            lap_e1 = 0
        else:
            acc = 0
            for y in range(1, h - 1):
                for x in range(1, w - 1):
                    acc += abs(
                        4 * lsum[y][x]
                        - lsum[y - 1][x]
                        - lsum[y + 1][x]
                        - lsum[y][x - 1]
                        - lsum[y][x + 1]
                    )
            lap_e1 = acc * 10 // ((h - 2) * (w - 2))
        rec = {
            "image_id": r["image_id"],
            "w": w,
            "h": h,
            "aspect": round(w / h, 4),
            "luma_mean": round(mean, 4),
            "luma_std": round(std, 4),
            "entropy": round(entropy, 4),
            "skin_e4": skin * 10000 // len(px),
            "lap_e1": lap_e1,
            "align_e6": int(math.floor(cos * 1e6 + 0.5)),
            "cap_tokens": n_cap,
            "cap_rep_e4": rep_e4,
        }
        rec["too_small"] = w < t["min_side"] or h < t["min_side"]
        rec["bad_aspect"] = rec["aspect"] < t["min_aspect"] or rec["aspect"] > t["max_aspect"]
        rec["low_entropy"] = rec["entropy"] < t["min_entropy"]
        rec["low_contrast"] = rec["luma_std"] < t["min_contrast"]
        rec["misaligned"] = rec["align_e6"] < thr_e6
        rec["flagged_nsfw"] = rec["skin_e4"] > t["max_skin_e4"]
        rec["flagged_caption"] = (
            n_cap < t["min_cap_tokens"]
            or n_cap > t["max_cap_tokens"]
            or rep_e4 > t["max_cap_rep_e4"]
        )
        rec["flagged_blurry"] = rec["lap_e1"] < t["min_lap_e1"]
        rec["keep"] = not (
            rec["too_small"]
            or rec["bad_aspect"]
            or rec["low_entropy"]
            or rec["low_contrast"]
            or rec["misaligned"]
            or rec["flagged_nsfw"]
            or rec["flagged_caption"]
            or rec["flagged_blurry"]
        )
        out.append(rec)
    return out


def image_curation_rows(n: int = 160, seed: int = 42) -> list[tuple]:
    """(image_id, w, h, aspect, luma_mean, luma_std, entropy, skin_e4,
    align_e6, too_small, bad_aspect, low_entropy, low_contrast,
    misaligned, flagged_nsfw, keep) for q_image_curation's
    gen_curation_images fixture, via :func:`curate_images_py`
    (min_side=24 like the gate)."""
    from ..generators import gen_curation_images

    rows = curate_images_py(
        gen_curation_images(n, seed=seed).to_dict("records"), min_side=24
    )
    return [
        (
            r["image_id"], r["w"], r["h"], r["aspect"], r["luma_mean"],
            r["luma_std"], r["entropy"], r["skin_e4"], r["lap_e1"],
            r["align_e6"], r["cap_tokens"], r["cap_rep_e4"],
            r["too_small"], r["bad_aspect"], r["low_entropy"],
            r["low_contrast"], r["misaligned"], r["flagged_nsfw"],
            r["flagged_caption"], r["flagged_blurry"], r["keep"],
        )
        for r in rows
    ]


# ---------------------------------------------------------------------------
# extract_verify: per-image invariant verdicts, sequential numpy
# ---------------------------------------------------------------------------


def extract_verify_rows(n: int = 128, seed: int = 42) -> list[tuple]:
    """(image_id, fmt, decode_ok, psnr_ok, caption_ok, phash_match) for
    q_extract_verify's gen_images(128) fixture. Decode/PSNR/phash are
    recomputed here sequentially (fresh PSNR arithmetic, not
    operators/extract.py)."""
    import numpy as np

    from .. import fetch_model as FM
    from ..functions import codecs
    from ..functions.urls import canonicalize_py

    out = []
    for i in range(n):
        url = f"http://img{seed}.example.com/i/{i}"
        data, w, h, fmt, caption, ph = FM.fetch_payload(url)
        image_id = canonicalize_py(url)
        decoded = codecs.decode(data, fmt)
        decode_ok = decoded.shape == (h, w, 3)
        truth = FM.expected_pixels(url)
        if fmt in codecs.LOSSY_FMTS:
            err = (truth.astype(np.float64) - decoded.astype(np.float64)) ** 2
            mse = float(err.mean())
            psnr = float("inf") if mse == 0 else 10.0 * np.log10(255.0**2 / mse)
            psnr_ok = psnr >= 40.0
        else:
            psnr_ok = bool(np.array_equal(truth, decoded))
        caption_ok = caption == FM.caption_for(url)
        phash_match = codecs.phash(truth) == ph
        out.append((image_id, fmt, decode_ok, psnr_ok, caption_ok, phash_match))
    return out


# ---------------------------------------------------------------------------
# jobs_pipeline: parse -> clean -> enrich -> stamp -> upsert, in pandas/re
# ---------------------------------------------------------------------------


def _parse_all_py(configs, payloads) -> list[dict]:
    """Sequential re-implementation of the four parse strategies over the
    canned bodies (python re/json loops; the engine does this with
    regexp_extract_all/from_json/posexplode in sources/strategies.py)."""
    from ..sources.strategies import (
        P_DESC,
        P_JOB,
        P_LINK,
        P_LOC,
        P_TITLE,
    )

    bodies = {
        r["url"]: r["body"]
        for _, r in payloads.iterrows()
        if int(r["status"]) == 200
    }
    rows: list[dict] = []
    for _, cfg in configs.iterrows():
        kind, strategy = cfg["source_kind"], cfg["strategy"]
        sel = lambda c, d: (cfg.get(c) if isinstance(cfg.get(c), str) else None) or d
        if kind == "bs4":
            for page in range(int(cfg["start_point"]), int(cfg["pages_to_crawl"]) + 1):
                body = bodies.get(f"{cfg['url']}{page}")
                if body is None:
                    continue
                if strategy == "main":
                    jobs = re.findall(sel("sel_job", P_JOB), body)
                    fields = [
                        (
                            _search1(sel("sel_title", P_TITLE), j),
                            _search1(sel("sel_link", P_LINK), j),
                            _search1(sel("sel_desc", P_DESC), j),
                            _search1(sel("sel_loc", P_LOC), j),
                        )
                        for j in jobs
                    ]
                    # page-level abort: any missing title/link kills the page
                    if any(t == "" or l == "" for t, l, _d, _o in fields):
                        continue
                    for pos, (t, l, d, o) in enumerate(fields):
                        rows.append(
                            dict(
                                config_idx=int(cfg["config_idx"]), page=page, pos=pos,
                                title=t, link=cfg["name"] + l,
                                description=_nan_if_empty(d),
                                location=_nan_if_empty(o), source_kind="bs4",
                            )
                        )
                else:  # container: zip-truncate to the shortest list
                    titles = re.findall(sel("sel_title", P_TITLE), body)
                    links = re.findall(sel("sel_link", P_LINK), body)
                    descs = re.findall(sel("sel_desc", P_DESC), body)
                    locs = re.findall(sel("sel_loc", P_LOC), body)
                    if not titles or not links:
                        continue
                    for pos in range(min(len(titles), len(links), len(descs), len(locs))):
                        rows.append(
                            dict(
                                config_idx=int(cfg["config_idx"]), page=page, pos=pos,
                                title=_nan_if_empty(titles[pos]),
                                link=cfg["name"] + links[pos],
                                description=_nan_if_empty(descs[pos]),
                                location=_nan_if_empty(locs[pos]), source_kind="bs4",
                            )
                        )
        elif kind == "api":
            body = bodies.get(cfg["url"])
            if body is None:
                continue
            payload = json.loads(body)
            arr = payload["data"] if strategy == "dict" else payload
            for pos, job in enumerate(arr):
                loc = job.get(sel("tag_loc", "locF"))
                # coalesce(element_at, 'NaN'): MISSING key -> 'NaN';
                # present-but-empty stays '' (only location defaults on '')
                nan_if_missing = lambda v: "NaN" if v is None else v
                rows.append(
                    dict(
                        config_idx=int(cfg["config_idx"]), page=1, pos=pos,
                        title=nan_if_missing(job.get(sel("tag_title", "titleF"))),
                        link=nan_if_missing(job.get(sel("tag_link", "linkF"))),
                        description=nan_if_missing(job.get(sel("tag_desc", "descF"))),
                        location="Worldwide" if loc is None or loc == "" else loc,
                        source_kind="api",
                    )
                )
        else:  # rss
            body = bodies.get(cfg["url"])
            if body is None:
                continue
            items = re.findall(r"(?is)<(?:item|entry)(?:\s[^>]*)?>(.*?)</(?:item|entry)\s*>", body)

            def field(tag: str, item: str) -> str:
                return _search1(
                    rf"(?is)<{tag}(?:\s[^>]*)?>\s*(?:<!\[CDATA\[)?\s*(.*?)\s*(?:\]\]>)?\s*</{tag}\s*>",
                    item,
                )

            for pos, item in enumerate(items):
                link = field("link", item) or _search1(
                    r'(?is)<link\s[^>]*href\s*=\s*"(.*?)"', item
                )
                rows.append(
                    dict(
                        config_idx=int(cfg["config_idx"]), page=1, pos=pos,
                        title=_nan_if_empty(field("title", item)),
                        link=_nan_if_empty(link),
                        description=_nan_if_empty(field("description", item)),
                        location=_nan_if_empty(field("location", item)),
                        source_kind="rss",
                    )
                )
    return rows


def _clean_text_py(s: str) -> str:
    from ..functions.cleaning import RE_HTML_PUNCT

    return re.sub(RE_HTML_PUNCT, "", s)


def _clean_location_py(s: str) -> str:
    from ..functions.cleaning import (
        RE_CAMEL,
        RE_DASH,
        RE_DATE,
        RE_HTML_PUNCT,
        RE_REMOTE,
        RE_REMOTE_EXACT,
        RE_REPEAT,
        RE_SALARY,
    )

    c = re.sub(RE_HTML_PUNCT, "", s)
    c = re.sub(RE_REPEAT, r"\1", c)
    c = re.sub(RE_DATE, "", c)
    c = re.sub(RE_SALARY, "", c)
    c = re.sub(RE_DASH, " ", c)
    c = re.sub(RE_CAMEL, " ", c)
    c = re.sub(RE_REMOTE, "Worldwide", c)
    c = re.sub(RE_REMOTE_EXACT, "Worldwide", c)
    return c.strip(" ")  # Spark trim strips the space character


def _location_tags_py(location: str, dim: dict[str, str]) -> tuple[str | None, list[str] | None]:
    """(rejoined location, ordered-distinct tags) — the unigram/bigram
    enrichment re-derived sequentially (engine: operators/location_tags.py;
    reference: src/crawler.py:45-107)."""
    cleaned = re.sub(r"\|", " ", re.sub(r"[,()]", "", location))
    toks = [t for t in re.split(r"\s+", cleaned.strip(" ")) if t != ""]
    if not toks:
        return None, None
    tag1 = [dim.get(t.upper()) for t in toks]
    tags = []
    for j, tok in enumerate(toks):
        nxt = toks[j + 1] if j + 1 < len(toks) else None
        tag_bwd = None
        if j > 0 and tag1[j - 1] is None:
            tag_bwd = dim.get(f"{toks[j - 1]} {tok}".upper())
        tag_fwd = None
        if tag1[j] is None and nxt is not None:
            tag_fwd = dim.get(f"{tok} {nxt}".upper())
        # tag_bwd outranks tag1: the trailing token of a matched compound
        # takes the compound tag (reference i += 2 consumption)
        t = tag_bwd or tag1[j] or tag_fwd or "NaN"
        tags.append(t)
    rejoined = re.sub(r"[\[\]']", "", " ".join(toks))
    distinct = list(dict.fromkeys(tags))
    return rejoined, distinct


def jobs_rows() -> list[dict]:
    """The upserted jobs table for q_jobs_pipeline's fixtures, re-derived
    sequentially. Columns: title, link, description, pubdate (date),
    location, timestamp (datetime), location_tags (list)."""
    from ..generators import gen_payload_bodies, gen_site_configs, gen_world_locations

    configs = gen_site_configs()
    payloads = gen_payload_bodies(configs)
    dim_rows = gen_world_locations()
    dim = {r["alias"]: r["tag"] for _, r in dim_rows.iterrows()}

    parsed = _parse_all_py(configs, payloads)
    # per-strategy clean: api has NO dedupe; rest dropDuplicates (the
    # (config_idx, page, pos) key makes rows unique anyway — assert it)
    keys = [(r["config_idx"], r["page"], r["pos"], r["source_kind"]) for r in parsed]
    assert len(keys) == len(set(keys))
    out = []
    for r in parsed:
        title = _clean_text_py(r["title"])
        desc = _clean_text_py(r["description"])
        loc = _clean_location_py(r["location"])
        rejoined, tags = _location_tags_py(loc, dim)
        out.append(
            dict(
                title=title if title is not None else "NaN",
                link=r["link"],
                description=desc if desc is not None else "NaN",
                pubdate=CLOCK.date(),
                location="NaN" if rejoined is None else rejoined,
                timestamp=CLOCK,
                location_tags=tags,
                _order=(r["config_idx"], r["page"], r["pos"]),
            )
        )
    # upsert key=link into an empty table: within-batch conflicts resolve
    # by min over the remaining columns (operators/sink.py contract)
    by_link: dict[str, dict] = {}
    for r in out:
        cur = by_link.get(r["link"])
        if cur is None:
            by_link[r["link"]] = r
        else:
            key = lambda d: (
                d["title"], d["description"], str(d["pubdate"]), d["location"],
                str(d["timestamp"]), d["location_tags"] or [],
            )
            if key(r) < key(cur):
                by_link[r["link"]] = r
    return list(by_link.values())


# ---------------------------------------------------------------------------
# embed_pipeline: watermark -> wrap/clean/truncate -> prefix -> embed -> upsert
# ---------------------------------------------------------------------------


def _embed_cleanup_py(s: str) -> str:
    return s.translate({ord(c): None for c in "()',"})


def _truncate_ws_py(s: str, max_tokens: int) -> str:
    toks = [t for t in re.split(r"\s+", s.strip(" ")) if t != ""]
    return " ".join(toks[:max_tokens])


def embed_rows(max_tokens: int = 60, dim: int = 64) -> list[dict]:
    """The embeddings sink for q_embed_pipeline, re-derived sequentially:
    id=xxhash64(link), job_info='passage: ' + truncate(wrap(title,
    location, description)), and the embedding's integer codes
    k_j = xxhash64(job_info + '|' + j) mod 100000 (the synthetic model's
    exact integers — the gate fingerprints these, so no float formatting
    crosses the comparison). Columns: id, job_info, timestamp,
    embedding_md5."""
    out = []
    for r in jobs_rows():
        wrapped = " ".join(
            [
                f"<title> {_embed_cleanup_py(r['title'])} </title>",
                f"<location> {_embed_cleanup_py(r['location'])} </location>",
                f"<description> {_embed_cleanup_py(r['description'])} </description>",
            ]
        )
        job_info = "passage: " + _truncate_ws_py(wrapped, max_tokens)
        codes = [
            spark_xxhash64_str(f"{job_info}|{j}") % 100000 for j in range(dim)
        ]
        fp = hashlib.md5(",".join(str(k) for k in codes).encode()).hexdigest()
        out.append(
            dict(
                id=spark_xxhash64_str(r["link"]),
                job_info=job_info,
                timestamp=CLOCK,
                embedding_md5=fp,
            )
        )
    # upsert key=id into an empty table; ids are distinct by construction
    assert len({r["id"] for r in out}) == len(out)
    return out


# ---------------------------------------------------------------------------
# multimodal_pipeline: image/video/audio branches, sequential numpy
# ---------------------------------------------------------------------------


def multimodal_rows() -> list[tuple]:
    """(kind, media_id, idx, w, h, fmt, metric, fingerprint) for
    q_multimodal_pipeline's fixtures (96 images, 12 videos, 48 audio) —
    features recomputed with fresh numpy arithmetic; fingerprints are the
    gate's scaled-integer md5s (no float-to-string crosses engines)."""
    import numpy as np

    from .. import fetch_model as FM
    from ..functions import codecs
    from ..functions.urls import canonicalize_py

    rows: list[tuple] = []
    for i in range(96):
        url = f"http://img42.example.com/i/{i}"
        data, w, h, fmt, _caption, _ph = FM.fetch_payload(url)
        img = codecs.decode(data, fmt)
        means = img.reshape(-1, 3).mean(axis=0)
        mr, mg, mb = (round(float(m), 4) for m in means)
        brightness = round(float(means.mean()), 4)
        fp = hashlib.md5(
            "|".join(
                [
                    str(int(spark_round_py(mr * 10000.0, 0))),
                    str(int(spark_round_py(mg * 10000.0, 0))),
                    str(int(spark_round_py(mb * 10000.0, 0))),
                    str(codecs.phash(img)),
                ]
            ).encode()
        ).hexdigest()
        rows.append(
            ("image", canonicalize_py(url), 0, img.shape[1], img.shape[0], fmt,
             spark_round_py(brightness, 4), fp)
        )
    for i in range(12):
        d = FM.url_digest(f"video:42:{i}")
        w, h = 8 + (d >> 8) % 25, 8 + (d >> 16) % 25
        nf = 5 + d % 20
        frames = codecs.synth_video(d, int(w), int(h), int(nf))
        for fno in range(0, len(frames), 5):
            png = codecs.encode(frames[fno], "png")
            rows.append(
                ("video_frame", f"v{i:04d}", fno, int(frames.shape[2]),
                 int(frames.shape[1]), "png", None,
                 hashlib.md5(png).hexdigest())
            )
    for i in range(48):
        d = FM.url_digest(f"audio:42:{i}")
        samples = codecs.synth_audio(d, int(1000 + d % 8000))
        x = samples.astype(np.float64)
        rate = 16000
        n = len(samples)
        duration = round(n / rate, 6)
        rms = round(float(np.sqrt((x**2).mean())), 4)
        zc = int(np.count_nonzero(np.diff(np.signbit(x))))
        peak = int(np.abs(samples.astype(np.int32)).max()) if n else 0
        fp = hashlib.md5(
            "|".join(
                [str(n), str(zc), str(peak),
                 str(int(spark_round_py(duration * 1000000.0, 0)))]
            ).encode()
        ).hexdigest()
        rows.append(("audio", f"a{i:04d}", 0, None, None, "pcm16",
                     spark_round_py(rms, 4), fp))
    rows += scene_cut_rows()
    rows += scene_dup_rows()
    rows += watermark_rows()
    rows += audio_seg_rows()
    return rows


def audio_seg_rows(
    n: int = 12, seed: int = 42, frame_len: int = 400, threshold: int = 100_000
) -> list[tuple]:
    """Fresh sequential recompute of segment_audio over the planted VAD
    fixture, in the merged multimodal gate shape: per-sample pure-Python
    squared sums (the operator uses vectorized int64 — integers are exact
    so arithmetic order must agree), metric = seg_id, fingerprint =
    md5(seg|active|energy_sum|n). Waveform construction is shared input
    (generators.vad_audio_samples); the computation is independent."""
    from ..generators import vad_audio_samples

    rows: list[tuple] = []
    for i in range(n):
        samples = vad_audio_samples(i, seed)
        prev: bool | None = None
        seg = -1
        for fno, start in enumerate(range(0, len(samples), frame_len)):
            fr = samples[start : start + frame_len]
            e = 0
            for s in fr:
                v = int(s)
                e += v * v
            act = e > threshold * len(fr)
            if prev is None or act != prev:
                seg += 1
            fp = hashlib.md5(
                f"{seg}|{1 if act else 0}|{e}|{len(fr)}".encode()
            ).hexdigest()
            rows.append(
                ("audio_seg", f"va{i:04d}", fno, None, None, "pcm16", float(seg), fp)
            )
            prev = act
    return rows


def scene_cut_rows(n: int = 10, seed: int = 42, threshold: int = 25) -> list[tuple]:
    """Fresh sequential recompute of detect_scene_cuts over the scene-video
    fixture, in the merged multimodal gate shape (kind, media_id, idx, w,
    h, fmt, metric, fingerprint): pure-Python per-pixel accumulation (no
    numpy reductions — the operator uses vectorized int64 sums; integers
    are exact so any arithmetic order must agree), metric = scene_id,
    fingerprint = md5(scene|cut|luma_sum|diff_sum(-1 for frame 0)|phash).
    Frame construction is shared input (generators.scene_video_frames);
    the computation is independent."""
    from ..functions import codecs
    from ..generators import scene_video_frames

    rows: list[tuple] = []
    for i in range(n):
        frames = scene_video_frames(i, seed)
        n_px = int(frames.shape[1]) * int(frames.shape[2])
        prev: list[int] | None = None
        scene = -1
        for fno in range(frames.shape[0]):
            luma = [
                int(px[0]) + int(px[1]) + int(px[2])
                for row in frames[fno]
                for px in row
            ]
            if prev is None:
                diff = None
                is_cut = True
            else:
                diff = sum(abs(a - b) for a, b in zip(luma, prev))
                is_cut = diff > threshold * n_px
            if is_cut:
                scene += 1
            fp = hashlib.md5(
                f"{scene}|{1 if is_cut else 0}|{sum(luma)}|"
                f"{-1 if diff is None else diff}|{codecs.phash(frames[fno])}".encode()
            ).hexdigest()
            rows.append(
                ("scene_cut", f"sv{i:04d}", fno, None, None, "vraw", float(scene), fp)
            )
            prev = luma
    return rows


def scene_dup_rows(n: int = 12, seed: int = 42, threshold: int = 25,
                   max_hamming: int = 4) -> list[tuple]:
    """Fresh sequential recompute of scene_dup_stats over the SHARED-SCENE
    fixture (gen_scene_videos(shared_scene=True)), in the merged
    multimodal gate shape: cuts re-detected with pure-Python accumulation,
    keyframe phashes via the engine's deterministic phash, then EXACT
    all-pairs Hamming over the keyframe set (~n*scenes rows — the banded
    LSH the operator uses is pigeonhole-complete for max_hamming <=
    n_bands - 1, so the exact pass must agree; running it exactly here
    independently re-validates that guarantee on this data). Row shape:
    idx = n_scenes, metric = shared_scene_frac, fingerprint =
    md5(n_scenes|n_shared)."""
    from ..functions import codecs
    from ..generators import scene_video_frames

    keyframes: list[tuple[int, int, int]] = []  # (video_i, scene, phash)
    for i in range(n):
        frames = scene_video_frames(i, seed, shared_scene=True)
        n_px = int(frames.shape[1]) * int(frames.shape[2])
        prev: list[int] | None = None
        scene = -1
        for fno in range(frames.shape[0]):
            luma = [
                int(px[0]) + int(px[1]) + int(px[2])
                for row in frames[fno]
                for px in row
            ]
            cut = prev is None or sum(
                abs(a - b) for a, b in zip(luma, prev)
            ) > threshold * n_px
            if cut:
                scene += 1
                keyframes.append((i, scene, codecs.phash(frames[fno])))
            prev = luma
    shared: set[tuple[int, int]] = set()
    for ai in range(len(keyframes)):
        for bi in range(ai + 1, len(keyframes)):
            va, sa, pa = keyframes[ai]
            vb, sb, pb = keyframes[bi]
            if va != vb and bin(pa ^ pb).count("1") <= max_hamming:
                shared.add((va, sa))
                shared.add((vb, sb))
    rows: list[tuple] = []
    for i in range(n):
        scenes = [k for k in keyframes if k[0] == i]
        n_sh = sum(1 for v, s, _ in scenes if (v, s) in shared)
        fp = hashlib.md5(f"{len(scenes)}|{n_sh}".encode()).hexdigest()
        rows.append(
            ("scene_dup", f"sv{i:04d}", len(scenes), None, None, "vraw",
             spark_round_py(n_sh / len(scenes), 6), fp)
        )
    return rows


def train_bigram_lm_independent(
    texts: list[str], scale: int = 1000
) -> tuple[list[tuple[str, str, int]], list[tuple[str, int]], int]:
    """Independent re-derivation of functions/lm.train_bigram_lm's
    integer-surprisal contract (add-one bigram LM over the bounded
    sample; pair = round(-log2((c12+1)/(c1+V))*scale), backoff =
    round(log2(c1+V)*scale), unk = round(log2(V)*scale)) using Counter
    instead of the dict loops. Returns sorted (w1, w2, cost) /
    (w1, cost) lists ready for VALUES rendering."""
    import math
    from collections import Counter

    uni: Counter = Counter()
    bi: Counter = Counter()
    for t in texts:
        toks = t.split()
        uni.update(toks)
        bi.update(zip(toks, toks[1:]))
    v = len(uni)
    pairs = sorted(
        (a, b, round(-math.log2((n + 1) / (uni[a] + v)) * scale))
        for (a, b), n in bi.items()
    )
    backs = sorted((w, round(math.log2(n + v) * scale)) for w, n in uni.items())
    return pairs, backs, round(math.log2(v) * scale)


def pagerank_py(
    edges: set[tuple],
    iters: int = 10,
    scale: int = 10**9,
    damping_pct: int = 85,
) -> dict:
    """Pure-Python port of components.pagerank's INTEGER contract (init =
    scale // n; contrib(v) = sum of rank(u) // outdeg(u) over distinct
    in-edges; share = dangling mass // n; rank' = base +
    damping*(contrib+share) // 100). Integer sums are order-free, so this
    equals the distributed aggregation bit-for-bit — which is what lets
    the oracle simulator reproduce pagerank-prioritized fetch ordering
    exactly."""
    es = sorted(set(edges))
    nodes = sorted({s for s, _ in es} | {d for _, d in es})
    if not nodes:
        return {}
    n = len(nodes)
    outdeg: dict = {}
    for s, _ in es:
        outdeg[s] = outdeg.get(s, 0) + 1
    init = scale // n
    base = (init * (100 - damping_pct)) // 100
    rank = {u: init for u in nodes}
    for _ in range(iters):
        contrib = {u: 0 for u in nodes}
        for s, d in es:
            contrib[d] += rank[s] // outdeg[s]
        share = sum(rank[u] for u in nodes if u not in outdeg) // n
        rank = {
            u: base + (damping_pct * (contrib[u] + share)) // 100 for u in nodes
        }
    return rank


def tfidf_idf_independent(
    texts: list[str], n_buckets: int = 1024, scale: int = 1000
) -> list[tuple[int, int]]:
    """Independent re-derivation of operators/corpus.tfidf_keywords'
    bucket-idf contract (hashing-trick document frequency per md5 bucket;
    idf_scaled = round((ln((N+1)/(df+1)) + 1) * scale), Python banker's
    round) from the raw texts — hashlib.md5 over each distinct token per
    document, no Spark. Returns sorted (bucket, idf_scaled) rows ready
    for VALUES rendering."""
    import hashlib
    import math
    from collections import Counter

    df: Counter = Counter()
    for t in texts:
        buckets = {
            int(hashlib.md5(tok.encode()).hexdigest()[:4], 16) % n_buckets
            for tok in t.split()
            if tok
        }
        df.update(buckets)
    n = len(texts)
    return sorted(
        (b, round((math.log((n + 1) / (d + 1)) + 1.0) * scale))
        for b, d in df.items()
    )


def watermark_rows(
    n: int = 48,
    seed: int = 42,
    keys: tuple[int, ...] = (1, 2, 3),
    strength: int = 6,
    scale: int = 1000,
) -> list[tuple]:
    """'watermark'-kind rows for q_multimodal_pipeline: detection
    statistics re-derived in PURE PYTHON (integer pattern hash +
    integer correlation + floor division — no numpy, no codecs.wm_*
    call) over the shared fixture pixels (generators.wm_image_pixels;
    fixture construction is input, not computation). Pins
    multimodal.detect_watermarks bit-for-bit."""
    from ..generators import wm_image_pixels

    thr = strength * scale // 2
    rows: list[tuple] = []
    for i in range(n):
        img, _key = wm_image_pixels(i, seed)
        h, w = int(img.shape[0]), int(img.shape[1])
        vals = [int(x) for x in img.flatten().tolist()]
        nv = len(vals)
        for k in keys:
            corr = 0
            for idx, p in enumerate(vals):
                v = (idx * 2654435761 + k * 40503) & 0xFFFFFFFF
                v = (v * 2246822519) & 0xFFFFFFFF
                v ^= v >> 15
                corr += p if ((v >> 16) & 1) else -p
            cs = (corr * scale) // nv
            rows.append(
                (
                    "watermark",
                    f"wm{i:04d}",
                    k,
                    w,
                    h,
                    "raw",
                    float(cs),
                    hashlib.md5(
                        f"{cs}|{1 if cs >= thr else 0}".encode()
                    ).hexdigest(),
                )
            )
    return rows


def dsir_selected_independent(
    rows: list[tuple[int, str, str]],
    target_lang: str = "en",
    keep_frac: float = 0.4,
    n_buckets: int = 1024,
    scale: int = 1000,
    bin_width: int = 4096,
    salt: str = "dsir|",
) -> list[tuple[int, int]]:
    """Independent re-derivation of operators/corpus.dsir_select's whole
    contract (hashed uni+bigram bag models with add-one smoothing,
    scaled-integer log-ratio table, integer doc scores, two-phase
    coarse-bin/exact threshold, md5 tie admission) from the raw
    (doc_id, text, lang) rows — hashlib/math/Counter only, no Spark and
    no corpus.py import. Returns sorted (doc_id, dsir_score) of the
    selected documents, ready for VALUES rendering."""
    import hashlib
    import math
    from collections import Counter

    def grams(text: str) -> list[str]:
        toks = text.split()
        return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]

    def bucket(g: str) -> int:
        return int(hashlib.md5(g.encode()).hexdigest()[:4], 16) % n_buckets

    raw_c: Counter = Counter()
    tgt_c: Counter = Counter()
    doc_buckets: dict[int, list[int]] = {}
    for doc_id, text, lang in rows:
        bs = [bucket(g) for g in grams(text)]
        doc_buckets[doc_id] = bs
        raw_c.update(bs)
        if lang == target_lang:
            tgt_c.update(bs)
    c_t = sum(tgt_c.values())
    c_r = sum(raw_c.values())
    lr = {
        b: round(
            (
                math.log((tgt_c.get(b, 0) + 1) / (c_t + n_buckets))
                - math.log((raw_c[b] + 1) / (c_r + n_buckets))
            )
            * scale
        )
        for b in raw_c
    }
    scores = {
        doc_id: sum(lr[b] for b in bs) for doc_id, bs in doc_buckets.items()
    }
    n = len(rows)
    target_n = int(round(keep_frac * n))
    if target_n <= 0:
        return []
    if target_n >= n:
        return sorted(scores.items())

    bins: Counter = Counter(s // bin_width for s in scores.values())
    cum = 0
    b_star = None
    for b in sorted(bins, reverse=True):
        if cum + bins[b] >= target_n:
            b_star = b
            break
        cum += bins[b]
    exact: Counter = Counter(
        s for s in scores.values() if s // bin_width == b_star
    )
    thr = None
    tie_hex = None
    for s in sorted(exact, reverse=True):
        if cum + exact[s] >= target_n:
            thr = s
            rate = (target_n - cum) / exact[s]
            t = max(0, min(16**8, int(round(rate * 16**8))))
            tie_hex = "g" if t >= 16**8 else format(t, "08x")
            break
        cum += exact[s]
    assert thr is not None and tie_hex is not None
    return sorted(
        (doc_id, s)
        for doc_id, s in scores.items()
        if s > thr
        or (
            s == thr
            and hashlib.md5(f"{salt}{doc_id}".encode()).hexdigest()[:8] < tie_hex
        )
    )


def verified_neardup_rows(
    n: int = 48,
    seed: int = 42,
    max_hamming: int = 7,
    grid: int = 8,
    sad_threshold: int = 512,
) -> list[tuple]:
    """'verified'-kind rows for q_image_phash_neardup: candidate pairs +
    pixel verification re-derived FRESHLY over the gen_verify_images
    fixture (construction is input) — candidates by EXACT all-pairs
    Hamming (so the hash match re-validates the banded-LSH pigeonhole
    recall on this data, the scene_dup pattern), grids by explicit
    pure-Python pixel loops (no numpy pooling), SAD and the verdict in
    plain integer arithmetic. Pins similarity.verify_near_dup_pairs
    bit-for-bit."""
    from ..functions import codecs
    from ..generators import gen_verify_images

    imgs = list(gen_verify_images(n, seed).itertuples())
    grids: dict[str, list[int]] = {}
    for r in imgs:
        px = codecs.decode(bytes(r.bytes), r.fmt)
        h, w = int(px.shape[0]), int(px.shape[1])
        flat = [int(v) for v in px.reshape(-1).tolist()]  # h*w*3 channel values
        cells = []
        for gy in range(grid):
            y0, y1 = gy * h // grid, (gy + 1) * h // grid
            for gx in range(grid):
                x0, x1 = gx * w // grid, (gx + 1) * w // grid
                tot, cnt = 0, 0
                for y in range(y0, y1):
                    for x in range(x0, x1):
                        base = (y * w + x) * 3
                        tot += flat[base] + flat[base + 1] + flat[base + 2]
                        cnt += 1
                cells.append(0 if cnt == 0 else tot // cnt)
        grids[r.image_id] = cells
    rows: list[tuple] = []
    for i in range(len(imgs)):
        for j in range(i + 1, len(imgs)):
            a, b = imgs[i], imgs[j]
            id_a, id_b = sorted((a.image_id, b.image_id))
            ham = bin((int(a.phash) ^ int(b.phash)) & 0xFFFFFFFFFFFFFFFF).count("1")
            if ham > max_hamming:
                continue
            sad = sum(
                x - y if x >= y else y - x
                for x, y in zip(grids[a.image_id], grids[b.image_id])
            )
            rows.append((id_a, id_b, ham, sad, sad <= sad_threshold))
    return sorted(rows)
