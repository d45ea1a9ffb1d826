"""Corpus-assembly operators: decontamination, sequence packing, mixing.

The three steps between "deduped, filtered documents" and "training
batches" that a 100 TB pipeline runs after the dedup/quality family
(operators/dedupe.py, functions/text.py). The reference has nothing like
them (its corpus is the jobs table, reference: src/crawler.py:172-244);
these are north-rule training-data extensions, each expressed so a DuckDB
SQL oracle verifies it exactly:

- **decontamination**: flag documents sharing >= ``min_shared`` distinct
  word ``n``-grams with any benchmark/eval document — the standard
  test-set-overlap removal. Candidates come from an equi-join on the
  md5 gram key (never all-pairs); a document-frequency cap drops
  stop-grams before the join, exactly like ngram_jaccard_pairs.
- **sequence packing**: concatenate documents into fixed token-budget
  bins (the GPT-style "concat then chunk" batch layout), greedily in
  deterministic (group, doc_id) order via a window cumulative sum.
  Packing is PER GROUP (source by default) so the window is partitioned —
  a global-order pack would serialize on one partition at 10^10 docs;
  per-source packing streams, and training shuffles bins anyway.
- **weighted mixing**: per-source sampling rates (the "data mixture"), as
  deterministic md5-threshold sampling — the hex prefix of
  md5('mix|' || doc_id) is compared against a per-source 8-hex-digit
  threshold string precomputed from the rate, so the decision is a pure
  string compare (bit-identical in Spark, DuckDB, and any re-run —
  rand() is none of those).

Scale notes (100 TB): decontamination's only shuffle is the gram-key
equi-join (uniform md5 key, DF-capped buckets; the benchmark side is
small — broadcastable); packing is one partitioned window (shuffle on the
group key); mixing is map-side only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import token_count, tokens_col

MIX_SALT = "mix|"
HEX_SPAN = 16**8  # md5 8-hex-digit prefix space


def _gram_hashes(docs: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    """(id, gram md5) — distinct word n-grams per document."""
    from .util import fan_out

    # guide §2.5 input skew: spread the gram md5 compute when the scan
    # arrives narrower than the session parallelism (measured 3.3s ->
    # 0.8s on the sf0.1 corpus explode, r7); no-op at 100 TB
    docs = fan_out(docs)
    toks = tokens_col(F.col(text_col))
    cnt = F.size(toks)
    idx = F.when(cnt >= n, F.sequence(F.lit(0), cnt - n)).otherwise(
        F.array().cast("array<int>")
    )
    grams = F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " "))
    # (id, gram) is already unique via the map-side array_distinct — no
    # cross-doc .distinct() shuffle needed
    return (
        docs.select(F.col(id_col), F.explode(F.array_distinct(grams)).alias("__g"))
        .filter(F.col("__g") != "")
        .select(id_col, F.md5("__g").alias("gram"))
    )


def decontaminate_ngram(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_id_col: str = "bench_id",
    n: int = 8,
    min_shared: int = 1,
    max_doc_freq: int | None = 64,
) -> DataFrame:
    """(doc_id, bench_id, n_shared_grams) for every contaminated pair —
    documents sharing >= ``min_shared`` distinct ``n``-grams with a
    benchmark document (callers anti-join docs against the doc_id side to
    drop them). 8-grams are the published decontamination practice: long
    enough that organic collisions are negligible, short enough to catch
    quoted spans.

    ``max_doc_freq`` caps the CORPUS-side document frequency of a gram
    before the join (a boilerplate 8-gram in 10^6 docs would create a
    10^6 x |bench| bucket); the cap is part of the contract and the
    oracle mirrors it.
    """
    bg = _gram_hashes(benchmark, text_col, bench_id_col, n)
    return _decontaminate_tail(
        _gram_hashes(docs, text_col, id_col, n),
        bg,
        id_col,
        bench_id_col,
        min_shared,
        max_doc_freq,
    )


def _decontaminate_tail(
    corpus_grams: DataFrame,
    bg: DataFrame,
    id_col: str,
    bench_id_col: str,
    min_shared: int,
    max_doc_freq: int | None,
) -> DataFrame:
    """Shared tail of one-shot and incremental decontamination: restrict
    the corpus gram side to grams that occur in the benchmark FIRST
    (broadcast semi-join; eval sets are small by construction) — the DF
    cap then aggregates only the matched grams' occurrences instead of
    the full corpus gram set, with identical semantics (a gram's document
    frequency counts all its corpus rows, and every row of a matched
    gram survives the semi-join; unmatched grams never reach the output
    so their cap decision is irrelevant)."""
    dg = corpus_grams.join(
        F.broadcast(bg.select("gram").distinct()), "gram", "left_semi"
    )
    if max_doc_freq is not None:
        # the matched-gram rows feed BOTH the DF-cap aggregate and the
        # benchmark join — persist them so the corpus gram explode runs
        # once, not once per consumer (r7; O(matched grams) rows, bounded
        # by the benchmark gram set's corpus occurrences)
        dg = dg.persist()
        rare = (
            dg.groupBy("gram")
            .agg(F.count("*").alias("__df"))
            .filter(F.col("__df") <= max_doc_freq)
            .select("gram")
        )
        # both small sides broadcast: the cap survivors are <= the matched
        # gram count and bg is eval-set-sized — neither join shuffles dg
        dg = dg.join(F.broadcast(rare), "gram")
    return (
        dg.join(F.broadcast(bg), "gram")
        .groupBy(id_col, bench_id_col)
        .agg(F.count("*").alias("n_shared_grams"))
        .filter(F.col("n_shared_grams") >= min_shared)
    )


def corpus_gram_table(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """The PERSISTABLE decontamination state: (id, gram md5) — the
    corpus's distinct word n-grams, written ONCE at landing time
    (SnapshotTable beside the seen-set/band stores, appended per crawl
    batch; at scale bucketed on the gram key so benchmark joins
    co-locate). Each NEW benchmark then joins this store instead of
    re-exploding 10^10 documents (incremental_decontaminate) — the
    decontamination sibling of the minhash/phash band stores."""
    return _gram_hashes(docs, text_col, id_col, n)


def incremental_decontaminate(
    new_benchmark: DataFrame,
    corpus_grams: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_id_col: str = "bench_id",
    n: int = 8,
    min_shared: int = 1,
    max_doc_freq: int | None = 64,
) -> DataFrame:
    """INCREMENTAL decontamination — a NEW benchmark/eval set arrives and
    the corpus must be re-screened against it: the new benchmark's grams
    (small) join the persisted corpus gram store (corpus_gram_table), so
    the cost is O(benchmark grams + matching corpus rows), never a corpus
    re-explode. EXACTLY equals decontaminate_ngram(docs, new_benchmark)
    — including the DF cap, whose per-gram decision depends only on the
    gram's total corpus row count (test-pinned) — because both run the
    same _decontaminate_tail over the same gram rows."""
    bg = _gram_hashes(new_benchmark, text_col, bench_id_col, n)
    return _decontaminate_tail(
        corpus_grams, bg, id_col, bench_id_col, min_shared, max_doc_freq
    )


def pack_sequences(
    docs: DataFrame,
    budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    token_counter: str = "ws",
    bpe_merges: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """Assign each document to a token-budget bin: documents are laid out
    in deterministic (group, doc_id) order, token counts cumulate, and a
    document belongs to bin floor(preceding_total / budget) within its
    group — the concat-then-chunk layout (documents longer than the
    budget occupy ceil(n/budget) bins and still get one assignment row).

    Returns (group, doc_id, n_tokens, bin_id, bin_offset): ``bin_offset``
    is the document's start position inside its bin. One shuffle (the
    window partition on ``group_col``); bins are only comparable WITHIN a
    group, which is exactly what keeps the window partitioned at scale.

    ``bin_id`` is integer division kept as BIGINT: at the documented
    10^10-doc scale a group's cumulative token count exceeds 2^31*budget
    (and past 2^53 a double floor would drift), so the double-division
    floor + int cast would overflow (ADVICE r4).

    ``token_counter`` selects the counting backend (r4 verdict task 3 —
    the fidelity tokenizer must be load-bearing, not a sidecar):
    - ``'ws'``   — whitespace tokens, pure Catalyst (functions/text.py)
    - ``'bpe'``  — real BPE counts from functions/bpe.py's mapInPandas
      encode (``bpe_merges`` required, trained via train_bpe_on_docs).
      Adds one narrow map stage before the same partitioned window; the
      plan shape (one shuffle on the group key) is unchanged.
    """
    if token_counter == "bpe":
        if bpe_merges is None:
            raise ValueError("token_counter='bpe' requires bpe_merges")
        from ..functions.bpe import encode_docs

        # group key rides THROUGH the encode map stage (no join-back shuffle)
        counted = encode_docs(
            docs, bpe_merges, text_col=text_col, id_col=id_col,
            passthrough_cols=[group_col],
        ).select(group_col, id_col, F.col("n_bpe_tokens").cast("int").alias("n_tokens"))
    elif token_counter == "ws":
        n_tok = token_count(F.col(text_col))
        counted = docs.select(F.col(group_col), F.col(id_col), n_tok.alias("n_tokens"))
    else:
        raise ValueError(f"unknown token_counter {token_counter!r}")
    return _pack_by_budget(counted, budget, group_col, id_col, "n_tokens")


def _pack_by_budget(
    counted: DataFrame, budget: int, group_col: str, id_col: str, count_col: str
) -> DataFrame:
    """The shared packing core: deterministic (group, id) layout,
    cumulative counts, bin = preceding DIV budget — ONE shuffle (the
    window partition on ``group_col``), bigint bins (ADVICE r4)."""
    w = Window.partitionBy(group_col).orderBy(id_col)
    preceding = F.coalesce(
        F.sum(count_col).over(w.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)
    )
    return (
        counted.withColumn("__pre", preceding)
        .select(
            group_col,
            id_col,
            count_col,
            F.expr(f"CAST(__pre DIV {int(budget)} AS BIGINT)").alias("bin_id"),
            F.pmod(F.col("__pre"), F.lit(budget)).cast("int").alias("bin_offset"),
        )
    )


# aspect classes (w:h ascending) with midpoint thresholds as EXACT
# rationals: bucket decisions are integer cross-multiplications, so
# Spark, DuckDB, and any reimplementation agree bit-for-bit — a
# log2-based bucketing would hang class membership on the last ulp of a
# transcendental that differs between java Math.log and libm.
ASPECT_BUCKETS = ["r1x2", "r9x16", "r3x4", "r1x1", "r4x3", "r16x9", "r2x1"]
# threshold between bucket i and i+1: w/h < p/q  <=>  w*q < p*h
_ASPECT_THRESHOLDS = [(17, 32), (21, 32), (7, 8), (7, 6), (14, 9), (17, 9)]


def aspect_bucket_col(w_col: Column, h_col: Column) -> Column:
    """Nearest aspect class of ``w_col``/``h_col`` (SDXL-style bucketing:
    mixed-aspect corpora batch per shape class so tensors stack without
    destructive square-cropping). Pure integer arithmetic."""
    expr: Column | None = None
    for name, (p, q) in zip(ASPECT_BUCKETS, _ASPECT_THRESHOLDS):
        cond = w_col * q < p * h_col
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return expr.otherwise(ASPECT_BUCKETS[-1])


def pack_image_batches(
    images: DataFrame,
    pixel_budget: int,
    id_col: str = "image_id",
    w_col: str = "w",
    h_col: str = "h",
    shard_hex_chars: int = 0,
) -> DataFrame:
    """Image-training batch layout: bucket every image by nearest aspect
    class, then pack each bucket into fixed PIXEL-budget bins — the image
    counterpart of :func:`pack_sequences` (a training step's memory cost
    is pixels, not rows, so bins equalize w*h mass; batching within an
    aspect class is what lets variable-shape corpora stack into tensors
    without square-cropping).

    Returns (aspect_bucket, image_id, n_px, bin_id, bin_offset). Same
    scale shape as pack_sequences: metadata-only (no decode), one
    shuffle — the window partition on the group key. The bare aspect
    class has only 7 values, which would serialize 10^10 images onto 7
    window partitions, so ``shard_hex_chars`` appends an md5-prefix shard
    to the key (16x parallelism per char; bins stay valid training
    batches because packing only ever needs to be sequential WITHIN a
    group, exactly like pack_sequences' per-source independence). md5,
    not xxhash: both engines spell it identically, same reasoning as
    weighted_mix's threshold compare.
    """
    group = aspect_bucket_col(F.col(w_col), F.col(h_col))
    if shard_hex_chars > 0:
        group = F.concat(
            group,
            F.lit("|"),
            F.substring(
                F.md5(F.concat(F.lit("pack|"), F.col(id_col))), 1, shard_hex_chars
            ),
        )
    counted = images.select(
        group.alias("aspect_bucket"),
        F.col(id_col),
        (F.col(w_col).cast("long") * F.col(h_col).cast("long")).cast("int").alias("n_px"),
    )
    return _pack_by_budget(counted, pixel_budget, "aspect_bucket", id_col, "n_px")


def mix_threshold_hex(rate: float) -> str:
    """The 8-hex-digit threshold string for a sampling rate — computed
    driver-side so BOTH engines decide by pure string comparison.
    rate >= 1.0 returns 'g' (lexicographically above every hex prefix,
    keep-everything) because format(2^32) would be 9 chars and 8-char
    prefixes compare against it by FIRST character, not value."""
    t = max(0, min(HEX_SPAN, int(round(rate * HEX_SPAN))))
    if t >= HEX_SPAN:
        return "g"
    return format(t, "08x")


def temperature_thresholds(
    counts: dict[str, int],
    alpha: float = 0.5,
    target_frac: float = 0.5,
) -> list[tuple[str, str]]:
    """Temperature-based mixture rates (the multilingual ``size^alpha``
    sampling of mT5/XLM-R — public): boost low-resource sources, damp
    dominant ones. Deterministic driver-side contract (pure Python floats,
    summation in SORTED source order) so the oracle's independent Python
    recompute is bit-identical:

    - ``N = sum(counts)``, ``T = int(N * target_frac)``
    - ``z = sum((n_s/N) ** alpha  for s in sorted(sources))``
    - ``q_s = ((n_s/N) ** alpha) / z``  (the temperature share)
    - ``rate_s = min(1.0, (T * q_s) / n_s)``  -> mix_threshold_hex

    Returns [(source, threshold_hex)] in sorted source order, ready for
    ``weighted_mix``. ``counts`` is bounded by the source dimension (a
    grouped count, never per-doc driver data), so this scales like every
    other driver-side codebook in the repo."""
    srcs = sorted(counts)
    n_total = sum(counts[s] for s in srcs)
    z = sum((counts[s] / n_total) ** alpha for s in srcs)
    target = int(n_total * target_frac)
    out = []
    for s in srcs:
        q = ((counts[s] / n_total) ** alpha) / z
        rate = min(1.0, (target * q) / counts[s])
        out.append((s, mix_threshold_hex(rate)))
    return out


def weighted_mix(
    docs: DataFrame,
    rates: DataFrame,
    id_col: str = "doc_id",
    group_col: str = "source",
) -> DataFrame:
    """Deterministic per-source downsampling to the data-mixture rates.

    ``rates``: (source, threshold_hex) — build with mix_threshold_hex.
    A document survives iff the md5 hex prefix of 'mix|<id>' is strictly
    below its source's threshold (missing sources keep everything). The
    decision depends only on the document id, so re-runs, engines, and
    partitionings all agree; expected survivor share per source == rate.
    Map-side except the broadcast rates join.
    """
    prefix = F.substring(
        F.md5(F.concat(F.lit(MIX_SALT), F.col(id_col).cast("string"))), 1, 8
    )
    return (
        docs.join(F.broadcast(rates), group_col, "left")
        .withColumn("__p", prefix)
        .filter(
            F.col("threshold_hex").isNull() | (F.col("__p") < F.col("threshold_hex"))
        )
        .drop("threshold_hex", "__p")
    )


def epoch_shuffle(
    docs: DataFrame,
    epoch: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-epoch global shuffle: (id, pos) where ``pos`` is
    the document's 0-based position in the epoch's training order —
    ordering by ``md5('shuffle|<epoch>|<id>')`` (ties -> lowest id), so
    every epoch is a different, reproducible permutation and any engine
    or re-run derives the identical order (the data-defined-order rule
    the whole repo follows; rand() is none of that).

    Scale shape (100 TB): a global ``row_number`` window would serialize
    the corpus through ONE partition. Instead, the classic two-phase
    distributed ranking: the shard is the key's FIRST BYTE (256 uniform
    md5 shards), within-shard ranks come from a window PARTITIONED on the
    shard, and global positions add per-shard offsets from a 256-row
    grouped count cum-summed driver-side and inlined as a literal map.
    Because the shard is a prefix of the sort key, shard-major order IS
    global key order — bit-equal to the naive global window (test-pinned)
    at any partitioning."""
    key = F.md5(F.concat(F.lit(f"shuffle|{epoch}|"), F.col(id_col).cast("string")))
    d = docs.select(F.col(id_col), key.alias("__k")).withColumn(
        "__shard", F.conv(F.substring("__k", 1, 2), 16, 10).cast("int")
    )
    counts = {
        r["__shard"]: r["n"]
        for r in d.groupBy("__shard").agg(F.count("*").alias("n")).collect()
    }
    offsets, acc = [], 0
    for s in range(256):
        offsets.append(acc)
        acc += counts.get(s, 0)
    off_map = F.create_map(
        *[F.lit(v) for s in range(256) for v in (s, offsets[s])]
    )
    w = Window.partitionBy("__shard").orderBy("__k", id_col)
    return d.select(
        F.col(id_col),
        (
            off_map[F.col("__shard")].cast("long")
            + F.row_number().over(w)
            - 1
        ).alias("pos"),
    )


def split_thresholds(splits: list[tuple[str, float]]) -> list[tuple[str, str]]:
    """Cumulative md5-threshold boundaries for hash_split: each split
    owns the hex interval [prev_threshold, mix_threshold_hex(cum)).
    Fractions must sum to <= 1.0; any remainder falls into the LAST
    split (its threshold is forced to 'g' > every hex digit, so the
    partition is exhaustive)."""
    out, cum = [], 0.0
    for i, (name, frac) in enumerate(splits):
        cum += frac
        th = "g" if i == len(splits) - 1 else mix_threshold_hex(cum)
        out.append((name, th))
    return out


def hash_split(
    docs: DataFrame,
    splits: list[tuple[str, float]] | None = None,
    id_col: str = "doc_id",
    salt: str = "split|",
) -> DataFrame:
    """Deterministic disjoint-and-exhaustive train/val/test assignment:
    adds a ``split`` column chosen by where the md5 hex prefix of
    ``'<salt><id>'`` falls among the cumulative thresholds — a pure
    map-side string compare, so membership depends only on the id.
    Growing a prefix split's fraction keeps every id it already had
    (cumulative-interval monotonicity, test-pinned), which is what makes
    the split stable as the ratio is re-tuned mid-project."""
    splits = splits or [("train", 0.9), ("val", 0.05), ("test", 0.05)]
    prefix = F.substring(
        F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8
    )
    expr = None
    for name, th in split_thresholds(splits):
        cond = prefix < F.lit(th)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return docs.withColumn("split", expr)


def chunk_documents(
    docs: DataFrame,
    window: int = 64,
    stride: int = 48,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
) -> DataFrame:
    """Overlapping token-window chunking — the RAG / context-window prep
    step (fixed window ``W``, stride ``S < W`` so consecutive chunks
    overlap by ``W - S`` tokens). Output: one row per chunk —
    (group, id, chunk_idx, start, n_chunk_tokens, chunk_text).

    Chunk starts are 0, S, 2S, ...; a document emits
    ``1 + ceil((n - W) / S)`` chunks when ``n > W`` (integer arithmetic:
    ``(n - W + S - 1) div S + 1``), else exactly one (possibly short or
    empty) chunk — so the final chunk always reaches the last token and
    no token is dropped.

    Scale shape: pure map-side — tokens split, chunk indexes generated
    per row (sequence + explode), slices taken in place. ZERO shuffles;
    the explode fan-out is n/S chunks per doc, the same order as the
    token fan-out every gram operator pays. Everything is integer
    arithmetic + string slicing, so the DuckDB oracle repeats it
    exactly."""
    toks = tokens_col(F.col(text_col))
    d = docs.select(
        F.col(group_col), F.col(id_col), toks.alias("__t"), F.size(toks).alias("__n")
    )
    n_chunks = F.when(F.col("__n") <= window, F.lit(1)).otherwise(
        F.expr(f"((__n - {window} + {stride} - 1) div {stride}) + 1").cast("int")
    )
    start = (F.col("chunk_idx") * stride).cast("int")
    return (
        d.withColumn("chunk_idx", F.explode(F.sequence(F.lit(0), n_chunks - 1)))
        .select(
            group_col,
            id_col,
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            start.alias("start"),
            F.greatest(
                F.least(F.lit(window), F.col("__n") - start), F.lit(0)
            ).alias("n_chunk_tokens"),
            F.array_join(F.slice("__t", start + 1, window), " ").alias("chunk_text"),
        )
    )


CDC_WINDOW = 8
CDC_BASE = 31
CDC_MOD = 1_048_573  # prime < 2^20: the mod mixes all hash bits
CDC_THRESHOLD = 16_383  # ~ MOD/64 -> ~1/64 boundary rate -> ~64-char chunks


def cdc_chunks(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    window: int = CDC_WINDOW,
    base: int = CDC_BASE,
    mod: int = CDC_MOD,
    threshold: int = CDC_THRESHOLD,
) -> DataFrame:
    """CONTENT-DEFINED chunking (Rabin/LBFS rolling-hash boundaries) —
    the dedup-friendly complement to fixed-window chunk_documents: an
    insertion near the top of a page shifts every fixed-window chunk, but
    content-defined boundaries RESYNC, so the unchanged tail chunks keep
    identical hashes and an exact md5-groupBy dedup still collapses them
    (rsync / LBFS / FastCDC's core idea, re-expressed for corpus dedup).

    Contract (integer-exact, repeated verbatim by the DuckDB oracle):
    a boundary falls AFTER 1-based char position ``i`` (window <= i < n)
    iff ``(sum_{j=0..window-1} code(char[i-j]) * base^j) mod mod <
    threshold`` — a polynomial hash of the trailing ``window`` chars
    against a prime modulus (max term sum ~8 * 0x10FFFF * 31^7 << 2^63,
    exact int64). Chunks are the slices between consecutive boundaries;
    a doc shorter than ``window`` is one chunk. No min/max chunk bounds:
    bounds would make each boundary depend on the previous one
    (sequential state); the stateless form keeps every position's
    decision independent — shift-resistant AND embarrassingly parallel.

    Output: (group, id, chunk_no, start, chunk_len, chunk_md5,
    chunk_text). Pure map-side — codes/boundaries/slices are per-row
    array expressions, ZERO shuffles; the downstream dedup is one
    uniform md5 groupBy.
    """
    from .util import fan_out

    # guide §2.5 input skew: the per-char polynomial hash is the heaviest
    # map-side expression in the repo — spread it when the scan arrives
    # narrower than the session parallelism (no-op at 100 TB)
    docs = fan_out(docs)
    powers = [pow(base, j, mod) for j in range(window)]
    n = F.length(F.col(text_col))
    codes = F.transform(
        F.when(n > 0, F.sequence(F.lit(1), n)).otherwise(F.array().cast("array<int>")),
        lambda i: F.ascii(F.substr(F.col(text_col), i, F.lit(1))).cast("long"),
    )
    d = docs.select(
        F.col(group_col), F.col(id_col), F.col(text_col).alias("__txt"),
        n.alias("__n"), codes.alias("__c"),
    )

    def is_boundary(i):
        h = F.lit(0).cast("long")
        for j, p in enumerate(powers):
            h = h + F.element_at(F.col("__c"), i - F.lit(j)) * F.lit(p)
        return (h % F.lit(mod)) < F.lit(threshold)

    bpos = F.filter(
        F.when(
            F.col("__n") - 1 >= window,
            F.sequence(F.lit(window), F.col("__n") - 1),
        ).otherwise(F.array().cast("array<int>")),
        is_boundary,
    )
    d = d.withColumn(
        "__starts", F.concat(F.array(F.lit(0)), bpos)
    ).withColumn("__ends", F.concat(bpos, F.array(F.col("__n"))))
    k = F.explode(F.sequence(F.lit(0), F.size("__starts") - 1)).alias("chunk_no")
    start = F.element_at("__starts", F.col("chunk_no") + 1)
    end = F.element_at("__ends", F.col("chunk_no") + 1)
    chunk = F.substr("__txt", start + F.lit(1), end - start)
    return d.select(group_col, id_col, k, "__txt", "__starts", "__ends").select(
        group_col,
        id_col,
        F.col("chunk_no").cast("int").alias("chunk_no"),
        start.cast("int").alias("start"),
        (end - start).cast("int").alias("chunk_len"),
        F.md5(chunk).alias("chunk_md5"),
        chunk.alias("chunk_text"),
    )


TFIDF_BUCKETS = 1024
TFIDF_SCALE = 1000


def tfidf_idf_table(
    bucket_df: list[tuple[int, int]], n_docs: int, scale: int = TFIDF_SCALE
) -> list[tuple[int, int]]:
    """(bucket, idf_scaled) rows from (bucket, df) rows — the scaled-integer
    idf contract (the functions/lm.py pattern: the transcendental runs ONCE
    per bucket on the driver over a BOUNDED table, never near the data):

        idf_scaled = round((ln((N + 1) / (df + 1)) + 1) * scale)

    (smooth idf, Python banker's round — the oracle recompute
    oracle/expected.py:tfidf_idf_independent re-derives the same table from
    the raw texts without touching this code)."""
    import math

    return [
        (int(b), int(round((math.log((n_docs + 1) / (df + 1)) + 1.0) * scale)))
        for b, df in sorted(bucket_df)
    ]


def tfidf_bucket_col(token: Column, n_buckets: int = TFIDF_BUCKETS) -> Column:
    """Hashing-trick bucket for a token: first 4 md5 hex chars as an int,
    mod ``n_buckets`` — the MLlib HashingTF idea with an md5 hash both
    engines share bit-for-bit (DuckDB: CAST(('0x' || substr(md5(t),1,4))
    AS INT) % n)."""
    return (
        F.conv(F.substring(F.md5(token), 1, 4), 16, 10).cast("int") % n_buckets
    )


def tfidf_keywords(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = TFIDF_BUCKETS,
    top_k: int = 3,
    scale: int = TFIDF_SCALE,
) -> DataFrame:
    """Hashing-trick tf-idf keyword extraction: the top-``top_k`` tokens
    per document by ``tf * idf_scaled``, where idf is pooled per hash
    BUCKET (``n_buckets`` bounded), not per raw term. Output:
    (id, token, tf, score, rn), rn in [1, top_k], ordered by
    (score DESC, token ASC) within a document.

    Why buckets: a per-term idf table is vocabulary-sized (10^9+ terms at
    100 TB) — joining it back to the (doc, token) side is a vocab-scale
    shuffle join. The hashing trick (MLlib HashingTF; Weinberger et al.
    2009) pools document frequency per bucket instead: the idf table is
    ≤ ``n_buckets`` rows, small enough to compute driver-side (the
    quality_model weights-as-literal pattern) and ride the plan as a
    broadcast join. Colliding terms share an idf estimate — the standard,
    documented trade; raise ``n_buckets`` to taste (bounded by 65536 with
    the 4-hex-char hash).

    Scale shape (100 TB): one explode (the same fan-out every gram
    operator pays), one uniform-key (doc, token) groupBy for tf, one
    uniform-key bucket agg for df (≤ n_buckets result rows, collected —
    a bounded driver-side read), one BROADCAST join of the idf literal,
    one window partitioned by doc id for top-k. No vocab-sized shuffle,
    no skewed keys (md5 buckets are uniform by construction).

    Reference analogue: none (the reference stores raw text,
    src/crawler.py:172-244); north-rule training-data extension."""
    # no fan_out here: the token explode carries no per-row hashing heavy
    # enough to pay for the repartition (measured 1.8s plain vs 2.2s
    # fanned at sf0.1)
    toks = docs.select(
        F.col(id_col), F.explode(tokens_col(F.col(text_col))).alias("token")
    )
    tf = toks.groupBy(id_col, "token").agg(F.count("*").alias("tf"))
    n_docs = docs.count()
    bucket_df = [
        (r["bucket"], r["df"])
        for r in (
            toks.select(
                F.col(id_col),
                tfidf_bucket_col(F.col("token"), n_buckets).alias("bucket"),
            )
            .distinct()
            .groupBy("bucket")
            .agg(F.count("*").alias("df"))
            .collect()
        )
    ]
    spark = docs.sparkSession
    idf = spark.createDataFrame(
        tfidf_idf_table(bucket_df, n_docs, scale),
        "bucket int, idf_scaled bigint",
    )
    scored = (
        tf.withColumn("bucket", tfidf_bucket_col(F.col("token"), n_buckets))
        .join(F.broadcast(idf), "bucket")
        .withColumn("score", (F.col("tf") * F.col("idf_scaled")).cast("bigint"))
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("token"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= top_k)
        .select(
            F.col(id_col),
            "token",
            F.col("tf").cast("bigint").alias("tf"),
            "score",
            F.col("rn").cast("int").alias("rn"),
        )
    )


DSIR_BUCKETS = 1024
DSIR_SCALE = 1000
DSIR_SALT = "dsir|"
DSIR_BIN = 4096  # coarse score-bin width for the two-phase threshold


def unigram_bigram_col(text: Column) -> Column:
    """Unigrams + bigrams WITH multiplicity over whitespace tokens — the
    hashed-ngram feature set of DSIR (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"; their feature space
    is hashed uni+bigram counts). Pure Catalyst array expression."""
    toks = tokens_col(text)
    cnt = F.size(toks)
    idx = F.when(cnt >= 2, F.sequence(F.lit(0), cnt - 2)).otherwise(
        F.array().cast("array<int>")
    )
    bigrams = F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, 2), " "))
    return F.concat(toks, bigrams)


def dsir_lr_table(
    target_counts: dict[int, int],
    raw_counts: dict[int, int],
    n_buckets: int = DSIR_BUCKETS,
    scale: int = DSIR_SCALE,
) -> list[tuple[int, int]]:
    """(bucket, lr_scaled) rows — the scaled-integer log-likelihood-ratio
    contract (the lm.py/tfidf pattern: transcendentals run ONCE per bucket
    on the driver over a table bounded by ``n_buckets``, never near the
    data). Add-one smoothing on both bag-of-hashed-ngrams models:

        lr_scaled(b) = round((ln((ct_b + 1) / (Ct + B))
                             - ln((cr_b + 1) / (Cr + B))) * scale)

    where ct/cr are target/raw gram-occurrence counts for bucket ``b``,
    Ct/Cr their totals, B = n_buckets. Only buckets PRESENT in the raw
    corpus get a row — every gram being scored is in the raw corpus by
    definition, so the table is complete for scoring. The oracle
    re-derives this table independently
    (oracle/expected.py:dsir_selected_independent)."""
    import math

    c_t = sum(target_counts.values())
    c_r = sum(raw_counts.values())
    return [
        (
            int(b),
            int(
                round(
                    (
                        math.log((target_counts.get(b, 0) + 1) / (c_t + n_buckets))
                        - math.log((raw_counts[b] + 1) / (c_r + n_buckets))
                    )
                    * scale
                )
            ),
        )
        for b in sorted(raw_counts)
    ]


def dsir_scores(
    docs: DataFrame,
    target: DataFrame | None,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = DSIR_BUCKETS,
    scale: int = DSIR_SCALE,
    target_filter: Column | None = None,
) -> DataFrame:
    """``docs`` + an integer ``dsir_score`` column: the DSIR importance
    weight log(p_target(x)/p_raw(x)) under hashed uni+bigram bag models,
    as a SUM of per-gram scaled-integer log-ratios — integer addition is
    order-free, so any partitioning/engine agrees exactly.

    Scale shape (100 TB): two bounded driver-side bucket aggregates
    (``<= n_buckets`` rows each — the tfidf/lm bounded-collect pattern;
    the target set is a sample, the raw side one grouped agg over the
    corpus), then MAP-SIDE scoring: the ``n_buckets``-entry lr table
    rides the plan as ONE array literal indexed by bucket (the
    ivf_assign literal-codebook pattern — r7), and each document's score
    is an ``F.aggregate`` over its own gram array. No explode fan-out,
    no join, no groupBy(id) shuffle, no join back — zero Exchanges for
    the scoring pass at any corpus size. Grams whose bucket never occurs
    in the raw corpus contribute 0, exactly like the old inner join;
    gram-less docs sum an empty array to 0, exactly like the old
    left-join coalesce.

    ``target_filter`` (r7): when the target set is a predicate over
    ``docs`` itself (the common in-corpus case), pass the predicate
    instead of a ``target`` frame — BOTH bucket tables then come from ONE
    conditional aggregation over a single gram pass (count(*) for raw,
    sum(flag) for target), halving the count-side work with identical
    counts."""

    from .util import fan_out

    # guide §2.5 input skew: both the bucket-count aggregation and the
    # map-side scoring pass hash every uni+bigram of every doc — spread
    # the compute when the scan arrives narrower than the session
    # parallelism (no-op at 100 TB)
    docs = fan_out(docs)
    if target is not None:
        target = fan_out(target)

    def _bucket_counts(df: DataFrame) -> dict[int, int]:
        return {
            r["bucket"]: r["n"]
            for r in (
                df.select(
                    F.explode(unigram_bigram_col(F.col(text_col))).alias("g")
                )
                .select(tfidf_bucket_col(F.col("g"), n_buckets).alias("bucket"))
                .groupBy("bucket")
                .agg(F.count("*").alias("n"))
                .collect()
            )
        }

    if target_filter is not None:
        rows = (
            docs.select(
                F.explode(unigram_bigram_col(F.col(text_col))).alias("g"),
                F.when(target_filter, F.lit(1)).otherwise(F.lit(0)).alias("__t"),
            )
            .select(tfidf_bucket_col(F.col("g"), n_buckets).alias("bucket"), "__t")
            .groupBy("bucket")
            .agg(F.count("*").alias("n"), F.sum("__t").alias("nt"))
            .collect()
        )
        raw_c = {r["bucket"]: r["n"] for r in rows}
        tgt_c = {r["bucket"]: int(r["nt"]) for r in rows if r["nt"]}
    else:
        raw_c = _bucket_counts(docs)
        tgt_c = _bucket_counts(target)
    lr_map = dict(dsir_lr_table(tgt_c, raw_c, n_buckets, scale))
    lr_arr = F.lit([int(lr_map.get(b, 0)) for b in range(n_buckets)])
    score = F.aggregate(
        F.transform(
            unigram_bigram_col(F.col(text_col)),
            lambda g: F.element_at(lr_arr, tfidf_bucket_col(g, n_buckets) + 1),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    return docs.withColumn("dsir_score", score.cast("long"))


def dsir_threshold(
    scored: DataFrame,
    target_n: int,
    score_col: str = "dsir_score",
    bin_width: int = DSIR_BIN,
) -> tuple[int, str]:
    """Exact top-``target_n`` threshold ``(T, tie_threshold_hex)`` from
    two BOUNDED driver-side reads — never a global window (which would
    serialize 10^10 rows through one partition):

    1. coarse histogram: groupBy ``score // bin_width`` (floored
       division; bounded by score_range / bin_width rows) -> descending
       cumulative count finds the boundary bin b*;
    2. exact histogram WITHIN b* only: groupBy exact score (``<=
       bin_width`` distinct values by construction) -> descending
       cumulative count finds the exact threshold score T, the number of
       docs strictly above it, and the tie population at T.

    Ties at T are admitted by deterministic hash: a tie survives iff the
    md5 hex prefix of 'dsir|<id>' is below ``mix_threshold_hex(need /
    tie_count)`` — the weighted_mix decision rule, so the selected count
    is target_n +- the hash-binomial deviation on the single boundary
    score (exact above T). DSIR is itself a sampler; a deterministic,
    engine-reproducible boundary beats an exact-count global sort."""
    binned = F.floor(F.col(score_col) / F.lit(float(bin_width))).cast("long")
    bins = {
        r["b"]: r["n"]
        for r in scored.groupBy(binned.alias("b"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    cum = 0
    b_star = None
    for b in sorted(bins, reverse=True):
        if cum + bins[b] >= target_n:
            b_star = b
            break
        cum += bins[b]
    assert b_star is not None, "target_n exceeds the corpus size"
    exact = {
        r[score_col]: r["n"]
        for r in scored.filter(binned == b_star)
        .groupBy(score_col)
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for s in sorted(exact, reverse=True):
        if cum + exact[s] >= target_n:
            return int(s), mix_threshold_hex((target_n - cum) / exact[s])
        cum += exact[s]
    raise AssertionError("unreachable: cumulative counts cover target_n")


def dsir_select(
    docs: DataFrame,
    target: DataFrame | None,
    keep_frac: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = DSIR_BUCKETS,
    scale: int = DSIR_SCALE,
    bin_width: int = DSIR_BIN,
    target_filter: Column | None = None,
    n: int | None = None,
) -> DataFrame:
    """DSIR data selection (Xie et al. 2023) in its deterministic top-k
    form: keep the ``int(round(keep_frac * n))`` documents whose hashed
    uni+bigram importance weight log(p_target/p_raw) is highest. Returns
    the selected docs with their ``dsir_score``. Selection = a pure
    map-side filter against the driver-computed ``(T, tie_hex)``
    boundary (dsir_threshold), so the final pass is shuffle-free and the
    decision depends only on the document id + score — engines, re-runs
    and partitionings agree exactly.

    Reference analogue: none (the reference crawls configured job boards,
    src/crawler.py:172-244); north-rule training-data extension.

    ``n`` (r7): callers that already hold the corpus row count (e.g. from
    a per-source counts aggregate) pass it in, saving the one full pass
    a bare count() costs at scale."""
    if n is None:
        n = docs.count()
    target_n = int(round(keep_frac * n))
    scored = dsir_scores(
        docs, target, text_col, id_col, n_buckets, scale,
        target_filter=target_filter,
    )
    if target_n <= 0:
        return scored.filter(F.lit(False))
    if target_n >= n:
        return scored
    # persist across the threshold's two bounded reads + the caller's final
    # pass: the map-side scoring pass runs ONCE instead of three times
    # (an in-query intermediate computed from the inputs, not a cross-run
    # cache; O(docs) rows, spills to disk at scale)
    scored = scored.persist()
    t, tie_hex = dsir_threshold(scored, target_n, bin_width=bin_width)
    prefix = F.substring(
        F.md5(F.concat(F.lit(DSIR_SALT), F.col(id_col).cast("string"))), 1, 8
    )
    return scored.filter(
        (F.col("dsir_score") > t)
        | ((F.col("dsir_score") == t) & (prefix < F.lit(tie_hex)))
    )


def domain_share(
    docs: DataFrame,
    flag: Column,
    group_col: str = "source",
    scale: int = 10000,
) -> DataFrame:
    """Domain-level statistic: per ``group_col``, the share of rows
    satisfying ``flag``, as a scaled INTEGER ``share_e4 = (n_flag *
    scale) div n`` (exact integral division — no float summation or
    division crosses engines). The RefinedWeb/CCNet domain-filtering
    primitive: a document's fate can depend on its whole domain's
    statistics (language share, quality share, spam share), computed
    over the RAW crawl before any per-doc filter.

    Scale shape (100 TB): ONE groupBy keyed on the domain dimension
    (uniform by construction for md5-ish hosts; a pathological megahost
    is one counter, not a fan-out) producing a dimension-sized table —
    broadcastable back onto the corpus. Counts are order-free integer
    sums."""
    counted = (
        docs.withColumn("__flag", flag)
        .groupBy(group_col)
        .agg(
            F.sum(F.when(F.col("__flag"), 1).otherwise(0)).alias("__n_flag"),
            F.count("*").alias("__n"),
        )
    )
    return counted.select(
        group_col,
        F.expr(f"CAST((__n_flag * {int(scale)}) div __n AS BIGINT)").alias(
            "share_e4"
        ),
    )
