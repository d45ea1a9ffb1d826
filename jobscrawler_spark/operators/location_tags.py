"""Location tagging: explode -> broadcast lookup -> bigram fallback -> regroup.

Re-expresses the reference's enrichment pipeline (reference:
src/crawler.py:110-167 ``add_location_tags_to_df`` + 45-107
``get_location_tags``) as DataFrame transformations:

- pre-tokenize (F9): remove ``, ( )``, ``|``->space, split on whitespace,
  posexplode
- unigram lookup (J2): broadcast hash join of UPPER(token) against the
  flattened alias dim — replaces the reference's nested-loop scan over the
  whole WorldLocations hierarchy per token
- bigram fallback (J3): ``lead(token)`` window + second broadcast join on
  the two-token compound; on hit BOTH tokens get the tag (reference:
  src/crawler.py:88-101 ``result.extend([tag, tag])``)
- regroup (A1): ``collect_list`` sorted by position; tag list is
  order-of-first-appearance distinct INCLUDING the literal 'NaN' for
  unmatched tokens — matching the reference's fillna('NaN') +
  Series.unique() round-trip (src/crawler.py:142-154) without the
  numpy-repr/regex detour (quirk 6).

Known divergence from the reference (documented, exercised in tests):
the reference consumes bigram tokens sequentially (i += 2), so in a chain
A B C where both "A B" and "B C" match, it tags only "A B" (and C gets an
independent lookup). This engine evaluates bigrams via a window, so B and
C could both receive compound tags. Real location strings don't contain
overlapping compounds; the parity tests pin equality on non-overlapping
fixtures. Within a NON-overlapping compound the engine matches the
reference exactly, including the trailing-token rule: a token that
completes a matched compound takes the compound tag even when it has its
own unigram tag (tag_bwd outranks tag1 in the coalesce below).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tokenize_locations(df: DataFrame, id_col: str) -> DataFrame:
    """(id, location) -> (id, pos, token) via the reference's pre-clean
    (F9: strip ',()' chars, '|'->' ', split on whitespace)."""
    cleaned = F.regexp_replace(
        F.regexp_replace(F.col("location").cast("string"), r"[,()]", ""), r"\|", " "
    )
    tokens = F.split(F.trim(cleaned), r"\s+")
    return df.select(
        F.col(id_col), F.posexplode(tokens).alias("pos", "token")
    ).filter(F.col("token") != "")


def add_location_tags(df: DataFrame, dim: DataFrame, id_col: str) -> DataFrame:
    """Add ``location_tags: array<string>`` and the re-joined ``location``.

    ``dim`` is the flattened world-locations dim (alias, tag, kind) —
    broadcast (a few thousand rows at most). ``df`` must carry a unique
    ``id_col`` (the reference uses the pandas index, src/crawler.py:128).
    """
    toks = tokenize_locations(df, id_col)
    d = F.broadcast(dim.select(F.col("alias"), F.col("tag")))

    # unigram join
    uni = toks.join(d, F.upper(toks["token"]) == d["alias"], "left").select(
        id_col, "pos", "token", F.col("tag").alias("tag1")
    )

    # bigram fallback: only pairs where the LEFT token is untagged
    w = Window.partitionBy(id_col).orderBy("pos")
    uni = uni.withColumn("next_token", F.lead("token").over(w)).withColumn(
        "prev_untagged_compound",
        F.when(
            F.lag("tag1").over(w).isNull() & F.lag("token").over(w).isNotNull(),
            F.concat_ws(" ", F.lag("token").over(w), F.col("token")),
        ),
    )
    compound = F.when(
        F.col("tag1").isNull() & F.col("next_token").isNotNull(),
        F.concat_ws(" ", F.col("token"), F.col("next_token")),
    )
    uni = uni.withColumn("compound", compound)

    d2 = dim.select(F.col("alias").alias("alias2"), F.col("tag").alias("tag_fwd"))
    d3 = dim.select(F.col("alias").alias("alias3"), F.col("tag").alias("tag_bwd"))
    joined = (
        uni.join(F.broadcast(d2), F.upper(F.col("compound")) == F.col("alias2"), "left")
        .join(
            F.broadcast(d3),
            F.upper(F.col("prev_untagged_compound")) == F.col("alias3"),
            "left",
        )
        # tag_bwd outranks tag1: the reference consumes the trailing token of
        # a matched compound (i += 2, src/crawler.py:88-101), so that token
        # gets the compound tag even when it has its own unigram tag
        .withColumn("tag", F.coalesce("tag_bwd", "tag1", "tag_fwd", F.lit("NaN")))
    )

    grouped = joined.groupBy(id_col).agg(
        F.regexp_replace(  # F12: bracket/apostrophe cleanup after rejoin
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "token"))), lambda s: s["token"]
                ),
                " ",
            ),
            r"[\[\]']",
            "",
        ).alias("location"),
        F.array_distinct(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tag"))), lambda s: s["tag"]
            )
        ).alias("location_tags"),
    )

    return df.drop("location").join(grouped, id_col, "left")
