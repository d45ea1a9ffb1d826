"""BPE tokenizer: deterministic training, correct greedy encode, and the
distributed (mapInPandas) path matching the local encoder exactly."""

import pandas as pd

from jobscrawler_spark.functions.bpe import (
    EOW,
    encode,
    encode_docs,
    train_bpe,
    train_bpe_on_docs,
)


def test_train_merges_by_frequency_then_lexicographic():
    # 'ab' occurs 4x within words; ('a','b') must be the first merge.
    merges = train_bpe(["abx aby", "abz abw"], n_merges=1)
    assert merges == [("a", "b")]
    # tie-break: 'xy' and 'ab' both twice -> lexicographically smaller first
    merges = train_bpe(["abq xyr", "abs xyt"], n_merges=1)
    assert merges == [("a", "b")]


def test_training_is_deterministic_and_order_invariant():
    texts = [f"token{i % 7} shared shared prefix{i % 3}" for i in range(50)]
    a = train_bpe(texts, n_merges=64)
    b = train_bpe(list(reversed(texts)), n_merges=64)
    assert a == b
    assert len(a) > 0


def test_encode_reconstructs_characters():
    texts = ["the crawler fetched the page", "the fetcher crawled"]
    merges = train_bpe(texts, n_merges=32)
    for t in texts + ["unseen words entirely"]:
        toks = encode(t, merges)
        flat = "".join(toks).replace(EOW, " ").strip()
        assert flat == " ".join(t.split())
        # every word ends at an EOW boundary
        assert toks[-1].endswith(EOW)


def test_encode_applies_lowest_rank_first():
    # merges learned: ('a','b') then ('ab','c') — 'abc' becomes one symbol
    merges = [("a", "b"), ("ab", "c"), ("c", EOW)]
    assert encode("abc", merges) == ["abc" + EOW] or encode("abc", merges) == [
        "abc",
        EOW,
    ]
    # a word with no applicable merges stays at character level
    toks = encode("xyz", merges)
    assert toks == ["x", "y", "z", EOW]


def test_merged_tokens_never_exceed_char_count():
    texts = ["aa aa aa bb", "aa bb cc"]
    merges = train_bpe(texts, n_merges=16)
    for t in texts:
        n_chars = len(t.replace(" ", "")) + len(t.split())  # + EOW markers
        assert len(encode(t, merges)) <= n_chars


def test_distributed_encode_matches_local(spark):
    rows = [(i, f"doc {i % 5} shares shared tokens token{i % 4}") for i in range(200)]
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    merges = train_bpe_on_docs(docs, n_merges=64, sample_n=100)
    # training twice on the same sample is identical
    assert merges == train_bpe_on_docs(docs, n_merges=64, sample_n=100)

    out = {r["doc_id"]: list(r["bpe_tokens"]) for r in encode_docs(docs, merges).collect()}
    for i, t in rows:
        assert out[i] == encode(t, merges), i
    counts = {
        r["doc_id"]: r["n_bpe_tokens"] for r in encode_docs(docs, merges).collect()
    }
    for i, t in rows:
        assert counts[i] == len(encode(t, merges))


def test_distributed_encode_preserves_id_type(spark):
    """The output id column keeps the INPUT type (review r4: it was
    hardcoded long, breaking string ids like image_id)."""
    docs = spark.createDataFrame(
        [("img-a", "shared words here"), ("img-b", "shared words there")],
        "image_id string, text string",
    )
    merges = train_bpe(["shared words"], n_merges=8)
    out = encode_docs(docs, merges, id_col="image_id")
    assert dict(out.dtypes)["image_id"] == "string"
    got = {r["image_id"]: list(r["bpe_tokens"]) for r in out.collect()}
    assert got["img-a"] == encode("shared words here", merges)


def test_sf_corpus_compression(spark):
    """On the real fixture corpus the learned BPE must actually compress:
    fewer tokens than characters, more than whitespace words."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    merges = train_bpe_on_docs(docs, n_merges=128, sample_n=200)
    enc = encode_docs(docs.limit(50), merges).collect()
    pdf = docs.limit(50).toPandas().set_index("doc_id")
    for r in enc:
        text = pdf.loc[r["doc_id"], "text"]
        n_words = len(text.split())
        n_chars = len(text)
        assert n_words <= r["n_bpe_tokens"] <= n_chars + n_words


def test_bpe_backed_truncate_matches_local(spark):
    """truncate_docs (mapInPandas) == truncate_text (local) row for row,
    and the truncated text's encode is exactly the first max_tokens
    tokens of the full encode."""
    from jobscrawler_spark.functions.bpe import truncate_docs, truncate_text

    rows = [(i, f"shared shared token{i % 4} tail words here {i}") for i in range(60)]
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    merges = train_bpe_on_docs(docs, n_merges=32, sample_n=60)
    got = {
        r["doc_id"]: r["text"] for r in truncate_docs(docs, merges, max_tokens=5).collect()
    }
    for i, t in rows:
        local = truncate_text(t, merges, 5)
        assert got[i] == local, i
        assert encode(local, merges) == encode(t, merges)[:5] or len(
            encode(t, merges)
        ) <= 5


def test_pack_sequences_bpe_backend_matches_python(spark):
    """pack_sequences(token_counter='bpe') end-to-end: bin assignment
    equals a plain-Python cumsum over local-encoder counts in
    (source, doc_id) order — the BPE counter is load-bearing, not a
    sidecar (r4 verdict task 3)."""
    from jobscrawler_spark.operators.corpus import pack_sequences

    rows = [
        (i, f"s{i % 3}", f"doc {i % 5} shares shared tokens token{i % 4} pad {i % 7}")
        for i in range(120)
    ]
    docs = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "source", "text"])
    )
    merges = train_bpe_on_docs(docs, n_merges=48, sample_n=120)
    got = {
        (r["source"], r["doc_id"]): (r["n_tokens"], r["bin_id"], r["bin_offset"])
        for r in pack_sequences(
            docs, budget=16, token_counter="bpe", bpe_merges=merges
        ).collect()
    }
    assert len(got) == len(rows)
    pre: dict[str, int] = {}
    for i, src, text in sorted(rows, key=lambda r: (r[1], r[0])):
        n = len(encode(text, merges))
        p = pre.get(src, 0)
        assert got[(src, i)] == (n, p // 16, p % 16), (src, i)
        pre[src] = p + n


# --- property tests (hypothesis) -------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_texts = st.lists(
    st.text(alphabet="abcdef ", min_size=0, max_size=40), min_size=1, max_size=8
)


@settings(max_examples=50, deadline=None)
@given(_texts)
def test_prop_encode_reconstructs_any_corpus(texts):
    merges = train_bpe(texts, n_merges=24)
    for t in texts:
        toks = encode(t, merges)
        assert "".join(toks).replace(EOW, " ").strip() == " ".join(t.split())


@settings(max_examples=30, deadline=None)
@given(_texts)
def test_prop_training_order_invariant(texts):
    assert train_bpe(texts, n_merges=24) == train_bpe(
        list(reversed(texts)), n_merges=24
    )


def test_compression_ratio_separates_text_from_gibberish(spark):
    """cpt_e2 (chars per BPE token, x100 integral division — the
    text_bpe gate's r6 quality signal): corpus-like text compresses
    under a BPE trained on it, character gibberish does not."""
    from jobscrawler_spark.functions.bpe import encode, train_bpe

    words = ["stream", "frontier", "crawl", "budget"]
    natural = " ".join(words * 6)
    gibberish = "zq xv jk wq pz vx qj kz"  # no shared pairs to merge
    merges = train_bpe([natural], n_merges=32)

    def cpt(text):
        n_tok = len(encode(text, merges))
        return (len(text) * 100) // n_tok

    assert cpt(natural) > cpt(gibberish)
    # exact arithmetic: integral division, not rounding
    n = len(encode(gibberish, merges))
    assert cpt(gibberish) == (len(gibberish) * 100) // n
