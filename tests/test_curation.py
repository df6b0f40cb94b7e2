"""Crafted-input semantics for the curation operators (q63-q66).

The oracle gate proves engine == DuckDB on the synthetic corpus; these
tests pin the SEMANTICS on inputs built to hit the edges the corpus
doesn't: multi-hit scrubbing, exact repetition ratios, chunk-boundary
straddling, containment asymmetry, and sub-k documents.
"""

from pyspark.sql import functions as F

from osmcha_spark.operators.curation import (
    decontaminate,
    pack_chunks,
    repetition_stats,
    scrub_pii,
)


def test_scrub_pii_replaces_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a@b.org and c.d+e@f.co.uk now"),
            (2, "go to https://x.y/p?id=3&q=_z-w then http://a.b/c"),
            (3, "call +1-202-555-0142 or +44-20-7946-0958"),
            (4, "clean text, nothing to scrub"),
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in scrub_pii(df).collect()}
    assert rows[1]["n_emails"] == 2 and rows[1]["scrubbed"] == (
        "mail <EMAIL> and <EMAIL> now"
    )
    assert rows[2]["n_urls"] == 2 and rows[2]["scrubbed"] == (
        "go to <URL> then <URL>"
    )
    assert rows[3]["n_phones"] == 2 and rows[3]["scrubbed"] == (
        "call <PHONE> or <PHONE>"
    )
    assert rows[4]["scrubbed"] == "clean text, nothing to scrub"
    assert (
        rows[4]["n_emails"] == rows[4]["n_urls"] == rows[4]["n_phones"] == 0
    )


def test_repetition_exact_ratio(spark):
    df = spark.createDataFrame(
        [
            (1, "a b a b a b"),  # "a b" x3 of 5 bigrams, 6 tokens
            (2, "solo"),  # no bigrams
            (3, "w x y z"),  # all bigrams unique
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert rows[1]["n_tokens"] == 6 and rows[1]["top_bigram_n"] == 3
    assert rows[1]["rep2_permille"] == 3 * 2000 // 6  # == 1000
    assert rows[2] ["top_bigram_n"] == 0 and rows[2]["rep2_permille"] == 0
    assert rows[3]["top_bigram_n"] == 1
    assert rows[3]["rep2_permille"] == 2000 // 4


def test_pack_chunks_offsets_and_straddle(spark):
    # 1 shard => one global stream; budget 10; doc token counts 4,4,4
    # in hash order => starts 0,4,8; the third doc straddles chunk 0->1.
    df = spark.createDataFrame(
        [(i, "t t t t") for i in range(3)], ["doc_id", "text"]
    )
    out = pack_chunks(df, budget=10, n_shards=1).orderBy("token_start")
    rows = out.collect()
    assert [r["token_start"] for r in rows] == [0, 4, 8]
    assert [r["n_tokens"] for r in rows] == [4, 4, 4]
    assert [(r["first_chunk"], r["last_chunk"]) for r in rows] == [
        (0, 0),
        (0, 0),
        (0, 1),  # tokens 8..11 straddle the budget-10 boundary
    ]


def test_pack_chunks_layout_is_partitioning_invariant(spark):
    df = spark.createDataFrame(
        [(i, " ".join(["w"] * (1 + i % 7))) for i in range(200)],
        ["doc_id", "text"],
    )
    a = pack_chunks(df, budget=32, n_shards=4).orderBy("doc_id").collect()
    b = (
        pack_chunks(df.repartition(13), budget=32, n_shards=4)
        .orderBy("doc_id")
        .collect()
    )
    assert a == b
    # per shard, offsets tile the stream with no gaps or overlaps
    by_shard = {}
    for r in a:
        by_shard.setdefault(r["shard"], []).append(r)
    for rows in by_shard.values():
        rows.sort(key=lambda r: r["token_start"])
        pos = 0
        for r in rows:
            assert r["token_start"] == pos
            pos += r["n_tokens"]


def test_decontaminate_is_containment_not_jaccard(spark):
    eval_text = "e1 e2 e3 e4 e5 e6 e7 e8 e9 e10"  # 10 tokens, 3 8-grams
    filler = " ".join(f"f{i}" for i in range(100))
    train = spark.createDataFrame(
        [
            (1, filler + " " + eval_text),  # contains eval verbatim
            (2, filler),  # disjoint
        ],
        ["doc_id", "text"],
    )
    ev = spark.createDataFrame([(7, eval_text)], ["doc_id", "text"])
    got = {
        (r["train_id"], r["eval_id"]): r["n_shared"]
        for r in decontaminate(train, ev, k=8, min_shared=3).collect()
    }
    # full containment scores ALL 3 eval shingles despite the Jaccard
    # ratio being 3/103-ish; the disjoint doc never appears
    assert got == {(1, 7): 3}


def test_decontaminate_sub_k_docs_emit_nothing(spark):
    train = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    ev = spark.createDataFrame([(2, "a b c")], ["doc_id", "text"])
    assert decontaminate(train, ev, k=8, min_shared=1).count() == 0


def test_remove_boilerplate_lines_planted(spark):
    """remove_boilerplate_lines (q136): a line verbatim in >= min_df
    DISTINCT docs vanishes from every doc (no keeper); unique lines and
    EMPTY lines survive; an all-boilerplate doc cleans to ''; repeats
    within one doc don't count toward df."""
    from osmcha_spark.operators.curation import remove_boilerplate_lines

    banner = "accept cookies to continue"
    rows = [
        (1, f"{banner}\nunique alpha one\nfooter text"),
        (2, f"{banner}\nunique beta two\nfooter text"),
        (3, f"{banner}\nunique gamma three"),
        (4, "all original content\n\nwith an empty line kept"),
        (5, banner),
        (6, "self repeat\nself repeat\nunique zeta"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in
           remove_boilerplate_lines(docs, min_df=2).collect()}
    assert got[1].text == "unique alpha one"          # banner+footer gone
    assert got[1].n_lines == 3 and got[1].n_removed == 2
    assert got[2].text == "unique beta two"
    assert got[3].text == "unique gamma three"
    assert got[4].text == "all original content\n\nwith an empty line kept"
    assert got[4].n_removed == 0                      # empty line survives
    assert got[5].text == "" and got[5].n_removed == 1
    # within-doc repeats: df("self repeat") == 1 < 2 -> kept
    assert got[6].text == "self repeat\nself repeat\nunique zeta"
