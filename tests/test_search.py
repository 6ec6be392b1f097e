"""BM25 retrieval properties (operators/search.py). Values are
oracle-checked by the driver (`search_bm25_topk`); these tests pin the
ranking semantics and the plan shape."""

from __future__ import annotations

from github_etl_spark.operators.search import bm25_topk


def _corpus(spark):
    rows = [
        (1, "quantum flux capacitor design notes"),          # rare terms
        (2, "the common words appear here again and again"),
        (3, "common words and more common words repeated"),
        (4, "flux measurements with common words"),
        (5, "entirely unrelated text about gardening tulips"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_rare_term_outranks_common(spark):
    """A doc matching the rare query term scores above docs matching
    only the common one (idf dominates at equal tf)."""
    docs = _corpus(spark)
    out = bm25_topk(docs, ["flux", "common"], k=5)
    ranks = {r.doc_id: r.rank for r in out.collect()}
    # docs 1 and 4 contain 'flux' (df=2); 2,3 only 'common' (df=3).
    assert ranks[4] < ranks[2] and ranks[4] < ranks[3]
    assert 5 not in ranks  # no matching term → absent, not rank 5


def test_higher_tf_scores_higher_same_length(spark):
    rows = [
        (1, "alpha beta gamma delta"),
        (2, "alpha alpha gamma delta"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.score for r in bm25_topk(docs, ["alpha"], k=2).collect()}
    assert out[2] > out[1]


def test_no_matches_is_empty(spark):
    assert bm25_topk(_corpus(spark), ["zzzznope"], k=5).count() == 0


def test_partitioning_invariant(spark):
    docs = _corpus(spark)
    a = sorted(map(tuple, bm25_topk(docs, ["flux", "common"], k=5).collect()))
    b = sorted(
        map(tuple, bm25_topk(docs.repartition(7), ["flux", "common"], k=5).collect())
    )
    assert a == b


def test_topk_plan_is_take_ordered(spark):
    """The final top-k must plan as TakeOrderedAndProject, never a full
    global sort."""
    docs = _corpus(spark)
    plan = (
        bm25_topk(docs, ["flux"], k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan, plan[:2000]


def test_phrase_count_expr_exact_matches(spark):
    from pyspark.sql import functions as F

    from github_etl_spark.operators.search import phrase_count_expr

    df = spark.createDataFrame(
        [
            (1, "the quick fox the quick fox jumps"),
            (2, "quick the fox"),
            (3, "the quick"),
            (4, "the"),
            (5, None),
        ],
        ["doc_id", "text"],
    ).select(
        "doc_id",
        phrase_count_expr(F.col("text"), ["the", "quick", "fox"]).alias("n"),
    )
    got = {r.doc_id: r.n for r in df.collect()}
    assert got[1] == 2  # two non-overlapping occurrences
    assert got[2] == 0  # right words, wrong order
    assert got[3] == 0  # shorter than the phrase (sequence guard)
    assert got[4] == 0
    assert got[5] == 0 or got[5] is None  # NULL text has no tokens


def test_phrase_count_overlapping(spark):
    from pyspark.sql import functions as F

    from github_etl_spark.operators.search import phrase_count_expr

    df = spark.createDataFrame([(1, "a a a a")], ["doc_id", "text"]).select(
        phrase_count_expr(F.col("text"), ["a", "a"]).alias("n")
    )
    assert df.collect()[0].n == 3  # sliding window counts overlaps


def test_multi_topk_matches_single_query_form(spark):
    """bm25_multi_topk with one query row ≡ bm25_topk with that
    query's term set — same scores, same ranks (the multi form's ONE
    postings pass must not change the arithmetic)."""
    from github_etl_spark.operators.search import bm25_multi_topk

    docs = _corpus(spark)
    single = {
        (r.doc_id, r.rank): r.score
        for r in bm25_topk(docs, ["flux", "common"], k=5).collect()
    }
    q = spark.createDataFrame(
        [(7, "flux common")], "query_id long, qtext string"
    )
    multi = {
        (r.doc_id, r.rank): r.score
        for r in bm25_multi_topk(docs, q, k=5).collect()
    }
    assert multi == single


def test_multi_topk_queries_are_independent(spark):
    """Each query's ranking in the shared-pass form equals its own
    single-query run — one query's terms must not leak into
    another's scores (df/idf are global corpus stats, identical
    either way; per-query scoring joins only that query's terms)."""
    from github_etl_spark.operators.search import bm25_multi_topk

    docs = _corpus(spark)
    q = spark.createDataFrame(
        [(1, "flux"), (2, "common words"), (3, "tulips")],
        "query_id long, qtext string",
    )
    out = bm25_multi_topk(docs, q, k=5).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, {})[(r.doc_id, r.rank)] = r.score
    for qid, terms in [(1, ["flux"]), (2, ["common", "words"]), (3, ["tulips"])]:
        solo = {
            (r.doc_id, r.rank): r.score
            for r in bm25_topk(docs, terms, k=5).collect()
        }
        assert by_q.get(qid, {}) == solo, qid


def test_multi_topk_duplicate_query_terms_collapse(spark):
    """BM25 is a bag-of-TERMS model over the query here: repeating a
    term in qtext must not double its contribution (terms are
    array_distinct'ed per query)."""
    from github_etl_spark.operators.search import bm25_multi_topk

    docs = _corpus(spark)
    once = spark.createDataFrame(
        [(1, "flux")], "query_id long, qtext string"
    )
    thrice = spark.createDataFrame(
        [(1, "flux flux flux")], "query_id long, qtext string"
    )
    a = sorted(map(tuple, bm25_multi_topk(docs, once, k=5).collect()))
    b = sorted(map(tuple, bm25_multi_topk(docs, thrice, k=5).collect()))
    assert a == b


def test_multi_topk_inset_overflow_falls_back_identically(spark):
    """Above ``max_inset_terms`` the operator must switch to the
    broadcast-join postings shape (no driver term collect beyond the
    cap probe, no giant InSet literal) and return EXACTLY the InSet
    path's rows — the guard exists for corpus-sized query sets
    (contamination audits), where the r13 literal shape would OOM the
    driver (VERDICT r13 item 5)."""
    from github_etl_spark.operators.search import bm25_multi_topk

    docs = _corpus(spark)
    q = spark.createDataFrame(
        [(1, "flux common"), (2, "gardening words")],
        "query_id long, qtext string",
    )
    fast = sorted(map(tuple, bm25_multi_topk(docs, q, k=5).collect()))
    # 4 distinct terms total; cap at 2 forces the fallback.
    slow = sorted(
        map(tuple, bm25_multi_topk(docs, q, k=5, max_inset_terms=2).collect())
    )
    assert fast == slow
    assert len(fast) > 0


def test_multi_topk_fallback_plan_has_no_inset_literal(spark):
    """The fallback plan must not carry the per-token InSet literal —
    its postings side joins the distributed term relation instead."""
    from github_etl_spark.operators.search import bm25_multi_topk

    docs = _corpus(spark)
    q = spark.createDataFrame(
        [(1, "flux common gardening")], "query_id long, qtext string"
    )
    out = bm25_multi_topk(docs, q, k=5, max_inset_terms=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the InSet path renders the term set inside an array_contains/IN
    # over the token lambda variable; the fallback must show a join on
    # `term` instead of any literal term-set filter of the tokens.
    assert "flux" not in plan
