"""Substring-level (span) dedup — operators/spans.py.

Model: Lee et al. 2021 exact-substring dedup.  Tests pin the window
hashing/counting semantics, the gaps-and-islands span merge, both
removal policies, and the cross-document line dedup variant, against
a hand-computable fixture plus a brute-force Python model.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_pipeline_with_kafka_spark.operators import spans as S

DOCS = [
    (1, "alpha beta gamma delta epsilon zeta eta theta unique one"),
    (2, "prefix words alpha beta gamma delta epsilon zeta eta theta suffix"),
    (3, "totally different content with no overlap whatsoever here now"),
    (4, "alpha beta gamma delta epsilon zeta eta theta unique one"),  # exact dup of 1
]


def _py_windows(docs, k, min_docs):
    """Brute-force model: window -> set of doc ids."""
    holders: dict[tuple, set] = {}
    for did, text in docs:
        toks = text.lower().split()
        for i in range(len(toks) - k + 1):
            holders.setdefault(tuple(toks[i : i + k]), set()).add(did)
    out = []
    for did, text in docs:
        toks = text.lower().split()
        for i in range(len(toks) - k + 1):
            ids = holders[tuple(toks[i : i + k])]
            if len(ids) >= min_docs:
                out.append((did, i, len(ids), min(ids)))
    return sorted(out)


def test_duplicated_windows_match_python_model(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = sorted(
        (r.id, r.start, r.n_docs, r.keep_id)
        for r in S.duplicated_windows(df, k=5, min_docs=2).collect()
    )
    assert got == _py_windows(DOCS, 5, 2)


def test_spans_merge_overlapping_windows(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {
        (r.id, r.span_start, r.span_end, r.n_windows)
        for r in S.duplicated_spans(df, k=5, min_docs=2).collect()
    }
    # doc 1/4 share tokens 0..9 (10 tokens -> 6 windows of 5); doc 2's
    # copy sits at offsets 2..9 (only the 8-token passage is shared).
    assert got == {(1, 0, 9, 6), (2, 2, 9, 4), (4, 0, 9, 6)}


def test_remove_keep_first_preserves_canonical_copy(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    out = {
        r.doc_id: (r.cleaned_text, r.n_removed_tokens)
        for r in S.remove_duplicated_spans(df, k=5, min_docs=2, policy="keep_first").collect()
    }
    assert out[1] == ("alpha beta gamma delta epsilon zeta eta theta unique one", 0)
    assert out[2] == ("prefix words suffix", 8)
    assert out[3][1] == 0
    assert out[4] == ("", 10)  # exact dup fully removed


def test_remove_policy_all_removes_every_occurrence(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    out = {
        r.doc_id: r.cleaned_text
        for r in S.remove_duplicated_spans(df, k=5, min_docs=2, policy="all").collect()
    }
    assert out[1] == ""
    assert out[2] == "prefix words suffix"
    assert out[4] == ""


def test_gap_between_spans_stays_split(spark):
    # two shared passages separated by a unique middle -> two islands
    docs = [
        (1, "a b c d e MIDDLE1 unique1 v w x y z"),
        (2, "a b c d e MIDDLE2 unique2 v w x y z"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = sorted(
        (r.id, r.span_start, r.span_end)
        for r in S.duplicated_spans(df, k=5, min_docs=2).collect()
    )
    assert got == [(1, 0, 4), (1, 7, 11), (2, 0, 4), (2, 7, 11)]


def test_short_docs_produce_no_windows(spark):
    df = spark.createDataFrame([(1, "a b c"), (2, "a b c")], ["doc_id", "text"])
    assert S.duplicated_windows(df, k=5, min_docs=2).count() == 0
    out = S.remove_duplicated_spans(df, k=5, min_docs=2).collect()
    assert all(r.n_spans == 0 and r.cleaned_text == r.text for r in out)


def test_rewrite_preserves_original_text_fidelity(spark):
    """Range-cut semantics (Lee et al.): casing, newlines, punctuation
    spacing and leading/trailing whitespace of the ORIGINAL text
    survive the rewrite; only the matched ranges are cut.  Matching is
    case-insensitive, rewriting is not."""
    shared = "alpha beta gamma delta epsilon"
    docs = [
        (1, f"Keep Me.\n  {shared} tail words here"),
        (2, f"ALPHA Beta GAMMA delta EPSILON\ttrailing Unique Words"),
        (3, "  Leading ws kept\nAnd NO span here at all  "),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {
        r.doc_id: (r.cleaned_text, r.n_removed_tokens)
        for r in S.remove_duplicated_spans(df, k=5, min_docs=2, policy="all").collect()
    }
    # doc 1: tokens 2..6 cut with their separators (incl. the "\n  "
    # after "Me." staying put — it precedes the span); original casing kept
    assert out[1] == ("Keep Me.\n  tail words here", 5)
    # doc 2: uppercase copy matched case-insensitively; the \t after the
    # span's last token travels with it
    assert out[2] == ("trailing Unique Words", 5)
    # doc 3: untouched docs are byte-identical (leading + trailing ws)
    assert out[3] == ("  Leading ws kept\nAnd NO span here at all  ", 0)


def test_rewrite_tail_cut_drops_preceding_separator(spark):
    """A span reaching the end of the document takes the separator
    before it along (no dangling trailing whitespace), while a doc
    whose final token survives keeps its own trailing whitespace."""
    shared = "alpha beta gamma delta epsilon"
    docs = [
        (1, f"Unique Opening Words then {shared}"),
        (2, f"{shared} kept tail\n"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {
        r.doc_id: r.cleaned_text
        for r in S.remove_duplicated_spans(df, k=5, min_docs=2, policy="all").collect()
    }
    assert out[1] == "Unique Opening Words then"
    assert out[2] == "kept tail\n"


def test_line_dedup_preserves_untrimmed_lines_and_blanks(spark):
    docs = [
        (1, "  Shared Header  \n\nBody One here\nShared Footer"),
        (2, "Shared Header\nBody Two there\n\nShared Footer"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {
        r.doc_id: (r.cleaned_text, r.n_removed_lines)
        for r in S.dedup_lines_across_docs(df, min_docs=2, policy="keep_first").collect()
    }
    # doc 1 is canonical: byte-identical, blank line and padding intact
    assert out[1] == ("  Shared Header  \n\nBody One here\nShared Footer", 0)
    # doc 2 loses both shared lines but keeps its own blank line
    assert out[2] == ("Body Two there\n", 2)


def test_validation_errors(spark):
    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        S.duplicated_windows(df, k=1)
    with pytest.raises(ValueError):
        S.duplicated_windows(df, min_docs=1)
    with pytest.raises(ValueError):
        S.duplicated_spans(df, policy="bogus")


def test_dedup_lines_across_docs(spark):
    docs = [
        (1, "Shared Header\nbody one\nShared Footer"),
        (2, "shared header\nbody two\nShared Footer"),
        (3, "solo document"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    keep_first = {
        r.doc_id: (r.cleaned_text, r.n_removed_lines)
        for r in S.dedup_lines_across_docs(df, min_docs=2, policy="keep_first").collect()
    }
    # doc 1 holds the canonical copy of both shared lines (case-insensitive hash)
    assert keep_first[1] == ("Shared Header\nbody one\nShared Footer", 0)
    assert keep_first[2] == ("body two", 2)
    assert keep_first[3] == ("solo document", 0)
    removed_all = {
        r.doc_id: r.cleaned_text
        for r in S.dedup_lines_across_docs(df, min_docs=2, policy="all").collect()
    }
    assert removed_all[1] == "body one"
    assert removed_all[2] == "body two"


def test_remove_spans_plan_has_no_token_grain_shuffle(spark):
    """The rewrite must not posexplode the corpus tokens: the only
    Generate in the plan belongs to the window-hash pass, and the final
    join is doc-grain."""
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    plan = S.remove_duplicated_spans(df, k=5, min_docs=2)._jdf.queryExecution().executedPlan().toString()
    # token reconstruction is a filter() lambda, not an explode+groupBy
    assert plan.count("Generate") <= 2  # window pass occurs twice (agg + position join)


def test_repeated_spans_catch_within_doc_repeats(spark):
    """A passage repeated inside ONE document is invisible to
    duplicated_spans (distinct-doc counting) but caught by
    repeated_spans."""
    docs = [
        (1, "alpha beta gamma delta epsilon filler alpha beta gamma delta epsilon"),
        (2, "totally different words with no repetition at all here"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    assert S.duplicated_spans(df, k=5, min_docs=2).count() == 0
    got = {
        (r.id, r.span_start, r.span_end)
        for r in S.repeated_spans(df, k=5, min_count=2, policy="keep_first").collect()
    }
    # first occurrence (tokens 0-4) kept; the repeat at 6-10 removed
    assert got == {(1, 6, 10)}
    out = {r.doc_id: r.cleaned_text for r in S.remove_repeated_spans(df, k=5, min_count=2).collect()}
    assert out[1] == "alpha beta gamma delta epsilon filler"
    assert out[2] == docs[1][1]


def test_repeated_spans_policy_all_and_cross_doc(spark):
    docs = [
        (1, "alpha beta gamma delta epsilon unique one"),
        (2, "prefix alpha beta gamma delta epsilon suffix"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    # cross-doc repeats count toward min_count too
    kf = {r.doc_id: r.cleaned_text for r in S.remove_repeated_spans(df, k=5, min_count=2).collect()}
    assert kf[1] == "alpha beta gamma delta epsilon unique one"
    assert kf[2] == "prefix suffix"
    al = {r.doc_id: r.cleaned_text for r in S.remove_repeated_spans(df, k=5, min_count=2, policy="all").collect()}
    assert al[1] == "unique one"
    assert al[2] == "prefix suffix"


def test_repeated_spans_validation(spark):
    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    import pytest as _pytest

    with _pytest.raises(ValueError):
        S.repeated_spans(df, k=1)
    with _pytest.raises(ValueError):
        S.repeated_spans(df, min_count=1)
    with _pytest.raises(ValueError):
        S.repeated_spans(df, policy="nope")


def test_remove_corpus_spans_incremental(spark):
    """Admission-time passage dedup: a shard doc repeating a corpus
    passage is stripped via the persisted window index alone; the rest
    of the shard passes through; appending the shard's windows keeps
    the index current for the next shard."""
    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta closing words")],
        ["doc_id", "text"],
    )
    idx = S.build_window_index(corpus, k=5)
    shard = spark.createDataFrame(
        [
            (10, "intro text alpha beta gamma delta epsilon zeta eta theta outro"),
            (11, "completely novel content with no corpus overlap at all"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in S.remove_corpus_spans(shard, idx, k=5).collect()}
    assert out[10].cleaned_text == "intro text outro"
    assert out[10].n_removed_tokens == 8
    # no corpus overlap → byte-identical passthrough (original casing)
    assert out[11].cleaned_text == shard.collect()[1].text
    assert out[11].n_spans == 0
    # index update: after appending shard windows, a doc repeating
    # shard 1's novel passage is stripped next round
    idx2 = idx.unionByName(S.build_window_index(shard, k=5)).distinct()
    shard2 = spark.createDataFrame(
        [(20, "completely novel content with no corpus overlap at all plus more")],
        ["doc_id", "text"],
    )
    out2 = S.remove_corpus_spans(shard2, idx2, k=5).collect()[0]
    assert out2.cleaned_text == "plus more"
