"""Gopher-rule quality gate + char-diversity: hand-computed expectations.

Every rule is exact-integer, so expectations here are derivable by hand and
must hold bit-for-bit (the DuckDB differential for the corpus-scale run lives
in the quality_gopher_rules / conv_quality_rules / quality_char_diversity
oracle rows).
"""

from __future__ import annotations

from deepdoctection_spark.operators.textstats import char_diversity, gopher_rules

TEN = "the quick brown fox jumps over a lazy dog today"  # 10 words, 38 chars


def _run(spark, rows):
    df = spark.createDataFrame(rows, "doc_id int, text string")
    return {r["doc_id"]: r.asDict() for r in gopher_rules(df).collect()}


def test_gopher_keep_and_word_count(spark):
    out = _run(spark, [(1, " ".join([TEN] * 6)), (2, TEN)])
    a = out[1]
    assert a["n_words"] == 60 and a["word_chars"] == 60 * 38 // 10
    assert all(
        a[f]
        for f in (
            "flag_word_count flag_mean_len flag_symbol flag_bullet "
            "flag_ellipsis flag_alpha flag_stopwords keep"
        ).split()
    )
    b = out[2]  # 10 words: below the 50-word floor, everything else fine
    assert not b["flag_word_count"] and b["flag_mean_len"] and not b["keep"]


def test_gopher_line_rules(spark):
    bullets = "\n".join(f"- item {i}" for i in range(10))
    ell = "\n".join((f"line {i}..." if i < 4 else f"line {i}") for i in range(10))
    out = _run(spark, [(1, bullets), (2, ell)])
    assert out[1]["n_lines"] == 10 and not out[1]["flag_bullet"]
    assert out[2]["flag_bullet"] and not out[2]["flag_ellipsis"]
    # 4 '...' occurrences also count as symbols: 10*4 > 60 words? n=20 words
    assert out[2]["n_symbols"] == 4


def test_gopher_symbol_alpha_and_empty(spark):
    hashy = " ".join([TEN] * 6) + " " + "# " * 7  # 67 words, 7 '#'
    digits = " ".join(str(i) for i in range(60))
    out = _run(spark, [(1, hashy), (2, digits), (3, ""), (4, " ".join(["x" * 15] * 60))])
    assert out[1]["n_symbols"] == 7 and not out[1]["flag_symbol"]  # 70 > 67
    assert not out[2]["flag_alpha"] and not out[2]["flag_stopwords"]
    e = out[3]
    assert e["n_words"] == 0 and e["word_chars"] == 0
    assert not e["flag_word_count"] and not e["flag_mean_len"] and not e["flag_alpha"]
    assert e["flag_symbol"] and e["flag_bullet"] and not e["keep"]
    assert not out[4]["flag_mean_len"]  # mean word length 15 > 10


def test_char_diversity_exact(spark):
    df = spark.createDataFrame(
        [(1, "aaa"), (2, "ab"), (3, "aab"), (4, ""), (5, "a a a")],
        "doc_id int, text string",
    )
    got = {r["doc_id"]: r for r in char_diversity(df).collect()}
    # (n_chars, distinct, simpson_micro): floor(1e6 * Σc(c-1)/N(N-1) + .5)
    assert (got[1]["n_chars"], got[1]["distinct_chars"], got[1]["simpson_micro"]) == (3, 1, 1_000_000)
    assert (got[2]["n_chars"], got[2]["distinct_chars"], got[2]["simpson_micro"]) == (2, 2, 0)
    assert (got[3]["n_chars"], got[3]["distinct_chars"], got[3]["simpson_micro"]) == (3, 2, 333_333)
    assert (got[4]["n_chars"], got[4]["distinct_chars"], got[4]["simpson_micro"]) == (0, 0, 0)
    # spaces are stripped before counting: 'a a a' ≡ 'aaa'
    assert got[5]["simpson_micro"] == 1_000_000 and got[5]["n_chars"] == 3


# -- C4 cleaning gate (Raffel et al. 2020 §2.2) -----------------------------

from deepdoctection_spark.operators.textstats import c4_rules  # noqa: E402


def _run_c4(spark, rows):
    df = spark.createDataFrame(rows, "doc_id int, text string")
    return {r["doc_id"]: r.asDict() for r in c4_rules(df).collect()}


def test_c4_line_keep_rules(spark):
    good = "This first sentence has enough words to pass."
    out = _run_c4(spark, [
        (1, good + "\nshort one.\nno terminal punctuation on this line"),
        (2, good + "\nPlease read our Privacy Policy before continuing today."),
        (3, 'He said the quote ends with a quotation mark instead."'),
    ])
    a = out[1]  # only the good line survives: <5 words and no-punct drop
    assert a["n_lines"] == 3 and a["kept_lines"] == 1 and a["n_sentences"] == 1
    assert not a["flag_sentences"] and not a["keep"]
    b = out[2]  # boilerplate phrase drops an otherwise-valid line
    assert b["kept_lines"] == 1
    assert out[3]["kept_lines"] == 1  # closing-quote terminal counts


def test_c4_page_gates(spark):
    three = ("One proper sentence stands entirely alone here.\n"
             "A second proper sentence follows the first one!\n"
             "Does a third proper sentence close the page?")
    out = _run_c4(spark, [
        (1, three),
        (2, three + "\nsome Lorem IPSUM filler text"),
        (3, three + "\ncode { x }"),
        (4, ""),
    ])
    a = out[1]
    assert a["kept_lines"] == 3 and a["n_sentences"] == 3 and a["keep"]
    assert a["flag_sentences"] and a["flag_lorem"] and a["flag_brace"]
    assert not out[2]["flag_lorem"] and not out[2]["keep"]  # case-insensitive
    assert not out[3]["flag_brace"] and not out[3]["keep"]
    e = out[4]
    assert e["kept_lines"] == 0 and e["clean_chars"] == 0 and not e["keep"]


def test_c4_whitespace_seams(spark):
    # trailing \r / \t around an otherwise-valid line must not break the
    # terminal-punctuation check or the word count
    line = "\t  Tabs and spaces surround this proper sentence.  \r"
    out = _run_c4(spark, [(1, line + "\n" + line + "\n" + line)])
    assert out[1]["kept_lines"] == 3 and out[1]["keep"]
