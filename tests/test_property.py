"""Property-based kernel tests (hypothesis): totality + span invariants.

The reference has no property-based testing (SURVEY §5); at 10^12 turns the
kernels see adversarial inputs statistically, so totality (never throw) and
offset validity are load-bearing properties, not nice-to-haves.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from deepdoctection_spark.kernels.extract import extract_turn, finalize_turn
from deepdoctection_spark.kernels.html import extract_blocks, parse_html
from deepdoctection_spark.kernels.teds import teds
from deepdoctection_spark.kernels.textnorm import normalize_ws, word_spans

# text with plenty of HTML-ish structure mixed in
_frag = st.sampled_from(
    list("abc <>/=\"'&\n\t!-xyzp1")
    + ["<p>", "</p>", "<a href='x'>", "</a>", "<table>", "<tr>", "<td>",
       "</td>", "</tr>", "</table>", "<div>", "</div>", "<!--", "-->"]
)
_soup = st.lists(_frag, max_size=80).map("".join)


@settings(max_examples=120, deadline=None, derandomize=True)
@given(_soup)
def test_parser_total_on_tag_soup(s):
    from deepdoctection_spark.kernels.html import extract_blocks_stream

    parse_html(s)  # must not raise on any input
    extract_blocks(s)
    extract_blocks_stream(s)  # the production hot path is total too


@settings(max_examples=120, deadline=None, derandomize=True)
@given(
    st.text(max_size=300),
    st.sampled_from(["", "browser", "pdf_reader"]),
)
def test_extract_turn_total_and_offsets_valid(text, tool):
    blocks = extract_turn(text, tool)
    fin = finalize_turn("conv", 0, blocks)
    et = fin.extracted_text
    # every span's offsets slice to a consistent substring
    for s in fin.blocks:
        assert 0 <= s.begin <= s.end <= len(et)
    for _wi, tok, wb, we in fin.words:
        assert et[wb:we] == tok
        assert " " not in tok and "\n" not in tok
    # block texts joined with \n reconstruct extracted_text
    assert "\n".join(et[s.begin : s.end] for s in fin.blocks) == et
    # reading order is dense 0..n-1
    assert [s.reading_order for s in fin.blocks] == list(range(len(fin.blocks)))


@settings(max_examples=80, deadline=None, derandomize=True)
@given(st.text(max_size=200))
def test_normalize_idempotent_and_word_spans_cover(s):
    n = normalize_ws(s)
    assert normalize_ws(n) == n
    ws = word_spans(n)
    # tokens tile the normalized text with single separators
    rebuilt_len = sum(e - b for _, _, b, e in ws) + max(0, len(ws) - 1)
    assert rebuilt_len == len(n)


@settings(max_examples=40, deadline=None, derandomize=True)
@given(_soup, _soup)
def test_teds_bounded_and_reflexive(a, b):
    assert teds(a, a) == 1.0
    v = teds(a, b)
    assert 0.0 <= v <= 1.0


# --- equivalence oracles for the fused/split fast paths ---------------------


def _gather_text_reference(node):
    """The pre-fusion reference implementation: raw subtree text + density
    counters, normalized afterwards. The fused _gather_text must match it
    exactly on arbitrary tag soup."""
    from deepdoctection_spark.kernels.html import _BLOCKISH
    from deepdoctection_spark.kernels.textnorm import _WS_RE

    parts, total, linked, tags = [], 0, 0, -1  # -1: don't count `node` itself

    def rec(nd, in_link):
        nonlocal total, linked, tags
        if nd.tag == "":
            parts.append(nd.text)
            ws = [w for w in _WS_RE.split(nd.text) if w]
            stripped = sum(map(len, ws)) + max(0, len(ws) - 1)
            total += stripped
            if in_link:
                linked += stripped
            return
        tags += 1
        for c in nd.children:
            rec(c, in_link or nd.tag == "a")
        if nd.tag in _BLOCKISH:
            parts.append(" ")

    rec(node, False)
    return "".join(parts), total, linked, tags


@settings(max_examples=200, deadline=None, derandomize=True)
@given(_soup)
def test_fused_gather_matches_reference(s):
    from deepdoctection_spark.kernels.html import _gather_text

    root = parse_html(s)
    norm, total, linked, tags = _gather_text(root)
    raw, rtotal, rlinked, rtags = _gather_text_reference(root)
    assert (norm, total, linked, tags) == (normalize_ws(raw), rtotal, rlinked, rtags)


@settings(max_examples=200, deadline=None, derandomize=True)
@given(st.text(alphabet=list("ab \n\tx\xa0é"), max_size=120))
def test_word_spans_matches_finditer(s):
    import re

    ref = [(i, m[0], *m.span())
           for i, m in enumerate(re.finditer(r"[^ \n]+", s))]
    assert word_spans(s) == ref


@settings(max_examples=200, deadline=None, derandomize=True)
@given(st.lists(st.text(alphabet=list("ab \n\tx\xa0é日"), max_size=60), max_size=12))
def test_batch_words_matches_per_row(texts):
    """The Arrow-vectorized batch tokenizer (operators/extraction.py
    _batch_words) is bit-identical to per-row word_spans on arbitrary text,
    including unicode, separator runs, and empty rows."""
    from deepdoctection_spark.operators.extraction import _batch_words

    got = _batch_words(texts).to_pylist()
    exp = [
        [
            {"token": t, "span_begin": b, "span_end": e, "word_idx": i}
            for (i, t, b, e) in word_spans(s)
        ]
        for s in texts
    ]
    assert got == exp


_pdf_text = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FFF,
                           blacklist_categories=("Cs",)),
    min_size=1, max_size=40,
).map(lambda s: s.strip() or "x")

_pdf_pages = st.lists(
    st.lists(
        st.tuples(
            st.integers(40, 500),        # x
            st.integers(100, 740),       # y
            st.sampled_from([9, 11, 12]),
            _pdf_text,
        ).map(lambda t: (float(t[0]), float(t[1]), float(t[2]), t[3])),
        min_size=1, max_size=4,
    ),
    min_size=1, max_size=3,
)


@settings(max_examples=25, deadline=None, derandomize=True)
@given(_pdf_pages)
def test_pdf_layout_matrix_equivalence(pages):
    """EVERY writer layout decodes to the same per-page text: classic,
    ObjStm/xref-stream, CID font (which also survives non-latin-1 chars
    the simple font would replace), RC4-128, AESV2 — the property the
    mixed-corpus query relies on. CID is the reference decode (it is
    lossless for the full generated alphabet); latin-1 layouts are
    compared on their own encode of the same pages."""
    from deepdoctection_spark.kernels.pdf import pdf_encode, pdf_texts

    base = pdf_texts(pdf_encode(pages))
    assert pdf_texts(pdf_encode(pages, object_streams=True)) == base
    assert pdf_texts(pdf_encode(pages, encrypt_bits=128)) == base
    assert pdf_texts(pdf_encode(pages, encrypt_bits=128,
                                cipher="aes")) == base
    cid = pdf_texts(pdf_encode(pages, cid_font=True))
    cid_objstm = pdf_texts(pdf_encode(pages, cid_font=True,
                                      object_streams=True))
    assert cid == cid_objstm
    # CID is exact on the full alphabet; the simple-font layouts agree
    # with it whenever the text is latin-1-representable
    if all(all(t == t.encode("latin-1", "replace").decode("latin-1")
               for _x, _y, _s, t in page) for page in pages):
        assert cid == base


@settings(max_examples=400, deadline=None, derandomize=True)
@given(_soup)
def test_stream_matches_tree_extractor(s):
    """The single-pass streaming extractor (the production hot path since
    round 4) is block-for-block identical to the tree fold on arbitrary tag
    soup — categories, texts, and full table-cell grids."""
    from deepdoctection_spark.kernels.html import (
        extract_blocks,
        extract_blocks_stream,
    )

    def key(bs):
        return [
            (
                b.category,
                b.text,
                [
                    (c.row_number, c.column_number, c.row_span, c.column_span, c.text)
                    for c in b.cells
                ],
            )
            for b in bs
        ]

    assert key(extract_blocks(s)) == key(extract_blocks_stream(s))


def test_stream_matches_tree_on_structured_nesting():
    """Deterministic structured-nesting sweep (deep lists, unclosed tags,
    tables in containers) — heavier structure than the flat soup strategy."""
    import random

    from deepdoctection_spark.kernels.html import (
        MAX_DEPTH,
        extract_blocks,
        extract_blocks_stream,
    )

    def key(bs):
        return [(b.category, b.text, [(c.row_number, c.column_number, c.text) for c in b.cells]) for b in bs]

    tags = ["div", "p", "span", "ul", "li", "table", "tr", "td", "h2", "a",
            "b", "nav", "pre", "blockquote", "ol", "th", "dd", "dl", "section"]
    rng = random.Random(7)

    def gen(depth):
        if depth > 6 or rng.random() < 0.3:
            return rng.choice(["hello", "x y z", " ", "&amp;", "w" * rng.randint(1, 8), ""])
        t = rng.choice(tags)
        inner = "".join(gen(depth + 1) for _ in range(rng.randint(0, 4)))
        if rng.random() < 0.15:
            return f"<{t}>{inner}"  # unclosed
        return f"<{t}>{inner}</{t}>"

    for _ in range(3000):
        s = "".join(gen(0) for _ in range(rng.randint(1, 4)))
        assert key(extract_blocks(s)) == key(extract_blocks_stream(s)), s[:200]
    for s in (
        "<div>" * (MAX_DEPTH + 5) + "<p>past cap</p>x" + "</div>" * (MAX_DEPTH + 5),
        "<a>" * 260 + "linky" + "</a>" * 260,
        "<ul>" + "<li>i<div>" * 200 + "</div></li>" * 200 + "</ul>",
    ):
        assert key(extract_blocks(s)) == key(extract_blocks_stream(s))


def test_stream_matches_tree_on_stray_angle_hostile():
    """Stray '<' / mis-nested close / unterminated-tag sweep: pins the
    round-5 fused-lexer chunking contract (consecutive text matches buffer
    into ONE chunk so chunk boundaries — which the total/stripped char
    count is sensitive to at the tag-density threshold — land exactly where
    the tree parser's between-match slices do). The seed-7 generator here
    reproduced the one divergence the flat-soup strategy missed."""
    import random

    from deepdoctection_spark.kernels.html import (
        extract_blocks,
        extract_blocks_stream,
    )

    def key(bs):
        return [
            (b.category, b.text,
             [(c.row_number, c.column_number, c.row_span, c.column_span, c.text)
              for c in b.cells])
            for b in bs
        ]

    tags = ["div", "p", "span", "a href='/x'", "ul", "li", "table", "tr",
            "td", "b", "h2", "br", "img", "script", "style"]
    texts = ["hello world", "a&amp;b", "x<y", "<", "&lt;tag&gt;", " ", "",
             "mixed  ws\ttext", "trail ", " lead"]
    rng = random.Random(7)

    def gen(depth=0):
        out = []
        for _ in range(rng.randint(1, 5)):
            if rng.random() < 0.45 or depth > 5:
                out.append(rng.choice(texts))
            else:
                t = rng.choice(tags)
                name = t.split(" ")[0]
                out.append(f"<{t}>")
                out.append("".join(gen(depth + 1)))
                if rng.random() < 0.85:
                    out.append(f"</{name}>")
                elif rng.random() < 0.3:
                    out.append(f"</{rng.choice(['div', 'p', 'span'])}>")
        return out

    for trial in range(5000):
        s = "".join(gen())
        assert key(extract_blocks(s)) == key(extract_blocks_stream(s)), (
            trial, s[:300])
