"""Per-turn extraction dispatch + span finalization (offsets, ids, order).

The per-row core of the engine — the analogue of the reference's full
analyzer chain (layout → segmentation → text → matching → ordering → page
parsing, /root/reference/deepdoctection/analyzer/dd.py:256-401) collapsed into
one pure function over a (text, tool) payload:

    extract_turn(text, tool) -> [(category, block_text, cells)]
    finalize_turn(conv_id, turn_idx, blocks) -> TurnExtraction

Payload dispatch mirrors the reference's source-sensitive _entry
(/root/reference/deepdoctection/pipe/doctectionpipe.py:142-163): the ``tool``
column selects the decoder (browser → HTML DOM walk; pdf_reader → positioned
layout parse; anything else → plain-text normalize), with a content sniff as
fallback.

Output contract (pinned once — SURVEY.md §7 hard-part #1):
- block texts join with a single "\n" to form extracted_text
  (reference: Page._make_text, view.py:665-671);
- span offsets are [begin, end) char offsets into extracted_text;
- reading_order enumerates blocks 0.. in emit order
  (reference: TextOrderService, pipe/order.py:566-772);
- span ids are content-addressed md5 (kernels/ids.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from hashlib import md5 as _md5
from deepdoctection_spark.kernels.html import extract_blocks_stream, looks_like_html
from deepdoctection_spark.kernels.layout import extract_layout_blocks, looks_like_layout
from deepdoctection_spark.kernels.table import TableCell, cells_to_html
from deepdoctection_spark.kernels.textnorm import normalize_ws, word_spans


@dataclass(slots=True)
class Block:
    category: str
    text: str
    cells: list[TableCell] = field(default_factory=list)


@dataclass(slots=True)
class SpanOut:
    span_id: str
    category: str
    begin: int
    end: int
    reading_order: int
    parent_id: str | None
    score: float
    attrs: dict[str, str]


# Word-level spans travel as plain (idx, token, begin, end) tuples — the
# single hottest per-row object (≈60 words/turn): no per-word class
# construction, no per-word id hashing. Word span_ids are NOT materialized in
# the hot path at all; consumers needing the deterministic id derive it
# JVM-side from the same key (operators/extraction.word_token_ids), which is
# a vectorized md5 column expression over the flat exploded rows.
WordTuple = tuple[int, str, int, int]


@dataclass(slots=True)
class TurnExtraction:
    extracted_text: str
    blocks: list[SpanOut]
    cells: list[SpanOut]
    words: list[WordTuple]
    table_htmls: list[str]


def extract_turn(
    text: str,
    tool: str,
    link_density_threshold: float = 0.5,
    column_gap: float = 100.0,
    tag_density_threshold: float = 8.0,
) -> list[Block]:
    """Dispatch by payload kind and return ordered content blocks."""
    if text is None:
        return []
    if tool == "browser" or (tool not in ("pdf_reader",) and looks_like_html(text)):
        # HtmlBlock is duck-compatible with Block (category/text/cells) —
        # re-wrapping every block in a second dataclass was pure alloc churn
        # the single-pass streaming extractor (no tree materialization);
        # block-identical to kernels/html.extract_blocks (property-tested)
        return extract_blocks_stream(text, link_density_threshold, tag_density_threshold)
    if tool == "pdf_reader" or looks_like_layout(text):
        # LayoutBlock carries category/text and an empty shared .cells
        return extract_layout_blocks(text, column_gap)
    norm = normalize_ws(text)
    return [Block("text", norm)] if norm else []


def finalize_turn(
    conv_id: str, turn_idx: int, blocks: list[Block], with_words: bool = True
) -> TurnExtraction:
    """Assemble extracted_text and all span levels with deterministic ids.

    ``with_words=False`` skips per-row word tokenization: the Arrow stage
    (operators/extraction.py) tokenizes the whole batch in one vectorized
    pass instead — per-row word_spans was the hottest single kernel
    (~1/3 of stage CPU at sf0.1)."""
    texts = [b.text for b in blocks]
    extracted = "\n".join(texts)
    spans: list[SpanOut] = []
    cell_spans: list[SpanOut] = []
    table_htmls: list[str] = []
    offset = 0
    # span_id contract inlined (kernels/ids.py): the "{conv}|{turn}|" prefix
    # is constant per turn — format it once, not once per span
    pre = f"{conv_id}|{turn_idx}|"
    for order, b in enumerate(blocks):
        begin, end = offset, offset + len(b.text)
        sid = _md5(f"{pre}{b.category}|{begin}|{end}".encode()).hexdigest()
        spans.append(
            SpanOut(sid, b.category, begin, end, order, None, 1.0, {})
        )
        if b.cells:
            table_htmls.append(cells_to_html(b.cells))
            # cell offsets: walk the block's own text, which was assembled as
            # rows joined by \n and cells by single spaces (kernels/html.py) —
            # recompute positions by scanning within [begin, end). Cells
            # arrive row-major / column-ascending from segment_table_grid
            # (the only producer), so a consecutive walk needs no sorting.
            cursor = begin
            cur_row = None
            first_in_row = True
            for c in b.cells:
                if c.row_number != cur_row:
                    if cur_row is not None:
                        cursor += 1  # the joining \n
                    cur_row = c.row_number
                    first_in_row = True
                if not c.text:
                    continue
                if not first_in_row:
                    cursor += 1  # the joining space
                cb, ce = cursor, cursor + len(c.text)
                cid = _md5(f"{pre}cell|{cb}|{ce}".encode()).hexdigest()
                cell_spans.append(
                    SpanOut(
                        cid, "cell", cb, ce, order, sid, 1.0,
                        {
                            "row_number": str(c.row_number),
                            "column_number": str(c.column_number),
                            "row_span": str(c.row_span),
                            "column_span": str(c.column_span),
                        },
                    )
                )
                cursor = ce
                first_in_row = False
        offset = end + 1  # block-joining \n
    return TurnExtraction(
        extracted,
        spans,
        cell_spans,
        word_spans(extracted) if with_words else [],
        table_htmls,
    )
