"""Cell-merge refinement query with a generated DuckDB oracle.

Spark runs the real connected-components + rectangle-fixpoint kernel over
noisy cell proposals (operators/refineop.py); the oracle never refines — it
renders the EXPECTED merged-cell HTML per variant directly from the template
ground truth (sources/transcripts.EXPECTED_CELLS), so agreement checks the
union-find, the fixpoint absorption of the L-shaped component, the merged
text order, and the generate_html_string row/span contract end-to-end.
"""

from __future__ import annotations

from deepdoctection_spark.operators.extraction import extract_transcripts
from deepdoctection_spark.operators.refineop import refined_tables
from deepdoctection_spark.plans.registry import register
from deepdoctection_spark.sources.transcripts import (
    EXPECTED_CELLS,
    TRANSCRIPT_BASE_SQL,
    Lit,
    build_transcripts,
    sql_concat,
)


def _cell_pieces() -> dict[tuple[int, int], list[Lit]]:
    return {(r, c): p for r, c, p in EXPECTED_CELLS}


def _joined(*cells: list[Lit]) -> list[Lit]:
    out: list[Lit] = []
    for i, p in enumerate(cells):
        if i:
            out.append(("lit", " "))
        out.extend(p)
    return out


def oracle_table_refined() -> str:
    cp = _cell_pieces()
    c00, c01, c10, c11 = cp[(1, 1)], cp[(1, 2)], cp[(2, 1)], cp[(2, 2)]

    def html(pieces_rows: list[list[Lit]]) -> str:
        out: list[Lit] = [("lit", "<table>")]
        for row in pieces_rows:
            out.append(("lit", "<tr>"))
            out.extend(row)
            out.append(("lit", "</tr>"))
        out.append(("lit", "</table>"))
        return sql_concat(out)

    def td(pieces: list[Lit], attrs: str = "") -> list[Lit]:
        return [("lit", f"<td{attrs}>"), *pieces, ("lit", "</td>")]

    v0 = html(
        [
            td(c00) + td(c01),
            td(c10) + td(c11),
        ]
    )
    v1 = html(
        [
            td(_joined(c00, c10), " rowspan=2") + td(c01),
            td(c11),
        ]
    )
    v2 = html(
        [
            td(_joined(c00, c01, c10, c11), " rowspan=2 colspan=2"),
            [],  # fully-spanned second row renders as an empty <tr></tr>
        ]
    )
    return f"""
WITH base AS ({TRANSCRIPT_BASE_SQL})
SELECT conv_id, turn_idx,
       ((doc_id % 8) % 3)::INT AS variant,
       (CASE (doc_id % 8) % 3 WHEN 0 THEN 4 WHEN 1 THEN 3 ELSE 1 END)::INT AS n_cells,
       (CASE (doc_id % 8) % 3
          WHEN 0 THEN {v0}
          WHEN 1 THEN {v1}
          ELSE {v2} END) AS refined_html
FROM base WHERE (doc_id % 3) = 1
"""


@register("table_refined", oracle_table_refined())
def q_table_refined(spark, sf_dir):
    return refined_tables(
        extract_transcripts(build_transcripts(spark, sf_dir), with_words=False)
    )


def oracle_table_refined_csv() -> str:
    """Expected Table.csv rows per variant: text + trailing space at the
    upper-left tile, blank tiles under spans, tab-joined."""
    cp = _cell_pieces()
    c00, c01, c10, c11 = cp[(1, 1)], cp[(1, 2)], cp[(2, 1)], cp[(2, 2)]
    sp: Lit = ("lit", " ")
    tab: Lit = ("lit", "\t")
    rows_by_variant = {
        0: [
            [*c00, sp, tab, *c01, sp],
            [*c10, sp, tab, *c11, sp],
        ],
        1: [
            [*_joined(c00, c10), sp, tab, *c01, sp],
            [tab, *c11, sp],
        ],
        2: [
            [*_joined(c00, c01, c10, c11), sp, tab],
            [tab],
        ],
    }
    selects = []
    for v, rows in rows_by_variant.items():
        for r, pieces in enumerate(rows, 1):
            selects.append(
                f"SELECT conv_id, turn_idx, {v}::INT AS variant, "
                f"{r}::INT AS row_number, {sql_concat(pieces)} AS csv_row "
                f"FROM base WHERE (doc_id % 3) = 1 AND (doc_id % 8) % 3 = {v}"
            )
    union = "\nUNION ALL\n".join(selects)
    return f"WITH base AS ({TRANSCRIPT_BASE_SQL})\n{union}"


@register("table_refined_csv", oracle_table_refined_csv())
def q_table_refined_csv(spark, sf_dir):
    from deepdoctection_spark.operators.refineop import refined_csv_rows

    return refined_csv_rows(
        extract_transcripts(build_transcripts(spark, sf_dir), with_words=False)
    )
