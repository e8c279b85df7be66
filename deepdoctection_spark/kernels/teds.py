"""Tree-edit-distance similarity over table HTML (TEDS).

Re-expression of the reference's TEDS metric
(/root/reference/deepdoctection/eval/tedsmetric.py:105-265): parse both HTML
strings into element trees and score 1 - dist/max(|T1|,|T2|) where dist is
the Zhang-Shasha ordered-tree edit distance (unit insert/delete/rename
costs; rename is free iff (tag, text) labels match). The reference rides on
apted/distance libraries; neither ships here, so the classic Zhang-Shasha
dynamic program (public algorithm, 1989) is implemented directly — tables
are tiny trees (≤10³ nodes), so the O(n²·depth²) worst case is irrelevant
row-locally.
"""

from __future__ import annotations

from deepdoctection_spark.kernels.html import Node, parse_html
from deepdoctection_spark.kernels.textnorm import normalize_ws


# Size guard: the DP allocates an m×n matrix. Without a cap, a crawled page
# with a ~100k-node table would OOM/hang the executor — the poison-row
# failure the engine quarantines everywhere else (html.MAX_DEPTH,
# table.MAX_SPAN). Callers catch TreeTooLarge and emit null.
MAX_TEDS_NODES = 2000


class TreeTooLarge(ValueError):
    pass


def _postorder(root: Node) -> tuple[list[tuple], list[int]]:
    """(labels, leftmost-leaf-descendant index) in postorder.

    Element labels include colspan/rowspan (the reference's TableTree
    encodes cell spans into the label, tedsmetric.py:105-160) so
    structurally different tables never score as identical."""
    labels: list[tuple] = []
    lld: list[int] = []

    def rec(nd: Node) -> int:
        """Returns the postorder index of nd's leftmost leaf."""
        first_leaf = -1
        for c in nd.children:
            leaf = rec(c)
            if first_leaf < 0:
                first_leaf = leaf
        if nd.tag == "":
            label = ("", normalize_ws(nd.text), "", "")
        else:
            label = (
                nd.tag,
                "",
                str(nd.attrs.get("colspan", "")),
                str(nd.attrs.get("rowspan", "")),
            )
        labels.append(label)
        if len(labels) > MAX_TEDS_NODES:
            raise TreeTooLarge(f"tree exceeds {MAX_TEDS_NODES} nodes")
        if first_leaf < 0:
            first_leaf = len(labels) - 1
        lld.append(first_leaf)
        return first_leaf

    rec(root)
    return labels, lld


def _keyroots(lld: list[int]) -> list[int]:
    seen: dict[int, int] = {}
    for i, leaf in enumerate(lld):
        seen[leaf] = i  # last (highest) node per leftmost-leaf = keyroot
    return sorted(seen.values())


def tree_edit_distance(a: Node, b: Node) -> tuple[int, int, int]:
    """(distance, |A|, |B|) via Zhang-Shasha with unit costs."""
    la, lda = _postorder(a)
    lb, ldb = _postorder(b)
    m, n = len(la), len(lb)
    kra, krb = _keyroots(lda), _keyroots(ldb)
    td = [[0] * n for _ in range(m)]

    for i in kra:
        for j in krb:
            li, lj = lda[i], ldb[j]
            fd = [[0] * (j - lj + 2) for _ in range(i - li + 2)]
            for x in range(1, i - li + 2):
                fd[x][0] = fd[x - 1][0] + 1
            for y in range(1, j - lj + 2):
                fd[0][y] = fd[0][y - 1] + 1
            for x in range(1, i - li + 2):
                for y in range(1, j - lj + 2):
                    ai, bj = li + x - 1, lj + y - 1
                    if lda[ai] == li and ldb[bj] == lj:
                        rename = 0 if la[ai] == lb[bj] else 1
                        fd[x][y] = min(
                            fd[x - 1][y] + 1,
                            fd[x][y - 1] + 1,
                            fd[x - 1][y - 1] + rename,
                        )
                        td[ai][bj] = fd[x][y]
                    else:
                        fd[x][y] = min(
                            fd[x - 1][y] + 1,
                            fd[x][y - 1] + 1,
                            fd[lda[ai] - li][ldb[bj] - lj] + td[ai][bj],
                        )
    return td[m - 1][n - 1], m, n


def teds(gt_html: str, pred_html: str) -> float:
    """TEDS similarity in [0, 1]; 1.0 = identical trees."""
    ta, tb = parse_html(gt_html), parse_html(pred_html)
    dist, m, n = tree_edit_distance(ta, tb)
    denom = max(m, n)
    return 1.0 if denom == 0 else 1.0 - dist / denom
