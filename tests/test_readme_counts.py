"""The README front page advertises the registry size; r10's verdict
caught it drifting (said 222/218 while the registry was 230/226).
Derive the numbers from the registry itself so the front page can
never silently drift again (VERDICT r10 Next #7): the test fails the
moment a registration lands without the README counts line moving.

No Spark needed — queries.py imports without a session.
"""

import re
from pathlib import Path

from vector_io_spark.queries import ORACLE, QUERIES

README = Path(__file__).resolve().parent.parent / "README.md"


def test_readme_counts_match_registry():
    text = README.read_text()
    m = re.search(
        r"(\d+) operator queries \((\d+) paired with DuckDB oracle",
        text,
    )
    assert m, (
        "README.md no longer contains the canonical counts line "
        "'<N> operator queries (<M> paired with DuckDB oracle' — "
        "keep that phrasing so this test can pin it"
    )
    assert int(m.group(1)) == len(QUERIES), (
        f"README says {m.group(1)} operator queries but the registry "
        f"has {len(QUERIES)} — update README.md"
    )
    assert int(m.group(2)) == len(ORACLE), (
        f"README says {m.group(2)} oracle-paired but the registry "
        f"has {len(ORACLE)} — update README.md"
    )


def test_unpaired_names_are_exactly_the_documented_ann_paths():
    unpaired = sorted(set(QUERIES) - set(ORACLE))
    assert unpaired == [
        "ann_topk_ivf",
        "ann_topk_ivfpq",
        "ann_topk_pq",
        "maxsim_pruned_topk",
    ], (
        "rows-only (non-oracle-paired) queries changed: "
        f"{unpaired} — every new registration must ship oracle SQL "
        "unless it is a documented approximate-ANN path with a "
        "hash-exact twin"
    )
