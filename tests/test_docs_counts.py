"""Evidence-chain guard: the query counts published in README.md and
COVERAGE.md must equal the live registry (VERDICT round 6, item 3 —
doc drift).  The registry dict is the single source of truth; a doc
edit or a new registration that forgets to bump the docs fails here.
"""

from __future__ import annotations

import re
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _registry_size() -> int:
    import __spark_entry__ as entrymod

    return len(entrymod.queries())


def test_readme_counts_match_registry():
    n = _registry_size()
    text = (REPO / "README.md").read_text()
    claims = re.findall(r"(\d+) registered queries", text)
    claims += [m[0] for m in re.findall(r"(\d+)/(\1) ", text) if m]
    gate = re.findall(r"every registered query \((\d+)/(\d+)", text)
    assert claims, "README.md no longer states a registry count"
    for c in claims:
        assert int(c) == n, f"README claims {c} queries; registry has {n}"
    for a, b in gate:
        assert int(a) == int(b) == n


def test_coverage_headline_matches_registry():
    n = _registry_size()
    head = (REPO / "COVERAGE.md").read_text().split("\n\n")[1]
    m = re.search(r"Current registry: (\d+) queries", head)
    assert m, "COVERAGE.md header must state the current registry size"
    assert int(m.group(1)) == n, (
        f"COVERAGE.md claims {m.group(1)}; registry has {n}"
    )


def test_every_query_is_oracle_paired_or_documented():
    import __spark_entry__ as entrymod

    q = set(entrymod.queries())
    o = set(entrymod.oracle_sql())
    unpaired = q - o
    # The contract allows rows-only checks for non-SQL-expressible ops,
    # but as of round 6 every registered query is oracle-paired; if one
    # is added without an oracle, it must be a deliberate decision.
    assert not unpaired, (
        f"queries without oracles (add one or document why): {unpaired}"
    )
