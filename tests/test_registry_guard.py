"""Registry drift guards.

Round-3's failure mode was a queries() rename committed without updating its
two consumers: bench.py crashed (KeyError) and text_features lost its oracle.
Both regressions become one-line failures here — no Spark session needed.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry
import bench


def test_registry_fits_driver_row_cap():
    # Round 4 proved the driver records at most 50 CORRECTNESS rows: the
    # registry grew to 52 and the two newest entries silently lost their
    # driver rows. Growth past 50 must force an explicit retire/merge
    # decision, never a silent truncation of the gate.
    n = len(entry.queries())
    assert n <= 50, (
        f"queries() has {n} entries but the driver artifact caps at 50 — "
        "retire or merge a redundant gate query before adding more"
    )


def test_bench_queries_subset_of_queries():
    qs = set(entry.queries())
    missing = [n for n in bench.BENCH_QUERIES if n not in qs]
    assert not missing, f"bench.py BENCH_QUERIES not in queries(): {missing}"


def test_oracle_keys_subset_of_queries():
    qs = set(entry.queries())
    dead = [n for n in entry.oracle_sql() if n not in qs]
    assert not dead, f"oracle_sql() keys with no queries() entry (dead): {dead}"


def test_every_query_has_oracle_or_documented_exemption():
    # queries intentionally without a SQL oracle (driver does rows-only
    # check); empty since r10 — every registry row carries a full oracle
    # (embedding_lsh_topk, the one historical exemption, gained a portable
    # oracle in r8 and its gate row retired in r10 for the 50-row cap)
    exempt: set[str] = set()
    qs = set(entry.queries())
    oracles = set(entry.oracle_sql())
    unexplained = qs - oracles - exempt
    assert not unexplained, f"queries() entries with no oracle and no exemption: {unexplained}"


def test_coverage_md_query_names_exist():
    # COVERAGE.md cites driver gate queries in the last column of its
    # tables; a rename/retire in queries() must update the doc (round-4
    # verdict found five stale names). Scan last-column backticked tokens
    # that look like registry names; test/module/file refs are excluded by
    # shape (dots, slashes, colons, parens, test_ prefix).
    import re

    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "COVERAGE.md")
    with open(path) as f:
        lines = f.readlines()
    qs = set(entry.queries())
    stale = []
    for ln in lines:
        if not ln.strip().startswith("|"):
            continue
        cells = [c.strip() for c in ln.strip().strip("|").split("|")]
        if len(cells) < 2:
            continue
        for tok in re.findall(r"`([a-z][a-z0-9_]*)`", cells[-1]):
            if tok.startswith("test_"):
                continue
            if tok not in qs:
                stale.append(tok)
    assert not stale, f"COVERAGE.md cites query names not in queries(): {sorted(set(stale))}"
