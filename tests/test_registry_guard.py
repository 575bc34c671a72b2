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


def test_bench_queries_subset_of_queries():
    qs = set(entry.queries())
    missing = [n for n in bench.BENCH_QUERIES if n not in qs]
    assert not missing, f"bench.py BENCH_QUERIES not in queries(): {missing}"


def test_oracle_keys_subset_of_queries():
    qs = set(entry.queries())
    dead = [n for n in entry.oracle_sql() if n not in qs]
    assert not dead, f"oracle_sql() keys with no queries() entry (dead): {dead}"


def test_every_query_has_oracle_or_documented_exemption():
    # queries intentionally without a SQL oracle (driver does rows-only check)
    exempt = {"embedding_lsh_topk"}  # hash-derived hyperplanes; recall unit-tested
    qs = set(entry.queries())
    oracles = set(entry.oracle_sql())
    unexplained = qs - oracles - exempt
    assert not unexplained, f"queries() entries with no oracle and no exemption: {unexplained}"
