"""Driver-contract registry sanity (full oracle equivalence is exercised
by scripts/check_oracles.py, which the driver mirrors at sf0.01)."""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"


def test_registry_consistency():
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    os_ = entry_mod.oracle_sql()
    assert set(os_) <= set(qs)
    # every query family is represented
    fams = {n.split("_")[0] for n in qs}
    assert {"kg", "rel", "events", "text", "dedup", "sim"} <= fams


@pytest.mark.parametrize(
    "name",
    ["kg_mentions", "rel_pricing_summary", "text_token_stats", "dedup_exact",
     "sim_topk_cosine", "events_sessions"],
)
def test_queries_execute(spark, name):
    import __spark_entry__ as entry_mod

    df = entry_mod.queries()[name](spark, SF_DIR)
    assert df.count() > 0


def test_entry_smoke(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert df.columns == [
        "doc", "subjectType", "subjectValue", "relation", "objectType",
        "objectValue", "meta",
    ]
