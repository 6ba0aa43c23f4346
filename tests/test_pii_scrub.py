"""PII scrubbing (docs_pii_scrub_stats) — unit-level validation of
the redaction semantics on crafted fixtures (the gate validates the
cross-engine rewrite; these tests pin the per-pattern behavior).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from epl_cas_etl_2026_spark.plans import extensions as ext


def _write_docs(tmp_path, rows):
    import pandas as pd

    sf = str(tmp_path / "sf")
    os.makedirs(sf, exist_ok=True)
    pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "lang": ["en"] * len(rows),
            "source": [r[2] for r in rows],
            "n_chars": [len(r[1]) for r in rows],
        }
    ).to_parquet(os.path.join(sf, "documents.parquet"))
    return sf


def test_injected_pii_counts_and_organic_matches(spark, tmp_path):
    rows = [
        (0, "plain prose only", "a"),
        # organic email + organic IP on top of the injected sentence
        (1, "mail me at someone@test.org from 10.0.0.1 today", "a"),
        # an 11-digit run reads as a phone number (documented organic)
        (2, "order 123 456 789 01 shipped", "b"),
    ]
    sf = _write_docs(tmp_path, rows)
    got = {
        r["source"]: r.asDict()
        for r in ext.docs_pii_scrub_stats(spark, sf).collect()
    }
    # every doc gets exactly one injected email/phone/IP; doc 1 adds
    # one organic email + one organic IP
    assert got["a"]["n_docs"] == 2
    assert got["a"]["emails"] == 3  # 2 injected + 1 organic
    assert got["a"]["phones"] == 2
    assert got["a"]["ips"] == 3  # 2 injected + 1 organic
    assert got["b"]["emails"] == 1
    assert got["b"]["phones"] == 2  # injected + the digit run
    assert got["b"]["ips"] == 1
    # redaction removes characters (tokens are shorter than matches)
    assert got["a"]["chars_removed"] > 0 and got["b"]["chars_removed"] > 0


def test_scrub_is_idempotent_on_redacted_text(spark):
    from pyspark.sql import functions as F

    df = spark.range(1).select(
        F.lit("x [EMAIL] y [PHONE] z [IP].").alias("t")
    )
    out = df.select(
        F.regexp_count(F.col("t"), F.lit(ext._PII_EMAIL)).alias("e"),
        F.regexp_count(F.col("t"), F.lit(ext._PII_PHONE)).alias("p"),
        F.regexp_count(F.col("t"), F.lit(ext._PII_IP)).alias("i"),
    ).collect()[0]
    assert (out["e"], out["p"], out["i"]) == (0, 0, 0)


def test_patterns_do_not_cross_structure(spark):
    """The phone pattern must not swallow dotted quads or email local
    parts; the IP pattern must not match version strings with >3
    octets as a whole."""
    from pyspark.sql import functions as F

    cases = spark.createDataFrame(
        [
            ("ip stays ip 192.168.1.2 end",),
            ("ver 1.2.3.4.5 multi",),
        ],
        "t string",
    )
    out = cases.select(
        "t",
        F.regexp_count(F.col("t"), F.lit(ext._PII_PHONE)).alias("p"),
        F.regexp_count(F.col("t"), F.lit(ext._PII_IP)).alias("i"),
    ).collect()
    assert out[0]["p"] == 0 and out[0]["i"] == 1
    # 1.2.3.4.5: RE2/Java both match the leading dotted quad once
    assert out[1]["p"] == 0 and out[1]["i"] == 1
