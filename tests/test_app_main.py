"""The runnable application (`python -m transitdata_hfp_deduplicator_spark`)
— Main.java's operational surface: config-driven source → dedup →
forward → stats, end-to-end on the golden corpus."""

from __future__ import annotations


def test_app_drains_corpus_to_golden_uniques(spark, tmp_path, capsys):
    from transitdata_hfp_deduplicator_spark.__main__ import main

    out = str(tmp_path / "out")
    rc = main(
        [
            "--source",
            "/root/reference/src/integration-test/resources/hfp-5000.txt",
            "--out",
            out,
            "--checkpoint",
            str(tmp_path / "ckpt"),
        ]
    )
    assert rc == 0
    got = spark.read.parquet(out)
    assert got.count() == 4956  # ITDeduplicatorTest.java:92-93
    # forwarded rows preserve the full envelope (server_ts/topic/payload)
    assert {"server_ts", "topic", "payload", "digest"} <= set(got.columns)
    printed = capsys.readouterr().out
    assert "[stats]" in printed and "[done]" in printed
